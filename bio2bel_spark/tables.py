"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings. The physical type of ``events.ts`` has changed between driver
data drops (TIMESTAMP(NANOS) in early rounds, TIMESTAMP(MICROS) without a
timezone — read as TIMESTAMP_NTZ — since round 3), so the loader normalizes
whichever of {nanos-as-long, TIMESTAMP_NTZ, TIMESTAMP} arrives into ONE
canonical type, ``timestamp_ntz``, at scan time and asserts the result.
DOCUMENTED SIDE EFFECT: loading a temporal table pins the SESSION timezone
to UTC (``spark.sql.session.timeZone``, a runtime conf) — this is a
deliberate contract, not an accident. The NTZ↔TIMESTAMP casts and
``unix_micros`` epochs must be wall-clock exact and match DuckDB's
``epoch_us`` on the same naive parquet values bit-for-bit regardless of
which session built the plan (the driver's oracle harness constructs its
own SparkSession without the session-factory confs, and the cast reads the
tz at EXECUTION time, so a set-and-restore around the loader would not
survive until the query actually runs). Applications embedding this
library that need a different display timezone should render through
``from_utc_timestamp`` rather than repointing the session conf.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: columns that are semantically timestamps — normalized to timestamp_ntz at
#: scan time whatever physical layout the driver's data drop uses (events.ts
#: has shipped as TIMESTAMP(NANOS) and as bare micros across rounds; the
#: date columns share the same exposure)
TEMPORAL_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


#: session -> {(sf_dir, table) -> DataFrame}. A harness run executes dozens
#: of queries in one session; without this each query re-lists the directory
#: and re-reads parquet footers for the same immutable table. DataFrames are
#: immutable plans, so sharing one per table is free — this is the file-index
#: cache every table catalog keeps, in miniature. Weak-keyed so a stopped
#: session's entries die with it (no stale plans on id reuse, no leak).
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def _session_cache(spark: SparkSession) -> dict:
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        _TABLE_CACHE = weakref.WeakKeyDictionary()
    return _TABLE_CACHE.setdefault(spark, {})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cache = _session_cache(spark)
    cache_key = (os.path.abspath(sf_dir), name)
    cached = cache.get(cache_key)
    if cached is not None:
        return cached
    temporal = TEMPORAL_COLUMNS.get(name, [])
    if temporal:
        # Runtime-settable SQL confs; the driver's oracle harness builds its
        # own SparkSession without the session-factory confs, so the loader
        # must be self-sufficient (PARQUET_TYPE_ILLEGAL on nanos otherwise,
        # and the NTZ/LTZ casts below need a deterministic timezone).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in temporal:
        df = _normalize_ts(df, col)
    cache[cache_key] = df
    return df


def _normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize a timestamp column to the canonical ``timestamp_ntz`` type.

    Accepts any of the layouts the driver's testdata has shipped:

    * ``bigint`` — TIMESTAMP(NANOS) read via ``nanosAsLong``; integer DIV
      (not ``/``) because float division of large nanos values loses the low
      bits and lands 1us off DuckDB's truncating conversion;
    * ``timestamp_ntz`` — parquet TIMESTAMP(MICROS) with no timezone (the
      current layout) — already canonical;
    * ``timestamp`` — TIMESTAMP(MICROS) with timezone; cast is exact under
      the UTC session timezone pinned by the caller;
    * ``date`` — midnight timestamps, exact under any timezone.

    Raises loudly on any other dtype: a silent new layout must fail the scan,
    not corrupt every downstream temporal operator (this bit rounds 1 and 3).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(
            col,
            F.timestamp_micros(F.expr(f"{col} DIV 1000")).cast("timestamp_ntz"),
        )
    elif dtype in ("timestamp", "date"):
        df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    elif dtype != "timestamp_ntz":
        raise TypeError(
            f"{col}: unexpected dtype {dtype!r}; expected one of "
            "bigint (nanos-as-long), timestamp, timestamp_ntz, date — the "
            "driver's testdata layout changed again; extend _normalize_ts"
        )
    assert dict(df.dtypes)[col] == "timestamp_ntz"
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all driver tables to Spark SQL by name."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
