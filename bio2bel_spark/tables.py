"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings. The ``events.ts`` column is parquet TIMESTAMP(NANOS), which the
Spark vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
(set in the session factory) it arrives as nanoseconds-since-epoch LongType
and is converted here to a proper microsecond TimestampType column once, at
scan time — keeping every downstream plan in native timestamp functions.
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
    if name == "events":
        # Runtime-settable SQL conf; the driver's oracle harness builds its own
        # SparkSession without the session-factory confs, so the loader must be
        # self-sufficient (PARQUET_TYPE_ILLEGAL otherwise).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV, not `/`: float division of large nanos values loses
        # the low bits and lands 1us off DuckDB's truncating conversion
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    cache[cache_key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all driver tables to Spark SQL by name."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
