"""Layout-proofing for the events.ts loader.

The driver's testdata has shipped ``events.ts`` as TIMESTAMP(NANOS)-as-long
(rounds 1-2) and as TIMESTAMP_NTZ micros (round 3+); both dtype flips broke
the harness once. These tests feed every layout through the normalizer and
require identical epochs and the single canonical dtype.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bio2bel_spark.tables import _normalize_ts, load_table


EPOCHS_US = [0, 1_600_000_000_123_456, 1_700_000_000_999_999]


def _epochs(df):
    rows = (
        df.select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .orderBy("us")
        .collect()
    )
    return [r["us"] for r in rows]


def test_normalize_ts_all_layouts_identical(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos = spark.createDataFrame(
        [(e * 1000,) for e in EPOCHS_US], "ts bigint"
    )
    ntz = spark.createDataFrame([(e,) for e in EPOCHS_US], "us bigint").select(
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts")
    )
    ltz = spark.createDataFrame([(e,) for e in EPOCHS_US], "us bigint").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    results = []
    for df in (nanos, ntz, ltz):
        out = _normalize_ts(df, "ts")
        assert dict(out.dtypes)["ts"] == "timestamp_ntz"
        results.append(_epochs(out))
    assert results[0] == results[1] == results[2] == sorted(EPOCHS_US)


def test_normalize_ts_rejects_unknown_layout(spark):
    df = spark.createDataFrame([("2020-01-01",)], "ts string")
    with pytest.raises(TypeError, match="unexpected dtype"):
        _normalize_ts(df, "ts")


def test_load_table_events_canonical_dtype(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    # epoch arithmetic must work on the canonical type (the round-3 crash)
    n = ev.select(
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3600_000_000).cast(
            "long"
        )
    ).count()
    assert n == ev.count()


def test_normalize_ts_accepts_date_layout(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("2024-03-01",)], "d string").select(
        F.col("d").cast("date").alias("ts")
    )
    out = _normalize_ts(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    assert str(out.collect()[0]["ts"]) == "2024-03-01 00:00:00"


def test_load_table_normalizes_all_temporal_columns(spark, sf_dir):
    from bio2bel_spark.tables import TEMPORAL_COLUMNS

    for table, cols in TEMPORAL_COLUMNS.items():
        df = load_table(spark, sf_dir, table)
        for col in cols:
            assert dict(df.dtypes)[col] == "timestamp_ntz", (table, col)
