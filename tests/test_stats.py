"""Unit tests for robust stats + pivot report operators."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_winsorized_stats_clamps_outliers(spark):
    from bio2bel_spark.operators.stats import winsorized_stats

    # group a: 0..99 plus one outlier 1_000_000 that must be clamped
    rows = [("a", float(i)) for i in range(100)] + [("a", 1_000_000.0)]
    rows += [("b", 10.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r.asDict() for r in winsorized_stats(df, "v", "g").collect()}
    a = got["a"]
    assert a["n"] == 101 and a["n_clipped_high"] >= 1
    # robust mean stays within the data's bulk despite the 1e6 outlier
    assert a["mean_winsorized"] < 100.0
    b = got["b"]
    # single non-null value: quantiles collapse onto it, nothing clipped
    assert b["n"] == 1 and b["mean_winsorized"] == 10.0
    assert b["n_clipped_low"] == 0 and b["n_clipped_high"] == 0


def test_pivot_report_explicit_categories(spark):
    from bio2bel_spark.operators.stats import pivot_report

    rows = [
        (1, "x", 1.0),
        (1, "x", 2.0),
        (1, "y", 5.0),
        (2, "y", 7.0),
    ]
    df = spark.createDataFrame(rows, "uid long, cat string, v double")
    got = {
        r["uid"]: r.asDict()
        for r in pivot_report(df, "uid", "cat", "v", categories=("x", "y", "z")).collect()
    }
    assert got[1] == {"uid": 1, "x": 3.0, "y": 5.0, "z": 0.0}
    assert got[2] == {"uid": 2, "x": 0.0, "y": 7.0, "z": 0.0}
