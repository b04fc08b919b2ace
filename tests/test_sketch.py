"""Tests for KMV sketch, deterministic splits, and heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_kmv_exact_below_k(spark):
    from bio2bel_spark.operators.sketch import kmv_distinct

    df = spark.range(100).select((F.col("id") % 37).alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.n_hashes == 37
    assert row.estimate == 37.0  # sketch not saturated -> exact


def test_kmv_estimate_within_error_bounds(spark):
    from bio2bel_spark.operators.sketch import kmv_distinct

    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.n_hashes == 256
    # standard error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(row.estimate - n) / n < 0.25


def test_kmv_ignores_nulls_and_duplicates(spark):
    from bio2bel_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)] * 10, "v STRING"
    )
    row = kmv_distinct(df, "v", k=16).collect()[0]
    assert (row.n_hashes, row.estimate) == (2, 2.0)


def test_hash_split_is_stable_and_rowwise(spark):
    from bio2bel_spark.operators.sketch import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.range(2000).select(F.col("id"))
    full = dict(
        hash_split(df, "id", fr).select("id", "split").collect()
    )
    # filtering rows never changes surviving rows' assignment
    half = dict(
        hash_split(df.filter(F.col("id") % 2 == 0), "id", fr)
        .select("id", "split")
        .collect()
    )
    assert all(full[k] == v for k, v in half.items())
    # all splits present, roughly proportional
    from collections import Counter

    c = Counter(full.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.7 < c["train"] / 2000 < 0.9


def test_hash_split_rejects_bad_fractions(spark):
    from bio2bel_spark.operators.sketch import hash_split

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(spark.range(1), "id", {"a": 0.5, "b": 0.4}).collect()


def test_heavy_hitters_order_and_ties(spark):
    from bio2bel_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 3 + [("w",)] * 1, "v STRING"
    )
    rows = heavy_hitters(df, "v", k=3).collect()
    assert [(r.v, r.n) for r in rows] == [("x", 5), ("y", 3), ("z", 3)]


def test_heavy_hitters_plan_is_take_ordered(spark):
    from bio2bel_spark.operators.sketch import heavy_hitters

    df = spark.range(100).select((F.col("id") % 7).alias("v"))
    plan = heavy_hitters(df, "v", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
