"""Salting utilities must be exactly equivalent to their unsalted twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bio2bel_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" holds 90% of rows with many duplicate values
    rows = [("hot", f"v{i % 37}") for i in range(900)]
    rows += [(f"k{i}", f"v{i}") for i in range(100)]
    return spark.createDataFrame(rows, "key string, value string")


def test_salted_distinct_count_exact(spark, skewed):
    got = {
        r["key"]: r["n_distinct"]
        for r in skew.salted_distinct_count(skewed, "key", "value", 8).collect()
    }
    want = {
        r["key"]: r["n"]
        for r in skewed.groupBy("key")
        .agg(F.countDistinct("value").alias("n"))
        .collect()
    }
    assert got == want
    assert got["hot"] == 37


def test_salted_collect_set_exact(spark, skewed):
    got = {
        r["key"]: r["values"]
        for r in skew.salted_collect_set(skewed, "key", "value", 8).collect()
    }
    want = {
        r["key"]: r["v"]
        for r in skewed.groupBy("key")
        .agg(F.sort_array(F.collect_set("value")).alias("v"))
        .collect()
    }
    assert got == want


def test_replicated_salt_join_multiplicity(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k1", 3), ("missing", 4)], "key string, attr int"
    )
    got = skew.replicated_salt_join(skewed, dim, "key", n_salts=4)
    plain = skewed.join(dim, "key")
    assert got.count() == plain.count()
    got_hot = got.filter(F.col("key") == "k1").orderBy("value", "attr").collect()
    plain_hot = plain.filter(F.col("key") == "k1").orderBy("value", "attr").collect()
    assert [tuple(r) for r in got_hot] == [tuple(r) for r in plain_hot]
