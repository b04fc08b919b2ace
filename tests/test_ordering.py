"""Tests for distributed enumeration and deterministic shuffling."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_enumerate_sorted_matches_global_window(spark):
    from bio2bel_spark.operators.ordering import enumerate_sorted

    df = spark.range(500).select(
        F.concat(F.lit("k"), F.lpad((F.col("id") * 37 % 500).cast("string"), 4, "0")).alias("k")
    ).repartition(13)
    got = {r.k: r.seq for r in enumerate_sorted(df, "k").collect()}
    want = {k: i for i, k in enumerate(sorted(got))}
    assert got == want  # contiguous 0-based ids in sort order


def test_enumerate_sorted_runs_multiple_tasks(spark):
    from bio2bel_spark.operators.ordering import enumerate_sorted

    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    out = enumerate_sorted(df, "k")
    # the sort is range-partitioned (parallel), not a global unpartitioned
    # window funneling every row through one task. The ranged table is
    # materialized via localCheckpoint (so ReuseExchange ambiguity can't
    # give the two branches different boundaries), which truncates lineage —
    # assert on the checkpointed RDD's partitioning + range ids instead of
    # the (now-opaque) plan string.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan.split("Window")[0]
    ranges = out.withColumn(
        "_pid", F.spark_partition_id()
    ).select("_pid").distinct().count()
    assert ranges > 1  # work is spread across tasks, not one reducer
    # and ids are still the exact global enumeration
    got = {r.k: r.seq for r in out.collect()}
    assert got == {k: i for i, k in enumerate(sorted(got))}


def test_deterministic_shuffle_properties(spark):
    from bio2bel_spark.operators.ordering import deterministic_shuffle

    df = spark.range(300).select("id")
    a = {r.id: r.seq for r in deterministic_shuffle(df, "id", seed=1).collect()}
    b = {r.id: r.seq for r in
         deterministic_shuffle(df.repartition(7), "id", seed=1).collect()}
    c = {r.id: r.seq for r in deterministic_shuffle(df, "id", seed=2).collect()}
    assert a == b                      # partitioning-independent
    assert a != c                      # a new seed is a new permutation
    assert sorted(a.values()) == list(range(300))  # it IS a permutation
    # and it's not the identity order (the hash actually shuffles)
    assert [a[i] for i in range(300)] != list(range(300))


def test_negative_samples_properties(spark):
    from bio2bel_spark.operators.ordering import negative_samples

    df = spark.createDataFrame([(i,) for i in range(20)], "id long")
    out = negative_samples(df, "id", k=3, seed=5).collect()
    # k rows per anchor
    assert len(out) == 60
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["id"], set()).add(r["neg_id"])
    for anchor, negs in by_anchor.items():
        assert anchor not in negs, "anchor paired with itself"
        assert len(negs) == 3, "negatives must be distinct"
    # deterministic: same seed → same pairs; new seed → different permutation
    again = negative_samples(df, "id", k=3, seed=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = negative_samples(df, "id", k=3, seed=6).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_negative_samples_rejects_tiny_input(spark):
    import pytest as _pytest

    from bio2bel_spark.operators.ordering import negative_samples

    df = spark.createDataFrame([(1,), (2,)], "id long")
    with _pytest.raises(ValueError, match="more rows than negatives"):
        negative_samples(df, "id", k=3)
