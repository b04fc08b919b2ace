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
