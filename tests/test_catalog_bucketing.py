"""Bucketed managed tables must give shuffle-free co-located joins."""

from __future__ import annotations

import pytest

from bio2bel_spark.catalog import Catalog


def _has_shuffle(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    cat = Catalog(spark, str(tmp_path / "wh"))
    a = spark.range(5000).selectExpr("id as k", "id * 2 as va")
    b = spark.range(5000).selectExpr("id as k", "id * 3 as vb")
    cat.write_bucketed_table(a, "bkt_a", ["k"], n_buckets=8)
    cat.write_bucketed_table(b, "bkt_b", ["k"], n_buckets=8)
    try:
        bucketed = cat.read_bucketed_table("bkt_a").join(
            cat.read_bucketed_table("bkt_b"), "k"
        )
        plain = a.join(b, "k")
        assert not _has_shuffle(bucketed)
        assert _has_shuffle(plain)
        assert bucketed.count() == plain.count() == 5000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
