"""Catalog + provenance tests (≈ reference tests/test_actions.py:14-51)."""

from __future__ import annotations

from bio2bel_spark.catalog import ACTION_DROP, ACTION_POPULATE, Catalog


def test_write_read_roundtrip(spark, warehouse):
    cat = Catalog(spark, warehouse)
    df = spark.range(10).withColumnRenamed("id", "x")
    cat.write_table(df, "demo")
    assert cat.table_exists("demo")
    assert cat.read_table("demo").count() == 10
    assert "demo" in cat.list_tables()


def test_drop_table(spark, warehouse):
    cat = Catalog(spark, warehouse)
    cat.write_table(spark.range(3), "gone")
    assert cat.drop_table("gone") is True
    assert not cat.table_exists("gone")
    assert cat.drop_table("gone") is False


def test_actions_append_and_order(spark, warehouse):
    cat = Catalog(spark, warehouse)
    assert cat.count_actions() == 0
    cat.store_action("test", ACTION_POPULATE)
    cat.store_action("test", ACTION_DROP)
    cat.store_action("other", ACTION_POPULATE)
    assert cat.count_actions() == 3
    rows = cat.actions().collect()
    # newest first (Action.ls ordering, models.py:121)
    assert [r["created"] for r in rows] == sorted(
        [r["created"] for r in rows], reverse=True
    )


def test_latest_actions_window(spark, warehouse):
    cat = Catalog(spark, warehouse)
    cat.store_action("test", ACTION_POPULATE)
    cat.store_action("test", ACTION_DROP)
    latest = {r["resource"]: r["action"] for r in cat.latest_actions().collect()}
    assert latest == {"test": ACTION_DROP}
