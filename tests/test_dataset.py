"""Dataset contract tests.

Mirrors the reference's abstract-contract and populate/provenance tests
(``/root/reference/tests/test_manager.py:18-156``,
``tests/test_actions.py:14-51``, ``tests/constants.py:17-97``): 5-row
synthetic model, contract violations raise, populate/drop write exactly one
provenance row each, upsert adds only new keys.
"""

from __future__ import annotations

import pytest

from bio2bel_spark.catalog import ACTION_DROP, ACTION_POPULATE, ACTION_POPULATE_FAILED
from bio2bel_spark.dataset import Dataset, get_dataset_classes
from bio2bel_spark.exc import Bio2BELMissingNameError, Bio2BELModuleCaseError


class TestDataset(Dataset):
    """5-row synthetic model (reference tests/constants.py:17-41)."""

    __test__ = False  # not a pytest class

    module_name = "test"
    tables = {"model": "id BIGINT, test_id STRING, name STRING"}

    def _populate_tables(self, **kwargs):
        rows = [(i, f"MODEL:{i}", str(i) * 5) for i in range(5)]
        df = self.spark.createDataFrame(rows, "id long, test_id string, name string")
        return {"model": df}


class FailingDataset(Dataset):
    __test__ = False
    module_name = "failing"
    tables = {"model": None}

    def _populate_tables(self, **kwargs):
        raise RuntimeError("boom")


def test_contract_missing_name():
    with pytest.raises(Bio2BELMissingNameError):
        class Bad(Dataset):  # noqa
            tables = {"t": None}
            def _populate_tables(self): return {}


def test_contract_case():
    with pytest.raises(Bio2BELModuleCaseError):
        class Bad(Dataset):  # noqa
            module_name = "NotLower"
            def _populate_tables(self): return {}


def test_registry_contains_test_dataset():
    assert get_dataset_classes()["test"] is TestDataset


def test_populate_counts_and_provenance(spark, warehouse):
    ds = TestDataset(spark, warehouse)
    assert not ds.is_populated()
    assert ds.summarize() == {"model": 0}
    ds.populate()
    assert ds.is_populated()
    assert ds.summarize() == {"model": 5}
    assert ds.count_table("model") == 5
    actions = ds.catalog.actions().collect()
    assert len(actions) == 1
    assert (actions[0]["resource"], actions[0]["action"]) == ("test", ACTION_POPULATE)
    # get-by-id on a missing key returns nothing (test_manager.py:151-156)
    assert ds.table("model").filter("test_id = 'MODEL:99'").count() == 0


def test_populate_idempotent_without_force(spark, warehouse):
    ds = TestDataset(spark, warehouse)
    ds.populate()
    ds.populate()  # no-op: guarded by is_populated (abstract_manager.py:312-324)
    assert ds.catalog.count_actions() == 1
    ds.populate(force=True)
    assert ds.catalog.count_actions() == 2


def test_drop_writes_provenance(spark, warehouse):
    ds = TestDataset(spark, warehouse)
    ds.populate()
    ds.drop_all()
    assert not ds.is_populated()
    latest = {r["resource"]: r["action"] for r in ds.catalog.latest_actions().collect()}
    assert latest["test"] == ACTION_DROP


def test_populate_failed_provenance(spark, warehouse):
    ds = FailingDataset(spark, warehouse)
    with pytest.raises(RuntimeError):
        ds.populate()
    actions = ds.catalog.actions().collect()
    assert [a["action"] for a in actions] == [ACTION_POPULATE_FAILED]


def test_upsert_adds_only_new(spark, warehouse):
    """Namespace-update semantics: +4 on overlapping delta
    (reference tests/test_manager_namespace.py:112-128)."""
    ds = TestDataset(spark, warehouse)
    ds.populate()
    delta = spark.createDataFrame(
        [(i, f"MODEL:{i}", str(i) * 5) for i in range(3, 10)],
        "id long, test_id string, name string",
    )
    added = ds.upsert("model", delta, key="test_id")
    assert added == 5  # ids 5..9 are new; 3,4 already present
    assert ds.count_table("model") == 10
    # idempotent
    assert ds.upsert("model", delta, key="test_id") == 0
