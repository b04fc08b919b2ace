"""INDRA export adapter (G6) + registry lookup (M5 stub)."""

from __future__ import annotations

import pytest

from bio2bel_spark.dataset import ensure_dataset
from bio2bel_spark.io.indra import to_indra_statements


def test_to_indra_statements(spark):
    edges = spark.createDataFrame(
        [
            ("hgnc", "11998", "TP53", "increases", "hgnc", "6973", "MDM2", "111", "ev1"),
            ("hgnc", "11998", "TP53", "decreases", "hgnc", "990", "BCL2", "222", "ev2"),
            ("hgnc", "1", "X", "unknownRel", "hgnc", "2", "Y", None, None),
        ],
        "source_ns string, source_id string, source_name string, relation string, "
        "target_ns string, target_id string, target_name string, citation string, "
        "evidence string",
    )
    stmts = to_indra_statements(edges)
    assert len(stmts) == 2  # unknown relation skipped
    by_type = {s["type"]: s for s in stmts}
    assert by_type["Activation"]["obj"]["name"] == "MDM2"
    assert by_type["Inhibition"]["evidence"]["pmid"] == "222"


def test_to_indra_statements_caps_driver_collect(spark):
    edges = spark.range(20).selectExpr(
        "'a' as source_ns", "cast(id as string) as source_id",
        "'increases' as relation", "'b' as target_ns", "'t' as target_id"
    )
    with pytest.raises(ValueError, match="cap"):
        to_indra_statements(edges, limit=10)


def test_ensure_dataset_lookup():
    import bio2bel_spark.sources.datasets  # noqa: F401 — registers sources

    assert ensure_dataset("tfregulons").module_name == "tfregulons"
    with pytest.raises(KeyError, match="not registered"):
        ensure_dataset("nope")
