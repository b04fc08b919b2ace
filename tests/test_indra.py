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


def test_distributed_tier_matches_collected(spark, tmp_path):
    """Round-7 full-export tier: indra_statements_df drops the same edges
    and emits the same fields as the collected reference-parity tier, and
    the NDJSON sink round-trips through a JSON parse."""
    import json

    from bio2bel_spark.io.indra import (
        indra_statements_df,
        to_indra_statements,
        write_indra_ndjson,
    )

    edges = spark.createDataFrame(
        [
            ("hgnc", "1", "A", "increases", "hgnc", "2", "B", "pubmed:10", "ev1"),
            ("hgnc", "2", "B", "binds", "chebi", "3", "C", "pubmed:11", "ev2"),
            ("hgnc", "1", "A", "mystery", "hgnc", "2", "B", "pubmed:12", "ev3"),
        ],
        "source_ns string, source_id string, source_name string, "
        "relation string, target_ns string, target_id string, "
        "target_name string, citation string, evidence string",
    )
    collected = to_indra_statements(edges)
    dist = indra_statements_df(edges).collect()
    assert len(collected) == len(dist) == 2  # 'mystery' dropped by both
    got = {
        (r["stmt_type"], r["subj_id"], r["obj_id"], r["pmid"], r["text"])
        for r in dist
    }
    want = {
        (s["type"], s["subj"]["id"], s["obj"]["id"],
         s["evidence"]["pmid"], s["evidence"]["text"])
        for s in collected
    }
    assert got == want

    out = str(tmp_path / "ndjson")
    write_indra_ndjson(edges, out)
    lines = [json.loads(r["value"]) for r in spark.read.text(out).collect()]
    assert len(lines) == 2
    assert {l["type"] for l in lines} == {"Activation", "Complex"}
    assert all(l["subj"]["db"] and l["evidence"]["pmid"] for l in lines)
