"""rhea (triples/SPARQL-as-joins) and pid (CX) pipeline tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bio2bel_spark.sources import pid, rhea

RH = rhea.RH
CH = rhea.CHEBI_NS


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # reaction 1: bidirectional, 1 reactant (direct chebi), 1 product (reactive part)
        ("http://x/10001", RH + "equation", "A <=> B"),
        ("http://x/10001", RH + "bidirectionalReaction", "http://x/10001_bd"),
        ("http://x/10001", RH + "id", "10001"),
        ("http://x/10001_L", RH + "contains", "http://x/p1"),
        ("http://x/p1", RH + "compound", "http://x/c1"),
        ("http://x/c1", RH + "name", "water"),
        ("http://x/c1", RH + "chebi", CH + "15377"),
        ("http://x/10001_R", RH + "contains", "http://x/p2"),
        ("http://x/p2", RH + "compound", "http://x/c2"),
        ("http://x/c2", RH + "name", "bigprotein"),
        ("http://x/c2", RH + "reactivePart", "http://x/c2_part"),
        ("http://x/c2_part", RH + "chebi", CH + "29999"),
        ("http://x/c2_part", RH + "name", "residue"),
        # reaction 2: NOT bidirectional → excluded
        ("http://x/20002", RH + "equation", "C => D"),
        ("http://x/20002", RH + "id", "20002"),
        # compound with TWO reactive parts → skipped
        ("http://x/10001_L", RH + "contains", "http://x/p3"),
        ("http://x/p3", RH + "compound", "http://x/c3"),
        ("http://x/c3", RH + "name", "multi"),
        ("http://x/c3", RH + "reactivePart", "http://x/c3_a"),
        ("http://x/c3_a", RH + "chebi", CH + "1"),
        ("http://x/c3_a", RH + "name", "a"),
        ("http://x/c3", RH + "reactivePart", "http://x/c3_b"),
        ("http://x/c3_b", RH + "chebi", CH + "2"),
        ("http://x/c3_b", RH + "name", "b"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_rhea_reactions_filter_bidirectional(triples):
    r = rhea.reactions(triples).collect()
    assert len(r) == 1
    assert r[0]["rhea_id"] == "10001"


def test_rhea_participants_and_nested_nodes(triples):
    nodes = rhea.to_reaction_nodes(triples).collect()
    assert len(nodes) == 1
    n = nodes[0]
    assert n["dsl_type"] == "Reaction"
    assert n["identifier"] == "10001"
    assert n["name"] == "A <=> B"
    reactants = [(x["identifier"], x["name"]) for x in n["reactants"]]
    products = [(x["identifier"], x["name"]) for x in n["products"]]
    assert reactants == [("15377", "water")]  # multi-part compound skipped
    assert products == [("29999", "residue")]  # reactive-part name wins


# -------------------------------------------------------------------------- pid

@pytest.fixture(scope="module")
def cx(spark):
    nodes = spark.createDataFrame(
        [
            (1, "TP53", "uniprot:P04637"),
            (2, "RAS Family", "other:RAS"),
            (3, "GTP", "CHEBI:15996"),
            (4, "fam", "none:x"),
            (5, "skipme", "hprd:123"),
        ],
        "`@id` long, n string, r string",
    )
    node_attrs = spark.createDataFrame(
        [
            (4, "type", ["proteinfamily"]),
            (4, "member", ["hgnc.symbol:TP53", "hgnc.symbol:MDM2", "hgnc.symbol:NOPE"]),
        ],
        "po long, n string, v array<string>",
    )
    edges = spark.createDataFrame(
        [
            (10, 1, 3, "in-complex-with"),
            (11, 1, 4, "controls-phosphorylation-of"),
            (12, 5, 1, "controls-expression-of"),  # source unresolved → dropped
            (13, 1, 3, "mystery-edge"),            # unhandled type → dropped
        ],
        "`@id` long, s long, t long, i string",
    )
    edge_attrs = spark.createDataFrame(
        [(10, "citation", ["pubmed:111", "pubmed:222"])],
        "po long, n string, v array<string>",
    )
    return nodes, node_attrs, edges, edge_attrs


def test_pid_resolve_nodes(spark, cx):
    nodes, node_attrs, _, _ = cx
    hgnc_map = spark.createDataFrame(
        [("TP53", "11998"), ("MDM2", "6973")], "hgnc_symbol string, hgnc_id string"
    )
    fam_map = spark.createDataFrame(
        [("other:RAS", "RAS")], "reference string, fplx_name string"
    )
    chebi = spark.createDataFrame([("15996", "GTP (official)")], "chebi_id string, name string")
    resolved = pid.resolve_nodes(nodes, node_attrs, hgnc_map, fam_map, chebi)
    rows = resolved.collect()
    by_cx = {}
    for r in rows:
        by_cx.setdefault(r["cx_id"], []).append(r)
    assert by_cx[1][0]["identifier"] == "11998"       # uniprot via name→hgnc
    assert by_cx[2][0]["namespace"] == "fplx"
    assert by_cx[3][0]["name"] == "GTP (official)"    # chebi name lookup
    assert len(by_cx[4]) == 2                          # family exploded, NOPE dropped
    assert 5 not in by_cx                              # hprd skipped


def test_pid_edges_cartesian_and_dispatch(spark, cx):
    nodes, node_attrs, edges, edge_attrs = cx
    hgnc_map = spark.createDataFrame(
        [("TP53", "11998"), ("MDM2", "6973")], "hgnc_symbol string, hgnc_id string"
    )
    fam_map = spark.createDataFrame(
        [("other:RAS", "RAS")], "reference string, fplx_name string"
    )
    resolved = pid.resolve_nodes(nodes, node_attrs, hgnc_map, fam_map, None)
    out = pid.to_edges(edges, resolved, edge_attrs, network_uuid="uuid-1").collect()
    binds = [r for r in out if r["relation"] == "binds"]
    # edge 10: 1 source × 1 target × 2 citations
    assert len(binds) == 2
    assert {r["citation"] for r in binds} == {"111", "222"}
    phos = [r for r in out if r["relation"] == "regulates"]
    # edge 11: 1 source × 2 family members × default citation
    assert len(phos) == 2
    assert all(r["variant_name"] == "Ph" for r in phos)
    assert all(r["citation"] == "ndex:uuid-1" for r in phos)
    assert {r["target_id"] for r in phos} == {"11998", "6973"}
    # unresolved source and unhandled type contributed nothing
    assert len(out) == 4
