"""ComPath query-surface tests (reference expectations from FIXTURES.md §3 /
``/root/reference/src/bio2bel/compath/manager.py``)."""

from __future__ import annotations

import pytest

from bio2bel_spark.operators.pathways import PathwayStore


@pytest.fixture(scope="module")
def store(spark):
    pathway = spark.createDataFrame(
        [
            (1, "pid.pathway", "PW1", "p53 signaling"),
            (2, "pid.pathway", "PW2", "apoptosis"),
            (3, "pid.pathway", "PW3", "empty pathway"),
        ],
        "pathway_id long, prefix string, identifier string, name string",
    )
    protein = spark.createDataFrame(
        [
            (10, "7157", "11998", "TP53"),
            (11, "4193", "6973", "MDM2"),
            (12, "596", "990", "BCL2"),
            (13, None, None, None),  # null symbol drives isnot(None) filters
        ],
        "protein_id long, entrez_id string, hgnc_id string, hgnc_symbol string",
    )
    membership = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12), (2, 13)],
        "pathway_id long, protein_id long",
    )
    return PathwayStore(pathway, protein, membership)


def test_counts(store):
    assert store.count_pathways() == 3
    assert store.count_proteins() == 4
    assert store.summarize() == {"pathways": 3, "proteins": 4}


def test_get_pathway_by_id_one_or_none(store):
    assert store.get_pathway_by_id("PW1")["name"] == "p53 signaling"
    assert store.get_pathway_by_id("NOPE") is None


def test_in_set_lookup(store):
    rows = store.get_proteins_by_symbols(["TP53", "BCL2", "MISSING"]).collect()
    assert {r["hgnc_symbol"] for r in rows} == {"TP53", "BCL2"}


def test_search_case_insensitive_with_limit(store):
    assert store.search_pathways("SIGNAL").count() == 1
    assert store.search_pathways("p", limit=2).count() == 2
    assert store.search_genes("dm").collect()[0]["hgnc_symbol"] == "MDM2"


def test_pathway_to_symbols_multidict(store):
    m = {r["pathway_id"]: r["symbols"] for r in store.pathway_to_symbols().collect()}
    assert m == {1: ["MDM2", "TP53"], 2: ["BCL2", "TP53"]}  # null symbol dropped


def test_pathway_size_distribution(store):
    sizes = {r["pathway_id"]: r["pathway_size"] for r in store.pathway_size_distribution().collect()}
    assert sizes == {1: 2, 2: 3}  # PW3 empty → absent (HAVING > 0)


def test_gene_pathway_count_distribution(store):
    counts = {r["hgnc_symbol"]: r["n_pathways"] for r in store.gene_pathway_count_distribution().collect()}
    assert counts == {"TP53": 2, "MDM2": 1, "BCL2": 1}


def test_enrichment_single_plan(store):
    result = {r["pathway_id"]: r for r in store.query_symbols(["TP53", "MDM2"]).collect()}
    assert set(result) == {1, 2}
    r1, r2 = result[1], result[2]
    assert (r1["mapped_proteins"], r1["pathway_size"], r1["gene_set"]) == (2, 2, ["MDM2", "TP53"])
    assert (r2["mapped_proteins"], r2["pathway_size"], r2["gene_set"]) == (1, 3, ["TP53"])
    assert r1["pathway_name"] == "p53 signaling"


def test_pathways_for_proteins_and_multiplicity(spark, store):
    keys = spark.createDataFrame([(10,)], "protein_id long")
    hit = {r["identifier"] for r in store.pathways_for_proteins(keys).collect()}
    assert hit == {"PW1", "PW2"}
    mult = {r["pathway_id"]: r["n_proteins"] for r in store.pathway_multiplicity(keys).collect()}
    assert mult == {1: 1, 2: 1}


def test_binds_to_tpch_trio(tables):
    """Same operators over the driver's orders↔part M2M via lineitem."""
    store = PathwayStore(
        tables["orders"].select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        ),
        tables["part"],
        tables["lineitem"].selectExpr("l_orderkey AS o_orderkey", "l_partkey AS p_partkey"),
        pathway_key="o_orderkey",
        protein_key="p_partkey",
        symbol_col="p_name",
        pathway_name_col="o_orderpriority",
    )
    # every order has >= 1 lineitem → distribution covers all orders w/ parts
    dist = store.pathway_size_distribution()
    assert dist.count() > 0
    assert dist.agg({"pathway_size": "max"}).collect()[0][0] >= 1
