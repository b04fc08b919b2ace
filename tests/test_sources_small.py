"""tfregulons / biogrid / hmdd / go pipeline tests (FIXTURES.md §4-7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bio2bel_spark.sources import biogrid, go, hmdd, tfregulons


# ------------------------------------------------------------------ tfregulons

@pytest.fixture(scope="module")
def hgnc_map(spark):
    return spark.createDataFrame(
        [("TP53", "11998"), ("MDM2", "6973"), ("BCL2", "990")],
        "hgnc_symbol string, hgnc_id string",
    )


def test_tfregulons_pipeline(spark, hgnc_map):
    raw = spark.createDataFrame(
        [
            ("TP53", "MDM2", 1, "A", "111, 222"),   # kept, 2 citations
            ("TP53", "BCL2", -1, "B", "333"),       # kept, repression
            ("TP53", "MDM2", 1, "D", "444"),        # dropped: score D
            ("TP53", "NOPE", 1, "A", "555"),        # dropped: unmapped target
            ("TP53", "MDM2", 0, "A", "666"),        # dropped: effect 0
        ],
        "tf_hgnc_symbol string, target_hgnc_symbol string, effect int, score string, pmids string",
    )
    prepared = tfregulons.prepare(raw, hgnc_map)
    assert prepared.count() == 3  # score+mapping filters
    edges = tfregulons.to_edges(prepared)
    rows = edges.collect()
    # row1: 2 citations × 2 edges + 1 transcription; row2: 1 × 2 + 1 transcription
    rels = [r["relation"] for r in rows]
    assert rels.count("directlyIncreases") == 2
    assert rels.count("increases") == 2
    assert rels.count("directlyDecreases") == 1
    assert rels.count("decreases") == 1
    assert rels.count("transcribedTo") == 2  # deduped per target
    up = [r for r in rows if r["relation"] == "directlyIncreases"]
    assert {r["citation"] for r in up} == {"111", "222"}
    assert up[0]["source_ns"] == "complex"


def test_tfregulons_enrich_semi_join(spark, hgnc_map):
    raw = spark.createDataFrame(
        [("TP53", "MDM2", 1, "A", "1"), ("TP53", "BCL2", 1, "A", "2")],
        "tf_hgnc_symbol string, target_hgnc_symbol string, effect int, score string, pmids string",
    )
    prepared = tfregulons.prepare(raw, hgnc_map)
    seed = spark.createDataFrame([("6973",)], "hgnc_id string")
    assert tfregulons.enrich_targets(prepared, seed).count() == 1


# --------------------------------------------------------------------- biogrid

def test_biogrid_pipeline(spark):
    raw = spark.createDataFrame(
        [
            ("entrez gene/locuslink:111", "biogrid:222", biogrid.BINDS_ACTIONS[0],
             "pubmed:1", "m", "biogrid", "score:1"),
            ("ncbigene:111", "uniprot:P0DTD2", biogrid.GENE_ASSOCIATION[0],
             "pubmed:2", "m", "biogrid", "-"),
            ("ncbigene:111", "biogrid:999", biogrid.ASSOCIATION_ACTIONS[0],
             "pubmed:3", "m", "biogrid", "-"),   # unmapped biogrid id
            ("ncbigene:111", "ncbigene:333", biogrid.ASSOCIATION_ACTIONS[0],
             "doi:4", "m", "biogrid", "-"),      # non-pubmed → reject
            ("ncbigene:111", "ncbigene:333", 'psi-mi:"MI:0000"(unknown)',
             "pubmed:5", "m", "biogrid", "-"),   # unhandled relation
        ],
        ", ".join(f"{c} string" for c in biogrid.RAW_COLUMNS),
    )
    bg_map = spark.createDataFrame([("222", "444")], "biogrid_id string, ncbigene_id string")
    up_map = spark.createDataFrame([("P0DTD2", "1489679")], "uniprot_id string, ncbigene_id string")
    edges, rejects = biogrid.process(spark, raw, bg_map, up_map)
    e = {(r["source_id"], r["target_id"]): r for r in edges.collect()}
    assert len(e) == 2
    assert e[("111", "444")]["relation"] == "binds"
    assert e[("111", "444")]["node_dsl"] == "Protein"
    assert e[("111", "1489679")]["relation"] == "association"
    assert e[("111", "1489679")]["node_dsl"] == "Gene"  # genetic interaction
    reasons = sorted(r["reject_reason"] for r in rejects.collect())
    assert reasons == ["non_pubmed_provenance", "unhandled_relation", "unmapped_interactor"]


# ------------------------------------------------------------------------ hmdd

def test_hmdd_grounding_with_comma_swap(spark):
    raw = spark.createDataFrame(
        [
            ("circulation", "hsa-mir-21", "breast cancer", "100", "desc1"),
            ("circulation", "hsa-mir-21", "carcinoma, hepatocellular", "101", "desc2"),
            ("circulation", "unknown-mir", "breast cancer", "102", "desc3"),
            ("circulation", "hsa-mir-21", "mystery disease", "103", "desc4"),
        ],
        "category string, mir string, disease string, pmid string, description string",
    )
    mirna_g = spark.createDataFrame(
        [("hsa-mir-21", "mirbase", "MI0000077", "hsa-mir-21")],
        "text string, prefix string, identifier string, name string",
    )
    disease_g = spark.createDataFrame(
        [
            ("breast cancer", "mondo", "0007254", "breast cancer"),
            ("hepatocellular carcinoma", "mondo", "0007256", "hepatocellular carcinoma"),
        ],
        "text string, prefix string, identifier string, name string",
    )
    edges, rejects = hmdd.process(raw, mirna_g, disease_g)
    e = edges.collect()
    assert len(e) == 2
    by_pmid = {r["citation"]: r for r in e}
    # comma-swap grounded 'carcinoma, hepatocellular'
    assert by_pmid["101"]["target_id"] == "0007256"
    assert by_pmid["100"]["relation"] == "regulates"
    assert by_pmid["100"]["source_dsl"] == "MicroRna"
    reasons = sorted(r["reject_reason"] for r in rejects.collect())
    assert reasons == ["ungrounded_disease", "ungrounded_mirna"]


# -------------------------------------------------------------------------- go

def test_go_associations(spark):
    raw = spark.createDataFrame(
        [
            ("UniProtKB:P31946", "YWHAB", "9606", "GO:0007165", "signal transduction", False),
            ("UniProtKB:P00000", "MOUSE1", "10090", "GO:0007165", "signal transduction", False),  # not human
            ("MGI:123", "X", "9606", "GO:0007165", "signal transduction", False),  # not uniprot
            ("UniProtKB:Q00000", "NOHGNC", "9606", "GO:0007165", "signal transduction", False),  # no hgnc
        ],
        "source_id string, source_name string, taxonomy_id string, "
        "target_id string, target_label string, negated boolean",
    )
    uniprot_hgnc = spark.createDataFrame(
        [("P31946", "12441")], "uniprot_id string, hgnc_id string"
    )
    hgnc_ncbigene = spark.createDataFrame(
        [("12441", "7529")], "hgnc_id string, ncbigene_id string"
    )
    processed = go.process_associations(raw, uniprot_hgnc, hgnc_ncbigene)
    rows = processed.collect()
    assert len(rows) == 1
    assert rows[0]["go_id"] == "0007165"
    edges = go.to_edges(processed).collect()
    assert edges[0]["source_id"] == "7529"
    assert edges[0]["target_ns"] == "go"
    assert edges[0]["relation"] == "association"


def test_go_subhierarchy(spark):
    onto = spark.createDataFrame(
        [
            ("GO:2", "is_a", "GO:1"),
            ("GO:3", "part_of", "GO:2"),
            ("GO:4", "is_a", "GO:9"),   # outside subtree
            ("GO:3", "regulates", "GO:1"),  # non-hierarchy relation dropped
        ],
        "child string, relation string, parent string",
    )
    edges = go.subhierarchy_edges(onto, "GO:1").collect()
    got = {(r["source_id"], r["relation"], r["target_id"]) for r in edges}
    assert got == {("GO:2", "isA", "GO:1"), ("GO:3", "partOf", "GO:2")}


# ------------------------------------------------------------- circrnadisease

def test_circrnadisease_prepare_projects_and_renames(spark):
    from bio2bel_spark.sources import circrnadisease

    raw = spark.createDataFrame(
        [
            ("1", "hsa_circ_1", "circA", "synA", "glioma", "RNA-seq",
             "human", "Up", "EXTRA"),
            ("2", "hsa_circ_2", "circB", None, "gastric cancer", "qRT-PCR",
             "human", "Down", "EXTRA"),
        ],
        "`pmid` string, `circRNA id` string, `circRNA name` string, "
        "`circRNA synonyms` string, `disease` string, "
        "`method of circRNA detection` string, `species` string, "
        "`expression pattern` string, `unused` string",
    )
    prepared = circrnadisease.prepare(raw)
    assert prepared.columns == [
        "pmid", "circrna_id", "circrna_name", "circrna_synonyms",
        "disease", "detection_method", "species", "expression_pattern",
    ]
    # snake_case input round-trips too
    assert circrnadisease.prepare(prepared).columns == prepared.columns
    out = {r["circrna_id"]: r for r in
           circrnadisease.associations(prepared).collect()}
    assert out["hsa_circ_1"]["expression_pattern"] == "up"
    assert out["hsa_circ_2"]["disease"] == "gastric cancer"


def test_circrnadisease_prepare_missing_column_raises(spark):
    from bio2bel_spark.sources import circrnadisease

    raw = spark.createDataFrame([("1",)], "`pmid` string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing column"):
        circrnadisease.prepare(raw)


def test_circrnadisease_dataset_populate(spark, warehouse):
    from bio2bel_spark.sources.datasets import CircRNADiseaseDataset

    raw = spark.createDataFrame(
        [
            ("1", "hsa_circ_1", "circA", "synA", " glioma ", "RNA-seq",
             "human", "Up"),
            ("1", "hsa_circ_1", "circA", "synA", "glioma", "RNA-seq",
             "human", "Up"),   # duplicate (circrna_id, disease, pmid)
        ],
        "`pmid` string, `circRNA id` string, `circRNA name` string, "
        "`circRNA synonyms` string, `disease` string, "
        "`method of circRNA detection` string, `species` string, "
        "`expression pattern` string",
    )
    ds = CircRNADiseaseDataset(spark, warehouse, input_dfs={"raw": raw})
    ds.populate()
    assert ds.is_populated()
    assert ds.table("associations").count() == 1
