"""IntAct pipeline tests: filter cascade + interactor dispatch + relation
dispatch (expectations from FIXTURES.md §4 / reference intact.py:513-545)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bio2bel_spark.sources import intact


def _raw(spark, rows):
    return spark.createDataFrame(rows, intact.RAW_SCHEMA)


@pytest.fixture(scope="module")
def mappings(spark):
    return {
        "uniprot_ncbigene": spark.createDataFrame(
            [("P12345", "7157")], "uniprot_id string, ncbigene_id string"
        ),
        "ncbigene_names": spark.createDataFrame(
            [("7157", "TP53")], "ncbigene_id string, name string"
        ),
        "uniprot_mnemonics": spark.createDataFrame(
            [("Q99999", "Q9_HUMAN")], "uniprot_id string, mnemonic string"
        ),
        "chebi_names": spark.createDataFrame(
            [("15996", "GTP")], "chebi_id string, name string"
        ),
        "complexportal": spark.createDataFrame(
            [("EBI-123", "CPX-1")], "intact_id string, cpx string"
        ),
        "reactome": spark.createDataFrame(
            [("EBI-456", "R-HSA-1")], "intact_id string, reactome_id string"
        ),
    }


PHOS = 'psi-mi:"MI:0217"(phosphorylation reaction)'
ASSOC = 'psi-mi:"MI:0914"(association)'
BINDS = 'psi-mi:"MI:0195"(covalent binding)'
DIRECT = 'psi-mi:"MI:0407"(direct interaction)'
DEPHOS = 'psi-mi:"MI:0203"(dephosphorylation reaction)'
OMIT = 'psi-mi:"MI:1110"(predicted interaction)'
PUBS = "imex:IM-1|pubmed:10831611"
CONF = "author score:high|intact-miscore:0.56"


def test_full_cascade(spark, mappings):
    rows = [
        # mapped uniprot→ncbigene both sides, increases+pmod
        ("uniprotkb:P12345", "uniprotkb:P12345", PHOS, PUBS, "m", "intact", CONF),
        # uniprot fallback w/ mnemonic + chebi
        ("uniprotkb:Q99999", 'chebi:"CHEBI:15996"', ASSOC, PUBS, "m", "intact", CONF),
        # complexportal + reactome remap
        ("intact:EBI-123", "intact:EBI-456", BINDS, PUBS, "m", "intact", CONF),
        # EBI- passthrough → rejected after parse
        ("intact:EBI-999", "uniprotkb:P12345", DIRECT, PUBS, "m", "intact", CONF),
        # omitted interaction type
        ("uniprotkb:P12345", "uniprotkb:P12345", OMIT, PUBS, "m", "intact", CONF),
        # unmapped prefix → reject
        ("ensembl:ENSG1", "uniprotkb:P12345", ASSOC, PUBS, "m", "intact", CONF),
        # null column → dropna
        ("uniprotkb:P12345", None, ASSOC, PUBS, "m", "intact", CONF),
        # unhandled relation
        ("uniprotkb:P12345", "uniprotkb:P12345", 'psi-mi:"MI:9999"(mystery)', PUBS, "m", "intact", CONF),
        # decreases + pmod + intenz
        ("intenz:1.2.3.4", "uniprotkb:P12345", DEPHOS, PUBS, "m", "intact", CONF),
    ]
    edges, rejects = intact.process(spark, _raw(spark, rows), **mappings)
    e = edges.collect()
    assert len(e) == 4
    by_rel = {r["relation"]: r for r in e}

    inc = by_rel["increases"]
    assert (inc["source_ns"], inc["source_id"], inc["source_name"]) == ("ncbigene", "7157", "TP53")
    assert (inc["variant_kind"], inc["variant_ns"], inc["variant_name"]) == ("pmod", "bel", "Ph")
    assert inc["citation"] == "pubmed:10831611"
    assert inc["annotations"]["intact-confidence"] == "intact-miscore:0.56"

    assoc = by_rel["association"]
    assert (assoc["source_ns"], assoc["source_id"], assoc["source_name"]) == ("uniprot", "Q99999", "Q9_HUMAN")
    assert (assoc["target_ns"], assoc["target_id"], assoc["target_name"]) == ("chebi", "15996", "GTP")

    binds = by_rel["binds"]
    assert (binds["source_ns"], binds["source_id"]) == ("complexportal", "CPX-1")
    assert (binds["target_ns"], binds["target_id"]) == ("reactome", "R-HSA-1")

    dec = by_rel["decreases"]
    assert (dec["source_ns"], dec["source_id"]) == ("eccode", "1.2.3.4")
    assert dec["variant_name"] == "Ph"  # dephosphorylation removes Ph

    reasons = {r["reject_reason"] for r in rejects.collect()}
    assert reasons == {"unmapped_interactor", "ebi_identifier", "unhandled_relation"}
    counts = {
        r["reject_reason"]: r["count"]
        for r in rejects.groupBy("reject_reason").count().collect()
    }
    assert counts["unmapped_interactor"] == 1  # ensembl row


def test_subject_activity_and_gene_target(spark, mappings):
    gtpase = 'psi-mi:"MI:0883"(gtpase reaction)'
    elong = 'psi-mi:"MI:0701"(dna strand elongation)'
    rows = [
        ("uniprotkb:P12345", "uniprotkb:P12345", gtpase, PUBS, "m", "intact", CONF),
        ("uniprotkb:P12345", "uniprotkb:P12345", elong, PUBS, "m", "intact", CONF),
    ]
    edges, _ = intact.process(spark, _raw(spark, rows), **mappings)
    got = {r["annotations"]["psi-mi"]: r for r in edges.collect()}
    assert got[gtpase]["source_modifier"] == "act(go:0003924)"
    assert got[elong]["target_dsl"] == "Gene"
    assert got[elong]["variant_kind"] == "gmod"


def test_missing_pmid_falls_back_to_database(spark, mappings):
    rows = [("uniprotkb:P12345", "uniprotkb:P12345", ASSOC, "imex:IM-1", "m", "intact", CONF)]
    edges, _ = intact.process(spark, _raw(spark, rows), **mappings)
    assert edges.collect()[0]["citation"] == "database:intact"


def test_relation_table_covers_all_buckets(spark):
    rel = intact.relation_table(spark)
    counts = {r["relation"]: r["count"] for r in rel.groupBy("relation").count().collect()}
    # 25 = reference INTACT_INCREASES_ACTIONS size (incl. dna strand elongation)
    assert counts["increases"] == 25
    assert counts["decreases"] == 15
    assert counts["association"] == 6
    assert counts["regulates"] == 1
    assert counts["binds"] == 2
