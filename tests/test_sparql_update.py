"""SPARQL 1.1 Update over an immutable (s, p, o) DataFrame: INSERT DATA /
DELETE DATA / DELETE WHERE / DELETE-INSERT-WHERE, ';'-sequenced, returning
the updated graph as a NEW DataFrame.

Pins bio2bel_spark/sparql.py:sparql_update / _apply_update_op /
parse_update — parity target: rdflib Graph.update() semantics (the
reference's rdflib graphs expose update(); src/bio2bel/sources/rhea.py
loads RDF with rdflib), re-read Spark-first: (G \\ D) ∪ I as one lazy
plan, set-semantics result.
"""

from __future__ import annotations

import pytest

from bio2bel_spark.sparql import SparqlError, sparql_update

EX = "http://ex.org/"
PFX = {"ex": EX}


@pytest.fixture()
def graph(spark):
    rows = [
        (EX + "a", EX + "type", "gene"),
        (EX + "b", EX + "type", "gene"),
        (EX + "c", EX + "type", "pathway"),
        (EX + "a", EX + "score", "5"),
        (EX + "b", EX + "score", "7"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def _triples(df):
    return sorted((r.s.rsplit("/", 1)[-1], r.p.rsplit("/", 1)[-1], r.o)
                  for r in df.collect())


# ------------------------------------------------------------ DATA forms


def test_insert_data(graph):
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           INSERT DATA { ex:d ex:type "gene" . ex:d ex:score "9" }""",
    )
    got = _triples(out)
    assert ("d", "type", "gene") in got and ("d", "score", "9") in got
    assert len(got) == 7


def test_insert_data_existing_triple_keeps_set_semantics(graph):
    out = sparql_update(
        graph,
        'PREFIX ex: <http://ex.org/> INSERT DATA { ex:a ex:type "gene" }',
    )
    # re-inserting a present triple must not duplicate it (graph = set)
    assert len(_triples(out)) == 5


def test_delete_data(graph):
    out = sparql_update(
        graph,
        'PREFIX ex: <http://ex.org/> DELETE DATA { ex:a ex:score "5" }',
    )
    got = _triples(out)
    assert ("a", "score", "5") not in got
    assert len(got) == 4


def test_data_rejects_variables(graph):
    with pytest.raises(SparqlError, match="ground"):
        sparql_update(
            graph,
            "PREFIX ex: <http://ex.org/> INSERT DATA { ?s ex:type \"x\" }",
        )


# ---------------------------------------------------------- DELETE WHERE


def test_delete_where_pattern_is_template(graph):
    out = sparql_update(
        graph,
        "PREFIX ex: <http://ex.org/> DELETE WHERE { ?s ex:type \"gene\" }",
    )
    got = _triples(out)
    # both gene typings removed; scores untouched
    assert got == [
        ("a", "score", "5"), ("b", "score", "7"), ("c", "type", "pathway"),
    ]


def test_delete_where_multi_pattern_joins(graph):
    # only subjects having BOTH patterns lose BOTH triples
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           DELETE WHERE { ?s ex:type "gene" . ?s ex:score ?v }""",
    )
    got = _triples(out)
    # c kept; a/b lose type AND score (both template triples instantiate)
    assert got == [("c", "type", "pathway")]


# ----------------------------------------------------------- modify form


def test_delete_insert_where(graph):
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           DELETE { ?s ex:type "gene" }
           INSERT { ?s ex:type "protein_coding" . ?s ex:flagged "true" }
           WHERE { ?s ex:type "gene" }""",
    )
    got = _triples(out)
    assert ("a", "type", "protein_coding") in got
    assert ("b", "flagged", "true") in got
    assert not any(t == ("a", "type", "gene") for t in got)
    assert ("c", "type", "pathway") in got


def test_insert_where_only(graph):
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           INSERT { ?s ex:seen "yes" } WHERE { ?s ex:score ?v }""",
    )
    got = _triples(out)
    assert ("a", "seen", "yes") in got and ("b", "seen", "yes") in got
    assert len(got) == 7


def test_insert_wins_over_delete_on_overlap(spark):
    # spec: G' = (G \ D) ∪ I — a triple both deleted and re-inserted stays
    g = spark.createDataFrame(
        [(EX + "a", EX + "p", "v")], "s string, p string, o string"
    )
    out = sparql_update(
        g,
        """PREFIX ex: <http://ex.org/>
           DELETE { ?s ex:p "v" } INSERT { ?s ex:p "v" }
           WHERE { ?s ex:p "v" }""",
    )
    assert _triples(out) == [("a", "p", "v")]


def test_optional_miss_emits_no_insert(graph):
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           INSERT { ?s ex:copy ?v }
           WHERE { ?s ex:type "pathway" . OPTIONAL { ?s ex:score ?v } }""",
    )
    # c has no score: the unbound ?v instantiates no triple
    assert len(_triples(out)) == 5


def test_unbound_template_var_rejected_before_any_job(graph):
    with pytest.raises(SparqlError, match=r"INSERT template variable \?z"):
        sparql_update(
            graph,
            """PREFIX ex: <http://ex.org/>
               INSERT { ?s ex:x ?z } WHERE { ?s ex:type "gene" }""",
        )


# ------------------------------------------------------------- sequences


def test_semicolon_sequence_sees_prior_state(graph):
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           INSERT DATA { ex:d ex:type "gene" } ;
           INSERT { ?s ex:audited "yes" } WHERE { ?s ex:type "gene" } ;
        """,
    )
    got = _triples(out)
    # the second op's WHERE runs over the graph INCLUDING ex:d
    audited = sorted(s for s, p, o in got if p == "audited")
    assert audited == ["a", "b", "d"]


def test_later_prefix_decl_not_retroactive(graph):
    # the 2nd op re-declares ex: to a different IRI; op 1 must have used
    # the original (snapshot-per-op, no retroactive resolution)
    out = sparql_update(
        graph,
        """PREFIX ex: <http://ex.org/>
           INSERT DATA { ex:d ex:type "gene" } ;
           PREFIX ex: <http://other.org/>
           INSERT DATA { ex:e ex:kind "thing" }""",
    )
    subs = {r.s for r in out.collect()}
    assert "http://ex.org/d" in subs and "http://other.org/e" in subs


# ------------------------------------------------------------- rejections


def test_graph_management_rejected(graph):
    for q in ("CLEAR DEFAULT", "DROP GRAPH <http://g>", "LOAD <http://u>"):
        with pytest.raises(SparqlError, match="graph-management"):
            sparql_update(graph, q)


def test_input_dataframe_not_mutated(graph):
    before = _triples(graph)
    sparql_update(
        graph,
        'PREFIX ex: <http://ex.org/> DELETE WHERE { ?s ex:type "gene" }',
    ).collect()
    assert _triples(graph) == before
