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


def test_graph_management_over_triples(graph):
    # round 12: CLEAR DEFAULT/ALL are legal over a triple store (it IS
    # one default graph) and empty it; CLEAR NAMED is a legal no-op
    assert sparql_update(graph, "CLEAR DEFAULT").count() == 0
    assert sparql_update(graph, "CLEAR ALL").count() == 0
    assert sparql_update(graph, "CLEAR NAMED").count() == graph.count()
    # graph-TARGETED forms still need a quad input; federation forms
    # stay rejected at parse
    with pytest.raises(SparqlError, match="quad input"):
        sparql_update(graph, "DROP GRAPH <http://g>")
    with pytest.raises(SparqlError, match="quad input"):
        sparql_update(
            graph,
            "WITH <http://g> DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }",
        )
    # LOAD is supported for LOCAL N-Triples paths (round 12b); network
    # sources stay out of scope
    with pytest.raises(SparqlError, match="network"):
        sparql_update(graph, "LOAD <http://u>")


def test_input_dataframe_not_mutated(graph):
    before = _triples(graph)
    sparql_update(
        graph,
        'PREFIX ex: <http://ex.org/> DELETE WHERE { ?s ex:type "gene" }',
    ).collect()
    assert _triples(graph) == before


# ------------------------------------------------- property: naive replay


def _render(term) -> str:
    if term[0] == "var":
        return "?" + term[1]
    v = term[1]
    return f"<{v}>" if v.startswith("http") else f'"{v}"'


def _naive_solutions(triples, patterns):
    """All bindings of a conjunctive (required-only) pattern list over a
    triple list — the brute-force reference for the planner's joins."""
    sols = [dict()]
    for pat in patterns:
        new = []
        for b in sols:
            for tri in triples:
                b2, ok = dict(b), True
                for term, val in zip(pat, tri):
                    if term[0] == "const":
                        if term[1] != val:
                            ok = False
                            break
                    elif term[1] in b2:
                        if b2[term[1]] != val:
                            ok = False
                            break
                    else:
                        b2[term[1]] = val
                if ok:
                    new.append(b2)
        sols = new
    return sols


def _naive_instantiate(sols, template):
    out = set()
    for b in sols:
        for tri in template:
            out.add(tuple(
                b[t[1]] if t[0] == "var" else t[1] for t in tri
            ))
    return out


def test_update_matches_naive_replay(spark):
    """Random small graphs × random modify ops, engine vs a brute-force
    Python evaluator of (G \\ D) ∪ I — pins join, instantiation, anti-
    join, union, and final set semantics in one sweep."""
    import random

    preds = [EX + p for p in ("p0", "p1", "p2")]
    subjects = [EX + f"s{i}" for i in range(5)]
    lits = ["red", "blue", "green"]
    for seed in range(30):
        rng = random.Random(seed)
        triples = sorted({
            (rng.choice(subjects), rng.choice(preds),
             rng.choice(subjects + lits))
            for _ in range(rng.randint(6, 14))
        })
        # pattern 1 binds ?x/?y; pattern 2 (sometimes) chains on ?y
        pats = [(("var", "x"), ("const", rng.choice(preds)), ("var", "y"))]
        if rng.random() < 0.6:
            pats.append(
                (("var", "y"), ("const", rng.choice(preds)), ("var", "z"))
            )
        tvars = ["x", "y"] + (["z"] if len(pats) == 2 else [])

        def rand_template(rng, tvars):
            tmpl = []
            for _ in range(rng.randint(1, 2)):
                s = ("var", rng.choice(tvars))
                p = ("const", rng.choice(preds))
                o = rng.choice(
                    [("var", rng.choice(tvars)), ("const", rng.choice(lits))]
                )
                tmpl.append((s, p, o))
            return tmpl

        delete_t = rand_template(rng, tvars) if rng.random() < 0.8 else None
        insert_t = rand_template(rng, tvars) if rng.random() < 0.8 else None
        if delete_t is None and insert_t is None:
            delete_t = rand_template(rng, tvars)

        q = ""
        if delete_t:
            q += "DELETE { " + " . ".join(
                " ".join(_render(t) for t in tri) for tri in delete_t
            ) + " } "
        if insert_t:
            q += "INSERT { " + " . ".join(
                " ".join(_render(t) for t in tri) for tri in insert_t
            ) + " } "
        q += "WHERE { " + " . ".join(
            " ".join(_render(t) for t in tri) for tri in pats
        ) + " }"

        df = spark.createDataFrame(triples, "s string, p string, o string")
        got = {
            (r.s, r.p, r.o)
            for r in sparql_update(df, q).collect()
        }
        sols = _naive_solutions(triples, pats)
        d = _naive_instantiate(sols, delete_t) if delete_t else set()
        i = _naive_instantiate(sols, insert_t) if insert_t else set()
        want = (set(triples) - d) | i
        assert got == want, f"seed {seed}: {q}\n got={got}\nwant={want}"


def test_update_parser_never_crashes_on_garbage(graph):
    """Malformed update strings must fail with SparqlError (or parse to a
    valid no-op), never IndexError/TypeError — same clamp-at-eof contract
    as the query parser."""
    import random

    bad = [
        "INSERT",
        "INSERT DATA {",
        "INSERT DATA { <a> <b>",
        "DELETE { ?s <p> ?o }",
        "DELETE WHERE { ?s",
        "DELETE DATA { ?s <p> \"v\" }",
        "INSERT { ?s <p> ?o } WHERE",
        ";",
        "INSERT DATA { <a> <b> \"c\" } ; DELETE",
        "PREFIX ex: INSERT DATA { <a> <b> \"c\" }",
    ]
    rng = random.Random(1)
    soup = 'INSERT DELETE DATA WHERE { } . ; ?v <i> "s" FILTER ('.split()
    for _ in range(60):
        bad.append(" ".join(rng.choices(soup, k=rng.randint(1, 12))))
    for q in bad:
        try:
            sparql_update(graph, q)
        except SparqlError:
            pass  # the designed failure mode
        # anything else (IndexError, Py4J crash, ...) propagates and fails


# --------------------------------------------- round-11 review regressions


def test_aggregating_where_after_insert_sees_a_set(spark):
    """A later op's WHERE must never observe multiplicity an earlier
    insert created: re-inserting a present triple, then COUNTing it in a
    subquery, must count 1 (RDF graphs are sets) — pins the dirty-flag
    dedup of the solution graph."""
    g = spark.createDataFrame(
        [("urn:a", "urn:p", "urn:b")], "s string, p string, o string"
    )
    out = sparql_update(
        g,
        """INSERT DATA { <urn:a> <urn:p> <urn:b> } ;
           INSERT { ?s <urn:n> ?n } WHERE {
             { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <urn:p> ?o }
               GROUP BY ?s } }""",
    )
    got = {(r.p, r.o) for r in out.collect()}
    assert ("urn:n", "1") in got and ("urn:n", "2") not in got


def test_bindings_shared_across_ops(spark):
    """A binding consumed by op 1 must not make op 2 raise; a binding no
    op mentions still fails loudly."""
    g = spark.createDataFrame(
        [("urn:a", "urn:p", "x"), ("urn:b", "urn:p", "y"),
         ("urn:a", "urn:done", "1")],
        "s string, p string, o string",
    )
    out = sparql_update(
        g,
        "DELETE WHERE { ?s <urn:p> ?o } ; DELETE WHERE { ?a <urn:done> ?b }",
        bindings={"s": "urn:a"},
    )
    got = sorted((r.s, r.p) for r in out.collect())
    # op 1 deleted only urn:a's p-triple (binding); op 2 deleted done
    assert got == [("urn:b", "urn:p")]
    with pytest.raises(SparqlError, match="not in any operation"):
        sparql_update(
            g, "DELETE WHERE { ?s <urn:p> ?o }", bindings={"zz": "urn:a"}
        )
