"""Round-12 graph-targeted SPARQL 1.1 UPDATE over the quad store
(verdict ask #4): WITH, GRAPH blocks in templates and DATA payloads,
USING / USING NAMED, CLEAR / DROP. Pins sparql.py parse_update_op /
_apply_update_op quad path / _anti_join_quads / _instantiate_quads /
_apply_clear.

Parity target: rdflib Dataset.update() — context-aware stores accept
exactly these forms (the reference loads RDF with rdflib,
src/bio2bel/sources/rhea.py:36-47).
"""

from __future__ import annotations

import pytest

from bio2bel_spark.sparql import SparqlError, sparql_update

EX = "http://ex.org/"
G1 = "http://g.org/one"
G2 = "http://g.org/two"
PFX = {"ex": EX}


@pytest.fixture()
def quads(spark):
    rows = [
        (None, EX + "a", EX + "type", "gene"),
        (None, EX + "b", EX + "type", "gene"),
        (G1, EX + "a", EX + "score", "5"),
        (G1, EX + "b", EX + "score", "7"),
        (G1, EX + "x", EX + "under", EX + "y"),
        (G2, EX + "a", EX + "score", "9"),
        (G2, EX + "b", EX + "flag", "true"),
    ]
    return spark.createDataFrame(
        rows, "g string, s string, p string, o string"
    )


def _rows(df):
    return sorted(
        (
            (r.g, r.s.rsplit("/", 1)[-1], r.p.rsplit("/", 1)[-1], r.o)
            for r in df.collect()
        ),
        key=lambda t: (t[0] or "", *t[1:]),
    )


# ----------------------------------------------------------- CLEAR / DROP


def test_clear_graph_removes_one_graph_only(quads):
    out = sparql_update(quads, f"CLEAR GRAPH <{G1}>")
    got = _rows(out)
    assert not any(g == G1 for g, *_ in got)
    assert len(got) == 4  # default (2) + G2 (2) byte-identical


def test_drop_is_clear(quads):
    assert _rows(sparql_update(quads, f"DROP SILENT GRAPH <{G1}>")) == _rows(
        sparql_update(quads, f"CLEAR GRAPH <{G1}>")
    )


def test_clear_default_and_named_and_all(quads):
    assert all(
        g is not None for g, *_ in _rows(sparql_update(quads, "CLEAR DEFAULT"))
    )
    assert all(
        g is None for g, *_ in _rows(sparql_update(quads, "CLEAR NAMED"))
    )
    assert sparql_update(quads, "CLEAR ALL").count() == 0


# ------------------------------------------------------------ DATA forms


def test_insert_data_with_graph_block(quads):
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        f'INSERT DATA {{ ex:c ex:type "gene" . '
        f'GRAPH <{G1}> {{ ex:c ex:score "3" }} }}',
        prefixes=PFX,
    )
    got = _rows(out)
    assert (None, "c", "type", "gene") in got      # default graph
    assert (G1, "c", "score", "3") in got          # named graph
    assert len(got) == 9


def test_delete_data_null_safe_on_default_graph(quads):
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        f'DELETE DATA {{ ex:a ex:type "gene" . '
        f'GRAPH <{G2}> {{ ex:a ex:score "9" }} }}',
        prefixes=PFX,
    )
    got = _rows(out)
    assert (None, "a", "type", "gene") not in got
    assert (G2, "a", "score", "9") not in got
    assert len(got) == 5


# ------------------------------------------------------------ WITH form


def test_with_targets_template_and_where(quads):
    """WITH <g>: the WHERE's plain patterns match g's contents, and
    non-GRAPH template triples delete from / insert into g."""
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        f"WITH <{G1}> "
        "DELETE { ?s ex:score ?v } INSERT { ?s ex:grade ?v } "
        "WHERE { ?s ex:score ?v }",
        prefixes=PFX,
    )
    got = _rows(out)
    assert (G1, "a", "grade", "5") in got and (G1, "b", "grade", "7") in got
    assert not any(
        g == G1 and p == "score" for g, _s, p, _o in got
    )
    # G2's score row untouched (WITH scoped the WHERE to G1)
    assert (G2, "a", "score", "9") in got


def test_graph_block_in_template_with_var(quads):
    """GRAPH ?g in an INSERT template re-files rows into the graph the
    WHERE bound — one op copies every score into the default graph
    tagged by origin."""
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        "INSERT { ?s ex:scoredIn ?g } "
        "WHERE { GRAPH ?g { ?s ex:score ?v } }",
        prefixes=PFX,
    )
    got = _rows(out)
    assert (None, "a", "scoredIn", G1) in got
    assert (None, "a", "scoredIn", G2) in got
    assert (None, "b", "scoredIn", G1) in got


def test_delete_where_with_graph_block(quads):
    out = sparql_update(
        quads,
        f"DELETE WHERE {{ GRAPH <{G1}> {{ ?s <{EX}score> ?v }} }}",
    )
    got = _rows(out)
    assert not any(g == G1 and p == "score" for g, _s, p, _o in got)
    assert (G1, "x", "under", EX + "y") in got  # other G1 rows survive
    assert (G2, "a", "score", "9") in got


# ------------------------------------------------------------ USING form


def test_using_builds_the_where_dataset(quads):
    """USING <G2>: the WHERE's default graph is G2's contents — only
    the a/score/9 row matches, and the delete targets the named graph
    via the template's GRAPH block."""
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        f"DELETE {{ GRAPH <{G2}> {{ ?s ex:score ?v }} }} "
        f"USING <{G2}> "
        "WHERE { ?s ex:score ?v }",
        prefixes=PFX,
    )
    got = _rows(out)
    assert not any(g == G2 and p == "score" for g, _s, p, _o in got)
    assert (G1, "a", "score", "5") in got  # G1 scores untouched


def test_using_named_scopes_graph_clauses(quads):
    """USING NAMED <G1>: GRAPH ?g ranges over exactly G1 — G2's rows
    can't match, so only G1 scores are deleted."""
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        "DELETE { GRAPH ?g { ?s ex:score ?v } } "
        f"USING NAMED <{G1}> "
        "WHERE { GRAPH ?g { ?s ex:score ?v } }",
        prefixes=PFX,
    )
    got = _rows(out)
    assert not any(g == G1 and p == "score" for g, _s, p, _o in got)
    assert (G2, "a", "score", "9") in got


# ------------------------------------------------------- op sequencing


def test_sequence_sees_prior_graph_state(quads):
    out = sparql_update(
        quads,
        "PREFIX ex: <http://ex.org/> "
        f'INSERT DATA {{ GRAPH <{G1}> {{ ex:c ex:score "1" }} }} ; '
        f'WITH <{G1}> DELETE {{ ?s ex:score "1" }} '
        'WHERE { ?s ex:score "1" }',
        prefixes=PFX,
    )
    got = _rows(out)
    # the inserted row is visible to (and deleted by) the second op
    assert not any(s == "c" for _g, s, _p, _o in got)
    assert (G1, "a", "score", "5") in got


# --------------------------------------------------------- rejections


def test_with_rejected_on_data_forms(quads):
    with pytest.raises(SparqlError, match="WITH does not apply"):
        sparql_update(
            quads,
            f'WITH <{G1}> INSERT DATA {{ <{EX}c> <{EX}p> "v" }}',
        )


def test_ground_data_rejects_graph_var(quads):
    with pytest.raises(SparqlError, match="graph name"):
        sparql_update(
            quads, f'INSERT DATA {{ GRAPH ?g {{ <{EX}c> <{EX}p> "v" }} }}'
        )


# ----------------------- round 12b: LOAD / CREATE / COPY / MOVE / ADD


def test_load_into_graph(quads, tmp_path):
    nt = tmp_path / "extra.nt"
    nt.write_text(
        f'<{EX}n1> <{EX}p> "v1" .\n'
        f'<{EX}n2> <{EX}p> "v2" .\n'
    )
    out = sparql_update(quads, f"LOAD <file://{nt}> INTO GRAPH <{G2}>")
    got = _rows(out)
    assert (G2, "n1", "p", "v1") in got and (G2, "n2", "p", "v2") in got
    out2 = sparql_update(quads, f"LOAD <{nt}>")  # bare path, default graph
    assert (None, "n1", "p", "v1") in _rows(out2)


def test_load_rejects_network_sources(quads):
    with pytest.raises(SparqlError, match="network"):
        sparql_update(quads, "LOAD <http://example.org/data.nt>")


def test_create_is_validated_noop(quads):
    out = sparql_update(quads, f"CREATE SILENT GRAPH <{EX}new>")
    assert _rows(out) == _rows(quads)


def test_copy_overwrites_dst(quads):
    out = sparql_update(quads, f"COPY <{G1}> TO <{G2}>")
    got = _rows(out)
    # dst overwritten: G2's old rows gone, G1's rows present in both
    assert (G2, "b", "flag", "true") not in got
    assert (G2, "a", "score", "5") in got and (G1, "a", "score", "5") in got


def test_move_drops_src(quads):
    out = sparql_update(quads, f"MOVE <{G1}> TO <{G2}>")
    got = _rows(out)
    assert not any(g == G1 for g, *_ in got)
    assert (G2, "a", "score", "5") in got
    assert (G2, "b", "flag", "true") not in got  # dst overwritten


def test_add_unions_without_overwrite(quads):
    out = sparql_update(quads, f"ADD DEFAULT TO GRAPH <{G2}>")
    got = _rows(out)
    assert (G2, "a", "type", "gene") in got      # copied in
    assert (None, "a", "type", "gene") in got    # src kept
    assert (G2, "b", "flag", "true") in got      # dst NOT overwritten


def test_copy_default_to_named_and_back(quads):
    out = sparql_update(quads, f"COPY DEFAULT TO GRAPH <{G1}>")
    got = _rows(out)
    assert (G1, "a", "type", "gene") in got
    assert (G1, "a", "score", "5") not in got    # dst overwritten
    assert (None, "a", "type", "gene") in got    # src kept (COPY)
    out2 = sparql_update(quads, f"MOVE GRAPH <{G2}> TO DEFAULT")
    got2 = _rows(out2)
    assert (None, "a", "score", "9") in got2
    assert (None, "a", "type", "gene") not in got2  # default overwritten
    assert not any(g == G2 for g, *_ in got2)


def test_self_copy_move_add_are_noops(quads):
    base = _rows(quads)
    for kw in ("COPY", "MOVE", "ADD"):
        assert _rows(sparql_update(quads, f"{kw} <{G1}> TO <{G1}>")) == base


def test_load_silent_missing_source_is_noop(quads):
    out = sparql_update(quads, "LOAD SILENT </nonexistent/path.nt>")
    assert _rows(out) == _rows(quads)
    with pytest.raises(SparqlError, match="not found"):
        sparql_update(quads, "LOAD </nonexistent/path.nt>")


def test_load_file_uri_with_authority(quads, tmp_path):
    nt = tmp_path / "auth.nt"
    nt.write_text(f'<{EX}n9> <{EX}p> "v9" .\n')
    out = sparql_update(quads, f"LOAD <file://localhost{nt}>")
    assert (None, "n9", "p", "v9") in _rows(out)


def test_gmove_rejected_on_triples(spark):
    t = spark.createDataFrame(
        [(EX + "a", EX + "p", "v")], "s string, p string, o string"
    )
    with pytest.raises(SparqlError, match="quad input"):
        sparql_update(t, f"COPY DEFAULT TO <{G1}>")
    with pytest.raises(SparqlError, match="quad input"):
        sparql_update(t, f"LOAD </tmp/x.nt> INTO GRAPH <{G1}>")
    # the spec's defensive self-copy touches only the default graph and
    # stays legal over a triple store
    got = sparql_update(t, "COPY DEFAULT TO DEFAULT")
    assert [(r.s, r.o) for r in got.collect()] == [(EX + "a", "v")]
