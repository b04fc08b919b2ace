"""Round-13 ADVICE fixes (three findings from the round-12 advisor).

1. FILTER ... IN with numeric members used to compile to ``isin([1])``,
   casting the string term column to BIGINT — an ANSI runtime crash over
   encoded typed literals ("1"^^xsd:integer) and a silent never-match in
   non-ANSI sessions. It now desugars to '='-cmp chains, which carry the
   §17.3 typed-numeric value branch — consistent with FILTER(?x = 1).
2. _maybe_encoded answered False for STRDT/STRLANG although they
   CONSTRUCT encoded terms, so constructed-vs-constructed comparisons
   skipped the typed-value branch (lexical "10" < "9").
3. Language tags now canonicalize to LOWERCASE at every construction
   point — the scan (ingest._term_col), the query grammar
   (_string_token_value), and STRLANG — per RDF 1.1 §3.3 (the tag value
   space is lowercase), so "x"@EN and "x"@en are the same term however
   either side spelled it.
"""

from __future__ import annotations

import pytest

from bio2bel_spark.ingest import read_ntriples
from bio2bel_spark.sparql import sparql_select

EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
PFX = {"ex": EX}


def _local(term: str) -> str:
    return term.rsplit("/", 1)[-1]


@pytest.fixture(scope="module")
def typed(spark):
    rows = [
        (EX + "a", EX + "price", f'"10"^^<{XSD}integer>'),
        (EX + "b", EX + "price", f'"9"^^<{XSD}integer>'),
        (EX + "c", EX + "price", f'"011"^^<{XSD}integer>'),
        (EX + "d", EX + "price", "cheap"),  # plain, non-numeric
        (EX + "a", EX + "label", '"chat"@fr'),
        (EX + "b", EX + "label", '"cat"@en'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


# ------------------------------------------------- 1. numeric-member IN


def test_in_with_numeric_members_matches_typed_by_value(typed):
    """?v IN (9, 11) must match "9"^^xsd:integer and "011"^^xsd:integer
    by VALUE — and must not crash casting the term column to BIGINT."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . FILTER(?v IN (9, 11)) }",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["b", "c"]


def test_not_in_with_numeric_members(typed):
    """NOT IN over typed numerics: "10"^^xsd:integer NOT IN (9, 11) is
    true; a non-numeric operand is a type error -> NULL -> dropped."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . FILTER(?v NOT IN (9, 11)) }",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a"]


def test_in_mixed_numeric_and_string_members(typed):
    """A mixed list: the numeric member value-matches typed literals,
    the string member term-matches the plain term."""
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:price ?v . '
        'FILTER(?v IN (10, "cheap")) }',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "d"]


def test_in_all_plain_strings_keeps_isin_plan(typed):
    """The all-plain-string fast path still answers correctly (and stays
    an isin — a pushable scan predicate)."""
    q = (
        'SELECT ?m WHERE { ?m ex:price ?v . '
        'FILTER(?v IN ("cheap", "pricey")) }'
    )
    df = sparql_select(typed, q, prefixes=PFX)
    assert [_local(r.m) for r in df.collect()] == ["d"]
    assert "IN (" in df._jdf.queryExecution().optimizedPlan().toString()


# --------------------------------- 2. constructed-term typed comparison


def test_strdt_both_sides_compare_by_value(typed):
    """FILTER(STRDT("10", xsd:integer) > STRDT("9", xsd:integer)) is
    TRUE by value — it used to be false (raw lexical "10" < "9")."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:label ?l . "
        f'FILTER(STRDT("10", <{XSD}integer>) > STRDT("9", <{XSD}integer>)) }}',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "b"]


def test_strdt_vs_variable_compare_by_value(typed):
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . "
        f'FILTER(?v < STRDT("10", <{XSD}integer>)) }}',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["b"]


# ------------------------------------------ 3. lang-tag canonical case


def test_scan_lowercases_lang_tags(spark, tmp_path):
    nt = tmp_path / "tags.nt"
    nt.write_text(
        f'<{EX}x> <{EX}label> "Hund"@DE .\n'
        f'<{EX}y> <{EX}label> "chien"@fr .\n'
        f'<{EX}z> <{EX}label> "color"@en-US .\n'
    )
    got = {_local(r.s): r.o for r in read_ntriples(spark, str(nt)).collect()}
    assert got == {
        "x": '"Hund"@de',
        "y": '"chien"@fr',
        "z": '"color"@en-us',
    }


def test_query_token_lang_tag_canonicalizes(typed):
    """"chat"@FR in query text term-equals loaded "chat"@fr."""
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . FILTER(?l = "chat"@FR) }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["a"]


def test_strlang_matches_loaded_regardless_of_case(typed):
    """STRLANG("cat", "EN") constructs "cat"@en — equal to the loaded
    term (both sides normalize to lowercase tags)."""
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . '
        'FILTER(?l = STRLANG("cat", "EN")) }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["b"]


# ------------------------------------- §15.1 value ordering (ask #1)


@pytest.fixture(scope="module")
def priced(spark):
    """Typed integers whose LEXICAL order differs from their VALUE
    order ("10" < "9" lexically), plus a decimal magnitude spread."""
    rows = [
        (EX + "a", EX + "price", f'"10"^^<{XSD}integer>'),
        (EX + "b", EX + "price", f'"9"^^<{XSD}integer>'),
        (EX + "c", EX + "price", f'"100"^^<{XSD}decimal>'),
        (EX + "d", EX + "price", f'"2.5"^^<{XSD}decimal>'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


#: rdflib's answers for the queries below (pinned from rdflib 7.x run
#: offline: ORDER BY orders xsd-numeric literals by VALUE; MIN/MAX pick
#: the numeric extremes). The differential test below re-derives them
#: live when rdflib is importable; this module must pass without it.
RDFLIB_ORDER = ["d", "b", "a", "c"]  # 2.5 < 9 < 10 < 100
RDFLIB_MIN, RDFLIB_MAX = "2.5", "100"


def test_order_by_typed_numeric_is_value_order(priced):
    got = sparql_select(
        priced,
        "SELECT ?m WHERE { ?m ex:price ?v } ORDER BY ?v",
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == RDFLIB_ORDER


def test_order_by_desc_typed_numeric(priced):
    got = sparql_select(
        priced,
        "SELECT ?m WHERE { ?m ex:price ?v } ORDER BY DESC(?v)",
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == RDFLIB_ORDER[::-1]


def test_min_max_typed_numeric_by_value(priced):
    row = sparql_select(
        priced,
        "SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) "
        "WHERE { ?m ex:price ?v }",
        prefixes=PFX,
    ).collect()[0]
    assert row.lo == f'"{RDFLIB_MIN}"^^<{XSD}decimal>'
    assert row.hi == f'"{RDFLIB_MAX}"^^<{XSD}decimal>'


def test_min_ignores_unbound(priced, spark):
    """MIN over an OPTIONAL-unbound variable keeps SQL's
    ignore-NULL semantics (min_by key is NULL for unbound rows)."""
    got = sparql_select(
        priced,
        "SELECT (MIN(?w) AS ?lo) WHERE { ?m ex:price ?v . "
        "OPTIONAL { ?m ex:weight ?w } }",
        prefixes=PFX,
    ).collect()
    assert got[0].lo is None


def test_order_by_untyped_stays_lexical(typed):
    """Plain terms (even numeric-shaped ones) keep the string model's
    LEXICAL order — DuckDB-VARCHAR oracle parity unchanged."""
    got = sparql_select(
        typed,
        "SELECT ?l WHERE { ?m ex:label ?l } ORDER BY ?l",
        prefixes=PFX,
    ).collect()
    assert [r.l for r in got] == ['"cat"@en', '"chat"@fr']


def test_rdflib_differential_typed_order():
    """Differential check against rdflib itself (the reference's SPARQL
    engine) when importable — the DuckDB oracle twins replay ENGINE
    semantics, so this is the one harness that can catch a
    typed-ordering divergence. Skips (container has no rdflib) but runs
    anywhere rdflib is installed; the pinned RDFLIB_* constants above
    keep the assertion live regardless."""
    rdflib = pytest.importorskip("rdflib")
    g = rdflib.Graph()
    for s, lex, dt in [
        ("a", "10", "integer"), ("b", "9", "integer"),
        ("c", "100", "decimal"), ("d", "2.5", "decimal"),
    ]:
        g.add((
            rdflib.URIRef(EX + s),
            rdflib.URIRef(EX + "price"),
            rdflib.Literal(lex, datatype=rdflib.URIRef(XSD + dt)),
        ))
    got = [
        _local(str(r.m))
        for r in g.query(
            f"PREFIX ex: <{EX}> "
            "SELECT ?m WHERE { ?m ex:price ?v } ORDER BY ?v"
        )
    ]
    assert got == RDFLIB_ORDER
    agg = list(g.query(
        f"PREFIX ex: <{EX}> "
        "SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) "
        "WHERE { ?m ex:price ?v }"
    ))[0]
    assert (str(agg.lo), str(agg.hi)) == (RDFLIB_MIN, RDFLIB_MAX)


# --------------------------------- xsd:dateTime comparisons (ask #4)


@pytest.fixture(scope="module")
def timed(spark):
    rows = [
        # lexically "2024-01-02T00:00:00+09:00" > "2024-01-01T23:00:00Z"
        # but the +09:00 instant is EARLIER (2024-01-01T15:00:00Z)
        (EX + "x", EX + "at", f'"2024-01-02T00:00:00+09:00"^^<{XSD}dateTime>'),
        (EX + "y", EX + "at", f'"2024-01-01T23:00:00Z"^^<{XSD}dateTime>'),
        (EX + "z", EX + "at", f'"2024-01-01T23:00:00+00:00"^^<{XSD}dateTime>'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_datetime_compare_by_instant(timed):
    got = sparql_select(
        timed,
        "SELECT ?m WHERE { ?m ex:at ?t . "
        f'FILTER(?t < "2024-01-01T20:00:00Z"^^<{XSD}dateTime>) }}',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["x"]


def test_datetime_equality_across_offset_spellings(timed):
    """"...Z" and "...+00:00" spell the SAME instant — equal by value,
    unequal lexically."""
    got = sparql_select(
        timed,
        "SELECT ?m WHERE { ?m ex:at ?t . "
        f'FILTER(?t = "2024-01-01T23:00:00Z"^^<{XSD}dateTime>) }}',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["y", "z"]


def test_order_by_datetime_is_instant_order(timed):
    got = sparql_select(
        timed,
        "SELECT ?m WHERE { ?m ex:at ?t } ORDER BY ?t ?m",
        prefixes=PFX,
    ).collect()
    # x = 15:00Z instant first; the two equal-instant 23:00Z spellings
    # tie on value and break on the key's own raw serialization
    # ("+00:00" < "Z" — the third component of the §15.1 key triple), a
    # deterministic total-order refinement the spec leaves open
    assert [_local(r.m) for r in got] == ["x", "z", "y"]


def test_min_datetime_by_instant(timed):
    row = sparql_select(
        timed,
        "SELECT (MIN(?t) AS ?first) WHERE { ?m ex:at ?t }",
        prefixes=PFX,
    ).collect()[0]
    assert row.first == f'"2024-01-02T00:00:00+09:00"^^<{XSD}dateTime>'


# ----------------------------------------- Turtle sugar (ask #2)


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def zoo(spark):
    rows = [
        (EX + "rex", RDF_TYPE, EX + "Dog"),
        (EX + "tom", RDF_TYPE, EX + "Cat"),
        (EX + "rex", EX + "name", "Rex"),
        (EX + "rex", EX + "likes", EX + "tom"),
        (EX + "tom", EX + "name", "Tom"),
        (EX + "Dog", EX + "subClassOf", EX + "Animal"),
        (EX + "Animal", EX + "subClassOf", EX + "Thing"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_semicolon_predicate_object_list(zoo):
    got = sparql_select(
        zoo,
        "SELECT ?n ?t WHERE { ?x ex:name ?n ; ex:likes ?t . }",
        prefixes=PFX,
    ).collect()
    assert [(r.n, _local(r.t)) for r in got] == [("Rex", "tom")]


def test_a_is_rdf_type(zoo):
    got = sparql_select(
        zoo,
        "SELECT ?x WHERE { ?x a ex:Dog }",
        prefixes=PFX,
    ).collect()
    assert [_local(r.x) for r in got] == ["rex"]


def test_semicolon_comma_a_combined_equals_spelled_out(zoo):
    sugar = sparql_select(
        zoo,
        """SELECT ?x ?n WHERE {
               ?x a ex:Dog ;
                  ex:name ?n ;
                  ex:likes ?t , ?t2 .
           }""",
        prefixes=PFX,
    ).collect()
    plain = sparql_select(
        zoo,
        f"""SELECT ?x ?n WHERE {{
               ?x <{RDF_TYPE}> ex:Dog .
               ?x ex:name ?n .
               ?x ex:likes ?t .
               ?x ex:likes ?t2 .
           }}""",
        prefixes=PFX,
    ).collect()
    assert sorted(map(tuple, sugar)) == sorted(map(tuple, plain))


def test_trailing_semicolon_tolerated(zoo):
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { ?x a ex:Cat ; ex:name ?n ; . }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Tom"]


def test_a_inside_property_path(zoo):
    """``a/ex:subClassOf+`` — the Turtle verb as a path segment."""
    got = sparql_select(
        zoo,
        "SELECT ?c WHERE { ?x ex:name \"Rex\" . "
        "?x a/ex:subClassOf+ ?c }",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.c) for r in got) == ["Animal", "Thing"]


def test_uppercase_A_stays_an_error(zoo):
    from bio2bel_spark.sparql import SparqlError

    with pytest.raises(SparqlError, match="bad term"):
        sparql_select(
            zoo, "SELECT ?x WHERE { ?x A ex:Dog }", prefixes=PFX
        )


def test_construct_template_semicolon_sugar(zoo, spark):
    from bio2bel_spark.sparql import sparql_construct

    got = sparql_construct(
        zoo,
        """PREFIX ex: <http://ex.org/>
           CONSTRUCT { ?x a ex:Pet ; ex:petName ?n . }
           WHERE { ?x a ex:Dog ; ex:name ?n . }""",
    ).collect()
    triples = {(r.s, r.p, r.o) for r in got}
    assert triples == {
        (EX + "rex", RDF_TYPE, EX + "Pet"),
        (EX + "rex", EX + "petName", "Rex"),
    }


def test_insert_data_comma_sugar(spark):
    from bio2bel_spark.sparql import sparql_update

    empty = spark.createDataFrame([], "s string, p string, o string")
    out = sparql_update(
        empty,
        f"INSERT DATA {{ <{EX}x> a <{EX}T> ; "
        f"<{EX}p> \"1\" , \"2\" . }}",
    )
    got = {(r.s, r.p, r.o) for r in out.collect()}
    assert got == {
        (EX + "x", RDF_TYPE, EX + "T"),
        (EX + "x", EX + "p", "1"),
        (EX + "x", EX + "p", "2"),
    }


# ------------------------------- CONSTRUCT with GRAPH templates (ask #8)


def test_construct_graph_template_emits_quads(spark):
    from bio2bel_spark.sparql import sparql_construct

    triples = spark.createDataFrame(
        [
            (EX + "a", EX + "score", "5"),
            (EX + "b", EX + "score", "7"),
        ],
        "s string, p string, o string",
    )
    got = sparql_construct(
        triples,
        f"""PREFIX ex: <{EX}>
            CONSTRUCT {{
                GRAPH <{EX}g/scores> {{ ?s ex:hadScore ?v . }}
                ?s ex:seen "true" .
            }}
            WHERE {{ ?s ex:score ?v }}""",
    )
    assert got.columns == ["g", "s", "p", "o"]
    rows = {(r.g, r.s, r.p, r.o) for r in got.collect()}
    assert rows == {
        (EX + "g/scores", EX + "a", EX + "hadScore", "5"),
        (EX + "g/scores", EX + "b", EX + "hadScore", "7"),
        # outside-GRAPH template triples land in the DEFAULT graph
        (None, EX + "a", EX + "seen", "true"),
        (None, EX + "b", EX + "seen", "true"),
    }


def test_construct_variable_graph_template(spark):
    """GRAPH ?g in the template routes each solution's quads into the
    graph its own binding names — a per-row scatter."""
    from bio2bel_spark.sparql import sparql_construct

    quads = spark.createDataFrame(
        [
            ("http://g.org/one", EX + "a", EX + "score", "5"),
            ("http://g.org/two", EX + "b", EX + "score", "7"),
        ],
        "g string, s string, p string, o string",
    )
    got = sparql_construct(
        quads,
        f"""PREFIX ex: <{EX}>
            CONSTRUCT {{ GRAPH ?g {{ ?s ex:copied "yes" . }} }}
            WHERE {{ GRAPH ?g {{ ?s ex:score ?v }} }}""",
    )
    rows = {(r.g, r.s, r.o) for r in got.collect()}
    assert rows == {
        ("http://g.org/one", EX + "a", "yes"),
        ("http://g.org/two", EX + "b", "yes"),
    }


def test_construct_without_graph_keeps_triple_schema(spark):
    from bio2bel_spark.sparql import sparql_construct

    triples = spark.createDataFrame(
        [(EX + "a", EX + "score", "5")],
        "s string, p string, o string",
    )
    got = sparql_construct(
        triples,
        f"PREFIX ex: <{EX}> "
        "CONSTRUCT { ?s ex:hadScore ?v . } WHERE { ?s ex:score ?v }",
    )
    assert got.columns == ["s", "p", "o"]
    assert got.collect()[0].o == "5"


def test_construct_quads_roundtrip_into_graph_query(spark):
    """Store-to-store: the quad CONSTRUCT's output is immediately
    queryable with GRAPH clauses — the round-trip the form exists for."""
    from bio2bel_spark.sparql import sparql_construct, sparql_select

    triples = spark.createDataFrame(
        [(EX + "a", EX + "score", "5"), (EX + "b", EX + "flag", "x")],
        "s string, p string, o string",
    )
    built = sparql_construct(
        triples,
        f"""PREFIX ex: <{EX}>
            CONSTRUCT {{ GRAPH <{EX}g/s> {{ ?s ex:v ?v . }} }}
            WHERE {{ ?s ex:score ?v }}""",
    )
    back = sparql_select(
        built,
        f"SELECT ?g ?s WHERE {{ GRAPH ?g {{ ?s <{EX}v> ?v }} }}",
    ).collect()
    assert [(r.g, _local(r.s)) for r in back] == [(EX + "g/s", "a")]


# -------------------------------- round-13 review-pass regressions


def test_pg_prefix_reserved(typed):
    """?__pg_rn would collide with the per-graph paging row-number
    column — rejected at tokenize time like the other internals."""
    from bio2bel_spark.sparql import SparqlError

    with pytest.raises(SparqlError, match="reserved"):
        sparql_select(
            typed, "SELECT ?__pg_rn WHERE { ?s ex:price ?__pg_rn }",
            prefixes=PFX,
        )


def test_lang_literal_with_caret_content(spark):
    """A lang-tagged literal whose CONTENT contains '^^' must classify
    as lang-tagged (and lowercase its tag), not trip the prefixed-
    datatype rejection."""
    triples = spark.createDataFrame(
        [(EX + "x", EX + "label", '"a^^b"@en')],
        "s string, p string, o string",
    )
    got = sparql_select(
        triples,
        'SELECT ?s WHERE { ?s ex:label "a^^b"@EN }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got] == ["x"]


def test_order_key_agrees_with_num_on_malformed_typed(spark):
    """ORDER BY/MIN/MAX use the same numeric gate as FILTER: a typed
    literal whose lexical fails _NUMERIC_SHAPE ("NaN"^^xsd:double)
    sorts LEXICALLY (bucket 0), exactly as comparisons call it a type
    error — the two layers never disagree on what is numeric."""
    rows = [
        (EX + "a", EX + "v", f'"NaN"^^<{XSD}double>'),
        (EX + "b", EX + "v", f'"9"^^<{XSD}integer>'),
        (EX + "c", EX + "v", f'"10"^^<{XSD}integer>'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    row = sparql_select(
        df,
        "SELECT (MAX(?x) AS ?hi) WHERE { ?s ex:v ?x }",
        prefixes=PFX,
    ).collect()[0]
    # numeric bucket wins over the lexical bucket under MAX; NaN stays
    # in the lexical bucket instead of polluting the numeric extremes
    assert row.hi == f'"10"^^<{XSD}integer>'
    got = sparql_select(
        df,
        "SELECT ?s WHERE { ?s ex:v ?x } ORDER BY ?x",
        prefixes=PFX,
    ).collect()
    # lexical bucket ("NaN" encoded) first under ASC, then 9 < 10
    assert [_local(r.s) for r in got] == ["a", "b", "c"]


# --------------------------- blank-node property lists (round 13)


def test_bnode_property_list_as_subject(zoo):
    """'[ a ex:Dog ; ex:name ?n ]' — the bnode is a fresh scoped
    variable joining the inner patterns."""
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { [ a ex:Dog ; ex:name ?n ] . }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_bnode_property_list_as_object(zoo):
    """'?x ex:likes [ ex:name ?n ]' — nested bnode object."""
    got = sparql_select(
        zoo,
        "SELECT ?x ?n WHERE { ?x ex:likes [ ex:name ?n ] . }",
        prefixes=PFX,
    ).collect()
    assert [(_local(r.x), r.n) for r in got] == [("rex", "Tom")]


def test_bnode_subject_with_following_po_list(zoo):
    """'[ a ex:Dog ] ex:name ?n' — the bracketed subject takes its own
    predicate-object list after the ']'."""
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { [ a ex:Dog ] ex:name ?n . }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_empty_bnode_is_fresh_variable(zoo):
    """'[] ex:name ?n' matches every subject with a name."""
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { [] ex:name ?n . }",
        prefixes=PFX,
    ).collect()
    assert sorted(r.n for r in got) == ["Rex", "Tom"]


def test_bnode_never_projects_under_select_star(zoo):
    got = sparql_select(
        zoo,
        "SELECT * WHERE { [ ex:name ?n ] . }",
        prefixes=PFX,
    )
    assert got.columns == ["n"]


def test_bnode_with_path_verb(zoo):
    """Paths work inside the bracket: '[ ex:subClassOf+ ex:Thing ]'
    binds the bnode to every strict descendant class of Thing."""
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { "
        "[ a ex:Dog ; ex:name ?n ; ex:likes ?t ] . "
        "?t a/ex:subClassOf* ?c . }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_nested_bnodes(zoo):
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { [ ex:likes [ ex:name ?n ] ] . }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Tom"]


# ----------------------------- IRI()/URI() + ENCODE_FOR_URI (round 13)


def test_iri_constructor_builds_joinable_iri(zoo):
    """IRI(CONCAT(...)) constructs a term that joins pattern-bound
    IRIs — the string model stores IRIs as plain strings."""
    got = sparql_select(
        zoo,
        'SELECT ?n WHERE { ?x ex:name ?n . '
        'FILTER(?x = IRI(CONCAT("http://ex.org/", "rex"))) }',
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_iri_of_xsd_string_literal_strips_encoding(spark):
    """URI of an xsd:string-typed literal is in the §17.4.2.8 domain
    and constructs from the lexical form; a lang-tagged argument is an
    error (see test_iri_of_blank_or_lang_term_is_error)."""
    df = spark.createDataFrame(
        [(EX + "m", EX + "code", f'"target"^^<{XSD}string>')],
        "s string, p string, o string",
    )
    got = sparql_select(
        df,
        "SELECT ?u WHERE { ?m ex:code ?c . BIND(URI(?c) AS ?u) }",
        prefixes=PFX,
    ).collect()
    assert [r.u for r in got] == ["target"]


def test_encode_for_uri_xpath_semantics(zoo):
    """fn:encode-for-uri: space -> %20 (never '+'), unreserved
    [A-Za-z0-9_.~-] untouched, everything else percent-encoded."""
    got = sparql_select(
        zoo,
        'SELECT ?e WHERE { ?x a ex:Dog . '
        'BIND(ENCODE_FOR_URI("a b~c*d+e_f.g-h/i") AS ?e) }',
        prefixes=PFX,
    ).collect()
    assert [r.e for r in got] == ["a%20b~c%2Ad%2Be_f.g-h%2Fi"]


# ----------------- SUM/AVG DISTINCT, xsd:date, TZ (round-13 round-out)


def test_sum_avg_distinct_over_terms(spark):
    """SUM/AVG(DISTINCT ?v) dedup the TERM multiset first: duplicate
    terms collapse, distinct lexicals of one value both count."""
    rows = [
        (EX + "a", EX + "v", f'"5"^^<{XSD}integer>'),
        (EX + "b", EX + "v", f'"5"^^<{XSD}integer>'),   # duplicate term
        (EX + "c", EX + "v", f'"05"^^<{XSD}integer>'),  # distinct term
        (EX + "d", EX + "v", f'"3"^^<{XSD}integer>'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    row = sparql_select(
        df,
        "SELECT (SUM(DISTINCT ?v) AS ?s) (AVG(DISTINCT ?v) AS ?a) "
        "WHERE { ?x ex:v ?v }",
        prefixes=PFX,
    ).collect()[0]
    # distinct terms: {"5", "05", "3"} -> values 5 + 5 + 3 = 13
    assert float(row.s) == 13.0
    assert abs(float(row.a) - 13.0 / 3) < 1e-9


def test_min_distinct_is_min(spark):
    df = spark.createDataFrame(
        [(EX + "a", EX + "v", "x"), (EX + "b", EX + "v", "y")],
        "s string, p string, o string",
    )
    row = sparql_select(
        df, "SELECT (MIN(DISTINCT ?v) AS ?m) WHERE { ?s ex:v ?v }",
        prefixes=PFX,
    ).collect()[0]
    assert row.m == "x"


def test_xsd_date_compares_by_value(spark):
    """xsd:date joins the temporal value category: a date compares as
    its midnight instant, so it orders correctly against dateTime
    spellings of the same timeline (lexical comparison across the two
    forms is meaningless)."""
    rows = [
        (EX + "a", EX + "d", f'"2024-03-05"^^<{XSD}date>'),
        (EX + "b", EX + "d", f'"2024-03-04T23:00:00"^^<{XSD}dateTime>'),
        (EX + "c", EX + "d", f'"2024-03-06"^^<{XSD}date>'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s WHERE { ?s ex:d ?t . "
        f'FILTER(?t < "2024-03-05T12:00:00"^^<{XSD}dateTime>) }}',
        prefixes=PFX,
    ).collect()
    # date "2024-03-05" = midnight instant < noon; b's 23:00 of the
    # 4th also earlier; c later
    assert sorted(_local(r.s) for r in got) == ["a", "b"]


def test_tz_accessor(spark):
    rows = [
        (EX + "a", EX + "t", f'"2024-01-01T00:00:00Z"^^<{XSD}dateTime>'),
        (EX + "b", EX + "t", f'"2024-01-01T00:00:00+05:30"^^<{XSD}dateTime>'),
        (EX + "c", EX + "t", f'"2024-01-01T00:00:00"^^<{XSD}dateTime>'),
        (EX + "d", EX + "t", "not-a-time"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s ?z WHERE { ?s ex:t ?t . BIND(TZ(?t) AS ?z) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.s): r.z for r in got}
    assert by == {"a": "Z", "b": "+05:30", "c": "", "d": None}


def test_trailing_semicolon_inside_bnode_list(zoo):
    """Grammar rule [77] allows the trailing ';' inside '[ ... ]'."""
    got = sparql_select(
        zoo,
        "SELECT ?n WHERE { [ a ex:Dog ; ex:name ?n ; ] . }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_iri_of_blank_or_lang_term_is_error(spark):
    """IRI() is defined only for IRIs / simple literals / xsd:string —
    a blank node or lang-tagged literal is an expression error (the
    BIND variable stays unbound), matching rdflib."""
    rows = [
        (EX + "a", EX + "v", "_:b1"),
        (EX + "b", EX + "v", '"chat"@fr'),
        (EX + "c", EX + "v", f'"x"^^<{XSD}string>'),
        (EX + "d", EX + "v", EX + "ok"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s ?u WHERE { ?s ex:v ?v . BIND(IRI(?v) AS ?u) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.s): r.u for r in got}
    assert by == {"a": None, "b": None, "c": "x", "d": EX + "ok"}


# ------------------------------ blank-node LABELS (round 13)


def test_bnode_label_is_scoped_variable(zoo):
    """_:x in a pattern is a scoped variable — same label joins."""
    got = sparql_select(
        zoo,
        "SELECT ?n ?t WHERE { _:x ex:name ?n . _:x ex:likes ?t . }",
        prefixes=PFX,
    ).collect()
    assert [(r.n, _local(r.t)) for r in got] == [("Rex", "tom")]


def test_bnode_labels_never_project(zoo):
    got = sparql_select(
        zoo, "SELECT * WHERE { _:s ex:name ?n }", prefixes=PFX
    )
    assert got.columns == ["n"]


def test_distinct_bnode_labels_are_distinct_vars(zoo):
    got = sparql_select(
        zoo,
        "SELECT ?a ?b WHERE { _:x ex:name ?a . _:y ex:name ?b . "
        'FILTER(?a < ?b) }',
        prefixes=PFX,
    ).collect()
    assert [(r.a, r.b) for r in got] == [("Rex", "Tom")]


def test_bnode_label_in_template_pointed_error(zoo):
    from bio2bel_spark.sparql import SparqlError, sparql_construct

    with pytest.raises(SparqlError, match="fresh blank node"):
        sparql_construct(
            zoo,
            f"PREFIX ex: <{EX}> "
            "CONSTRUCT { _:r ex:of ?x } WHERE { ?x a ex:Dog }",
        )


def test_bnode_list_in_template_pointed_error(spark, zoo):
    from bio2bel_spark.sparql import SparqlError, sparql_update

    with pytest.raises(SparqlError, match="fresh blank node"):
        sparql_update(
            zoo,
            f"INSERT DATA {{ [ <{EX}p> \"1\" ] . }}",
        )


# ---------------------------------------- BASE declaration (round 13)


def test_base_resolves_relative_iris(zoo):
    got = sparql_select(
        zoo,
        "BASE <http://ex.org/> "
        "SELECT ?n WHERE { <rex> <name> ?n }",
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_base_leaves_absolute_iris_alone(zoo):
    got = sparql_select(
        zoo,
        "BASE <http://other.example/> "
        f"SELECT ?n WHERE {{ <{EX}rex> <{EX}name> ?n }}",
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_base_governs_following_prefix(zoo):
    """A PREFIX declared AFTER the BASE resolves against it."""
    got = sparql_select(
        zoo,
        "BASE <http://ex.org/root> PREFIX e: </> "
        "SELECT ?n WHERE { e:rex e:name ?n }",
    ).collect()
    assert [r.n for r in got] == ["Rex"]


def test_relative_iri_without_base_passes_verbatim(zoo):
    """Pre-round-13 behavior preserved: no BASE -> relative IRIs match
    nothing instead of erroring."""
    got = sparql_select(
        zoo, "SELECT ?n WHERE { <rex> <name> ?n }"
    ).collect()
    assert got == []


def test_service_pointed_rejection(zoo):
    from bio2bel_spark.sparql import SparqlError

    with pytest.raises(SparqlError, match="federated query"):
        sparql_select(
            zoo,
            "SELECT ?s WHERE { SERVICE <http://remote/sparql> "
            "{ ?s ?p ?o } }",
            prefixes=PFX,
        )


def test_bnode_label_reuse_across_groups_rejected(zoo):
    """§19.6: a blank-node label may not recur in a different basic
    graph pattern — loud error, not a silent cross-group join."""
    from bio2bel_spark.sparql import SparqlError

    with pytest.raises(SparqlError, match="19.6"):
        sparql_select(
            zoo,
            "SELECT ?n ?m WHERE { _:x ex:name ?n "
            "OPTIONAL { _:x ex:likes ?m } }",
            prefixes=PFX,
        )


def test_base_resolves_datatype_iri_inside_literal(spark):
    """A RELATIVE datatype IRI rides inside the string token — BASE
    must reach it too."""
    df = spark.createDataFrame(
        [(EX + "s", EX + "p", f'"5"^^<{EX}t>')],
        "s string, p string, o string",
    )
    got = sparql_select(
        df,
        f'BASE <{EX}> SELECT ?s WHERE {{ ?s <p> "5"^^<t> }}',
    ).collect()
    assert [_local(r.s) for r in got] == ["s"]


def test_non_hierarchical_base_rejected(zoo):
    """urljoin is inert for urn:/mailto: bases — loud error instead of
    silently-unresolved relative IRIs."""
    from bio2bel_spark.sparql import SparqlError

    with pytest.raises(SparqlError, match="hierarchical"):
        sparql_select(
            zoo,
            "BASE <urn:example:> SELECT ?n WHERE { <rex> <name> ?n }",
        )


# ----------------------- effective boolean value §17.2.2 (round 13)


def test_filter_bare_variable_ebv(spark):
    rows = [
        (EX + "a", EX + "flag", "true"),    # plain non-empty -> true
        (EX + "b", EX + "flag", "false"),   # plain non-empty -> true
        # (round 14: the plain-"false" by-value deviation is GONE —
        # BIND'd booleans are typed terms now, so a plain "false" is
        # just a non-empty string, per the spec's xsd:string EBV)
        (EX + "c", EX + "flag", f'"true"^^<{XSD}boolean>'),
        (EX + "c2", EX + "flag", f'"false"^^<{XSD}boolean>'),  # by VALUE
        (EX + "d", EX + "flag", "0"),       # numeric zero -> false
        (EX + "e", EX + "flag", "7"),       # numeric nonzero -> true
        (EX + "f", EX + "flag", ""),        # empty literal -> false
        (EX + "g", EX + "flag", "yes"),     # non-empty literal -> true
        (EX + "h", EX + "flag", EX + "x"),  # IRI -> type error -> false
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s WHERE { ?s ex:flag ?v . FILTER(?v) }",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.s) for r in got) == ["a", "b", "c", "e", "g"]


def test_filter_negated_ebv_and_value_call(spark):
    """!?v and FILTER(STRLEN(?s)) — EBV composes with ! and value
    calls (numeric EBV of the length)."""
    rows = [
        (EX + "a", EX + "name", ""),
        (EX + "b", EX + "name", "bob"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s WHERE { ?s ex:name ?n . FILTER(STRLEN(?n)) }",
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got] == ["b"]
    got2 = sparql_select(
        df,
        "SELECT ?s WHERE { ?s ex:name ?n . FILTER(!?n) }",
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got2] == ["a"]


def test_ebv_in_boolean_combination(spark):
    rows = [(EX + "a", EX + "v", "1"), (EX + "b", EX + "v", "0")]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        'SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v || ?v = "0") }',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.s) for r in got) == ["a", "b"]
