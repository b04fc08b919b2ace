"""Round-12 typed-literal term model (verdict ask #3).

The scan keeps ``"lex"^^<dt>`` / ``"lex"@lang`` N-Triples serializations
verbatim (ENCODED-TERM model, sparql.py _ENC_LIT_SHAPE); LANG/DATATYPE/
STR read the suffix, numeric comparisons and SUM/AVG use the value when
an xsd-numeric datatype is present, and term identity stays string
equality (``"1"^^xsd:int`` != ``"1"`` — distinct RDF terms).

Parity target: rdflib preserves datatype/lang on parse (the reference's
rhea load, src/bio2bel/sources/rhea.py:36-47); these tests pin the same
observable answers for LANG()/DATATYPE()/numeric FILTER forms.
"""

from __future__ import annotations

import pytest

from bio2bel_spark.ingest import read_ntriples
from bio2bel_spark.sparql import sparql_select

EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
PFX = {"ex": EX}


def _local(term: str) -> str:
    return term.rsplit("/", 1)[-1]


@pytest.fixture(scope="module")
def typed(spark):
    rows = [
        # prices: typed integers with non-canonical lexical forms
        (EX + "a", EX + "price", f'"10"^^<{XSD}integer>'),
        (EX + "b", EX + "price", f'"9"^^<{XSD}integer>'),
        (EX + "c", EX + "price", f'"011"^^<{XSD}integer>'),
        (EX + "d", EX + "price", "cheap"),  # plain, non-numeric
        # labels: language-tagged + plain
        (EX + "a", EX + "label", '"chat"@fr'),
        (EX + "b", EX + "label", '"cat"@en'),
        (EX + "c", EX + "label", "plainword"),
        # a numeric-looking xsd:string literal (NOT numeric per spec)
        (EX + "d", EX + "code", f'"12"^^<{XSD}string>'),
        (EX + "a", EX + "code", "12"),  # plain "12" (string model)
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


# ----------------------------------------------------------- scan model


def test_read_ntriples_keeps_typed_serialization(spark, tmp_path):
    nt = tmp_path / "typed.nt"
    nt.write_text(
        f'<{EX}x> <{EX}price> "5"^^<{XSD}integer> .\n'
        f'<{EX}x> <{EX}label> "chat"@fr .\n'
        f'<{EX}x> <{EX}name> "plain" .\n'
    )
    got = {r.p.rsplit("/", 1)[-1]: r.o
           for r in read_ntriples(spark, str(nt)).collect()}
    assert got == {
        "price": f'"5"^^<{XSD}integer>',  # typed: serialization kept
        "label": '"chat"@fr',             # lang-tagged: kept
        "name": "plain",                  # plain: bare lexical (unchanged)
    }


# ---------------------------------------------------- LANG / DATATYPE


def test_lang_reads_the_tag(typed):
    got = sparql_select(
        typed,
        "SELECT ?m ?lg WHERE { ?m ex:label ?l . BIND(LANG(?l) AS ?lg) }",
        prefixes=PFX,
    ).collect()
    assert sorted((_local(r.m), r.lg) for r in got) == [
        ("a", "fr"), ("b", "en"), ("c", ""),
    ]


def test_datatype_reads_the_suffix(typed):
    got = sparql_select(
        typed,
        "SELECT ?m ?dt WHERE { ?m ex:price ?v . "
        "BIND(DATATYPE(?v) AS ?dt) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.m): r.dt for r in got}
    assert by["a"] == XSD + "integer"
    assert by["d"] == XSD + "string"  # plain literal


def test_datatype_of_lang_literal_is_langstring(typed):
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . '
        f"FILTER(DATATYPE(?l) = <{RDF_LANGSTR}>) }}",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "b"]


def test_lang_filter(typed):
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . FILTER(LANG(?l) = "fr") }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["a"]


# ------------------------------------------------- numeric comparisons


def test_typed_numeric_compare_by_value(typed):
    """"9"^^xsd:integer < "10"^^xsd:integer numerically (lexically it is
    the other way around) — §17.3 numeric operand category."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . FILTER(?v > 9) }",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "c"]


def test_typed_literal_token_in_query(typed):
    """Typed literal tokens parse in query text and compare by value:
    "011"^^xsd:integer = "11"^^xsd:integer."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . "
        f'FILTER(?v = "11"^^<{XSD}integer>) }}',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["c"]


def test_non_numeric_operand_is_type_error(typed):
    """Typed-numeric vs non-numeric term -> type error -> row dropped;
    the plain 'cheap' row must not satisfy either branch."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . "
        f'FILTER(?v >= "0"^^<{XSD}integer>) }}',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "b", "c"]


def test_plain_rows_keep_lexical_compare(typed):
    """Rows where neither side is typed-numeric keep the string model's
    lexical comparison — the untyped path is unchanged."""
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:code ?v . FILTER(?v = "12") }',
        prefixes=PFX,
    ).collect()
    # plain "12" matches; "12"^^xsd:string is a DIFFERENT term and its
    # comparison against the plain literal stays lexical on the
    # serialization (no xsd-numeric datatype on either side)
    assert sorted(_local(r.m) for r in got) == ["a"]


# -------------------------------------------------- term identity / fns


def test_typed_and_plain_are_distinct_terms(typed):
    got = sparql_select(
        typed,
        f'SELECT ?m WHERE {{ ?m ex:code "12"^^<{XSD}string> }}',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["d"]
    got2 = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:code "12" }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got2] == ["a"]


def test_str_and_strlen_use_lexical_form(typed):
    got = sparql_select(
        typed,
        "SELECT ?m ?sv ?n WHERE { ?m ex:label ?l . "
        "BIND(STR(?l) AS ?sv) BIND(STRLEN(?l) AS ?n) "
        'FILTER(LANG(?l) = "fr") }',
        prefixes=PFX,
    ).collect()
    assert [(r.sv, r.n) for r in got] == [("chat", "4")]


def test_contains_on_lang_literal_content(typed):
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . FILTER(CONTAINS(?l, "at")) }',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "b"]


def test_isnumeric_demands_numeric_datatype(typed):
    got = sparql_select(
        typed,
        "SELECT ?m ?v WHERE { ?m ex:code ?v . FILTER(isNumeric(?v)) }",
        prefixes=PFX,
    ).collect()
    # plain "12" stays numeric (string-model approximation);
    # "12"^^xsd:string is NOT numeric (typed, non-numeric datatype)
    assert [_local(r.m) for r in got] == ["a"]


def test_sum_of_typed_numerics(typed):
    got = sparql_select(
        typed,
        "SELECT (SUM(?v) AS ?total) WHERE { ?m ex:price ?v . "
        "FILTER(isNumeric(?v)) }",
        prefixes=PFX,
    ).collect()
    assert float(got[0].total) == 30.0  # 10 + 9 + 11


def test_abs_on_typed_numeric(typed):
    got = sparql_select(
        typed,
        "SELECT ?m ?a WHERE { ?m ex:price ?v . BIND(ABS(?v) AS ?a) "
        "FILTER(BOUND(?a)) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.m): float(r.a) for r in got}
    assert by == {"a": 10.0, "b": 9.0, "c": 11.0}


# ------------------------------------------- round-12 review regressions


def test_typed_string_is_not_a_number_in_compare(typed):
    """"10"^^xsd:integer = "10"^^xsd:string is a TYPE ERROR (row
    dropped), not numeric equality — _num only decodes xsd-numeric
    datatypes, agreeing with ISNUMERIC."""
    got = sparql_select(
        typed,
        "SELECT ?m WHERE { ?m ex:price ?v . "
        f'FILTER(?v = "10"^^<{XSD}string>) }}',
        prefixes=PFX,
    ).collect()
    assert got == []


def test_abs_of_typed_string_is_error(typed):
    got = sparql_select(
        typed,
        "SELECT ?m ?a WHERE { ?m ex:code ?v . BIND(ABS(?v) AS ?a) "
        "FILTER(BOUND(?a)) }",
        prefixes=PFX,
    ).collect()
    # plain "12" keeps the string-model approximation; the typed
    # xsd:string literal is an expression error -> unbound
    assert [( _local(r.m), float(r.a)) for r in got] == [("a", 12.0)]


def test_pname_datatype_pointed_error(typed):
    with pytest.raises(Exception, match="full <...> IRI"):
        sparql_select(
            typed,
            'SELECT ?m WHERE { ?m ex:price "10"^^xsd:integer }',
            prefixes=PFX,
        )


def test_subtagged_lang_reads_through(spark):
    df = spark.createDataFrame(
        [(EX + "a", EX + "label", '"color"@en-US')],
        "s string, p string, o string",
    )
    got = sparql_select(
        df,
        "SELECT ?lg WHERE { ?s ex:label ?l . BIND(LANG(?l) AS ?lg) }",
        prefixes=PFX,
    ).collect()
    assert [r.lg for r in got] == ["en-US"]


def test_nonstandard_lang_line_does_not_parse(spark, tmp_path):
    """A lang tag outside the N-Triples LANGTAG grammar (underscore) is
    a malformed line — dropped by the quad reader like any other garbage
    line, never half-encoded."""
    from bio2bel_spark.ingest import read_nquads

    nq = tmp_path / "bad.nq"
    nq.write_text(
        f'<{EX}a> <{EX}p> "ok"@en .\n'
        f'<{EX}b> <{EX}p> "bad"@en_US .\n'
    )
    got = [(r.s[-1], r.o) for r in read_nquads(spark, str(nq)).collect()]
    assert got == [("a", '"ok"@en')]


# ------------------- round 12c: constructors / langmatches / datetime


def test_langmatches_basic_filtering(typed):
    got = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . '
        'FILTER(LANGMATCHES(LANG(?l), "en")) }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.m) for r in got] == ["b"]
    star = sparql_select(
        typed,
        'SELECT ?m WHERE { ?m ex:label ?l . '
        'FILTER(LANGMATCHES(LANG(?l), "*")) }',
        prefixes=PFX,
    ).collect()
    # "*" matches any non-empty tag; the plain literal's "" does not
    assert sorted(_local(r.m) for r in star) == ["a", "b"]


def test_langmatches_subtag_prefix(spark):
    df = spark.createDataFrame(
        [(EX + "a", EX + "l", '"color"@en-US')],
        "s string, p string, o string",
    )
    got = sparql_select(
        df,
        'SELECT ?s WHERE { ?s ex:l ?l . '
        'FILTER(LANGMATCHES(LANG(?l), "EN")) }',
        prefixes=PFX,
    ).collect()
    assert len(got) == 1  # case-insensitive, matches at subtag boundary


def test_strlang_and_strdt_construct_encoded_terms(typed):
    got = sparql_select(
        typed,
        'SELECT ?n ?dt WHERE { ?m ex:label ?l . '
        'FILTER(LANG(?l) = "fr") '
        'BIND(STRLANG(STR(?l), "de") AS ?n) '
        "BIND(DATATYPE(STRDT(STR(?l), "
        f"<{XSD}token>)) AS ?dt) }}",
        prefixes=PFX,
    ).collect()
    assert [(r.n, r.dt) for r in got] == [('"chat"@de', XSD + "token")]


def test_strlang_rejects_bad_tag(typed):
    with pytest.raises(Exception, match="LANGTAG"):
        sparql_select(
            typed,
            'SELECT ?n WHERE { ?m ex:label ?l . '
            'BIND(STRLANG(STR(?l), "not a tag") AS ?n) }',
            prefixes=PFX,
        )


def test_datetime_accessors(spark):
    df = spark.createDataFrame(
        [
            (EX + "a", EX + "t",
             f'"2024-03-05T10:11:12"^^<{XSD}dateTime>'),
            (EX + "b", EX + "t", "bogus"),
        ],
        "s string, p string, o string",
    )
    got = sparql_select(
        df,
        "SELECT ?s ?y ?mo ?d ?h ?mi ?sec WHERE { ?s ex:t ?t . "
        "BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo) "
        "BIND(DAY(?t) AS ?d) BIND(HOURS(?t) AS ?h) "
        "BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?sec) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.s): (r.y, r.mo, r.d, r.h, r.mi, r.sec) for r in got}
    # SECONDS is the spec's xsd:decimal — fraction-bearing, so a whole
    # second reads 12.0 (round 14; YEAR..MINUTES stay integers)
    assert by["a"] == ("2024", "3", "5", "10", "11", "12.0")
    assert by["b"] == (None,) * 6  # non-datetime -> expression error


def test_hash_functions(spark):
    import hashlib

    df = spark.createDataFrame(
        [(EX + "a", EX + "v", "hello")], "s string, p string, o string"
    )
    got = sparql_select(
        df,
        "SELECT ?m ?s1 ?s256 WHERE { ?x ex:v ?v . "
        "BIND(MD5(?v) AS ?m) BIND(SHA1(?v) AS ?s1) "
        "BIND(SHA256(?v) AS ?s256) }",
        prefixes=PFX,
    ).collect()[0]
    assert got.m == hashlib.md5(b"hello").hexdigest()
    assert got.s1 == hashlib.sha1(b"hello").hexdigest()
    assert got.s256 == hashlib.sha256(b"hello").hexdigest()
