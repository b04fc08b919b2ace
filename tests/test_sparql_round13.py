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
