"""Round-14 ADVICE fixes (three findings from the round-13 advisor).

1. Plain SUM/AVG used ``cast('double')`` on the lexical form, so under
   Spark 4's default ANSI mode any non-numeric term in the group raised
   CAST_INVALID_INPUT at runtime — while SUM(DISTINCT) on the same data
   quietly skipped it (try_cast). Both forms now use try_cast and agree:
   non-numeric terms are skipped (the documented sum-ignores-bad-values
   reading, approximating rdflib's unbound-on-error).
2. IN's ``isin`` fast-path fired for ANY plain-string member, so
   ``?v IN ("5")`` matched only the plain term ``5`` while
   ``FILTER(?v = "5")`` also matched ``"5"^^xsd:integer`` by VALUE —
   contradicting §17.4.1.9's "IN = chained =". Numeric-shaped quoted
   members now take the cmp-chain desugar too.
3. ``parse_group_po_list`` only tolerated a trailing ';' before '.', '}'
   or ']'; the grammar-legal ``?s ex:p ?o ; FILTER(...)`` (no '.' before
   a non-triples element — GroupGraphPatternSub) failed with a baffling
   "bad term 'FILTER'". The loop now breaks on any token that cannot
   start a verb (``at_verb_start``).
"""

from __future__ import annotations

import pytest

from bio2bel_spark.sparql import sparql_select

EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
PFX = {"ex": EX}


def _local(term: str) -> str:
    return term.rsplit("/", 1)[-1]


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (EX + "a", EX + "price", f'"2"^^<{XSD}integer>'),
        (EX + "b", EX + "price", f'"3"^^<{XSD}integer>'),
        (EX + "c", EX + "price", "cheap"),  # plain, NON-numeric
        (EX + "d", EX + "price", "5"),  # plain, numeric-shaped
        (EX + "a", EX + "tag", '"x"@en'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


# ------------------------------------------- 1. SUM/AVG skip non-numeric


def test_sum_skips_non_numeric_terms(mixed):
    """Plain SUM over a mixed column must not ANSI-crash on 'cheap' —
    it skips non-numeric terms, exactly like its DISTINCT sibling."""
    got = sparql_select(
        mixed,
        "SELECT (SUM(?v) AS ?total) WHERE { ?s ex:price ?v }",
        prefixes=PFX,
    ).collect()
    assert got[0].total == pytest.approx(10.0)  # 2 + 3 + 5, 'cheap' out


def test_sum_and_sum_distinct_agree_on_mixed(mixed):
    got = sparql_select(
        mixed,
        "SELECT (SUM(DISTINCT ?v) AS ?total) WHERE { ?s ex:price ?v }",
        prefixes=PFX,
    ).collect()
    assert got[0].total == pytest.approx(10.0)


def test_avg_skips_non_numeric_terms(mixed):
    got = sparql_select(
        mixed,
        "SELECT (AVG(?v) AS ?mean) WHERE { ?s ex:price ?v }",
        prefixes=PFX,
    ).collect()
    assert got[0].mean == pytest.approx(10.0 / 3)  # 3 numeric terms


# --------------------------------------- 2. numeric-shaped quoted IN member


def test_in_quoted_numeric_member_matches_typed_by_value(mixed):
    """?v IN ("3", "5") = chained FILTER(?v = "3") || FILTER(?v = "5"):
    the quoted-but-numeric-shaped members compare by VALUE, matching
    "3"^^xsd:integer AND the plain "5"."""
    got = sparql_select(
        mixed,
        'SELECT ?s WHERE { ?s ex:price ?v . FILTER(?v IN ("3", "5")) }',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.s) for r in got) == ["b", "d"]


def test_in_plain_string_members_keep_isin_path(mixed):
    """Non-numeric plain members still take the pushable isin path and
    match the plain term exactly."""
    got = sparql_select(
        mixed,
        'SELECT ?s WHERE { ?s ex:price ?v . FILTER(?v IN ("cheap")) }',
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got] == ["c"]


def test_not_in_quoted_numeric_member(mixed):
    got = sparql_select(
        mixed,
        'SELECT ?s WHERE { ?s ex:price ?v . FILTER(?v NOT IN ("3")) }',
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.s) for r in got) == ["a", "c", "d"]


# --------------------------------- 3. trailing ';' before FILTER/OPTIONAL


def test_trailing_semicolon_before_filter(mixed):
    got = sparql_select(
        mixed,
        "SELECT ?s WHERE { ?s ex:price ?v ; FILTER(?v = 2) }",
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got] == ["a"]


def test_trailing_semicolon_before_optional(mixed):
    got = sparql_select(
        mixed,
        "SELECT ?s ?t WHERE { ?s ex:price ?v ; OPTIONAL { ?s ex:tag ?t } "
        "FILTER(?v = 2) }",
        prefixes=PFX,
    ).collect()
    assert len(got) == 1 and _local(got[0].s) == "a" and got[0].t


# ------------------------------- 4. typed term forms for subquery SUM/AVG


@pytest.fixture(scope="module")
def typed_prices(spark):
    rows = [
        (EX + "a", EX + "price", f'"2"^^<{XSD}integer>'),
        (EX + "a", EX + "price", f'"3"^^<{XSD}integer>'),
        (EX + "b", EX + "price", f'"1"^^<{XSD}integer>'),
        (EX + "b", EX + "price", f'"2.5"^^<{XSD}decimal>'),
        (EX + "c", EX + "price", f'"4"^^<{XSD}double>'),
        (EX + "c", EX + "price", f'"1"^^<{XSD}integer>'),
        (EX + "d", EX + "price", "7"),  # PLAIN numeric-shaped
        (EX + "d", EX + "price", f'"1"^^<{XSD}integer>'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def _totals(df):
    return {_local(r.s): r.total for r in df.collect()}


def test_subquery_sum_emits_typed_terms(typed_prices):
    """A subquery SUM re-enters the term world typed: all-integer ->
    xsd:integer, integer+decimal -> xsd:decimal, any double ->
    xsd:double, any PLAIN contributor -> plain double lexical
    (pre-round-14 behavior, oracle-hash-stable on untyped data)."""
    got = _totals(
        sparql_select(
            typed_prices,
            "SELECT ?s ?total WHERE { { SELECT ?s (SUM(?v) AS ?total) "
            "WHERE { ?s ex:price ?v } GROUP BY ?s } }",
            prefixes=PFX,
        )
    )
    assert got["a"] == f'"5"^^<{XSD}integer>'
    assert got["b"] == f'"3.5"^^<{XSD}decimal>'
    assert got["c"] == f'"5.0"^^<{XSD}double>'
    assert got["d"] == "8.0"  # plain contributor keeps the plain form


def test_subquery_avg_emits_decimal(typed_prices):
    """AVG of integers is xsd:decimal (XPath op:numeric-divide)."""
    got = sparql_select(
        typed_prices,
        "SELECT ?m WHERE { { SELECT (AVG(?v) AS ?m) WHERE "
        "{ ex:a ex:price ?v } } }",
        prefixes=PFX,
    ).collect()
    assert got[0].m == f'"2.5"^^<{XSD}decimal>'


def test_constructed_aggregate_reaggregates_losslessly(typed_prices):
    """The round-trip the typed forms exist for: CONSTRUCT a per-subject
    total from an aggregated subquery, RE-LOAD the constructed graph,
    and re-aggregate — the grand total equals the one computed over the
    original graph, because "5"^^xsd:integer re-enters the typed-numeric
    value branch (a plain "5.0" would too, but a typed CONSTRUCT output
    keeps DATATYPE() and xsd-aware consumers working)."""
    from bio2bel_spark.sparql import sparql_construct

    derived = sparql_construct(
        typed_prices,
        "CONSTRUCT { ?s ex:total ?total } WHERE { { SELECT ?s "
        "(SUM(?v) AS ?total) WHERE { ?s ex:price ?v } GROUP BY ?s } }",
        prefixes=PFX,
    )
    terms = {r.o for r in derived.collect()}
    assert f'"5"^^<{XSD}integer>' in terms
    regg = sparql_select(
        derived,
        "SELECT (SUM(?t) AS ?grand) WHERE { ?s ex:total ?t }",
        prefixes=PFX,
    ).collect()
    orig = sparql_select(
        typed_prices,
        "SELECT (SUM(?v) AS ?grand) WHERE { ?s ex:price ?v }",
        prefixes=PFX,
    ).collect()
    assert regg[0].grand == pytest.approx(orig[0].grand)


def test_top_level_sum_stays_numeric(typed_prices):
    """The TOP-LEVEL SELECT keeps native DOUBLE aggregates — the
    driver-facing projection of the string model (documented); typing
    applies where results re-enter the term world."""
    got = sparql_select(
        typed_prices,
        "SELECT (SUM(?v) AS ?total) WHERE { ex:a ex:price ?v }",
        prefixes=PFX,
    ).collect()
    assert isinstance(got[0].total, float) and got[0].total == 5.0


def test_subquery_count_stays_plain(typed_prices):
    """COUNT keeps its plain BIGINT lexical through subqueries —
    unchanged from every prior round (oracle-hash-stable)."""
    got = sparql_select(
        typed_prices,
        "SELECT ?n WHERE { { SELECT (COUNT(?v) AS ?n) WHERE "
        "{ ?s ex:price ?v } } }",
        prefixes=PFX,
    ).collect()
    assert got[0].n == "8"


# ----------------------------- 5. ORDER BY a native aggregate alias


def test_order_by_count_alias_sorts_by_value(spark):
    """ORDER BY ?n where ?n aliases COUNT must sort 2 < 10 numerically —
    the string-key expansion used to sort counts lexically ("10" < "2").
    Round-14 differential-harness finding."""
    rows = [(EX + "s1", EX + "p", f"o{i}") for i in range(10)]
    rows += [(EX + "s2", EX + "p", "oa"), (EX + "s2", EX + "p", "ob")]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:p ?o } "
        "GROUP BY ?s ORDER BY ASC(?n)",
        prefixes=PFX,
    ).collect()
    assert [(_local(r.s), r.n) for r in got] == [("s2", 2), ("s1", 10)]


# ------------------- 6. numeric pattern constants match typed spellings


def test_numeric_pattern_constant_matches_typed_and_plain(spark):
    """A bare 42 in a triple PATTERN is "42"^^xsd:integer per the
    Turtle/SPARQL grammars — it must match the typed serialization an
    N-Triples scan stores, and (documented model rule) the plain
    spelling too. Non-canonical spellings stay unmatched."""
    rows = [
        (EX + "a", EX + "p", f'"42"^^<{XSD}integer>'),
        (EX + "b", EX + "p", "42"),
        (EX + "c", EX + "p", f'"042"^^<{XSD}integer>'),  # non-canonical
        (EX + "d", EX + "p", f'"4.2"^^<{XSD}decimal>'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df, "SELECT ?s WHERE { ?s ex:p 42 }", prefixes=PFX
    ).collect()
    assert sorted(_local(r.s) for r in got) == ["a", "b"]
    got = sparql_select(
        df, "SELECT ?s WHERE { ?s ex:p 4.2 }", prefixes=PFX
    ).collect()
    assert [_local(r.s) for r in got] == ["d"]


# -------------------------- 7. typed boolean BINDs + spec plain-"false"


def test_bind_boolean_roundtrips_through_ebv(spark):
    """BIND(?v > 3 AS ?f) materializes "true"/"false"^^xsd:boolean terms;
    FILTER(?f) reads them by VALUE and DATATYPE answers xsd:boolean —
    closing the round-13 plain-"false" EBV deviation without losing the
    BIND -> FILTER round-trip it existed for."""
    rows = [(EX + "a", EX + "v", "5"), (EX + "b", EX + "v", "2")]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s ?d WHERE { ?s ex:v ?v . BIND(?v > 3 AS ?f) "
        "BIND(DATATYPE(?f) AS ?d) FILTER(?f) }",
        prefixes=PFX,
    ).collect()
    assert [(_local(r.s), r.d) for r in got] == [
        ("a", f"{XSD}boolean")
    ]


def test_plain_false_string_is_ebv_true(spark):
    """A PLAIN "false" data literal is a non-empty string — EBV true,
    per the spec's xsd:string rule (the round-13 deviation is gone)."""
    rows = [
        (EX + "a", EX + "flag", "false"),
        (EX + "b", EX + "flag", ""),
        (EX + "c", EX + "flag", f'"false"^^<{XSD}boolean>'),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = sparql_select(
        df,
        "SELECT ?s WHERE { ?s ex:flag ?v . FILTER(?v) }",
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got] == ["a"]
