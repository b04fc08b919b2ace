"""Round-12 SPARQL fixes (ADVICE round 11):

* trailing VALUES uses the spec's compatible-mapping join — a solution
  row whose shared variable is UNBOUND (OPTIONAL-bound NULL) joins every
  inline row and takes the inline value (§18.2.4.3 + §18.5 Join), with
  the all-nullable-shared case a loud error (would need a nested loop);
* FILTER(?x [NOT] IN ()) — the empty disjunction is FALSE without
  evaluating ?x (§17.4.1.9-10), so NOT IN () keeps rows with unbound ?x;
* ORDER BY expression keys referencing an unbound variable raise the
  pointed SparqlError, not a raw AnalysisException;
* user variables with the planner-internal ``__tv_`` prefix are rejected
  at tokenize time like the other reserved prefixes.

Parity target: rdflib evaluation of the same forms (reference
src/bio2bel/sources/rhea.py:38-47 runs arbitrary rdflib SPARQL).
"""

from __future__ import annotations

import pytest

from bio2bel_spark.sparql import SparqlError, sparql_select

EX = "http://ex.org/"
PFX = {"ex": EX}


def _local(term: str) -> str:
    return term.rsplit("/", 1)[-1]


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (EX + "a", EX + "type", "gene"),
        (EX + "b", EX + "type", "gene"),
        (EX + "c", EX + "type", "misc"),
        (EX + "a", EX + "score", "1"),
        (EX + "b", EX + "score", "2"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


# ------------------------------------- trailing VALUES compatible join


def test_trailing_values_unbound_shared_takes_inline_value(scored):
    """A solution row with the shared variable unbound is compatible
    with EVERY inline row and the merged solution takes the inline
    value — it must not be silently dropped (pre-round-12 behavior)."""
    got = sparql_select(
        scored,
        "SELECT ?m ?s WHERE { ?m ex:type ?t . "
        "OPTIONAL { ?m ex:score ?s } } "
        'VALUES (?m ?s) { (ex:a "1") (ex:b "9") (ex:c "7") }',
        prefixes=PFX,
    ).collect()
    # a: bound "1" = "1" -> kept; b: bound "2" != "9" -> dropped;
    # c: unbound -> compatible, takes "7"
    assert sorted((_local(r.m), r.s) for r in got) == [("a", "1"), ("c", "7")]


def test_trailing_values_all_nullable_shared_raises(scored):
    with pytest.raises(SparqlError, match="nullable"):
        sparql_select(
            scored,
            "SELECT ?m ?s WHERE { ?m ex:type ?t . "
            "OPTIONAL { ?m ex:score ?s } } "
            'VALUES ?s { "1" }',
            prefixes=PFX,
        )


def test_trailing_values_nullable_aggregate_alias(scored):
    """The nullable set is re-derived through the aggregation stage: a
    grouped SUM over a group that binds no values is NULL (rdflib
    semantics) and must still be compatible with the inline data."""
    got = sparql_select(
        scored,
        "SELECT ?t (SUM(?s) AS ?total) WHERE { ?m ex:type ?t . "
        "OPTIONAL { ?m ex:score ?s } } GROUP BY ?t "
        'VALUES (?t ?total) { ("gene" "3.0") ("misc" "42") }',
        prefixes=PFX,
    ).collect()
    assert sorted((r.t, r.total) for r in got) == [
        ("gene", "3.0"),
        ("misc", "42"),
    ]


# ------------------------------------------------- empty IN / NOT IN


def test_not_in_empty_keeps_unbound_rows(scored):
    """NOT IN () is TRUE without evaluating the operand — rows whose
    left side is unbound (OPTIONAL miss) are KEPT (§17.4.1.9-10)."""
    got = sparql_select(
        scored,
        "SELECT ?m WHERE { ?m ex:type ?t . "
        "OPTIONAL { ?m ex:nope ?z } FILTER(?z NOT IN ()) }",
        prefixes=PFX,
    ).collect()
    assert sorted(_local(r.m) for r in got) == ["a", "b", "c"]


def test_in_empty_is_false_even_unbound(scored):
    got = sparql_select(
        scored,
        "SELECT ?m WHERE { ?m ex:type ?t . "
        "OPTIONAL { ?m ex:nope ?z } FILTER(?z IN ()) }",
        prefixes=PFX,
    ).collect()
    assert got == []


# --------------------------------------------- ORDER BY expr validation


def test_order_by_expr_unbound_var_is_pointed_error(scored):
    with pytest.raises(SparqlError, match=r"\?nosuch"):
        sparql_select(
            scored,
            "SELECT ?m WHERE { ?m ex:type ?t } ORDER BY STRLEN(?nosuch)",
            prefixes=PFX,
        )


def test_order_by_expr_projected_out_under_distinct(scored):
    """Under DISTINCT the sort runs AFTER projection, so an expression
    key over a projected-out variable gets the pointed error too."""
    with pytest.raises(SparqlError, match=r"\?t"):
        sparql_select(
            scored,
            "SELECT DISTINCT ?m WHERE { ?m ex:type ?t } "
            "ORDER BY STRLEN(?t)",
            prefixes=PFX,
        )


# ----------------------------------------------- reserved __tv_ prefix


def test_tv_prefix_variable_rejected(scored):
    with pytest.raises(SparqlError, match="reserved"):
        sparql_select(
            scored,
            "SELECT ?__tv_x WHERE { ?__tv_x ex:type ?t }",
            prefixes=PFX,
        )


# ----------------------------------------------- arithmetic expressions


@pytest.fixture(scope="module")
def nums(spark):
    rows = [
        (EX + "a", EX + "v", "10"), (EX + "b", EX + "v", "3"),
        (EX + "c", EX + "v", "oops"),
        (EX + "a", EX + "w", "4"), (EX + "b", EX + "w", "0"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_arith_bind_and_precedence(nums):
    got = sparql_select(
        nums,
        "SELECT ?s ?n WHERE { ?s ex:v ?a . "
        "BIND(-?a + (2 + 3) * 2 AS ?n) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.s): r.n for r in got}
    # * binds tighter than +; unary minus; non-numeric -> error (unbound)
    assert by == {"a": "0.0", "b": "7.0", "c": None}


def test_arith_filter_and_negative_juxtaposition(nums):
    got = sparql_select(
        nums,
        "SELECT ?s WHERE { ?s ex:v ?a . FILTER(?a -1 > 8) }",
        prefixes=PFX,
    ).collect()
    assert [_local(r.s) for r in got] == ["a"]


def test_arith_division_by_zero_is_error(nums):
    got = sparql_select(
        nums,
        "SELECT ?s ?r WHERE { ?s ex:v ?a . ?s ex:w ?b . "
        "BIND(?a / ?b AS ?r) }",
        prefixes=PFX,
    ).collect()
    by = {_local(r.s): r.r for r in got}
    assert by == {"a": "2.5", "b": None}  # row kept, var unbound


def test_arith_over_aggregates_in_having_and_select(nums):
    got = sparql_select(
        nums,
        "SELECT ?s ((SUM(?a) * 2) AS ?dbl) WHERE { ?s ex:v ?a . "
        "FILTER(isNumeric(?a)) } GROUP BY ?s HAVING(SUM(?a) + 1 > 4)",
        prefixes=PFX,
    ).collect()
    assert [( _local(r.s), r.dbl) for r in got] == [("a", "20.0")]


def test_arith_strips_typed_encoding(spark):
    df = spark.createDataFrame(
        [(EX + "a", EX + "v",
          '"7"^^<http://www.w3.org/2001/XMLSchema#integer>')],
        "s string, p string, o string",
    )
    got = sparql_select(
        df,
        "SELECT ?n WHERE { ?s ex:v ?a . BIND(?a * 3 AS ?n) }",
        prefixes=PFX,
    ).collect()
    assert [r.n for r in got] == ["21.0"]
