"""Shared runner for the SPARQL 1.1 conformance cases.

``run_case(spark, case)`` returns ``(status, detail)`` with status one
of ``"green"`` (engine answer matches the transcribed spec answer),
``"rejected"`` (kind=="reject" and the engine raised SparqlError —
loudly out of subset), or ``"WRONG"`` (anything else: wrong rows, a
silent success where a rejection was expected, or an unexpected
SparqlError). Used by tests/test_conformance.py (asserts no WRONG) and
scripts/conformance.py (writes the CONFORMANCE.md scoreboard).
"""

from __future__ import annotations

from conformance_cases import PREFIXES

from bio2bel_spark.sparql import (
    SparqlError,
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
    sparql_update,
)


def _df(spark, case):
    if case.get("data_quads"):
        return spark.createDataFrame(
            case["data_quads"], "g string, s string, p string, o string"
        )
    data = case["data"]
    if not data:
        raise ValueError(f"case {case['id']} has no data")
    return spark.createDataFrame(data, "s string, p string, o string")


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, tuple) and v and v[0] == "num":
        return ("num", round(float(v[1]), 6))
    if isinstance(v, (int, float)):
        return ("num", round(float(v), 6))
    if isinstance(v, str):
        try:
            # a numeric-looking cell compares numerically IF the
            # expectation asked for a number; string expectations
            # compare exactly — resolved by the caller pairing below
            return ("str", v)
        except ValueError:  # pragma: no cover
            return ("str", v)
    return ("str", str(v))


def _row_key(row: dict, expect_row: dict):
    """Canonical tuple for one result row, honoring per-cell ("num", x)
    expectations by comparing that cell numerically."""
    key = []
    for var in sorted(expect_row):
        want = expect_row[var]
        got = row.get(var)
        if isinstance(want, tuple) and want and want[0] == "num":
            key.append(
                ("num", None if got is None else round(float(got), 6))
            )
        else:
            key.append(_canon(got))
    return tuple(key)


def _want_key(expect_row: dict):
    key = []
    for var in sorted(expect_row):
        want = expect_row[var]
        if isinstance(want, tuple) and want and want[0] == "num":
            key.append(("num", round(float(want[1]), 6)))
        else:
            key.append(_canon(want))
    return tuple(key)


def run_case(spark, case) -> "tuple[str, str]":
    kind = case["kind"]
    query = case["query"]
    pfx = PREFIXES
    try:
        df = _df(spark, case)
        if kind == "reject":
            try:
                result = sparql_select(df, query, prefixes=pfx)
                result.collect()
            except SparqlError as e:
                return "rejected", str(e).splitlines()[0][:100]
            return "WRONG", "expected a loud rejection; query ran"
        if kind == "ask":
            got = sparql_ask(df, query, prefixes=pfx)
            if got == case["expect"]:
                return "green", f"ASK = {got}"
            return "WRONG", f"ASK returned {got}, expected {case['expect']}"
        if kind in ("construct", "describe", "update"):
            fn = {
                "construct": sparql_construct,
                "describe": sparql_describe,
                "update": sparql_update,
            }[kind]
            got = {tuple(r) for r in fn(df, query, prefixes=pfx).collect()}
            if got == case["expect"]:
                return "green", f"{len(got)} triples"
            return (
                "WRONG",
                f"triples differ: got {sorted(got)!r} "
                f"expected {sorted(case['expect'])!r}",
            )
        # select
        rows = [
            r.asDict() for r in sparql_select(df, query, prefixes=pfx)
            .collect()
        ]
        expect = case["expect"]
        if len(rows) != len(expect):
            return (
                "WRONG",
                f"{len(rows)} rows, expected {len(expect)}: {rows!r}",
            )
        if expect:
            got_keys = [_row_key(r, expect[0]) for r in rows]
            want_keys = [_want_key(e) for e in expect]
            if case.get("ordered"):
                ok = got_keys == want_keys
            else:
                ok = sorted(got_keys) == sorted(want_keys)
            if not ok:
                return (
                    "WRONG",
                    f"rows differ: got {sorted(got_keys)!r} "
                    f"expected {sorted(want_keys)!r}",
                )
        return "green", f"{len(rows)} rows"
    except SparqlError as e:
        return "WRONG", f"unexpected SparqlError: {e}"
    except Exception as e:  # engine crash ≠ loud subset rejection
        return "WRONG", f"unexpected {type(e).__name__}: {e}"
