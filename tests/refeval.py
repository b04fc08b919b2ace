"""An INDEPENDENT reference evaluator for the engine's SPARQL subset.

Purpose (round-14 verdict ask #2): the hand-written DuckDB oracle twins
are per-query — a semantics bug encoded into BOTH the engine and its
twin is invisible to them, and rdflib (the one real SPARQL engine the
reference uses) is absent from this container and unreachable offline.
This module is the substitute oracle: a SECOND, from-scratch
implementation of the engine's documented semantics — the string/encoded
term model, §17.3 operand categories, §17.2.2 EBV (including the
documented plain-"false" deviation), §15.1 value ordering, §18.5
aggregates — written as naive Python over lists of triples. No Spark, no
SQL, no shared helper code: every divergence between `bio2bel_spark.sparql`
and this file on a generated query is a real bug in one of them.

The evaluator consumes a query AST (plain tuples/dicts, documented
below) rather than query text: the differential test generator builds
the AST once and derives BOTH the SPARQL text (for the engine) and the
reference answer (from here), so no second parser exists to share bugs
with the first.

AST shape
---------
A *term node* is one of::

    ("var", name)          # ?name
    ("term", serialized)   # data-side term: IRI, plain literal,
                           # '"lex"^^<dt>' / '"lex"@lang' encoded form
    ("numlit", 5)          # a BARE number token in query text — forces
                           # the §17.3 numeric category outright

A *pattern* is ``(s, p, o)`` of term nodes. A *filter expression*::

    ("cmp", op, l, r)      # op in = != < <= > >=
    ("in", l, [members], negated)
    ("and"|"or", a, b) / ("not", a)
    ("ebv", term_node)     # FILTER(?x) — bare EBV
    ("bound", var)

A *query* is a dict::

    {"patterns": [...], "optional": [patterns] | None,
     "union": ([patterns], [patterns]) | None,  # replaces "patterns"
     "filters": [...],
     "group_by": [vars] | None,
     "aggs": [(fn, distinct, var_or_None, alias)] | None,
     "having": filter-expr over agg aliases | None,
     "project": [vars], "distinct": bool,
     "order": [(var, asc_bool)] | None, "limit": int|None, "offset": int}

Results are lists of dicts var->value: term strings (or None for
unbound) for plain vars and MIN/MAX/SAMPLE/GROUP_CONCAT, int for COUNT,
float (or None) for SUM/AVG — the same surface `sparql_select` collects.
"""

from __future__ import annotations

import re
from datetime import datetime

XSD = "http://www.w3.org/2001/XMLSchema#"

_ENC = re.compile(r'^"(.*)"(\^\^<([^>]*)>|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))$',
                  re.S)
_NUMERIC = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
_IRI = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*://|urn:)")
_BLANK = re.compile(r"^_:")
_NUM_DT = re.compile(
    r"^http://www\.w3\.org/2001/XMLSchema#(integer|decimal|double|float|"
    r"int|long|short|byte|negativeInteger|nonNegativeInteger|"
    r"nonPositiveInteger|positiveInteger|unsignedLong|unsignedInt|"
    r"unsignedShort|unsignedByte)$"
)
_DT_DT = re.compile(
    r"^http://www\.w3\.org/2001/XMLSchema#(dateTime|date)$"
)


def lex(t: str) -> str:
    """Lexical form: strip ANY ``^^<dt>`` / ``@lang`` encoding."""
    m = _ENC.match(t)
    return m.group(1) if m else t


def _try_float(s: str):
    """Spark try_cast(string -> double), restricted to the lexical
    shapes the generator emits (no NaN/Infinity/underscores)."""
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


def num(t):
    """§17.3 numeric VALUE of a term, or None = type error: typed
    literals contribute only when the datatype is xsd-numeric; plain
    terms when numeric-shaped (the string model's documented reading)."""
    if t is None:
        return None
    m = _ENC.match(t)
    if m:
        if m.group(3) is None or not _NUM_DT.match(m.group(3)):
            return None  # @lang or non-numeric datatype
        s = m.group(1)
    else:
        s = t
    if not _NUMERIC.match(s):
        return None
    return float(s)


def dt_val(t):
    """Timestamp value for xsd:dateTime comparisons (instant; offsets
    normalize), or None. Bare ISO-8601 lexicals parse too, mirroring
    _dt_val's strip-then-try_cast."""
    if t is None:
        return None
    m = _ENC.match(t)
    if m:
        if m.group(3) is None or not _DT_DT.match(m.group(3)):
            return None
        s = m.group(1)
    else:
        s = t
    try:
        d = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is None:
        return None  # generator always embeds offsets (uniform-form)
    return d.timestamp()


def is_typed_numeric(t) -> bool:
    if t is None or not t.startswith('"'):
        return False
    m = _ENC.match(t)
    return bool(m and m.group(3) and _NUM_DT.match(m.group(3)))


def is_typed_dt(t) -> bool:
    if t is None or not t.startswith('"'):
        return False
    m = _ENC.match(t)
    return bool(m and m.group(3) and _DT_DT.match(m.group(3)))


def ebv(t):
    """§17.2.2 EBV, mirroring the round-14 engine: typed xsd:boolean by
    VALUE (true/1; ill-formed = false), numerics by value (typed OR
    numeric-shaped plain — the string model's documented reading), any
    other literal by non-emptiness (a PLAIN "false" is a non-empty
    string = true, per spec)."""
    if t is None:
        return None
    if _IRI.match(t) or _BLANK.match(t):
        return None  # type error
    m = _ENC.match(t)
    if m and m.group(3) == XSD + "boolean":
        return m.group(1) in ("true", "1")
    n = num(t)
    if n is not None:
        return n != 0
    return len(lex(t)) != 0


def _cmp3(op, a, b):
    """Three-valued comparison of two comparable Python values."""
    if a is None or b is None:
        return None
    if op == "=":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    return a >= b


def _numval(v):
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return float(v)
    return num(v)


def _operand(node, row):
    kind = node[0]
    if kind == "var":
        return row.get(node[1])
    return node[1]  # term / numlit payload


def eval_cmp(op, lnode, rnode, row):
    """§17.3 operand dispatch, mirroring _compile_filter's cmp node:
    a bare number literal forces the numeric category; else either side
    typed-numeric -> numeric values; else either side typed-dateTime ->
    instants; else raw serialization comparison."""
    lv, rv = _operand(lnode, row), _operand(rnode, row)
    if lnode[0] == "numlit" or rnode[0] == "numlit":
        # a HAVING operand may be a native aggregate value (int/float)
        # rather than a term string — hence _numval, mirroring the
        # engine's native hidden aggregate columns
        return _cmp3(op, _numval(lv), _numval(rv))
    if lv is None or rv is None:
        return None
    if is_typed_numeric(lv) or is_typed_numeric(rv):
        return _cmp3(op, num(lv), num(rv))
    if is_typed_dt(lv) or is_typed_dt(rv):
        return _cmp3(op, dt_val(lv), dt_val(rv))
    return _cmp3(op, lv, rv)


def eval_filter(expr, row):
    """Three-valued filter evaluation (SQL semantics: NULL OR TRUE is
    TRUE, NULL AND FALSE is FALSE, NOT NULL is NULL)."""
    kind = expr[0]
    if kind == "and":
        a, b = eval_filter(expr[1], row), eval_filter(expr[2], row)
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if kind == "or":
        a, b = eval_filter(expr[1], row), eval_filter(expr[2], row)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    if kind == "not":
        a = eval_filter(expr[1], row)
        return None if a is None else (not a)
    if kind == "cmp":
        return eval_cmp(expr[1], expr[2], expr[3], row)
    if kind == "in":
        _, l, members, negated = expr
        if not members:
            r = False  # empty disjunction, operand NOT evaluated
        else:
            r = False
            for m in members:
                e = eval_cmp("=", l, m, row)
                if e is True:
                    r = True
                    break
                if e is None:
                    r = None  # sticks unless a later member hits True
        if r is None:
            return None
        return (not r) if negated else r
    if kind == "ebv":
        return ebv(_operand(expr[1], row))
    if kind == "bound":
        return row.get(expr[1]) is not None
    raise ValueError(f"bad filter node {expr[0]!r}")


# ---------------------------------------------------------------- BGP


def _match_pattern(triples, pat, row):
    """All extensions of `row` matching one pattern — naive full scan."""
    out = []
    for s, p, o in triples:
        ext = dict(row)
        ok = True
        for node, val in ((pat[0], s), (pat[1], p), (pat[2], o)):
            if node[0] == "var":
                bound = ext.get(node[1])
                if bound is None and node[1] not in ext:
                    ext[node[1]] = val
                elif bound != val:
                    ok = False
                    break
            elif node[1] != val:
                ok = False
                break
        if ok:
            out.append(ext)
    return out


def _match_bgp(triples, patterns, rows):
    for pat in patterns:
        rows = [e for r in rows for e in _match_pattern(triples, pat, r)]
    return rows


def _pattern_vars(patterns):
    return {n[1] for pat in patterns for n in pat if n[0] == "var"}


# -------------------------------------------------------------- order


def order_key(t):
    """§15.1 value-ordering key: (bucket, value, raw) — bucket 1 =
    typed xsd-numeric by double value, 2 = typed dateTime by instant,
    0 = everything else lexically."""
    if t is None:
        return None
    if isinstance(t, (int, float)):
        # a NATIVE aggregate value (COUNT alias) orders by value — the
        # engine sorts native numeric columns directly (round 14)
        return (1, float(t), "")
    if is_typed_numeric(t):
        n = num(t)
        if n is not None:
            return (1, n, t)
    if is_typed_dt(t):
        d = dt_val(t)
        if d is not None:
            return (2, d, t)
    return (0, 0.0, t)


def _sort_rows(rows, order):
    """Stable multi-key sort honoring Spark's null placement: NULLS
    FIRST ascending, NULLS LAST descending."""
    for var, asc in reversed(order):
        def key(row, var=var):
            k = order_key(row.get(var))
            # unbound carries the SMALLEST flag in both directions:
            # ascending (reverse=False) puts it first, descending
            # (reverse=True) puts it last — Spark's null placement
            return (0, (0, 0.0, "")) if k is None else (1, k)

        rows = sorted(rows, key=key, reverse=not asc)
    return rows


# ---------------------------------------------------------- aggregates


def _agg_value(fn, distinct, values, grouped, sep=" "):
    """One aggregate over the group's TERM values (None = unbound),
    mirroring _agg_column: COUNT skips unbound; SUM/AVG strip ANY
    encoding then try-cast, skipping failures (try_cast semantics — a
    "12"^^xsd:string SUMS as 12 even though it COMPARES as non-numeric,
    the documented lex-based reading); global SUM/AVG of an empty/
    all-skipped input is 0.0 where a grouped one is None; MIN/MAX pick
    the §15.1-least/greatest term; GROUP_CONCAT joins sorted terms."""
    vals = [v for v in values if v is not None]
    if fn == "COUNT":
        return len(set(vals)) if distinct else len(vals)
    if fn == "GROUP_CONCAT":
        bag = sorted(set(vals)) if distinct else sorted(vals)
        return sep.join(bag)
    if fn in ("SUM", "AVG"):
        pool = sorted(set(vals)) if distinct else vals
        nums = [
            n for n in (_try_float(lex(v)) for v in pool) if n is not None
        ]
        if not nums:
            return None if grouped else 0.0
        total = sum(nums)
        return total / len(nums) if fn == "AVG" else total
    keyed = [(order_key(v), v) for v in vals]
    if not keyed:
        return None
    if fn in ("MIN", "SAMPLE"):
        return min(keyed)[1]
    return max(keyed)[1]  # MAX


# ------------------------------------------------------------ evaluate


def ref_select(triples, q):
    """Evaluate one AST query over the triple list; see module doc."""
    if q.get("union"):
        g1, g2 = q["union"]
        v1, v2 = _pattern_vars(g1), _pattern_vars(g2)
        rows = _match_bgp(triples, g1, [{}]) + _match_bgp(
            triples, g2, [{}]
        )
        allv = v1 | v2
        rows = [{v: r.get(v) for v in allv} | r for r in rows]
    else:
        rows = _match_bgp(triples, q["patterns"], [{}])
    if q.get("optional"):
        joined = []
        for r in rows:
            exts = _match_bgp(triples, q["optional"], [r])
            if exts:
                joined.extend(exts)
            else:
                miss = dict(r)
                for v in _pattern_vars(q["optional"]):
                    miss.setdefault(v, None)
                joined.append(miss)
        rows = joined
    for f in q.get("filters") or []:
        rows = [r for r in rows if eval_filter(f, r) is True]

    group_by = q.get("group_by")
    aggs = q.get("aggs")
    if aggs:
        keys = group_by or []
        groups: dict = {}
        for r in rows:
            k = tuple(r.get(v) for v in keys)
            groups.setdefault(k, []).append(r)
        if not group_by and not groups:
            groups[()] = []  # global aggregate over empty input
        out = []
        for k, members in groups.items():
            row = dict(zip(keys, k))
            for fn, distinct, var, alias in aggs:
                values = (
                    [1] * len(members)  # COUNT(*)
                    if var is None
                    else [m.get(var) for m in members]
                )
                row[alias] = _agg_value(
                    fn, distinct, values, grouped=bool(group_by)
                )
            out.append(row)
        rows = out
        if q.get("having") is not None:
            rows = [r for r in rows if eval_filter(q["having"], r) is True]

    project = q["project"]
    rows = [{v: r.get(v) for v in project} for r in rows]
    if q.get("distinct"):
        seen, dedup = set(), []
        for r in rows:
            key = tuple(r[v] for v in project)
            if key not in seen:
                seen.add(key)
                dedup.append(r)
        rows = dedup
    if q.get("order"):
        rows = _sort_rows(rows, q["order"])
    off = q.get("offset") or 0
    if off:
        rows = rows[off:]
    if q.get("limit") is not None:
        rows = rows[: q["limit"]]
    return rows
