"""Property test: the SPARQL-subset planner agrees with a naive driver-side
evaluator on randomized BGP + OPTIONAL queries over random triple tables.

The naive evaluator implements the SPARQL algebra directly (mapping sets,
compatible-mapping LeftJoin) with no Spark involvement, so agreement pins
the planner's join compilation — including the nullable-variable
compatible-join path — against an independent semantics."""

from __future__ import annotations

import itertools
import random

import pytest

from bio2bel_spark.sparql import sparql_select

PREDS = ["p0", "p1", "p2"]
NODES = ["a", "b", "c", "d", "e"]


def _rand_triples(rng, n):
    return [
        (rng.choice(NODES), rng.choice(PREDS), rng.choice(NODES))
        for _ in range(n)
    ]


def _naive_bgp(triples, patterns):
    """Evaluate required triple patterns: list of binding dicts."""
    out = [dict()]
    for s, p, o in patterns:
        new = []
        for mu in out:
            for ts, tp, to in triples:
                row = {}
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        v = term[1:]
                        bound = row.get(v, mu.get(v))
                        if bound is not None and bound != val:
                            ok = False
                            break
                        row[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    new.append({**mu, **row})
        out = new
    return out


def _naive_leftjoin(left, right):
    """SPARQL compatible-mapping LeftJoin over binding-dict lists."""
    out = []
    for mu in left:
        matched = False
        for nu in right:
            shared = set(mu) & set(nu)
            if all(mu[v] is None or mu[v] == nu[v] for v in shared):
                merged = dict(mu)
                for v, val in nu.items():
                    if merged.get(v) is None:
                        merged[v] = val
                out.append(merged)
                matched = True
        if not matched:
            out.append(dict(mu))
    return out


@pytest.mark.parametrize("seed", range(8))
def test_planner_matches_naive_evaluator(spark, seed):
    rng = random.Random(seed)
    triples = _rand_triples(rng, 40)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")

    # required patterns chained on a shared entity variable, plus an
    # OPTIONAL group introducing a new (nullable) variable
    p_req1, p_req2, p_opt = rng.choice(PREDS), rng.choice(PREDS), rng.choice(PREDS)
    query = f"""
        SELECT ?x ?y ?z ?w WHERE {{
            ?x <{p_req1}> ?y .
            ?y <{p_req2}> ?z .
            OPTIONAL {{ ?x <{p_opt}> ?w }}
        }}
    """
    got = {
        (r.x, r.y, r.z, r.w)
        for r in sparql_select(tdf, query).collect()
    }

    req = _naive_bgp(triples, [("?x", p_req1, "?y"), ("?y", p_req2, "?z")])
    opt = _naive_bgp(triples, [("?x", p_opt, "?w")])
    want_bindings = _naive_leftjoin(req, opt)
    want = {
        (mu["x"], mu["y"], mu["z"], mu.get("w"))
        for mu in want_bindings
    }
    # the planner (like SQL) is set-semantics per projected row only when
    # DISTINCT is applied; both sides here are deduplicated via sets
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_property_path_equals_desugared(spark, seed):
    """A ``/`` path query returns exactly what its hand-desugared chained
    BGP returns, for random data and random 2–3 segment paths."""
    rng = random.Random(200 + seed)
    triples = _rand_triples(rng, 40)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    segs = [rng.choice(PREDS) for _ in range(rng.choice([2, 3]))]
    path_q = f"SELECT ?x ?o WHERE {{ ?x <{'>/<'.join(segs)}> ?o }}"
    hops, prev = [], "?x"
    for i, p in enumerate(segs):
        nxt = "?o" if i == len(segs) - 1 else f"?v{i}"
        hops.append(f"{prev} <{p}> {nxt} .")
        prev = nxt
    manual_q = "SELECT ?x ?o WHERE { " + " ".join(hops) + " }"
    got = {(r.x, r.o) for r in sparql_select(tdf, path_q).collect()}
    want = {(r.x, r.o) for r in sparql_select(tdf, manual_q).collect()}
    naive = _naive_bgp(
        triples,
        [
            (("?x" if i == 0 else f"?v{i - 1}"), p,
             ("?o" if i == len(segs) - 1 else f"?v{i}"))
            for i, p in enumerate(segs)
        ],
    )
    assert got == want == {(mu["x"], mu["o"]) for mu in naive}


@pytest.mark.parametrize("seed", range(4))
def test_bindings_match_naive_initial_mapping(spark, seed):
    """initBindings substitution: the planner equals the naive evaluator
    run with the binding folded into the initial solution mapping —
    including the OPTIONAL-only-bound variable case."""
    rng = random.Random(300 + seed)
    triples = _rand_triples(rng, 40)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    p_req, p_opt = rng.choice(PREDS), rng.choice(PREDS)
    bound_w = rng.choice(NODES)
    query = f"""
        SELECT ?x ?y ?w WHERE {{
            ?x <{p_req}> ?y .
            OPTIONAL {{ ?x <{p_opt}> ?w }}
        }}
    """
    got = {
        (r.x, r.y, r.w)
        for r in sparql_select(tdf, query, bindings={"w": bound_w}).collect()
    }
    req = [
        {**mu, "w": bound_w}
        for mu in _naive_bgp(triples, [("?x", p_req, "?y")])
    ]
    opt = _naive_bgp(triples, [("?x", p_opt, "?w")])
    want = {
        (mu["x"], mu["y"], mu["w"])
        for mu in _naive_leftjoin(req, opt)
    }
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_values_match_naive_join(spark, seed):
    """VALUES inline data: the planner equals the naive evaluator's join
    against the literal rows (UNDEF = unbound in that row)."""
    rng = random.Random(400 + seed)
    triples = _rand_triples(rng, 40)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    p_req = rng.choice(PREDS)
    vals = rng.sample(NODES, 3)
    query = f"""
        SELECT ?x ?y ?t WHERE {{
            ?x <{p_req}> ?y .
            VALUES (?y ?t) {{ ("{vals[0]}" "t0") ("{vals[1]}" UNDEF) }}
        }}
    """
    got = {
        (r.x, r.y, r.t) for r in sparql_select(tdf, query).collect()
    }
    req = _naive_bgp(triples, [("?x", p_req, "?y")])
    inline = [{"y": vals[0], "t": "t0"}, {"y": vals[1]}]
    want = set()
    for mu in req:
        for nu in inline:
            if mu["y"] == nu["y"]:
                want.add((mu["x"], mu["y"], nu.get("t")))
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_not_exists_matches_naive(spark, seed):
    """FILTER NOT EXISTS / EXISTS / MINUS vs the naive evaluator: keep a
    solution iff no (resp. some) inner solution agrees on the shared
    variable. Within the planner's subset (shared vars bound non-null on
    both sides) MINUS must coincide with NOT EXISTS."""
    rng = random.Random(500 + seed)
    triples = _rand_triples(rng, 40)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    p_req, p_in = rng.choice(PREDS), rng.choice(PREDS)
    req = _naive_bgp(triples, [("?x", p_req, "?y")])
    inner_x = {mu["x"] for mu in _naive_bgp(triples, [("?x", p_in, "?w")])}
    want_not = {(mu["x"], mu["y"]) for mu in req if mu["x"] not in inner_x}
    want_yes = {(mu["x"], mu["y"]) for mu in req if mu["x"] in inner_x}
    for clause, want in [
        ("FILTER NOT EXISTS", want_not),
        ("MINUS", want_not),
        ("FILTER EXISTS", want_yes),
    ]:
        got = {
            (r.x, r.y)
            for r in sparql_select(
                tdf,
                f"""SELECT ?x ?y WHERE {{
                      ?x <{p_req}> ?y . {clause} {{ ?x <{p_in}> ?w }}
                    }}""",
            ).collect()
        }
        assert got == want, (clause, seed)


@pytest.mark.parametrize("seed", range(4))
def test_path_plus_matches_naive_closure(spark, seed):
    """p+ vs a python transitive closure over the same random hop set —
    including cyclic relations (random triples cycle freely)."""
    rng = random.Random(600 + seed)
    triples = _rand_triples(rng, 25)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    p = rng.choice(PREDS)
    hop = {(s, o) for s, pp, o in triples if pp == p}
    closure = set(hop)
    while True:
        new = {
            (a, d)
            for a, b in closure
            for c, d in hop
            if b == c and (a, d) not in closure
        }
        if not new:
            break
        closure |= new
    got = {
        (r.x, r.y)
        for r in sparql_select(
            tdf, f"SELECT ?x ?y WHERE {{ ?x <{p}>+ ?y }}"
        ).collect()
    }
    assert got == closure


@pytest.mark.parametrize("seed", range(4))
def test_chained_optional_property(spark, seed):
    """Two OPTIONALs binding the same variable: the planner's nullable
    compatible join must equal the naive left-associative LeftJoin."""
    rng = random.Random(100 + seed)
    triples = _rand_triples(rng, 30)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    query = """
        SELECT ?x ?y ?w WHERE {
            ?x <p0> ?y .
            OPTIONAL { ?x <p1> ?w }
            OPTIONAL { ?x <p2> ?w }
        }
    """
    got = {(r.x, r.y, r.w) for r in sparql_select(tdf, query).collect()}

    req = _naive_bgp(triples, [("?x", "p0", "?y")])
    o1 = _naive_bgp(triples, [("?x", "p1", "?w")])
    o2 = _naive_bgp(triples, [("?x", "p2", "?w")])
    step = _naive_leftjoin(req, o1)
    # ensure unbound ?w is present as None for the compatible test
    for mu in step:
        mu.setdefault("w", None)
    want_bindings = _naive_leftjoin(step, o2)
    want = {(mu["x"], mu["y"], mu.get("w")) for mu in want_bindings}
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_path_star_matches_naive_closure_plus_identity(spark, seed):
    """p* vs python closure ∪ identity over every graph term — pins the
    zero-length-row semantics (_zero_length_rows) under random cyclic
    relations, where the closure itself already contains some (t, t)
    pairs that must dedup against the identity rows."""
    rng = random.Random(900 + seed)
    triples = _rand_triples(rng, 25)
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    p = rng.choice(PREDS)
    hop = {(s, o) for s, pp, o in triples if pp == p}
    closure = set(hop)
    while True:
        new = {
            (a, d)
            for a, b in closure
            for c, d in hop
            if b == c and (a, d) not in closure
        }
        if not new:
            break
        closure |= new
    terms = {s for s, _, _ in triples} | {o for _, _, o in triples}
    want = closure | {(t, t) for t in terms}
    got = {
        (r.x, r.y)
        for r in sparql_select(
            tdf, f"SELECT ?x ?y WHERE {{ ?x <{p}>* ?y }}"
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_grouped_aggregates_match_naive_bag(spark, seed):
    """Grouped COUNT / COUNT DISTINCT / SUM / MIN / GROUP_CONCAT vs a
    python bag replay over the naive BGP evaluator — pins bag semantics
    (join fan-out multiplies solutions) and the aggregate typing."""
    rng = random.Random(1300 + seed)
    triples = _rand_triples(rng, 30) + [
        (n, "score", str(rng.randint(1, 9))) for n in NODES for _ in range(2)
    ]
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    q = (
        "SELECT ?x (COUNT(?y) AS ?n) (COUNT(DISTINCT ?y) AS ?nd) "
        "(SUM(?v) AS ?sv) (MIN(?y) AS ?lo) "
        '(GROUP_CONCAT(?y; SEPARATOR=",") AS ?ys) '
        "WHERE { ?x <p0> ?y . ?x <score> ?v } GROUP BY ?x"
    )
    got = {
        r.x: (r.n, r.nd, r.sv, r.lo, r.ys)
        for r in sparql_select(tdf, q).collect()
    }
    sols = _naive_bgp(
        triples, [("?x", "p0", "?y"), ("?x", "score", "?v")]
    )
    groups: dict = {}
    for mu in sols:
        groups.setdefault(mu["x"], []).append(mu)
    want = {}
    for x, mus in groups.items():
        ys = [mu["y"] for mu in mus]
        want[x] = (
            len(ys),
            len(set(ys)),
            float(sum(float(mu["v"]) for mu in mus)),
            min(ys),
            ",".join(sorted(ys)),
        )
    assert got == want
