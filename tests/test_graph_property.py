"""Property-based checks for the iterative graph algorithms: random graphs
vs pure-Python union-find (components) and BFS (descendants) models."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bio2bel_spark.operators.graph import KnowledgeGraph

EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=25,
)


def _components_model(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    groups: dict = {}
    for n in parent:
        groups.setdefault(find(n), set()).add(n)
    return {frozenset(g) for g in groups.values()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=EDGES)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(
        [("x", str(a), "r", "x", str(b)) for a, b in edges],
        "source_ns string, source_id string, relation string, "
        "target_ns string, target_id string",
    )
    kg = KnowledgeGraph(None, df)
    kg.nodes = kg.induced_nodes()
    rows = kg.connected_components().collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["component"], set()).add(int(r["identifier"]))
    got = {frozenset(g) for g in groups.values()}
    assert got == _components_model(edges)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=EDGES, root=st.integers(0, 15))
def test_descendants_match_bfs(spark, edges, root):
    hier = spark.createDataFrame(
        [(str(c), str(p)) for c, p in edges], "child string, parent string"
    )
    roots = spark.createDataFrame([(str(root),)], "node string")
    got = {r["node"] for r in KnowledgeGraph.descendants(hier, roots).collect()}

    want = {str(root)}
    children: dict = {}
    for c, p in edges:
        children.setdefault(str(p), set()).add(str(c))
    frontier = {str(root)}
    while frontier:
        nxt = set()
        for p in frontier:
            nxt |= children.get(p, set()) - want
        want |= nxt
        frontier = nxt
    assert got == want


def _k_core_model(edges, k):
    """Pure-python peel: unique fixpoint, returns {node: core_degree}."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=EDGES, k=st.integers(1, 4))
def test_k_core_matches_peeling_model(spark, edges, k):
    from bio2bel_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["degree"] for r in k_core(df, k=k).collect()}
    assert got == _k_core_model(edges, k)


def test_k_core_peels_chain_keeps_clique(spark):
    from bio2bel_spark.operators.graph import k_core

    # triangle {0,1,2} + tail 2-3-4: a 2-core keeps only the triangle
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["degree"] for r in k_core(df, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_k_core_cascades_to_empty(spark):
    """A chain fully unravels under k=2 — the anti-join peel's extreme
    case where the 'dropped' side grows to the whole node set."""
    from bio2bel_spark.operators.graph import k_core

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    assert k_core(df, k=2).count() == 0


def _k_hop_model(edges, seeds, max_hops):
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for s in seeds:
        visited = {s}
        frontier = {s}
        for hop in range(1, max_hops + 1):
            nxt = set()
            for n in frontier:
                nxt |= adj.get(n, set())
            nxt -= visited
            if not nxt:
                break
            out[(s, hop)] = len(nxt)
            visited |= nxt
            frontier = nxt
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=EDGES, seeds=st.sets(st.integers(0, 15), min_size=1, max_size=3))
def test_k_hop_profile_matches_bfs(spark, edges, seeds):
    from bio2bel_spark.operators.graph import k_hop_profile

    edf = spark.createDataFrame(edges, "src int, dst int")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "seed int")
    got = {
        (r["seed"], r["hop"]): r["n_new_nodes"]
        for r in k_hop_profile(edf, sdf, max_hops=3).collect()
    }
    assert got == _k_hop_model(edges, sorted(seeds), 3)
