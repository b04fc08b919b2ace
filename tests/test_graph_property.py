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
