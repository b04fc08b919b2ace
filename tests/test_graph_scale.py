"""10× scale-stress for the iterative graph trio (round-4 verdict ask #6).

The three most expensive bench queries — pagerank, k_core, k_hop_profile —
are iterative: the scale risks are (a) driver-side lineage growth across
rounds, (b) convergence taking MORE rounds at larger data, and (c) the
localCheckpoint count growing with data size instead of iteration count.

These tests inflate the sf0.1 membership edge set 10× by exploding a
10-element replica sequence (each replica prefixes its node ids, so the
graph becomes 10 structure-preserving disjoint copies: 10× the rows, the
same convergence depth a correct implementation should need) and assert:

* completion (no OOM / no unbounded lineage);
* the localCheckpoint count is a function of the ITERATION budget only —
  identical to what the un-inflated run would issue;
* no ``max_iterations`` RuntimeWarning fires (convergence inside budget).

Marked ``slow``: several minutes of real aggregation work on the test
session's local[4]. Run with ``SPARK_GRAFT_SLOW=1 python -m pytest
tests/test_graph_scale.py``; skipped otherwise so the default suite stays
fast. Round-5 evidence run recorded in PROGRESS.jsonl.
"""

from __future__ import annotations

import os
import warnings

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("SPARK_GRAFT_SLOW"),
        reason="scale-stress: set SPARK_GRAFT_SLOW=1 to run",
    ),
]


@pytest.fixture(scope="module")
def edges_10x(spark):
    """sf0.1 membership edges exploded into 10 disjoint replica copies."""
    from bio2bel_spark.tables import load_table

    m = (
        load_table(spark, SF_DIR, "lineitem")
        .select(
            F.concat(F.lit("o:"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"),
        )
        .distinct()
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    inflated = m.select(rep, "src", "dst").select(
        F.concat(F.col("rep"), F.lit("|"), F.col("src")).alias("src"),
        F.concat(F.col("rep"), F.lit("|"), F.col("dst")).alias("dst"),
    )
    yield inflated


@pytest.fixture()
def checkpoint_counter(monkeypatch):
    """Count every DataFrame.localCheckpoint issued during an operator run.

    Spark 4's ``pyspark.sql.DataFrame`` is the abstract facade; runtime
    instances are ``pyspark.sql.classic.dataframe.DataFrame``, so the
    CONCRETE class is what must be patched."""
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    calls = {"n": 0}
    orig = ClassicDF.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        return orig(self, eager=eager)

    monkeypatch.setattr(ClassicDF, "localCheckpoint", counting)
    return calls


def test_pagerank_10x(spark, edges_10x, checkpoint_counter):
    from bio2bel_spark.operators.graph import pagerank

    sym = edges_10x.union(
        edges_10x.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        n = pagerank(sym, iterations=10).count()
    assert n > 100_000  # 10 replicas of the sf0.1 node set
    # one lazy checkpoint per power-iteration round — data-size independent
    assert checkpoint_counter["n"] == 10


def test_k_core_10x(spark, edges_10x, checkpoint_counter):
    from bio2bel_spark.operators.graph import k_core

    with warnings.catch_warnings():
        # convergence must land inside the default budget: the warning is an error
        warnings.simplefilter("error", RuntimeWarning)
        out = k_core(edges_10x, k=3)
        n = out.count()
    assert n > 0
    # 1 canonicalize + 2 per double-peel round; replica copies converge in
    # exactly the rounds one copy needs, so the bound is the budget, never
    # the data size (30-iteration budget -> 15 barriers -> <= 31 calls)
    assert checkpoint_counter["n"] <= 31


def test_k_hop_profile_10x(spark, edges_10x, checkpoint_counter):
    from bio2bel_spark.operators.graph import k_hop_profile

    seeds = spark.createDataFrame(
        [(f"{r}|p:{p}",) for r in range(10) for p in (1, 2, 3)], "seed string"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        rows = k_hop_profile(edges_10x, seeds, max_hops=3).collect()
    # every replica's seeds expand identically — 10× seeds, same hop depth
    assert len(rows) > 0 and max(r["hop"] for r in rows) <= 3
    # 1 seed checkpoint + per-hop (frontier + visited) = <= 1 + 2*3
    assert checkpoint_counter["n"] <= 7
