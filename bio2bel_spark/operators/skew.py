"""Skew-handling utilities: deterministic salting for hot keys.

AQE's skew-join splitting (enabled in :mod:`bio2bel_spark.session`) covers
sort-merge joins, but two shapes still melt a single reducer at 100 TB:

* aggregations whose per-key STATE is huge (``collect_set``/``count
  distinct`` on a hot key — e.g. one namespace holding half the edges);
* joins where the hot key's rows must all meet on one partition and the
  small side is too big to broadcast.

Both decompose with a *salt*: a deterministic secondary key that splits a hot
key's rows across ``n_salts`` reducers, followed by a cheap re-merge. All
salts here are ``pmod(xxhash64(...), n)`` of data columns — reproducible
across runs, no ``rand()`` (which would break retries and tests).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_salt(value: Column, n_salts: int) -> Column:
    """Deterministic salt bucket from a value column."""
    return F.pmod(F.xxhash64(value), F.lit(n_salts))


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """``groupBy(key).agg(countDistinct(value))`` that survives hot keys.

    Phase 1 groups on ``(key, salt(value))`` — each reducer deduplicates only
    its hash-slice of the hot key's values; phase 2 sums the per-slice
    distinct counts. Exact (slices are disjoint by construction): returns
    ``(key, n_distinct)``.
    """
    return (
        df.select(F.col(key), F.col(value))
        .groupBy(key, value_salt(F.col(value), n_salts).alias("__salt"))
        .agg(F.countDistinct(value).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("n_distinct"))
    )


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """``groupBy(key).agg(sort_array(collect_set(value)))`` with bounded
    per-reducer state: per-slice sets are collected first, then flattened.
    Returns ``(key, values)`` with ``values`` sorted for determinism."""
    return (
        df.select(F.col(key), F.col(value))
        .groupBy(key, value_salt(F.col(value), n_salts).alias("__salt"))
        .agg(F.collect_set(value).alias("__partial"))
        .groupBy(key)
        .agg(
            F.sort_array(F.flatten(F.collect_list("__partial"))).alias("values")
        )
    )


def replicated_salt_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has hot keys and ``right`` is too big to
    broadcast: salt the left side by row content, replicate the right side
    ``n_salts`` times, join on ``(key..., salt)``.

    Each hot key's rows spread over ``n_salts`` reducers at the cost of
    ``n_salts``× duplication of the right side — the standard trade when
    neither broadcast nor AQE splitting applies (e.g. the right side feeds
    further per-key work). Row multiplicity is exactly that of the plain
    join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalt.join(rsalt, keys + ["__salt"], how).drop("__salt")


def choose_join_strategy(
    left: DataFrame,
    right: DataFrame,
    on: str,
    broadcast_rows: int = 1_000_000,
    skew_ratio: float = 8.0,
) -> dict:
    """Actionable planner over the :func:`~bio2bel_spark.operators.
    validation.join_size_estimate` audit: decide HOW to run the equi-join
    ``left ⋈ right ON on`` from the same bounded count statistics, before
    paying for it. Returns a dict:

    * ``strategy`` — ``"broadcast"`` (a side fits under
      ``broadcast_rows``), ``"salted"`` (no side broadcasts and one
      side's hottest key exceeds ``skew_ratio``× its mean per-key count
      — the single-reducer melter AQE's split cannot always save), or
      ``"plain"`` (shuffle join; AQE handles residual skew);
    * ``broadcast_side`` / ``salt_side`` — which side to hint/salt
      (``"left"``/``"right"``/None);
    * ``stats`` — the decision inputs (row counts, distinct keys,
      hottest-key count per side).

    Cost: two map-side-combinable grouped counts + two scalar rollups —
    one bounded 1-row collect, never the join itself. Execute the
    decision with :func:`apply_join_strategy`. The thresholds are row-
    based because the audit is row-based; convert a byte budget (Spark's
    ``autoBroadcastJoinThreshold``) with your mean row width.
    """
    def side_stats(df):
        return (
            df.groupBy(F.col(on).alias("__k"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.sum("__n").alias("rows"),
                F.count(F.lit(1)).alias("keys"),
                F.max("__n").alias("max_key"),
            )
            .collect()[0]
        )

    ls, rs = side_stats(left), side_stats(right)
    stats = {
        "n_left": int(ls["rows"] or 0),
        "n_right": int(rs["rows"] or 0),
        "keys_left": int(ls["keys"] or 0),
        "keys_right": int(rs["keys"] or 0),
        "max_key_left": int(ls["max_key"] or 0),
        "max_key_right": int(rs["max_key"] or 0),
    }
    decision = {"strategy": "plain", "broadcast_side": None,
                "salt_side": None, "stats": stats}
    smaller = "left" if stats["n_left"] <= stats["n_right"] else "right"
    if stats[f"n_{smaller}"] <= broadcast_rows:
        decision.update(strategy="broadcast", broadcast_side=smaller)
        return decision
    for side in ("left", "right"):
        mean_key = stats[f"n_{side}"] / max(stats[f"keys_{side}"], 1)
        if stats[f"max_key_{side}"] > skew_ratio * mean_key:
            decision.update(strategy="salted", salt_side=side)
            return decision
    return decision


def apply_join_strategy(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
    decision: "dict | None" = None,
    **thresholds,
) -> DataFrame:
    """Execute the equi-join the way :func:`choose_join_strategy` (or a
    caller-supplied ``decision``) prescribes: ``broadcast`` hints the
    small side, ``salted`` routes through :func:`replicated_salt_join`
    with the skewed side on the salted (left) position, ``plain`` is the
    stock shuffle join. A salted RIGHT side is only swappable for
    ``inner`` joins (symmetric); any other ``how`` falls back to plain +
    AQE rather than silently changing semantics. Column order follows
    Spark's join output for the executed shape.
    """
    d = decision or choose_join_strategy(left, right, on, **thresholds)
    if d["strategy"] == "broadcast":
        # the hint marks the relation; Spark picks the legal build side
        # (and silently falls back when `how` forbids broadcasting it)
        if d["broadcast_side"] == "left":
            return F.broadcast(left).join(right, on, how)
        return left.join(F.broadcast(right), on, how)
    if d["strategy"] == "salted":
        if d["salt_side"] == "left":
            return replicated_salt_join(left, right, on, n_salts, how)
        if how == "inner":
            return replicated_salt_join(right, left, on, n_salts, how)
    return left.join(right, on, how)
