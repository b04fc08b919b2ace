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
    join for ``inner``/``left``/``left_semi``/``left_anti``; ``right``/
    ``full`` joins are rejected — each unmatched right row would surface
    once per salt replica (``n_salts``× multiplicity).
    """
    h = how.lower().replace("_", "")
    if h not in {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}:
        raise ValueError(
            f"replicated_salt_join cannot preserve {how!r} semantics: the "
            "replicated right side would emit unmatched right rows once per "
            "salt. Use a plain join (AQE skew split) for right/full joins."
        )
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalt.join(rsalt, keys + ["__salt"], how).drop("__salt")


def join_strategy_report(
    left: DataFrame,
    right: DataFrame,
    on: str,
    broadcast_rows: int = 1_000_000,
    skew_ratio: float = 8.0,
) -> DataFrame:
    """ONE-row engine-side form of the join-strategy decision —
    ``(n_left, n_right, keys_left, keys_right, max_key_left,
    max_key_right, strategy, target_side)`` — so the planner's logic is
    value-oracle-checkable and usable inside a larger plan. Same decision
    rules as :func:`choose_join_strategy` (which routes through this):
    broadcast when a side fits the row budget, salted when a side's
    hottest key exceeds ``skew_ratio``× its mean per-key count, plain
    otherwise. Two combinable grouped counts + two 1-row rollups
    stitched by scalar cross joins (O(1) build sides).
    """
    def side(df, tag):
        return (
            df.groupBy(F.col(on).alias("__k"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias(f"n_{tag}"),
                F.count(F.lit(1)).cast("long").alias(f"keys_{tag}"),
                F.coalesce(F.max("__n"), F.lit(0)).cast("long").alias(f"max_key_{tag}"),
            )
        )

    j = side(left, "left").crossJoin(side(right, "right"))
    nl, nr = F.col("n_left"), F.col("n_right")
    # ratio-to-mean test (max_key*keys > ratio*n) PLUS an absolute hot-key
    # row threshold: with 1 (or few) keys on a side max == mean, so the most
    # extreme single-reducer concentration would otherwise classify 'plain'.
    # A key holding more rows than the broadcast budget is hot by definition.
    abs_hot = F.lit(int(broadcast_rows))
    skew_l = (
        F.col("max_key_left") * F.greatest(F.col("keys_left"), F.lit(1))
        > F.lit(float(skew_ratio)) * nl
    ) | (F.col("max_key_left") > abs_hot)
    skew_r = (
        F.col("max_key_right") * F.greatest(F.col("keys_right"), F.lit(1))
        > F.lit(float(skew_ratio)) * nr
    ) | (F.col("max_key_right") > abs_hot)
    small = F.least(nl, nr) <= F.lit(int(broadcast_rows))
    strategy = (
        F.when(small, F.lit("broadcast"))
        .when(skew_l | skew_r, F.lit("salted"))
        .otherwise(F.lit("plain"))
    )
    target = (
        F.when(small, F.when(nl <= nr, F.lit("left")).otherwise(F.lit("right")))
        .when(skew_l, F.lit("left"))
        .when(skew_r, F.lit("right"))
    )
    return j.select(
        "n_left", "n_right", "keys_left", "keys_right",
        "max_key_left", "max_key_right",
        strategy.alias("strategy"), target.alias("target_side"),
    )


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

    Routes through :func:`join_strategy_report` (one bounded 1-row
    collect), so the dict and DataFrame forms can never disagree.
    """
    r = join_strategy_report(left, right, on, broadcast_rows, skew_ratio).collect()[0]
    stats = {
        k: int(r[k])
        for k in (
            "n_left", "n_right", "keys_left", "keys_right",
            "max_key_left", "max_key_right",
        )
    }
    return {
        "strategy": r["strategy"],
        "broadcast_side": r["target_side"] if r["strategy"] == "broadcast" else None,
        "salt_side": r["target_side"] if r["strategy"] == "salted" else None,
        "stats": stats,
    }


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
    stock shuffle join. Salting only preserves semantics when the
    REPLICATED side never emits unmatched rows — so a salted LEFT runs
    only for ``inner``/``left``/``left_semi``/``left_anti`` and a salted
    RIGHT only for ``inner`` (symmetric swap); every other ``how``
    (``right``/``full`` would surface each unmatched replicated-side row
    ``n_salts`` times) falls back to plain + AQE rather than silently
    changing semantics. Column order follows Spark's join output for the
    executed shape.
    """
    d = decision or choose_join_strategy(left, right, on, **thresholds)
    if d["strategy"] == "broadcast":
        # the hint marks the relation; Spark picks the legal build side
        # (and silently falls back when `how` forbids broadcasting it)
        if d["broadcast_side"] == "left":
            return F.broadcast(left).join(right, on, how)
        return left.join(F.broadcast(right), on, how)
    if d["strategy"] == "salted":
        h = how.lower().replace("_", "")
        salt_safe = {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
        if d["salt_side"] == "left" and h in salt_safe:
            return replicated_salt_join(left, right, on, n_salts, how)
        if d["salt_side"] == "right" and h == "inner":
            return replicated_salt_join(right, left, on, n_salts, how)
    return left.join(right, on, how)
