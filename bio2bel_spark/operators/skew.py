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
