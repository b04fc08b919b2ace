"""Scalable global enumeration and deterministic corpus shuffling.

Both operators need a total order WITHOUT a single-task global window —
``row_number() OVER (ORDER BY …)`` with no partition key funnels every row
through one reducer. The range-partition trick used here keeps the sort
distributed: ``repartitionByRange`` splits the key space into ordered
ranges, ``row_number`` runs per range (parallel), and each range's offset
is the sum of the counts of the ranges before it — a partition-count-sized
aggregate broadcast back. Ids are identical to the global window for any
choice of range boundaries.

* :func:`enumerate_sorted` — contiguous 0-based ids in sort order (the
  engine's J8 node-id primitive, also the backbone of sharded exports);
* :func:`deterministic_shuffle` — training-data shuffling without RNG:
  order by a seeded hash of the key. Same seed → same permutation on any
  cluster, any partitioning, any engine that can md5; changing the seed
  gives a fresh epoch permutation. The standard alternative
  (``orderBy(rand())``) is irreproducible under retries and stage re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["enumerate_sorted", "deterministic_shuffle", "shuffle_hash", "negative_samples"]


def enumerate_sorted(
    df: DataFrame, order_col: str, out_col: str = "seq"
) -> DataFrame:
    """Attach contiguous 0-based ``out_col`` ids in ascending ``order_col``
    order — distributed (see module docstring), deterministic for unique
    keys. Input rows must be unique on ``order_col``."""
    n_ranges = df.sparkSession.sparkContext.defaultParallelism
    # materialize the ranged table ONCE before deriving both branches: the
    # offsets branch is column-pruned, so its exchange is not canonically
    # identical to the local-rank branch's and ReuseExchange may not dedupe
    # them — two executions would sample range boundaries independently and
    # could disagree, making offsets inconsistent with local ranks. An eager
    # localCheckpoint pins one physical partitioning for both consumers (and
    # truncates lineage, as the iterative graph operators already do).
    ranged = (
        df.repartitionByRange(n_ranges, order_col)
        .withColumn("_range", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = ranged.withColumn(
        "_local",
        F.row_number().over(Window.partitionBy("_range").orderBy(order_col)),
    )
    offsets = (
        ranged.groupBy("_range")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_range").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_range", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_range")
        .withColumn(
            out_col, (F.col("_offset") + F.col("_local") - 1).cast("long")
        )
        .drop("_range", "_local", "_offset")
    )


def shuffle_hash(key: Column | str, seed: int = 0) -> Column:
    """Seeded portable order key: md5 of ``seed || key`` as a hex string
    (string comparison ≡ unsigned numeric comparison on the full digest)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))


def deterministic_shuffle(
    df: DataFrame, key: str, seed: int = 0, out_col: str = "seq"
) -> DataFrame:
    """Assign a reproducible pseudo-random training order: rows are
    enumerated in ``shuffle_hash(key, seed)`` order (hash ties broken by the
    key itself). Epochs = different seeds. One range-partitioned sort, no
    RNG, no single-reducer window."""
    with_key = df.withColumn(
        "_shuffle_key",
        F.concat(shuffle_hash(key, seed), F.lit("|"), F.col(key).cast("string")),
    )
    return enumerate_sorted(with_key, "_shuffle_key", out_col).drop("_shuffle_key")


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    seed: int = 0,
    out_col: str = "neg_id",
) -> DataFrame:
    """``k`` deterministic pseudo-random negatives per anchor row — the
    contrastive-training sampling step, without RNG so pairs are stable
    under retries, repartitioning, and cross-engine replay.

    Rows are enumerated in seeded-hash order (:func:`deterministic_shuffle`
    — a permutation that is uncorrelated with the input order), then the
    anchor at position ``r`` pairs with positions ``(r + s_j) mod n`` for
    ``j = 1..k`` with strides ``s_j = floor(j*n/(k+1))``. For ``n > k`` the
    strides are distinct and nonzero, so an anchor never pairs with itself
    and its k negatives are distinct. Because the underlying order is a
    seeded hash permutation, a fixed stride in rank space is a fresh
    pseudo-random pick in id space; a new seed resamples everything.

    Plan: one range-partitioned enumeration + one self-join on rank (the
    bounded ``n`` comes from a count, the only driver-side scalar). Output:
    ``(id_col, j, out_col)`` — k rows per anchor.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    enum = deterministic_shuffle(
        df.select(id_col), id_col, seed=seed, out_col="_r"
    ).localCheckpoint(eager=True)
    n = enum.count()
    if n <= k:
        raise ValueError(
            f"negative_samples needs more rows than negatives (n={n}, k={k})"
        )
    strides = [(j * n) // (k + 1) for j in range(1, k + 1)]
    fanned = enum.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j + 1).alias("j"),
                        ((F.col("_r") + F.lit(s)) % n).alias("_nr"),
                    )
                    for j, s in enumerate(strides)
                ]
            )
        ).alias("_js"),
    ).select(id_col, F.col("_js.j").alias("j"), F.col("_js._nr").alias("_r"))
    neg = enum.select(F.col("_r"), F.col(id_col).alias(out_col))
    return fanned.join(neg, "_r").select(id_col, "j", out_col)
