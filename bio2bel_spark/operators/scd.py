"""Slowly-changing-dimension (Type 2) maintenance.

Beyond-reference extension (SURVEY §7.2): the reference's upsert (A7)
overwrites in place; a warehouse feeding training snapshots needs HISTORY —
every attribute change closes the old version and opens a new one, so any
past training run can be reproduced by filtering ``valid_from <= t <
valid_to``.

Design for 100 TB: one key-keyed outer join between the OPEN slice of the
dimension and the update batch, then three union branches (untouched open
rows, closed-out versions, new versions) — all projections of that single
join. Closed history rows never join anything (they are appended through
unchanged), so batch cost is O(open + updates), not O(history).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "cdc_apply"]


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to a Type-2 dimension and return the NEW full
    dimension table.

    ``current`` carries ``key_cols + tracked_cols + (valid_from, valid_to)``
    with ``valid_to IS NULL`` marking the open version of each key — AT
    MOST ONE open row per key (the Type-2 invariant this function itself
    maintains; feeding it a dimension that violates it duplicates that
    key's output rows).
    ``updates`` carries ``key_cols + tracked_cols + effective_col`` with AT
    MOST one row per key (pre-collapse a multi-row batch with a
    latest-per-key window first). Semantics per update key:

    * no open row → a new open version starting at ``effective_col``;
    * open row with any tracked attribute different → the open row closes at
      ``effective_col`` and a new open version starts there;
    * open row with identical attributes → no-op (idempotent re-delivery).

    NULL-safe comparison (``eqNullSafe``) decides "different", so a NULL
    attribute transitioning to a value (or back) versions correctly.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    if not keys or not tracked:
        # an empty tracked list would leave the change predicate undefined
        # (every update would look like a no-op AND a change); fail loudly
        # instead of raising an opaque TypeError mid-plan.
        raise ValueError("key_cols and tracked_cols must be non-empty")
    closed = current.where(F.col(valid_to).isNotNull())
    open_ = current.where(F.col(valid_to).isNull())

    u = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in keys],
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        F.col(effective_col).alias("__eff"),
    )
    cond = [F.col(k) == F.col(f"__u_{k}") for k in keys]
    j = open_.join(u, cond, "full_outer")

    same = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        same = eq if same is None else (same & eq)
    has_open = F.col(valid_from).isNotNull()
    has_upd = F.col("__eff").isNotNull()

    # open rows that survive untouched: no update, or identical attributes
    untouched = j.where(has_open & (~has_upd | same)).select(
        *keys, *tracked, valid_from, F.col(valid_to)
    )
    # open rows closed out by a genuine change
    closed_now = j.where(has_open & has_upd & ~same).select(
        *keys, *tracked, valid_from, F.col("__eff").alias(valid_to)
    )
    # new versions: brand-new keys, or the replacement after a change
    opened = j.where(has_upd & (~has_open | ~same)).select(
        *[F.col(f"__u_{k}").alias(k) for k in keys],
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
    )
    return (
        closed.select(*keys, *tracked, valid_from, valid_to)
        .unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture feed to a snapshot (the MERGE pattern):
    ``changes`` rows carry ``op`` ∈ {'I','U','D'} and a monotonically
    increasing ``seq_col``; per key only the HIGHEST-sequence change wins
    (late-arriving duplicates and replays collapse), then inserts/updates
    overwrite and deletes remove.

    Plan: per-key latest-change window (WindowGroupLimit — no full sort),
    one key-keyed full-outer join against the base, one projection. Base
    rows without changes pass through; 'I' and 'U' are deliberately
    symmetric (upsert semantics — a replayed insert after an update must
    not resurrect old attributes).

    Returns the new snapshot with ``key_cols`` plus the change feed's
    payload columns (the base must carry the same payload columns — the
    usual CDC contract where the feed mirrors the table schema).
    """
    keys = list(key_cols)
    payload = [
        c for c in changes.columns if c not in {*keys, seq_col, op_col}
    ]
    from pyspark.sql import Window

    # op + payload break exact-sequence ties deterministically; the real
    # contract is still a unique seq per (key, change) — equal seqs have no
    # defined winner in any CDC system, this just pins ONE engine-stable
    # choice instead of a partition-order lottery
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.col(op_col).desc(),
        F.struct(*[F.col(c) for c in payload]).desc(),
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(k).alias(f"__ck_{k}") for k in keys],
            *[F.col(c).alias(f"__c_{c}") for c in payload],
            F.col(op_col).alias("__op"),
        )
    )
    cond = [F.col(k) == F.col(f"__ck_{k}") for k in keys]
    j = base.join(latest, cond, "full_outer")
    has_change = F.col("__op").isNotNull()
    keep = ~has_change | (F.col("__op") != "D")
    out_cols = [
        F.coalesce(F.col(f"__ck_{k}"), F.col(k)).alias(k) for k in keys
    ] + [
        F.when(has_change, F.col(f"__c_{c}")).otherwise(F.col(c)).alias(c)
        for c in payload
    ]
    return j.where(keep).select(*out_cols)
