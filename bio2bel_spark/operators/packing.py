"""Sequence packing: group documents into context-window-sized bins.

Beyond-reference extension (SURVEY §7.2): LLM pretraining concatenates
documents and slices the token stream into fixed-size context windows.
Two packers, two cost/quality points:

* :func:`pack_concat_chunks` — the GPT-style "concatenate then chunk"
  packer: documents are laid out in a deterministic order inside each
  ``by`` group and assigned ``pack_id = floor(cumulative_tokens_before /
  budget)``. A document that straddles a boundary starts the next pack
  (no splitting — the conservative variant). Pure window arithmetic, ONE
  shuffle, partitioned by the group key — no global sort, so the plan
  scales with the number of groups, not corpus size. SQL-expressible →
  DuckDB-oracle-checkable.
* :func:`pack_first_fit` — greedy first-fit-decreasing bin packing per
  group (tighter packs, canonical NP-hard heuristic). Inherently
  sequential within a group → Arrow-batched ``applyInPandas`` per group
  key; deterministic (sort by tokens desc, then id). Not expressible in
  one SQL pass — the driver records the weaker rows-only check for it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pack_concat_chunks",
    "pack_first_fit",
    "chunk_spans",
    "sliding_window_spans",
    "select_token_budget",
]


def select_token_budget(
    df: DataFrame,
    quality_col: str,
    tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
) -> DataFrame:
    """EXACT quality-ranked corpus selection under a global token budget:
    keep the highest-``quality_col`` documents whose running token total
    stays ≤ ``budget`` — the data-selection step of every
    quality-filtered pretraining mix ("take the best N tokens"), with the
    document that would cross the budget excluded.

    Scale shape — a GLOBAL running sum without a global single-partition
    window (the naive ``sum() OVER (ORDER BY quality)`` funnels 100 TB
    through one reducer):

    1. ``repartitionByRange`` on ``(quality desc, id)`` — the one
       range shuffle any global ranking pays; ties broken by id so the
       total order (and therefore the cut) is deterministic;
    2. per-partition token subtotals → prefix OFFSETS on the driver
       (bounded: one row per partition);
    3. partitions whose offset already exceeds ``budget`` prune entirely
       (their filter is constant-false — at a tight budget most of the
       corpus never evaluates the window); within surviving partitions a
       partition-local cumulative window adds the offset.

    Returns the selected rows plus ``cum_tokens`` (the inclusive global
    running total). Rows with NULL quality or tokens are excluded (they
    cannot be ordered / budgeted).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    base = df.where(
        F.col(quality_col).isNotNull() & F.col(tokens_col).isNotNull()
    )
    ranged = base.repartitionByRange(
        n_parts, F.col(quality_col).desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=True)  # pin partitioning: the
    # subtotal pass and the window pass must see the SAME pid assignment
    subtotals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    # constant-fold the per-partition offset and prune exhausted partitions
    off_expr = F.lit(0).cast("long")
    live = [pid for pid in sorted(subtotals) if offsets[pid] < budget]
    for pid in live:
        off_expr = F.when(F.col("__pid") == pid, F.lit(int(offsets[pid]))).otherwise(off_expr)
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.where(F.col("__pid").isin(live) if live else F.lit(False))
        .withColumn(
            "cum_tokens",
            (off_expr + F.sum(tokens_col).over(w)).cast("long"),
        )
        .where(F.col("cum_tokens") <= budget)
        .drop("__pid")
    )


def chunk_spans(
    docs: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-offset chunk spans per document: the splitting complement of
    :func:`pack_concat_chunks`. A document of T tokens yields
    ``ceil(T/budget)`` rows ``(… , chunk_idx, chunk_start, chunk_tokens)``;
    the last chunk carries the remainder, and a zero-token document yields
    one empty chunk (so no document silently disappears).

    Map-only explode — fan-out is ``tokens/budget`` per row, no shuffle at
    all; the downstream tokenizer slices ``[chunk_start, chunk_start +
    chunk_tokens)`` out of each document.
    """
    n_chunks = F.greatest(
        F.ceil(F.col(token_col) / F.lit(budget)).cast("long"), F.lit(1)
    )
    return (
        docs.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)),
        )
        .withColumn("chunk_start", F.col("chunk_idx") * budget)
        .withColumn(
            "chunk_tokens",
            F.greatest(
                F.least(
                    F.lit(budget).cast("long"),
                    F.col(token_col) - F.col("chunk_start"),
                ),
                F.lit(0).cast("long"),
            ),
        )
    )


def pack_concat_chunks(
    docs: DataFrame,
    token_col: str,
    budget: int,
    by: str = "source",
    order: str = "doc_id",
) -> DataFrame:
    """Assign each document a ``pack_id`` within its ``by`` group.

    ``pack_id = floor(running_token_total_before_this_doc / budget)`` over
    the group ordered by ``order`` — i.e. the pack a concatenated token
    stream would place the document's first token in. Oversized documents
    (> budget) still get exactly one pack.
    """
    w = (
        Window.partitionBy(by)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("long")
    )


def pack_first_fit(
    docs: DataFrame,
    token_col: str,
    budget: int,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-fit-decreasing packing per group via ``applyInPandas``.

    Each group is processed by one task: documents sorted by (tokens desc,
    id asc) drop into the first open pack with room; a document larger than
    the budget gets a singleton pack. Output adds ``pack_id`` (dense ids in
    first-opened order) — deterministic for fixed input data.

    Scale note: state is one int per open pack and groups are processed
    independently, so the operator scales with the largest single group —
    choose ``by`` with bounded group size (e.g. source × date shard).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(docs.schema.fields) + [StructField("pack_id", LongType())]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []  # remaining capacity per open pack
        assigned = []
        for tok in pdf[token_col]:
            placed = None
            for i, cap in enumerate(remaining):
                if tok <= cap:
                    placed = i
                    break
            if placed is None:
                remaining.append(max(budget - tok, 0))
                placed = len(remaining) - 1
            else:
                remaining[placed] -= tok
            assigned.append(placed)
        pdf["pack_id"] = pd.Series(assigned, dtype="int64")
        return pdf

    return docs.groupBy(by).applyInPandas(_pack, schema=schema)


def sliding_window_spans(
    docs: DataFrame,
    token_col: str,
    window: int,
    stride: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping training windows per document: spans of ``window`` tokens
    every ``stride`` tokens (the context-window construction used when
    training must not lose cross-chunk context — stride < window overlaps
    consecutive spans by ``window - stride`` tokens).

    Span starts are ``0, stride, 2*stride, …`` up to the LAST start that
    still begins inside the document; the final window is truncated at the
    document end (no padding here — padding is the packer's job). A
    zero-token document yields one empty span so no document disappears.
    Map-only explode like :func:`chunk_spans` — fan-out ``≈ tokens/stride``
    per row, no shuffle.
    """
    if stride <= 0 or window <= 0:
        raise ValueError(f"window and stride must be positive, got {window}, {stride}")
    n_windows = F.greatest(
        (F.ceil((F.col(token_col) - F.lit(window)) / F.lit(stride)) + 1)
        .cast("long"),
        F.lit(1),
    )
    return (
        docs.withColumn(
            "window_idx",
            F.explode(F.sequence(F.lit(0).cast("long"), n_windows - 1)),
        )
        .withColumn("window_start", F.col("window_idx") * stride)
        .withColumn(
            "window_tokens",
            F.greatest(
                F.least(
                    F.lit(window).cast("long"),
                    F.col(token_col) - F.col("window_start"),
                ),
                F.lit(0).cast("long"),
            ),
        )
    )
