"""HMDD (miRNA–disease) pipeline, Spark-first.

Parity with ``/root/reference/src/bio2bel/sources/hmdd.py``:

* the reference grounds the DISTINCT miRNA/disease strings at the driver
  with ``pyobo.ground`` plus comma-swap retry heuristics (``:34-75``), then
  maps rows through the resulting dicts. Here that becomes the
  distinct→ground→broadcast-join-back pattern (F8): grounding is a
  DataFrame ``grounding(text, prefix, identifier, name)`` (pre-materialized
  vocabulary — FIXTURES.md §6), and the comma-swap retries are columnar
  alternate join keys tried in preference order via coalesce;
* ungroundable rows are skipped (``:79-82``) → rejects side-output;
* surviving rows emit ``regulates`` edges MicroRna → Pathology with the
  pmid citation and the description as evidence (``:83-89``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODULE_NAME = "hmdd"


def _comma_swap(col):
    """First comma-swap retry: ``'left, right'`` → ``'right left'``
    (reference ``:57-60``)."""
    i = F.instr(col, ", ")
    left = F.substring(col, F.lit(1), i - 1)
    right = F.substring(col, i + 2, F.lit(1 << 20))
    return F.when(i > 0, F.concat_ws(" ", right, left))


def _comma_swap_all(col):
    """Second retry: reverse ALL comma-separated chunks (reference ``:61-62``)."""
    return F.when(
        col.contains(","),
        F.array_join(
            F.reverse(F.transform(F.split(col, ","), lambda x: F.trim(x))), " "
        ),
    )


def ground_column(
    df: DataFrame, text_col: str, grounding: DataFrame, out_prefix: str
) -> DataFrame:
    """Ground a free-text column via broadcast joins with retry keys.

    Join priority: exact text, single comma-swap, full reversal — mirroring
    the reference's retry cascade, but as three broadcast left joins over the
    whole column instead of per-distinct-string Python calls.
    """
    g = F.broadcast(
        grounding.select(
            F.col("text").alias("__g_text"),
            F.col("prefix").alias(f"{out_prefix}_ns0"),
            F.col("identifier").alias(f"{out_prefix}_id0"),
            F.col("name").alias(f"{out_prefix}_name0"),
        ).dropDuplicates(["__g_text"])
    )
    out = df
    for attempt, key in enumerate(
        [F.col(text_col), _comma_swap(F.col(text_col)), _comma_swap_all(F.col(text_col))]
    ):
        gg = g
        for c in (f"{out_prefix}_ns0", f"{out_prefix}_id0", f"{out_prefix}_name0"):
            gg = gg.withColumnRenamed(c, c[:-1] + str(attempt))
        out = (
            out.withColumn("__g_text", key)
            .join(gg, "__g_text", "left")
            .drop("__g_text")
        )
    for field in ("ns", "id", "name"):
        out = out.withColumn(
            f"{out_prefix}_{field}",
            F.coalesce(*[F.col(f"{out_prefix}_{field}{i}") for i in range(3)]),
        ).drop(*[f"{out_prefix}_{field}{i}" for i in range(3)])
    return out


def process(
    raw: DataFrame, mirna_grounding: DataFrame, disease_grounding: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """raw ``(category, mir, disease, pmid, description)`` → (edges, rejects)."""
    df = ground_column(raw, "mir", mirna_grounding, "source")
    df = ground_column(df, "disease", disease_grounding, "target")

    bad = F.col("source_id").isNull() | F.col("target_id").isNull()
    rejects = df.filter(bad).select(
        "category", "mir", "disease", "pmid", "description",
        F.when(F.col("source_id").isNull(), F.lit("ungrounded_mirna"))
        .otherwise(F.lit("ungrounded_disease"))
        .alias("reject_reason"),
    )
    edges = df.filter(~bad).select(
        F.col("source_ns"),
        F.col("source_id"),
        F.col("source_name"),
        F.lit("regulates").alias("relation"),
        F.col("target_ns"),
        F.col("target_id"),
        F.col("target_name"),
        F.lit("MicroRna").alias("source_dsl"),
        F.lit("Pathology").alias("target_dsl"),
        F.col("pmid").alias("citation"),
        F.col("description").alias("evidence"),
    )
    return edges, rejects
