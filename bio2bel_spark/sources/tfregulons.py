"""TFregulons (DoRothEA) pipeline, Spark-first.

Parity with ``/root/reference/src/bio2bel/sources/tfregulons.py``:

* score filter A/B/C (``:43``) — P7;
* HGNC symbol→id mapping for TF and target via broadcast join (``:45-47``,
  F6) with null-id rows dropped (``:49-59``);
* effect 0 rows skipped (``:92-93``);
* per-citation fan-out (``:107-110,114-131``) — ``explode`` (UDTF-like);
* per citation, THREE edges: complex(tf, target_gene) →
  directly-increases/decreases→ target_rna; tf →increases/decreases→
  target_rna; target_gene →transcribedTo→ target_rna (``:115-131``).

The whole pipeline is broadcast-join + explode: zero shuffles.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODULE_NAME = "tfregulons"
EVIDENCE = "From TFregulons"
KEEP_SCORES = ["A", "B", "C"]


def prepare(raw: DataFrame, hgnc_map: DataFrame) -> DataFrame:
    """Filter + ground the raw table (reference ``_read_df``).

    ``raw``: columns ``tf_hgnc_symbol, target_hgnc_symbol, effect, score,
    pmids`` (FIXTURES.md §5). ``hgnc_map``: ``(hgnc_symbol, hgnc_id)``.
    """
    df = raw.filter(F.col("score").isin(KEEP_SCORES))
    m = F.broadcast(hgnc_map.dropDuplicates(["hgnc_symbol"]))
    df = (
        df.join(
            m.select(
                F.col("hgnc_symbol").alias("tf_hgnc_symbol"),
                F.col("hgnc_id").alias("tf_hgnc_id"),
            ),
            "tf_hgnc_symbol",
            "left",
        )
        .join(
            m.select(
                F.col("hgnc_symbol").alias("target_hgnc_symbol"),
                F.col("hgnc_id").alias("target_hgnc_id"),
            ),
            "target_hgnc_symbol",
            "left",
        )
        .filter(F.col("tf_hgnc_id").isNotNull() & F.col("target_hgnc_id").isNotNull())
    )
    return df


def to_edges(prepared: DataFrame) -> DataFrame:
    """Effect dispatch + citation fan-out → qualified edges."""
    df = prepared.filter(F.col("effect") != 0).withColumn(
        "citation",
        F.explode(F.transform(F.split(F.col("pmids"), ","), lambda x: F.trim(x))),
    )
    up = F.col("effect") == 1
    complex_edge = df.select(
        F.lit("complex").alias("source_ns"),
        F.concat_ws("_", "tf_hgnc_id", "target_hgnc_id").alias("source_id"),
        F.col("tf_hgnc_symbol").alias("source_name"),
        F.when(up, "directlyIncreases").otherwise("directlyDecreases").alias("relation"),
        F.lit("hgnc").alias("target_ns"),
        F.col("target_hgnc_id").alias("target_id"),
        F.col("target_hgnc_symbol").alias("target_name"),
        F.lit("Rna").alias("target_dsl"),
        "citation",
    )
    expression_edge = df.select(
        F.lit("hgnc").alias("source_ns"),
        F.col("tf_hgnc_id").alias("source_id"),
        F.col("tf_hgnc_symbol").alias("source_name"),
        F.when(up, "increases").otherwise("decreases").alias("relation"),
        F.lit("hgnc").alias("target_ns"),
        F.col("target_hgnc_id").alias("target_id"),
        F.col("target_hgnc_symbol").alias("target_name"),
        F.lit("Rna").alias("target_dsl"),
        "citation",
    )
    transcription_edge = df.select(
        F.lit("hgnc").alias("source_ns"),
        F.col("target_hgnc_id").alias("source_id"),
        F.col("target_hgnc_symbol").alias("source_name"),
        F.lit("transcribedTo").alias("relation"),
        F.lit("hgnc").alias("target_ns"),
        F.col("target_hgnc_id").alias("target_id"),
        F.col("target_hgnc_symbol").alias("target_name"),
        F.lit("Rna").alias("target_dsl"),
        "citation",
    ).dropDuplicates(["source_id", "target_id"])
    return (
        complex_edge.unionByName(expression_edge)
        .unionByName(transcription_edge)
        .withColumn("evidence", F.lit(EVIDENCE))
    )


def enrich_targets(prepared: DataFrame, hgnc_ids: DataFrame) -> DataFrame:
    """Dynamic enrichment (``enrich_graph``, ``:81-87``): keep rows whose
    target is in the given id set — a broadcast left-semi join (P12)."""
    return prepared.join(
        F.broadcast(hgnc_ids.select(F.col("hgnc_id").alias("target_hgnc_id"))),
        "target_hgnc_id",
        "left_semi",
    )
