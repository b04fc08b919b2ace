"""GO gene-association pipeline, Spark-first.

Parity with ``/root/reference/src/bio2bel/sources/go.py``:

* association table filters (``get_gene_associations_df``, ``:36-86``):
  taxonomy == 9606 (P10), ``UniProtKB:`` prefix filter (P9) + strip (F5),
  uniprot→hgnc broadcast join with null drop (``:81-82``), hgnc→ncbigene
  strict join (``:84`` — ``__getitem__`` raises on miss, so the join is
  inner), ``GO:`` prefix strip (``:85``);
* association edges Protein↔BiologicalProcess (``_enrich_graph_with_df``);
* subhierarchy edges (``_enrich_graph_with_hierarchy``, ``:106-122``) from an
  ontology edge table via the distributed BFS in
  :meth:`bio2bel_spark.operators.graph.KnowledgeGraph.descendants`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bio2bel_spark.functions.extractors import strip_prefix
from bio2bel_spark.operators.graph import KnowledgeGraph

MODULE_NAME = "go"
HUMAN_TAXONOMY = "9606"


def process_associations(
    raw: DataFrame,
    uniprot_hgnc: DataFrame,
    hgnc_ncbigene: DataFrame,
) -> DataFrame:
    """raw ``(source_id, source_name, taxonomy_id, target_id, target_label,
    negated)`` → grounded association rows."""
    df = (
        raw.filter(F.col("taxonomy_id") == HUMAN_TAXONOMY)
        .filter(F.col("source_id").startswith("UniProtKB:"))
        .withColumn("uniprot_id", strip_prefix("source_id", "UniProtKB:"))
        .drop("source_id", "taxonomy_id")
    )
    df = df.join(
        F.broadcast(uniprot_hgnc.dropDuplicates(["uniprot_id"])), "uniprot_id", "left"
    ).filter(F.col("hgnc_id").isNotNull())
    # strict xref: reference uses dict.__getitem__ (raises on miss) → inner join
    df = df.join(
        F.broadcast(hgnc_ncbigene.dropDuplicates(["hgnc_id"])), "hgnc_id", "inner"
    )
    return df.withColumn("go_id", strip_prefix("target_id", "GO:")).drop("target_id")


def to_edges(processed: DataFrame) -> DataFrame:
    """Association edges Protein(ncbigene) ↔ BiologicalProcess(go)."""
    return processed.select(
        F.lit("ncbigene").alias("source_ns"),
        F.col("ncbigene_id").alias("source_id"),
        F.col("source_name").alias("source_name"),
        F.lit("association").alias("relation"),
        F.lit("go").alias("target_ns"),
        F.col("go_id").alias("target_id"),
        F.col("target_label").alias("target_name"),
        F.lit("Protein").alias("source_dsl"),
        F.lit("BiologicalProcess").alias("target_dsl"),
    )


def subhierarchy_edges(ontology_edges: DataFrame, root_go_id: str) -> DataFrame:
    """is_a/part_of edges restricted to the subhierarchy under one term
    (``:106-122``): BFS downward from the root, then keep edges whose child
    AND parent are inside the reached set."""
    roots = ontology_edges.sparkSession.createDataFrame(
        [(root_go_id,)], "node string"
    )
    reached = KnowledgeGraph.descendants(ontology_edges, roots)
    inside = (
        ontology_edges.join(
            F.broadcast(reached.withColumnRenamed("node", "child")), "child", "left_semi"
        ).join(
            F.broadcast(reached.withColumnRenamed("node", "parent")), "parent", "left_semi"
        )
    )
    return inside.filter(F.col("relation").isin(["is_a", "part_of"])).select(
        F.lit("go").alias("source_ns"),
        F.col("child").alias("source_id"),
        F.when(F.col("relation") == "is_a", "isA").otherwise("partOf").alias("relation"),
        F.lit("go").alias("target_ns"),
        F.col("parent").alias("target_id"),
        F.lit("BiologicalProcess").alias("source_dsl"),
        F.lit("BiologicalProcess").alias("target_dsl"),
    )
