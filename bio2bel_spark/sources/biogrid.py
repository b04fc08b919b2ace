"""BioGRID MITAB pipeline, Spark-first.

Parity with ``/root/reference/src/bio2bel/sources/biogrid.py``:

* strict pubmed extraction (``_process_pmid``, ``:199-203``) — non-pubmed
  rows go to the rejects side-output instead of raising row-by-row;
* interactor → ncbigene normalization (``_process_interactor``, ``:143-173``):
  CURIE parse (F1) + biogrid→ncbigene broadcast mapping + the hand-curated
  remapping tables, with unmapped rows rejected (``:246-247`` skip);
* xref list splitting (``_iter_process_xrefs``, ``:176-196``) available via
  :func:`bio2bel_spark.functions.extractors.split_curies`;
* 3-way relation dispatch (``:287-312``): genetic-interaction set →
  Gene/Gene association; association set → Protein association; direct
  interaction → binds.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bio2bel_spark.functions.curie import normalize_curie_cols

MODULE_NAME = "biogrid"
EVIDENCE = "From BioGRID"

RAW_COLUMNS = [
    "interactor_a", "interactor_b", "interaction_type",
    "publications", "detection_method", "source_database", "confidence",
]


def _mi(code: str, label: str) -> str:
    return f'psi-mi:"MI:{code}"({label})'


#: genetic interactions → association between Gene nodes (reference :89-94)
GENE_ASSOCIATION = [
    _mi("0794", "synthetic genetic interaction defined by inequality"),
    _mi("0799", "additive genetic interaction defined by inequality"),
    _mi("0796", "suppressive genetic interaction defined by inequality"),
]
#: physical/colocalization → association between Proteins (reference :96-104)
ASSOCIATION_ACTIONS = [
    _mi("0403", "colocalization"),
    _mi("0914", "association"),
    _mi("0915", "physical association"),
]
#: direct interaction → binds (reference :106-109)
BINDS_ACTIONS = [_mi("0407", "direct interaction")]


def process(
    spark: SparkSession,
    raw: DataFrame,
    biogrid_ncbigene: Optional[DataFrame] = None,
    uniprot_ncbigene: Optional[DataFrame] = None,
) -> tuple[DataFrame, DataFrame]:
    """raw MITAB → (edges, rejects).

    ``biogrid_ncbigene``: ``(biogrid_id, ncbigene_id)`` broadcast mapping
    (stands in for ``pyobo.sources.biogrid.get_ncbigene_mapping`` plus the
    hand-curated BIOGRID_NCBIGENE_REMAPPING); ``uniprot_ncbigene`` likewise
    for UNIPROT_NCBIGENE_REMAPPING.
    """

    def normalize(df: DataFrame, col: str, out: str) -> DataFrame:
        prefix, ident = normalize_curie_cols(col)
        df = df.withColumn(f"__{out}_prefix", prefix).withColumn(f"__{out}_raw", ident)
        for mapping, key in ((biogrid_ncbigene, "biogrid"), (uniprot_ncbigene, "uniprot")):
            alias = f"__{out}_{key}_mapped"
            if mapping is None:
                df = df.withColumn(alias, F.lit(None).cast("string"))
                continue
            cols = mapping.columns
            m = mapping.select(
                F.col(cols[0]).alias("__k"), F.col(cols[1]).alias(alias)
            ).dropDuplicates(["__k"])
            df = (
                df.withColumn(
                    "__k",
                    F.when(F.col(f"__{out}_prefix") == key, F.col(f"__{out}_raw")),
                )
                .join(F.broadcast(m), "__k", "left")
                .drop("__k")
            )
        resolved = (
            F.when(F.col(f"__{out}_prefix") == "ncbigene", F.col(f"__{out}_raw"))
            .when(F.col(f"__{out}_prefix") == "biogrid", F.col(f"__{out}_biogrid_mapped"))
            .when(F.col(f"__{out}_prefix") == "uniprot", F.col(f"__{out}_uniprot_mapped"))
        )
        return df.withColumn(out, resolved).drop(
            *[c for c in df.columns if c.startswith(f"__{out}_")]
        )

    parsed = normalize(raw, "interactor_a", "source_ncbigene_id")
    parsed = normalize(parsed, "interactor_b", "target_ncbigene_id")
    parsed = parsed.withColumn(
        "citation",
        F.when(
            F.col("publications").startswith("pubmed:"),
            F.col("publications"),
        ),
    )

    relation = (
        F.when(F.col("interaction_type").isin(GENE_ASSOCIATION), F.lit("association"))
        .when(F.col("interaction_type").isin(ASSOCIATION_ACTIONS), F.lit("association"))
        .when(F.col("interaction_type").isin(BINDS_ACTIONS), F.lit("binds"))
    )
    dsl = F.when(
        F.col("interaction_type").isin(GENE_ASSOCIATION), F.lit("Gene")
    ).otherwise(F.lit("Protein"))

    parsed = parsed.withColumn("relation", relation).withColumn("node_dsl", dsl)

    bad_id = F.col("source_ncbigene_id").isNull() | F.col("target_ncbigene_id").isNull()
    bad_pub = F.col("citation").isNull()
    bad_rel = F.col("relation").isNull()

    rejects = parsed.filter(bad_id | bad_pub | bad_rel).select(
        *RAW_COLUMNS,
        F.when(bad_pub, F.lit("non_pubmed_provenance"))
        .when(bad_id, F.lit("unmapped_interactor"))
        .otherwise(F.lit("unhandled_relation"))
        .alias("reject_reason"),
    )

    edges = (
        parsed.filter(~bad_id & ~bad_pub & ~bad_rel)
        .withColumn(
            "annotations",
            F.create_map(
                F.lit("psi-mi"), F.col("interaction_type"),
                F.lit("biogrid-detection"), F.col("detection_method"),
                F.lit("biogrid-source"), F.col("source_database"),
                F.lit("biogrid-confidence"), F.col("confidence"),
            ),
        )
        .select(
            F.lit("ncbigene").alias("source_ns"),
            F.col("source_ncbigene_id").alias("source_id"),
            F.col("relation"),
            F.lit("ncbigene").alias("target_ns"),
            F.col("target_ncbigene_id").alias("target_id"),
            F.col("node_dsl"),
            "citation",
            F.lit(EVIDENCE).alias("evidence"),
            "annotations",
        )
    )
    return edges, rejects
