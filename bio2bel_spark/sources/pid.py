"""NCI-PID (NDEx CX) pipeline, Spark-first.

Parity with ``/root/reference/src/bio2bel/sources/pid.py:66-204``
(``get_graph_from_cx``):

* CX aspects (nodes/edges/nodeAttributes/edgeAttributes) arrive as
  DataFrames (see :func:`bio2bel_spark.ingest.read_cx_aspect`);
* node-attribute pivot (type/alias/member lists keyed by ``po``);
* node resolution to DSL entities: hand-curated family mapping → fplx,
  protein-family member explode (``hgnc.symbol:`` strip + name→id broadcast
  join), CHEBI → Abundance, uniprot → hgnc Protein; hprd/cas skipped;
* 9-way edge-type dispatch (``:172-204``) as a when/otherwise chain;
* source×target×citation cartesian expansion (``product(...)`` at ``:172``,
  J6) — a join fan-out (one CX endpoint can resolve to several members)
  times an ``explode`` over citations.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODULE_NAME = "pid"

BINDS_TYPES = ["in-complex-with", "reacts-with"]
REGULATES_TYPES = [
    "controls-transport-of",
    "controls-transport-of-chemical",
    "chemical-affects",
    "controls-expression-of",
    "controls-production-of",
    "consumption-controlled-by",
    "controls-state-change-of",
    "catalysis-precedes",
]


def pivot_node_attributes(node_attrs: DataFrame) -> DataFrame:
    """CX nodeAttributes rows ``(po, n, v)`` → one row per node with
    ``type``/``alias``/``member`` columns (reference ``:88-101``)."""
    return (
        node_attrs.groupBy("po")
        .agg(
            F.first(F.when(F.col("n") == "type", F.col("v")), ignorenulls=True).alias("type"),
            F.first(F.when(F.col("n") == "alias", F.col("v")), ignorenulls=True).alias("alias"),
            F.first(F.when(F.col("n") == "member", F.col("v")), ignorenulls=True).alias("member"),
        )
    )


def resolve_nodes(
    nodes: DataFrame,
    node_attrs: Optional[DataFrame],
    hgnc_map: Optional[DataFrame] = None,
    family_map: Optional[DataFrame] = None,
    chebi_names: Optional[DataFrame] = None,
) -> DataFrame:
    """CX nodes → resolved entity rows ``(cx_id, namespace, identifier,
    name, dsl_type)``; one CX node may yield several rows (families).

    ``hgnc_map``: (hgnc_symbol, hgnc_id); ``family_map``: (reference,
    fplx_name) standing in for the hand-curated MAPPING dict (``:38-63``);
    ``chebi_names``: (chebi_id, name).
    """
    base = nodes.select(
        F.col("@id").alias("cx_id"), F.col("n").alias("node_name"), F.col("r").alias("reference")
    )
    if node_attrs is not None:
        base = base.join(
            pivot_node_attributes(node_attrs).withColumnRenamed("po", "cx_id"),
            "cx_id",
            "left",
        )
    else:
        base = (
            base.withColumn("type", F.lit(None).cast("string"))
            .withColumn("member", F.lit(None).cast("array<string>"))
        )

    # 1. curated family mapping wins
    if family_map is not None:
        base = base.join(
            F.broadcast(
                family_map.select(
                    F.col("reference"), F.col("fplx_name").alias("__fplx")
                ).dropDuplicates(["reference"])
            ),
            "reference",
            "left",
        )
    else:
        base = base.withColumn("__fplx", F.lit(None).cast("string"))

    fplx = base.filter(F.col("__fplx").isNotNull()).select(
        "cx_id",
        F.lit("fplx").alias("namespace"),
        F.col("__fplx").alias("identifier"),
        F.col("__fplx").alias("name"),
        F.lit("Protein").alias("dsl_type"),
    )

    rest = base.filter(F.col("__fplx").isNull())

    # 2. protein families: explode members, strip 'hgnc.symbol:', map to id
    fam = (
        rest.filter(F.col("member").isNotNull())
        .select("cx_id", F.explode("member").alias("m"))
        .filter(F.col("m").startswith("hgnc.symbol:"))
        .withColumn("hgnc_symbol", F.expr("substring(m, length('hgnc.symbol:') + 1)"))
    )
    if hgnc_map is not None:
        fam = fam.join(
            F.broadcast(hgnc_map.dropDuplicates(["hgnc_symbol"])), "hgnc_symbol", "left"
        ).filter(F.col("hgnc_id").isNotNull())
    else:
        fam = fam.withColumn("hgnc_id", F.lit(None).cast("string")).filter(
            F.col("hgnc_id").isNotNull()
        )
    fam = fam.select(
        "cx_id",
        F.lit("hgnc").alias("namespace"),
        F.col("hgnc_id").alias("identifier"),
        F.col("hgnc_symbol").alias("name"),
        F.lit("Protein").alias("dsl_type"),
    )

    single = rest.filter(F.col("member").isNull()).withColumn(
        "__prefix", F.substring_index("reference", ":", 1)
    ).withColumn("__ident", F.regexp_extract("reference", r"^[^:]+:(.*)$", 1))

    chebi = single.filter(F.col("__prefix") == "CHEBI").select(
        "cx_id",
        F.lit("chebi").alias("namespace"),
        F.col("__ident").alias("identifier"),
        F.col("node_name").alias("name"),
        F.lit("Abundance").alias("dsl_type"),
    )
    if chebi_names is not None:
        chebi = (
            chebi.withColumnRenamed("name", "__fallback")
            .join(
                F.broadcast(
                    chebi_names.select(
                        F.col("chebi_id").alias("identifier"), F.col("name").alias("__n")
                    ).dropDuplicates(["identifier"])
                ),
                "identifier",
                "left",
            )
            .select(
                "cx_id", "namespace", "identifier",
                F.coalesce("__n", "__fallback").alias("name"), "dsl_type",
            )
        )

    uni = single.filter(F.col("__prefix") == "uniprot").select(
        "cx_id", F.col("node_name").alias("hgnc_symbol")
    )
    if hgnc_map is not None:
        uni = uni.join(
            F.broadcast(hgnc_map.dropDuplicates(["hgnc_symbol"])), "hgnc_symbol", "left"
        ).filter(F.col("hgnc_id").isNotNull())
    else:
        uni = uni.withColumn("hgnc_id", F.lit(None).cast("string")).filter(
            F.col("hgnc_id").isNotNull()
        )
    uni = uni.select(
        "cx_id",
        F.lit("hgnc").alias("namespace"),
        F.col("hgnc_id").alias("identifier"),
        F.col("hgnc_symbol").alias("name"),
        F.lit("Protein").alias("dsl_type"),
    )
    return fplx.unionByName(fam).unionByName(chebi).unionByName(uni)


def citations_per_edge(edge_attrs: Optional[DataFrame]) -> Optional[DataFrame]:
    """edgeAttributes → ``(edge_id, citation)`` with the ``pubmed:`` prefix
    stripped (reference ``:103-105``)."""
    if edge_attrs is None:
        return None
    return (
        edge_attrs.filter(F.col("n") == "citation")
        .select(F.col("po").alias("edge_id"), F.explode("v").alias("c"))
        .select(
            "edge_id",
            F.expr("substring(c, length('pubmed:') + 1)").alias("citation"),
        )
    )


def to_edges(
    edges: DataFrame,
    resolved_nodes: DataFrame,
    edge_attrs: Optional[DataFrame] = None,
    network_uuid: str = "unknown",
) -> DataFrame:
    """CX edges → qualified BEL-style edges with the cartesian fan-out."""
    e = edges.select(
        F.col("@id").alias("edge_id"),
        F.col("s").alias("s_cx"),
        F.col("t").alias("t_cx"),
        F.col("i").alias("edge_type"),
    )
    src = resolved_nodes.select(
        F.col("cx_id").alias("s_cx"),
        F.col("namespace").alias("source_ns"),
        F.col("identifier").alias("source_id"),
        F.col("name").alias("source_name"),
        F.col("dsl_type").alias("source_dsl"),
    )
    dst = resolved_nodes.select(
        F.col("cx_id").alias("t_cx"),
        F.col("namespace").alias("target_ns"),
        F.col("identifier").alias("target_id"),
        F.col("name").alias("target_name"),
        F.col("dsl_type").alias("target_dsl"),
    )
    # J6 cartesian expansion: endpoint fan-out via join multiplicity
    out = e.join(src, "s_cx").join(dst, "t_cx")

    cits = citations_per_edge(edge_attrs)
    if cits is not None:
        out = out.join(cits, "edge_id", "left")
    else:
        out = out.withColumn("citation", F.lit(None).cast("string"))
    out = out.withColumn(
        "citation", F.coalesce("citation", F.lit(f"ndex:{network_uuid}"))
    )

    t = F.col("edge_type")
    relation = (
        F.when(t.isin(BINDS_TYPES), F.lit("binds"))
        .when(t == "controls-phosphorylation-of", F.lit("regulates"))
        .when(t.isin(REGULATES_TYPES), F.lit("regulates"))
        .when(t == "used-to-produce", F.lit("hasProduct"))
    )
    variant = F.when(t == "controls-phosphorylation-of", F.lit("Ph"))
    obj_mod = F.when(t == "chemical-affects", F.lit("act()"))

    return (
        out.withColumn("relation", relation)
        .filter(F.col("relation").isNotNull())
        .withColumn("variant_name", variant)
        .withColumn("target_modifier", obj_mod)
        .withColumn("evidence", F.col("edge_id").cast("string"))
        .select(
            "source_ns", "source_id", "source_name", "source_dsl",
            "relation",
            "target_ns", "target_id", "target_name", "target_dsl",
            "variant_name", "target_modifier", "citation", "evidence",
        )
    )
