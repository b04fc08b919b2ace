"""INDRA statement export (SURVEY §2.10 G6).

The reference delegates to ``pybel.to_indra``
(``/root/reference/src/bio2bel/manager/bel_manager.py:96-102``), which turns
BEL edges into INDRA Statement objects. Without the INDRA/pybel packages the
engine emits the neutral dict shape of a statement — type, subject, object,
evidence. Two tiers:

* :func:`indra_statements_df` / :func:`write_indra_ndjson` — the FULL
  export, distributed: the relation→statement-type dispatch is a literal
  map lookup in codegen and the NDJSON sink is a plain text write, so a
  100 TB edge table exports with no driver involvement (closes the
  round-6 "full export hits the cap" gap);
* :func:`to_indra_statements` — the reference-parity OBJECT list (a
  python list, like ``pybel.to_indra``'s Statement list), which is
  inherently driver-side and therefore stays capped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: BEL relation → INDRA statement type (public INDRA ontology naming)
RELATION_TO_STATEMENT = {
    "increases": "Activation",
    "directlyIncreases": "Activation",
    "decreases": "Inhibition",
    "directlyDecreases": "Inhibition",
    "regulates": "RegulateActivity",
    "association": "Association",
    "binds": "Complex",
    "partOf": "Complex",
}

#: refuse to collect more than this many edges to the driver
MAX_STATEMENTS = 100_000


def to_indra_statements(edges: DataFrame, limit: int = MAX_STATEMENTS) -> list[dict]:
    """Collected INDRA-shaped statements from a (small) edges DataFrame.

    Guards the driver: raises if the edge set exceeds ``limit`` — exporting a
    100 TB edge table through this path is a design error; write parquet/TSV
    instead and convert downstream.
    """
    n = edges.limit(limit + 1).count()
    if n > limit:
        raise ValueError(
            f"to_indra_statements collects to the driver; {n}+ edges exceed "
            f"the {limit} cap — export with io.sinks instead"
        )
    out = []
    cols = set(edges.columns)
    for row in edges.collect():
        stmt_type = RELATION_TO_STATEMENT.get(row["relation"])
        if stmt_type is None:
            continue
        stmt = {
            "type": stmt_type,
            "subj": {
                "db": row["source_ns"],
                "id": row["source_id"],
                "name": row["source_name"] if "source_name" in cols else None,
            },
            "obj": {
                "db": row["target_ns"],
                "id": row["target_id"],
                "name": row["target_name"] if "target_name" in cols else None,
            },
            "evidence": {
                "pmid": row["citation"] if "citation" in cols else None,
                "text": row["evidence"] if "evidence" in cols else None,
            },
        }
        out.append(stmt)
    return out


def indra_statements_df(edges: DataFrame) -> DataFrame:
    """Distributed INDRA-shaped statement table — the uncapped export.

    One row per convertible edge: ``(stmt_type, subj_db, subj_id,
    subj_name, obj_db, obj_id, obj_name, pmid, text)``. Edges whose BEL
    relation has no INDRA statement type are DROPPED, matching
    ``pybel.to_indra``'s skip-unconvertible behavior (and this module's
    collected tier). The dispatch is a literal ``map`` lookup evaluated in
    whole-stage codegen — no UDF, no shuffle; missing optional columns
    (``source_name``/``citation``/``evidence``) surface as NULLs, exactly
    as the collected tier emits None.
    """
    m = []
    for k, v in RELATION_TO_STATEMENT.items():
        m.extend([F.lit(k), F.lit(v)])
    stmt_type = F.create_map(*m)[F.col("relation")]
    cols = set(edges.columns)
    opt = lambda c: (  # noqa: E731
        F.col(c) if c in cols else F.lit(None).cast("string")
    )
    return (
        edges.withColumn("stmt_type", stmt_type)
        .filter(F.col("stmt_type").isNotNull())
        .select(
            "stmt_type",
            F.col("source_ns").alias("subj_db"),
            F.col("source_id").alias("subj_id"),
            opt("source_name").alias("subj_name"),
            F.col("target_ns").alias("obj_db"),
            F.col("target_id").alias("obj_id"),
            opt("target_name").alias("obj_name"),
            opt("citation").alias("pmid"),
            opt("evidence").alias("text"),
        )
    )


def write_indra_ndjson(edges: DataFrame, path: str, mode: str = "error") -> None:
    """FULL INDRA export as newline-delimited JSON statements — the sink a
    downstream ``indra.statements.io`` loader reads directly. Nested
    subj/obj/evidence objects are built with ``to_json(struct(...))``
    JVM-side; the write is a distributed text sink, so the export scales
    with the cluster, never the driver."""
    df = indra_statements_df(edges)
    doc = F.to_json(
        F.struct(
            F.col("stmt_type").alias("type"),
            F.struct(
                F.col("subj_db").alias("db"),
                F.col("subj_id").alias("id"),
                F.col("subj_name").alias("name"),
            ).alias("subj"),
            F.struct(
                F.col("obj_db").alias("db"),
                F.col("obj_id").alias("id"),
                F.col("obj_name").alias("name"),
            ).alias("obj"),
            F.struct(
                F.col("pmid").alias("pmid"), F.col("text").alias("text")
            ).alias("evidence"),
        )
    )
    df.select(doc.alias("value")).write.mode(mode).text(path)
