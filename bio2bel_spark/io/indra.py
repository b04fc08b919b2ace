"""INDRA statement export (SURVEY §2.10 G6).

The reference delegates to ``pybel.to_indra``
(``/root/reference/src/bio2bel/manager/bel_manager.py:96-102``), which turns
BEL edges into INDRA Statement objects. Without the INDRA/pybel packages the
engine emits the neutral dict shape of a statement — type, subject, object,
evidence — from a *small collected* edge set; statement construction is
inherently a driver-side export, never a distributed transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
