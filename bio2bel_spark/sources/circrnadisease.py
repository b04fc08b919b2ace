"""circRNADisease: experimentally supported circRNA–disease associations.

Parity with ``/root/reference/src/bio2bel/sources/circrnadisease.py:10-25``:
the reference is a df-getter — ``pd.read_csv`` of the database's TSV dump
with ``usecols`` selecting eight columns. Here that becomes a projection
over a Spark TSV/parquet scan: :func:`prepare` selects exactly the
reference's eight columns (column pruning reaches the scan, the Spark
equivalent of ``usecols``) and renames them to snake_case so downstream SQL
never needs backtick-quoted identifiers.

The download URL itself (``cgga.org.cn``) lives with the other
environment-specific fetches in :mod:`bio2bel_spark.ingest`-style cached
downloads; this module is the pure transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODULE_NAME = "circrnadisease"

#: reference usecols (circrnadisease.py:14-23) -> snake_case output name
COLUMNS = {
    "pmid": "pmid",
    "circRNA id": "circrna_id",
    "circRNA name": "circrna_name",
    "circRNA synonyms": "circrna_synonyms",
    "disease": "disease",
    "method of circRNA detection": "detection_method",
    "species": "species",
    "expression pattern": "expression_pattern",
}


def prepare(raw: DataFrame) -> DataFrame:
    """Project the raw dump to the reference's eight columns, snake_cased.

    Accepts either the original headers or already-snake_cased columns
    (parquet round-trips of a prior run). Missing columns raise loudly —
    a silently absent ``usecols`` member is how projection bugs hide.
    """
    have = set(raw.columns)
    select = []
    for orig, out in COLUMNS.items():
        if orig in have:
            select.append(F.col(f"`{orig}`").alias(out))
        elif out in have:
            select.append(F.col(out))
        else:
            raise ValueError(
                f"circrnadisease: input is missing column {orig!r} "
                f"(have {sorted(have)})"
            )
    return raw.select(*select)


def associations(prepared: DataFrame) -> DataFrame:
    """Tidied association rows: trimmed strings, normalized expression
    pattern (``up``/``down``/other as-is, lowercased), one row per
    (circrna_id, disease, pmid)."""
    out = prepared.select(
        *[
            F.trim(F.col(c)).alias(c) if t == "string" else F.col(c)
            for c, t in prepared.dtypes
        ]
    ).withColumn("expression_pattern", F.lower("expression_pattern"))
    return out.dropDuplicates(["circrna_id", "disease", "pmid"])
