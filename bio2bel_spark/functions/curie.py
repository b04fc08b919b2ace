"""CURIE normalization as columnar expressions + broadcast mapping joins.

The reference normalizes identifiers with per-row Python
(``pyobo.identifier_utils.normalize_curie`` at
``/root/reference/src/bio2bel/sources/biogrid.py:144,194``; the
prefix-dispatch parser at ``sources/intact.py:458-510``). Here the parse is a
``when/otherwise`` chain over ``startswith`` + ``regexp_extract`` (F1), and
every dict lookup (``_map_complexportal``/``_map_reactome``/``get_entrez_id``)
becomes a broadcast left join against a mapping DataFrame (F6/J5) — the
distinct→map→join-back pattern that scales to 100 TB because the mapping
tables are vocabulary-sized.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: prefix synonyms applied by pyobo-style normalization (public CURIE
#: conventions; the cases observed in MITAB feeds)
PREFIX_SYNONYMS = {
    "entrez gene/locuslink": "ncbigene",
    "entrezgene/locuslink": "ncbigene",
    "uniprot/swiss-prot": "uniprot",
    "uniprotkb": "uniprot",
    "ec-code": "eccode",
}


def normalize_prefix(prefix: Column) -> Column:
    """Lowercase + synonym-fold a CURIE prefix."""
    p = F.lower(F.trim(prefix))
    expr = p
    for raw, canonical in PREFIX_SYNONYMS.items():
        expr = F.when(p == raw, F.lit(canonical)).otherwise(expr)
    return expr


def normalize_curie_cols(col) -> tuple[Column, Column]:
    """Split ``prefix:identifier`` into normalized (prefix, identifier)
    columns (≈ ``normalize_curie``). Tokens without a colon yield nulls."""
    col = F.col(col) if isinstance(col, str) else col
    has = col.contains(":")
    prefix = F.when(has, normalize_prefix(F.substring_index(col, ":", 1)))
    identifier = F.when(has, F.regexp_extract(col, r"^[^:]+:(.*)$", 1))
    return prefix, identifier


def broadcast_lookup(
    df: DataFrame,
    key_col: str,
    mapping: Optional[DataFrame],
    mapping_key: str,
    mapping_value: str,
    out_col: str,
) -> DataFrame:
    """Left-join a (small) mapping table onto ``df`` with an explicit
    broadcast hint; when no mapping is supplied the output column is null.

    This is the engine's F6 primitive: the reference's
    ``Series.map(dict.get)`` at scale.
    """
    if mapping is None:
        return df.withColumn(out_col, F.lit(None).cast("string"))
    m = mapping.select(
        F.col(mapping_key).alias(key_col), F.col(mapping_value).alias(out_col)
    ).dropDuplicates([key_col])
    return df.join(F.broadcast(m), key_col, "left")
