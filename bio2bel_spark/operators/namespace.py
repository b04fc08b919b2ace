"""Namespace (controlled-vocabulary) management: build, hash, upsert, export.

Re-expresses the reference's ``BELNamespaceManagerMixin``
(``/root/reference/src/bio2bel/manager/namespace_manager.py``):

* ``_make_namespace`` (``:242-260``) — one entry per model row;
* ``_update_namespace`` (``:262-296``) — insert-if-absent by identifier,
  here a left-anti join (A7/U1) instead of a driver-side id-set scan;
* content hash over ordered ``name:encoding`` pairs
  (``/root/reference/src/bio2bel/utils.py:189-199``, used at
  ``namespace_manager.py:435-445``) — deterministic ordering is the contract
  (SURVEY §2.6 O4), implemented as a sorted aggregate so it runs distributed
  and matches any single-node implementation byte-for-byte;
* ``write_bel_namespace`` (``:347-367``) / ``write_directory`` md5
  skip-if-unchanged (``:388-415``).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTRY_SCHEMA = "identifier STRING, name STRING, encoding STRING"


def make_namespace(
    df: DataFrame,
    identifier_col: str = "identifier",
    name_col: str = "name",
    encoding: str = "GRP",
) -> DataFrame:
    """Build namespace entries from a model table (``:242-260``)."""
    return df.select(
        F.col(identifier_col).cast("string").alias("identifier"),
        F.col(name_col).cast("string").alias("name"),
        F.lit(encoding).alias("encoding"),
    ).dropDuplicates(["identifier"])


def update_namespace(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Rows of ``incoming`` not already present by identifier (``:262-296``)."""
    return incoming.join(existing.select("identifier"), "identifier", "left_anti")


def namespace_hash(
    entries: DataFrame, use_names: bool = True, n_buckets: int = 64
) -> str:
    """Deterministic content digest of the namespace (``utils.py:189-199``).

    The reference hashes ``f'{name}:{encoding}'`` lines in iteration order;
    we pin a well-defined order instead. Digest definition (tree fold):

    1. each line goes to bucket ``crc32(line) % n_buckets`` — a pure function
       of the line, so the digest never depends on physical partitioning;
    2. per bucket: md5 of the sorted, newline-joined lines (parallel across
       buckets — no single reducer sees more than ~1/n_buckets of the data);
    3. final: md5 of the bucket digests in bucket order (n_buckets rows).

    A flat ``md5(concat(sort(all lines)))`` funnels the whole table through
    one reducer — fine for vocabularies, an OOM for fact tables; the tree
    form costs one extra (tiny) aggregate and scales to either.
    """
    key = F.concat_ws(":", F.col("name" if use_names else "identifier"), "encoding")
    per_bucket = (
        entries.select(key.alias("line"))
        .withColumn("_b", F.pmod(F.crc32(F.col("line")), F.lit(n_buckets)))
        .groupBy("_b")
        .agg(
            F.md5(F.concat_ws("\n", F.sort_array(F.collect_list("line")))).alias("h")
        )
    )
    row = per_bucket.agg(
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_b", "h"))),
                    lambda s: s["h"],
                ),
            )
        ).alias("h")
    ).collect()[0]
    return row["h"]


def write_bel_namespace(
    entries: DataFrame,
    path: str,
    use_names: bool = True,
    keyword: str = "NS",
    version: str = "1.0.0",
) -> None:
    """BEL namespace file: header + ``value|encoding`` lines (``:347-367``).

    Values are pulled ordered to the driver — namespace files are small by
    construction (they are vocabularies, not data).
    """
    col = "name" if use_names else "identifier"
    rows = (
        entries.select(F.col(col).alias("v"), "encoding")
        .orderBy("v")
        .collect()
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"[Namespace]\nKeyword={keyword}\nVersionString={version}\n\n[Values]\n")
        for r in rows:
            f.write(f"{r['v']}|{r['encoding']}\n")


def write_directory(
    entries: DataFrame,
    directory: str,
    keyword: str = "NS",
    use_names: bool = True,
) -> bool:
    """Skip-if-unchanged directory export (``:388-415``): compare the content
    hash against the sidecar from the previous write; rewrite only on change.
    Returns True if a new file was written."""
    os.makedirs(directory, exist_ok=True)
    target = os.path.join(directory, f"{keyword.lower()}.belns")
    sidecar = target + ".md5"
    new_hash = namespace_hash(entries, use_names=use_names)
    if os.path.exists(sidecar):
        with open(sidecar, encoding="utf-8") as f:
            if f.read().strip() == new_hash:
                return False
    write_bel_namespace(entries, target, use_names=use_names, keyword=keyword)
    with open(sidecar, "w", encoding="utf-8") as f:
        f.write(new_hash)
    return True
