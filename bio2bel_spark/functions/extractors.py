"""String/list extractors: F2-F5, F7, F10 from SURVEY §2.3.

Every one of these is a pandas ``Series.map(python_fn)`` in the reference;
here they are built-in Spark expressions (higher-order functions, regexps) so
they run inside whole-stage codegen — no Python boundary in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def first_prefixed_token(col, prefix: str, sep: str = "|") -> Column:
    """First ``sep``-separated token starting with ``prefix`` (F2/F3).

    The pubmed:/intact-miscore: extractors (reference
    ``src/bio2bel/sources/intact.py:408-433``): tokens are trimmed before the
    prefix test; null-safe (null in → null out).
    """
    col = F.col(col) if isinstance(col, str) else col
    esc = prefix.replace('"', '\\"')
    return F.get(
        F.filter(
            F.transform(F.split(col, "\\" + sep), lambda x: F.trim(x)),
            lambda x: x.startswith(esc),
        ),
        0,
    )


def strip_prefix(col, prefix: str) -> Column:
    """``s[len(prefix):]`` (F5 — reference ``go.py:77,85``)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.substring(col, len(prefix) + 1, 2_000_000)


def split_curies(col, sep: str = "|") -> Column:
    """Pipe-separated CURIE list → array<struct<prefix,identifier>> (F4 —
    reference ``biogrid.py:176-196``). Unparseable tokens are dropped."""
    col = F.col(col) if isinstance(col, str) else col
    tokens = F.transform(F.split(col, "\\" + sep), lambda x: F.trim(x))
    parsed = F.transform(
        tokens,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, r"^([^:]+):", 1)).alias("prefix"),
            F.regexp_extract(t, r"^[^:]+:(.*)$", 1).alias("identifier"),
        ),
    )
    return F.filter(
        parsed, lambda s: (s["prefix"] != "") & (s["identifier"] != "")
    )


def normalize_whitespace(col) -> Column:
    """``' '.join(s.split())`` (F7 — reference ``intact.py:634``)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def identifiers_url(prefix_col, identifier_col) -> Column:
    """``https://identifiers.org/{prefix}:{id}`` (F10 — reference
    ``compath/mixins.py:43-46``)."""
    p = F.col(prefix_col) if isinstance(prefix_col, str) else prefix_col
    i = F.col(identifier_col) if isinstance(identifier_col, str) else identifier_col
    return F.concat(F.lit("https://identifiers.org/"), p, F.lit(":"), i)
