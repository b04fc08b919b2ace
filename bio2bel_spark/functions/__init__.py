"""Column-level transform library (the reference's scalar-UDF surface,
SURVEY §2.3, re-expressed as JVM-side Spark expressions)."""

from bio2bel_spark.functions.extractors import (  # noqa: F401
    first_prefixed_token,
    identifiers_url,
    normalize_whitespace,
    split_curies,
    strip_prefix,
)
from bio2bel_spark.functions.curie import normalize_curie_cols  # noqa: F401
