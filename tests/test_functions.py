"""Column-function library tests (F2-F7, F10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bio2bel_spark.functions import (
    first_prefixed_token,
    identifiers_url,
    normalize_curie_cols,
    normalize_whitespace,
    split_curies,
    strip_prefix,
)


def _one(spark, value, expr):
    return (
        spark.createDataFrame([(value,)], "s string").select(expr.alias("v")).collect()[0]["v"]
    )


def test_first_prefixed_token(spark):
    assert _one(spark, "imex:IM-1| pubmed:10831611 |x", first_prefixed_token("s", "pubmed:")) == "pubmed:10831611"
    assert _one(spark, "a|b", first_prefixed_token("s", "pubmed:")) is None
    assert _one(spark, None, first_prefixed_token("s", "pubmed:")) is None


def test_strip_prefix(spark):
    assert _one(spark, "GO:0007165", strip_prefix("s", "GO:")) == "0007165"


def test_split_curies(spark):
    got = _one(spark, "hgnc:1234| ncbigene:5 |garbage|uniprot:P1", split_curies("s"))
    assert [(r["prefix"], r["identifier"]) for r in got] == [
        ("hgnc", "1234"), ("ncbigene", "5"), ("uniprot", "P1")
    ]


def test_normalize_whitespace(spark):
    assert _one(spark, "  a   b\t c ", normalize_whitespace("s")) == "a b c"


def test_normalize_curie_cols(spark):
    p, i = normalize_curie_cols("s")
    df = spark.createDataFrame(
        [("Entrez Gene/locuslink:111",), ("UniProtKB:P1",), ("nocolon",)], "s string"
    ).select(p.alias("p"), i.alias("i"))
    rows = [(r["p"], r["i"]) for r in df.collect()]
    assert rows == [("ncbigene", "111"), ("uniprot", "P1"), (None, None)]


def test_identifiers_url(spark):
    df = spark.createDataFrame([("hgnc", "1234")], "p string, i string")
    assert df.select(identifiers_url("p", "i").alias("u")).collect()[0]["u"] == (
        "https://identifiers.org/hgnc:1234"
    )
