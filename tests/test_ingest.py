"""Ingest reader tests over tiny driver-local fixtures (format plumbing only)."""

from __future__ import annotations

import json
import zipfile

from bio2bel_spark import ingest


def test_read_tsv_schema_usecols_null(spark, tmp_path):
    p = tmp_path / "feed.tsv"
    p.write_text("a\tb\tc\nx\t-\t1\ny\tkeep\t2\n")
    df = ingest.read_tsv(
        spark, str(p), "a STRING, b STRING, c STRING",
        usecols=["a", "b"], null_value="-",
    )
    rows = {r["a"]: r["b"] for r in df.collect()}
    assert rows == {"x": None, "y": "keep"}
    assert df.columns == ["a", "b"]


def test_zip_extraction_roundtrip(spark, tmp_path):
    member = "inner/data.tsv"
    zpath = tmp_path / "archive.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr(member, "col\nv1\nv2\n")
    extracted = ingest.extract_zip_member(str(zpath), member, str(tmp_path))
    df = ingest.read_tsv(spark, extracted, "col STRING")
    assert df.count() == 2


def test_parse_obo(spark, tmp_path):
    obo = """format-version: 1.2

[Term]
id: GO:0000001
name: mitochondrion inheritance
namespace: biological_process
is_a: GO:0048308 ! organelle inheritance
relationship: part_of GO:0048311

[Term]
id: GO:0000002
name: obsolete thing
is_obsolete: true

[Typedef]
id: part_of
"""
    p = tmp_path / "mini.obo"
    p.write_text(obo)
    terms, edges = ingest.read_obo(spark, str(p))
    t = {r["id"]: r for r in terms.collect()}
    assert t["GO:0000001"]["name"] == "mitochondrion inheritance"
    assert t["GO:0000002"]["is_obsolete"] is True
    e = {(r["child"], r["relation"], r["parent"]) for r in edges.collect()}
    assert ("GO:0000001", "is_a", "GO:0048308") in e
    assert ("GO:0000001", "part_of", "GO:0048311") in e


def test_read_ntriples(spark, tmp_path):
    nt = (
        '<http://ex/r1> <http://ex/equation> "A + B => C" .\n'
        "<http://ex/r1> <http://ex/side> <http://ex/r1_L> .\n"
        '<http://ex/r1> <http://ex/acc> "RHEA:10000"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
    )
    p = tmp_path / "mini.nt"
    p.write_text(nt)
    df = ingest.read_ntriples(spark, str(p))
    rows = {(r["s"], r["p"], r["o"]) for r in df.collect()}
    assert ("http://ex/r1", "http://ex/equation", "A + B => C") in rows
    # round 12 (encoded-term model): a typed literal keeps its N-Triples
    # serialization through the scan; STR()/DATATYPE() decode it in SPARQL
    assert (
        "http://ex/r1", "http://ex/acc",
        '"RHEA:10000"^^<http://www.w3.org/2001/XMLSchema#string>',
    ) in rows
    assert df.count() == 3


def test_read_cx_aspect(spark, tmp_path):
    cx = [
        {"nodes": [{"@id": 1, "n": "TP53"}, {"@id": 2, "n": "MDM2"}]},
        {"edges": [{"@id": 10, "s": 1, "t": 2, "i": "controls-state-change-of"}]},
    ]
    p = tmp_path / "net.cx"
    p.write_text(json.dumps(cx))
    nodes = ingest.read_cx_aspect(spark, str(p), "nodes")
    assert nodes.count() == 2
    edges = ingest.read_cx_aspect(spark, str(p), "edges")
    assert edges.collect()[0]["i"] == "controls-state-change-of"


def test_cached_download_skips_existing(tmp_path):
    p = tmp_path / "cached.txt"
    p.write_text("already here")
    # URL is bogus on purpose: cache hit must short-circuit the fetch
    out = ingest.cached_download("http://invalid.invalid/x", str(p))
    assert out == str(p)
    assert p.read_text() == "already here"
