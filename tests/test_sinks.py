"""Sink tests: triples TSV, JSON, single-file finalization."""

from __future__ import annotations

import json
import os

from bio2bel_spark.io import sinks


def test_write_triples_tsv_single_file(spark, tmp_path):
    df = spark.createDataFrame(
        [("a:1", "increases", "b:2"), ("a:1", "binds", "c:3")],
        "h string, r string, t string",
    )
    target = str(tmp_path / "triples.tsv")
    sinks.write_triples_tsv(df, target)
    lines = sorted(open(target, encoding="utf-8").read().strip().split("\n"))
    assert lines == ["a:1\tbinds\tc:3", "a:1\tincreases\tb:2"]


def test_write_tsv_distributed(spark, tmp_path):
    df = spark.range(100).selectExpr("cast(id as string) AS a", "'x' AS b")
    target = str(tmp_path / "out_dir")
    sinks.write_tsv(df, target)
    assert os.path.isdir(target)
    files = [f for f in os.listdir(target) if f.startswith("part-")]
    assert files


def test_write_json_single(spark, tmp_path):
    df = spark.createDataFrame([(1, "n")], "id long, name string")
    target = str(tmp_path / "nodes.json")
    sinks.write_json(df, target, single_file=True)
    rec = json.loads(open(target, encoding="utf-8").read().strip())
    assert rec == {"id": 1, "name": "n"}
