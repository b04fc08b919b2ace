"""Cache-or-build export automation (the in-scope half of M5)."""

from __future__ import annotations

import os

import pytest

from bio2bel_spark.io.automate import (
    ensure_graph_json,
    ensure_populated,
    ensure_triples_tsv,
)


@pytest.fixture()
def tf_inputs(tmp_path):
    raw = tmp_path / "raw.tsv"
    raw.write_text(
        "tf_hgnc_symbol\ttarget_hgnc_symbol\teffect\tscore\tpmids\n"
        "TP53\tMDM2\t1\tA\t111\n"
        "TP53\tBCL2\t-1\tB\t333\n"
    )
    hgnc = tmp_path / "hgnc.tsv"
    hgnc.write_text(
        "hgnc_symbol\thgnc_id\nTP53\t11998\nMDM2\t6973\nBCL2\t990\n"
    )
    return {"raw": str(raw), "hgnc_map": str(hgnc)}


def test_ensure_populated_idempotent(spark, tmp_path, tf_inputs):
    import bio2bel_spark.sources.datasets  # noqa: F401 — registers sources

    wh = str(tmp_path / "wh")
    ds = ensure_populated("tfregulons", spark, warehouse=wh,
                          input_paths=tf_inputs)
    assert ds.is_populated()
    n = ds.table("edges").count()
    assert n >= 1
    # second call: no re-population (populate would append a provenance row)
    before = ds.catalog.count_actions()
    ds2 = ensure_populated("tfregulons", spark, warehouse=wh,
                           input_paths=tf_inputs)
    assert ds2.catalog.count_actions() == before
    # unknown names keep the documented M5 boundary error
    with pytest.raises(KeyError, match="out of scope"):
        ensure_populated("not_a_module", spark, warehouse=wh)


def test_ensure_triples_tsv_cache_or_build(spark, tmp_path, tf_inputs):
    import bio2bel_spark.sources.datasets  # noqa: F401

    wh = str(tmp_path / "wh")
    path = ensure_triples_tsv("tfregulons", spark, warehouse=wh,
                              input_paths=tf_inputs)
    assert os.path.exists(path)
    first = open(path).read()
    assert first.count("\n") >= 1  # h\tr\tt rows
    mtime = os.path.getmtime(path)
    # cached: the second call returns the same path with no rebuild
    again = ensure_triples_tsv("tfregulons", spark, warehouse=wh,
                               input_paths=tf_inputs)
    assert again == path and os.path.getmtime(path) == mtime


def test_ensure_graph_json_cache_or_build(spark, tmp_path, tf_inputs):
    import bio2bel_spark.sources.datasets  # noqa: F401

    wh = str(tmp_path / "wh")
    path = ensure_graph_json("tfregulons", spark, warehouse=wh,
                             input_paths=tf_inputs)
    assert os.path.isdir(path)
    assert os.path.isdir(os.path.join(path, "nodes"))
    assert os.path.isdir(os.path.join(path, "edges"))
    assert ensure_graph_json("tfregulons", spark, warehouse=wh,
                             input_paths=tf_inputs) == path


def test_ensure_exports_publish_atomically(spark, tmp_path, tf_inputs):
    """Write-then-rename publication: stale scratch from a crashed build is
    cleaned and rebuilt, never served; after success no scratch remains and
    the published artifact is complete."""
    import shutil

    import bio2bel_spark.sources.datasets  # noqa: F401

    wh = str(tmp_path / "wh")
    # simulate a crash that left graph scratch behind (nodes only, no edges)
    exports = os.path.join(wh, "_exports", "tfregulons")
    os.makedirs(os.path.join(exports, "tfregulons.graph.json.tmp", "nodes"))
    path = ensure_graph_json("tfregulons", spark, warehouse=wh,
                             input_paths=tf_inputs)
    assert os.path.isdir(os.path.join(path, "nodes"))
    assert os.path.isdir(os.path.join(path, "edges"))
    assert not os.path.exists(path + ".tmp")  # scratch renamed away
    # same for the TSV: stale scratch file is replaced, publication atomic
    shutil.rmtree(os.path.join(exports))
    os.makedirs(exports)
    open(os.path.join(exports, "tfregulons.bel.tsv.tmp"), "w").write("junk")
    tsv = ensure_triples_tsv("tfregulons", spark, warehouse=wh,
                             input_paths=tf_inputs)
    assert open(tsv).read().count("\t") >= 2
    assert not os.path.exists(tsv + ".tmp")
