"""Namespace export tests (reference tests/test_manager_namespace.py:66-165)."""

from __future__ import annotations

from bio2bel_spark.operators import namespace as ns


def _entries(spark, n=5, start=0):
    rows = [(f"MODEL:{i}", str(i) * 5) for i in range(start, start + n)]
    return spark.createDataFrame(rows, "identifier string, name string")


def test_make_namespace(spark):
    entries = ns.make_namespace(_entries(spark), encoding="GRP")
    rows = {r["identifier"]: (r["name"], r["encoding"]) for r in entries.collect()}
    assert len(rows) == 5
    assert rows["MODEL:3"] == ("33333", "GRP")


def test_update_namespace_anti_join(spark):
    existing = ns.make_namespace(_entries(spark, 5))
    incoming = ns.make_namespace(_entries(spark, 6, start=3))  # 3..8, overlap 3,4
    delta = ns.update_namespace(existing, incoming)
    assert {r["identifier"] for r in delta.collect()} == {
        "MODEL:5", "MODEL:6", "MODEL:7", "MODEL:8"
    }  # +4, the reference's own update-test delta


def test_namespace_hash_stable_under_partitioning(spark):
    a = ns.make_namespace(_entries(spark)).repartition(7)
    b = ns.make_namespace(_entries(spark)).coalesce(1)
    assert ns.namespace_hash(a) == ns.namespace_hash(b)
    assert ns.namespace_hash(a, use_names=False) != ns.namespace_hash(a)


def test_write_bel_namespace_and_skip_if_unchanged(spark, tmp_path):
    entries = ns.make_namespace(_entries(spark))
    d = str(tmp_path / "out")
    assert ns.write_directory(entries, d, keyword="TEST") is True
    content = open(f"{d}/test.belns", encoding="utf-8").read()
    assert "[Namespace]" in content and "00000|GRP" in content
    # unchanged → skip
    assert ns.write_directory(entries, d, keyword="TEST") is False
    # changed → rewrite
    more = ns.make_namespace(_entries(spark, 6))
    assert ns.write_directory(more, d, keyword="TEST") is True
