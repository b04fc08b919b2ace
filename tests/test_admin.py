"""Read-only catalog admin server (M7): endpoints, caps, pushdown, errors."""

from __future__ import annotations

import json
import urllib.request

import pytest

from bio2bel_spark.admin import MAX_PAGE, serve_catalog
from bio2bel_spark.catalog import Catalog


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_admin")))
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(200)],
        "id long, name string, score double",
    )
    cat.write_table(df, "things")
    cat.store_action("things", "populate")
    server = serve_catalog(cat)
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}", cat
    server.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_root_and_tables(served):
    base, _ = served
    status, root = _get(base, "/")
    assert status == 200
    assert "things" in root["tables"] and root["n_actions"] >= 1
    status, tables = _get(base, "/tables")
    assert status == 200 and "things" in tables


def test_table_rows_schema_and_cap(served):
    base, _ = served
    status, body = _get(base, "/table/things?limit=5")
    assert status == 200
    assert len(body["rows"]) == 5
    assert {f["name"] for f in body["schema"]} == {"id", "name", "score"}
    # the hard cap holds even when the caller asks for more
    _, big = _get(base, f"/table/things?limit={MAX_PAGE * 10}")
    assert len(big["rows"]) == 200  # table smaller than cap


def test_where_predicate_pushdown(served):
    base, _ = served
    status, body = _get(base, "/table/things?where=id%20%3D%2042&limit=10")
    assert status == 200
    assert [r["id"] for r in body["rows"]] == [42]


def test_where_grammar_accepts_predicates(served):
    base, _ = served
    from urllib.parse import quote

    for pred, want in [
        ("id >= 197 AND score < 300.0", [197, 198, 199]),
        ("name LIKE 'name19_' AND id > 197", [198, 199]),
        ("id IN (1, 3) OR name = 'name5'", [1, 3, 5]),
        ("NOT (id < 198) AND name IS NOT NULL", [198, 199]),
    ]:
        status, body = _get(
            base, f"/table/things?where={quote(pred)}&limit=10"
        )
        assert status == 200, pred
        assert sorted(r["id"] for r in body["rows"]) == want, pred


def test_where_rejects_expression_injection(served):
    """The ADVICE-flagged injection surface: raw Spark SQL expressions
    (reflect/java_method, arithmetic, casts, subqueries, unknown columns)
    must be rejected with 400 by the whitelist parser — they never reach
    df.where()."""
    base, _ = served
    from urllib.parse import quote

    for bad in [
        "reflect('java.lang.System','getenv') = 'x'",
        "java_method('java.lang.System','exit',0) IS NULL",
        "id = reflect('a','b')",
        "cast(id AS string) = '1'",
        "id + 1 = 2",
        "nope = 1",           # unknown column
        "id = 1; drop",       # statement smuggling
        "exists(select 1)",
    ]:
        try:
            urllib.request.urlopen(
                base + f"/table/things?where={quote(bad)}", timeout=30
            )
            raise AssertionError(f"expected 400 for {bad!r}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, bad
            assert "error" in json.loads(e.read()), bad


def test_actions_and_stats(served):
    base, _ = served
    status, acts = _get(base, "/actions?limit=10")
    assert status == 200
    assert any(a["resource"] == "things" and a["action"] == "populate" for a in acts)
    status, stats = _get(base, "/stats/things")
    assert status == 200 and len(stats) >= 1


def test_missing_table_404(served):
    base, _ = served
    try:
        urllib.request.urlopen(base + "/table/nope", timeout=30)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert "no table" in json.loads(e.read())["error"]
