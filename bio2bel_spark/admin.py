"""Read-only catalog admin server (M7 twin of the reference's Flask-Admin).

The reference mounts a Flask-Admin UI over its SQLAlchemy models so a user
can browse each module's tables in a browser
(``reference src/bio2bel/manager/flask_manager.py:21-128``). The Spark-native
twin serves the SAME browsing surface over the :class:`~bio2bel_spark.
catalog.Catalog` — table list, row pages, per-table stats, and the Action
provenance log — as JSON from the Python stdlib ``http.server`` (no Flask
dependency; this container has none, and a query engine's admin surface
should not pull in a web framework).

Read-only by design: the reference admin's edit affordances are an artifact
of Flask-Admin's ModelView defaults, not a Bio2BEL workflow — population is
the CLI's job (M2). Every endpoint caps its row transfer (``limit`` ≤
``MAX_PAGE``), so pointing a browser at a 100 TB table costs one
``limit(n).collect()``, never a full scan; pagination is offset-free
keyset-style via the caller's own predicate pushdown (pass ``where=`` —
Catalyst pushes it to the parquet scan).

Endpoints::

    GET /                      {tables: [...], n_actions: N}
    GET /tables                ["events", ...]
    GET /table/<name>?limit=&where=   {rows: [...], schema: [...]}
    GET /stats/<name>          table_stats() rows (per-file zone maps)
    GET /actions?limit=        provenance log, newest first

Start with :func:`serve_catalog` (returns the live server; call
``.shutdown()`` when done) — the in-process threading server makes the
surface testable without sockets guesswork.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import functions as F

#: hard per-request row cap — the admin is a browser, not an export path
MAX_PAGE = 1000


def _json_rows(df, limit: int) -> list[dict]:
    rows = df.limit(min(int(limit), MAX_PAGE)).collect()
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        out.append({k: (str(v) if not _jsonable(v) else v) for k, v in d.items()})
    return out


def _jsonable(v) -> bool:
    if v is None or isinstance(v, (bool, int, float, str)):
        return True
    if isinstance(v, list):
        return all(_jsonable(x) for x in v)
    if isinstance(v, dict):
        return all(_jsonable(x) for x in v.values())
    return False


class _Handler(BaseHTTPRequestHandler):
    catalog = None  # set by serve_catalog

    def log_message(self, fmt, *args):  # noqa: D102 — silence stdlib logging
        pass

    def _send(self, payload, status: int = 200) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server contract
        cat = self.catalog
        try:
            url = urlparse(self.path)
            q = parse_qs(url.query)
            limit = int(q.get("limit", ["50"])[0])
            parts = [p for p in url.path.split("/") if p]
            if not parts:
                return self._send(
                    {
                        "tables": sorted(cat.list_tables()),
                        "n_actions": cat.count_actions(),
                    }
                )
            if parts[0] == "tables":
                return self._send(sorted(cat.list_tables()))
            if parts[0] == "table" and len(parts) == 2:
                name = unquote(parts[1])
                if not cat.table_exists(name):
                    return self._send({"error": f"no table {name!r}"}, 404)
                df = cat.read_table(name)
                where = q.get("where", [None])[0]
                if where:
                    # a plain SQL predicate; Catalyst pushes it to the scan
                    df = df.where(where)
                return self._send(
                    {
                        "table": name,
                        "schema": [
                            {"name": f.name, "type": f.dataType.simpleString()}
                            for f in df.schema.fields
                        ],
                        "rows": _json_rows(df, limit),
                    }
                )
            if parts[0] == "stats" and len(parts) == 2:
                name = unquote(parts[1])
                if not cat.table_exists(name):
                    return self._send({"error": f"no table {name!r}"}, 404)
                return self._send(_json_rows(cat.table_stats(name), limit))
            if parts[0] == "actions":
                df = cat.actions().orderBy(F.desc("created"))
                return self._send(_json_rows(df, limit))
            return self._send({"error": "unknown endpoint"}, 404)
        except Exception as exc:  # noqa: BLE001 — surface, don't kill server
            return self._send({"error": str(exc)[:500]}, 500)


def serve_catalog(
    catalog, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Start the read-only admin server over ``catalog`` on a daemon thread.

    ``port=0`` binds an ephemeral port (read it from
    ``server.server_address[1]``). Returns the live server; call
    ``server.shutdown()`` to stop. Requests run Spark jobs on the catalog's
    session from the handler threads — Spark sessions are thread-safe for
    concurrent job submission, and every endpoint is bounded
    (``MAX_PAGE``-capped collect or metadata-only), so the admin can sit
    next to production jobs without a resource footprint.
    """
    handler = type("_BoundHandler", (_Handler,), {"catalog": catalog})
    server = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def main(argv: Optional[list] = None) -> int:
    """``python -m bio2bel_spark.admin [--warehouse DIR] [--port N]`` — the
    CLI twin of the reference's ``web`` command (flask_manager.py:117-128)."""
    import argparse

    from bio2bel_spark.catalog import Catalog
    from bio2bel_spark.session import get_spark

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--warehouse", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5000)
    args = p.parse_args(argv)
    spark = get_spark(warehouse=args.warehouse)
    server = serve_catalog(
        Catalog(spark, args.warehouse), host=args.host, port=args.port
    )
    print(f"admin serving on http://{args.host}:{server.server_address[1]}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
