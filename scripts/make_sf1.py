#!/usr/bin/env python3
"""Materialize an sf1 dataset (10x sf0.1) under ./sf1data for the
scale-slope bench (round-14 verdict ask #6).

/root/testdata is read-only and has no sf1, so sf1 is derived from
sf0.1 by replicating every table 10x with disjoint key spaces —
referential integrity is preserved by offsetting each key column by
``copy * (max(key) + 1)`` consistently across tables (l_orderkey moves
with o_orderkey, o_custkey with c_custkey, ...). The small dimensions
(region, nation) stay single-copy, exactly like TPC-H scaling.
Document text gets a per-copy suffix (and n_chars is recomputed) so the
dedup operators don't see a pathological 10-way exact-duplicate corpus.

Pure DuckDB — no Spark session, runs in seconds. Output is
git-ignored (~170 MB).
"""

from __future__ import annotations

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(HERE, "sf1data")
K = 10

#: key column -> the table whose max defines its namespace stride
KEY_NS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

SMALL = {"region", "nation"}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple, int] = {}
    for table, col in set(KEY_NS.values()):
        strides[(table, col)] = con.execute(
            f"SELECT max({col}) + 1 FROM "
            f"read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]
    for table in TABLES:
        src = f"read_parquet('{SRC}/{table}.parquet')"
        out = os.path.join(DST, f"{table}.parquet")
        if table in SMALL:
            con.execute(f"COPY (SELECT * FROM {src}) TO '{out}' "
                        "(FORMAT parquet)")
            print(f"{table}: copied")
            continue
        cols = [
            r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}")
            .fetchall()
        ]
        exprs = []
        for c in cols:
            if c in KEY_NS:
                stride = strides[KEY_NS[c]]
                exprs.append(f"{c} + k * {stride} AS {c}")
            elif table == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN k = 0 THEN text "
                    "ELSE text || ' copytag' || k END AS text"
                )
            elif table == "documents" and c == "n_chars":
                exprs.append(
                    "length(CASE WHEN k = 0 THEN text "
                    "ELSE text || ' copytag' || k END)::BIGINT AS n_chars"
                )
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM {src} CROSS JOIN "
            f"(SELECT unnest(range({K})) AS k)) TO '{out}' "
            "(FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
