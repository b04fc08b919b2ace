"""Driver-style oracle sweep: run every __spark_entry__ query against its
DuckDB oracle at sf0.01 in a VANILLA SparkSession (no factory confs), using a
canonicalizer that mimics the driver's (pandas sort_values over all columns →
value hash). Exits nonzero listing any row-count / schema / hash mismatch.

Usage: python scripts/oracle_check.py [query ...]   (default: all)
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    cells = []
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float):
                cells.append(f"{v:.6f}")
            elif v is None or v != v:
                cells.append("<null>")
            else:
                cells.append(str(v))
    return hashlib.md5("|".join(cells).encode()).hexdigest()


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"spark error: {ex}"))
            print(f"ERR  {name}: {str(ex).splitlines()[0][:160]}")
            continue
        if any(isinstance(v, (list, dict)) or type(v).__name__ == "ndarray"
               for col in sdf.columns for v in sdf[col].head(5)):
            bad.append((name, "list/array-typed result column"))
            print(f"ARR  {name}: unhashable result column")
            continue
        if name not in oracles:
            print(f"---  {name}: rows-only ({len(sdf)})")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"oracle error: {ex}"))
            print(f"ERR  {name}: oracle: {str(ex).splitlines()[0][:160]}")
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(sdf.columns) == sorted(odf.columns)
        hash_ok = schema_ok and _canon(sdf) == _canon(odf)
        flag = "ok " if (rows_ok and schema_ok and hash_ok) else "BAD"
        print(f"{flag}  {name}: rows {len(sdf)}/{len(odf)} "
              f"schema={schema_ok} hash={hash_ok}")
        if flag == "BAD":
            bad.append((name, f"rows {len(sdf)}/{len(odf)} schema={schema_ok} hash={hash_ok}"))
    spark.stop()
    if bad:
        print(f"\n{len(bad)} FAILURES:")
        for name, why in bad:
            print(f"  {name}: {why}")
        return 1
    print("\nall green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
