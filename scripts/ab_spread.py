"""Same-session interleaved A/B of the `_spread` helper per query.

For every query routed through `_spread` (directly or via the shared input
helpers), times the noop-sink execution with the real `_spread` and with an
identity stand-in, alternating runs within ONE Spark session so JVM warmup
and host weather hit both arms equally. `_spread` is a no-op at production
scale by construction (it only fires on a partition deficit), so this local
A/B is the whole decision: keep the local round-robin exchange only where
the per-row work it parallelises beats its shuffle cost.

Usage:
    python scripts/ab_spread.py [--runs 3] [query ...]   # default: all users
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def spread_users(src: str) -> list[str]:
    helpers = set()
    for m in re.finditer(r"def (_[a-zA-Z0-9_]+)\(.*?\):(.*?)(?=\ndef |\Z)", src, re.S):
        if "_spread(" in m.group(2) and m.group(1) != "_spread":
            helpers.add(m.group(1))
    users = []
    for m in re.finditer(r"def (q_[a-zA-Z0-9_]+)\(.*?\):(.*?)(?=\ndef |\Z)", src, re.S):
        body = m.group(2)
        if "_spread(" in body or any(h + "(" in body for h in helpers):
            users.append(m.group(1)[2:])
    return users


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from bio2bel_spark.session import get_spark
    from bio2bel_spark.operators.caching import release_cached

    names = args.queries or spread_users(
        open(os.path.join(HERE, "__spark_entry__.py")).read()
    )

    spark = get_spark(
        app_name="bio2bel-spark-ab-spread",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    real = E._spread

    def ident(spark, df):
        return df

    out = {}
    for name in names:
        if name not in qs:
            print(f"?? {name}: not in registry", file=sys.stderr)
            continue
        best = {"with": float("inf"), "without": float("inf")}
        # warm both arms once (uncounted), then alternate timed runs
        for i in range(2 * args.runs + 2):
            mode = "with" if i % 2 == 0 else "without"
            E._spread = real if mode == "with" else ident
            spark.sparkContext.setJobDescription(f"ab:{name}:{mode}")
            release_cached(spark)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i >= 2:
                best[mode] = min(best[mode], dt)
        E._spread = real
        release_cached(spark)
        r = best["without"] / best["with"] if best["with"] else float("nan")
        out[name] = {
            "with": round(best["with"], 2),
            "without": round(best["without"], 2),
            "ratio_without_over_with": round(r, 2),
        }
        print(
            f"{name}: with={best['with']:.2f}s without={best['without']:.2f}s "
            f"ratio={r:.2f} load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
