"""Optimization profiler: for each named query, capture
``.explain("formatted")`` to ``plans/<round>/<query>_<tag>.txt`` and time the
noop-sink execution (min of N runs) at $SPARK_GRAFT_SF_DIR.

Usage:
    python scripts/profile_queries.py --tag before [--runs 3] q1 q2 ...
    python scripts/profile_queries.py --tag before --top 25      # top-N by
                                                                 # BENCH_FULL
Prints one line per query: name, min seconds, Exchange count, join node
kinds, Python-eval nodes, and writes the plan file. Timing methodology is
identical to bench.py (noop sink, full execution).
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", dest="round_dir", default="r15")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    names = list(args.queries)
    if args.top:
        full = json.load(open(os.path.join(HERE, "BENCH_FULL.json")))
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    import __spark_entry__ as entrymod
    from bio2bel_spark.session import get_spark
    from bio2bel_spark.operators.caching import release_cached

    spark = get_spark(
        app_name="bio2bel-spark-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    outdir = os.path.join(HERE, "plans", args.round_dir)
    os.makedirs(outdir, exist_ok=True)

    results = {}
    for name in names:
        if name not in qs:
            print(f"??   {name}: not in registry", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)))
        pyev = sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas)\b", plan)))
        best = None
        if not args.no_time:
            release_cached(spark)
            best = float("inf")
            for _ in range(args.runs):
                # construction INSIDE the timer, exactly like bench.py /
                # bench_floor.py: iterative queries do real work (eager
                # checkpoints, convergence counts) while building the frame
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            release_cached(spark)
            best = round(best, 2)
        results[name] = best
        print(
            f"{name}: {best if best is not None else '-'}s  "
            f"Exchange={n_ex}  joins={','.join(joins) or '-'}  "
            f"py={','.join(pyev) or '-'}  load={os.getloadavg()[0]:.1f}"
        )
    spark.stop()
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
