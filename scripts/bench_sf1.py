#!/usr/bin/env python3
"""Scale-slope bench: the most expensive registry queries at sf0.1 AND
sf1 (10x rows, scripts/make_sf1.py), writing BENCH_SF1.json with
per-query ratios (round-14 verdict ask #6).

A near-linear operator should show a ratio near 10 or below
(sub-linear: broadcast dims, top-k, bucketed LSH); a super-linear ratio
flags a quadratic node that the opt-in SPARK_GRAFT_SLOW scale tests
only assert synthetically. Both scales run in ONE session back-to-back
(min-of-2 each) so the comparison shares JVM warmup and host weather;
the 1-min loadavg rides along for triage.

Usage: python scripts/bench_sf1.py [N_top]  (default 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(HERE, "sf1data")


def main() -> int:
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    if not os.path.isdir(SF1):
        print("sf1data missing — run scripts/make_sf1.py first")
        return 1
    full = json.load(open(os.path.join(HERE, "BENCH_FULL.json")))
    timings = full.get("queries_full", full.get("queries", {}))
    top = [
        name for name, _t in sorted(
            timings.items(), key=lambda kv: -kv[1]
        )[:n_top]
    ]
    print(f"top-{n_top} by last bench: {top}")

    import __spark_entry__ as entrymod
    from bio2bel_spark.operators.caching import release_cached
    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-sf1",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in top:
        fn = qs[name]
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                release_cached(spark)
            row[label] = round(min(samples), 2)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        row["loadavg"] = round(os.getloadavg()[0], 1)
        out[name] = row
        print(f"{name}: sf0.1 {row['sf0.1']}s  sf1 {row['sf1']}s  "
              f"ratio {row['ratio']}  (loadavg {row['loadavg']})",
              flush=True)
    spark.stop()
    with open(os.path.join(HERE, "BENCH_SF1.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    worst = max(out.values(), key=lambda r: r["ratio"])["ratio"]
    print(f"BENCH_SF1.json written ({len(out)} queries, "
          f"worst ratio {worst})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
