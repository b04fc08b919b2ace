"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced end-to-end with the no-op sink (full execution, no
driver collect). Timings are per-query wall seconds; `value` is the total
across ALL queries.

Output-size contract: the driver captures only the tail of stdout (2000
chars), so the printed line must stay well under that. The line carries
per-query timings for the HEADLINE set (the first 50 queries — the same
window the driver's correctness harness checks); the full per-query map for
every query is written to BENCH_FULL.json next to this file.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

HEADLINE = 50


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-bench",
        # keep stdout/stderr clean so the final JSON line survives the
        # driver's 2000-char tail capture
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing so the first timed query isn't penalized
    entrymod.q_distinct_segments(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # each query is measured twice and the MIN is reported: the first
    # execution pays one-off costs (file listing, codegen, Python worker
    # spin-up) and single runs on this shared box swing ±50% under host
    # noise; min-of-2 reads the steady-state plan cost
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 2)

    with open(os.path.join(HERE, "BENCH_FULL.json"), "w") as fh:
        json.dump(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            },
            fh,
            indent=1,
        )

    headline = dict(list(timings.items())[:HEADLINE])
    line = json.dumps(
        {
            "metric": "total_query_wall_sec",
            "value": round(sum(timings.values()), 2),
            "unit": "sec",
            "queries": headline,
            "sf": sf,
            "n_queries": len(timings),
            "full": "BENCH_FULL.json",
        },
        separators=(",", ":"),
    )
    # hard guard: never exceed the driver's tail-capture window
    if len(line) > 1900:
        line = json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": dict(list(headline.items())[:40]),
                "sf": sf,
                "n_queries": len(timings),
                "full": "BENCH_FULL.json",
            },
            separators=(",", ":"),
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
