"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced end-to-end with the no-op sink (full execution, no
driver collect). Timings are per-query wall seconds; `value` is the total.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from bio2bel_spark.session import get_spark

    spark = get_spark(app_name="bio2bel-spark-bench")
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
        timings[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
