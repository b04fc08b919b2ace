"""Stage-level attribution for one query: run it through the noop sink
(bench methodology), then pull per-stage metrics from the Spark UI REST
API and print the top stages by executor run time with their call sites.

Usage: python scripts/stage_profile.py <query> [<query> ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from bio2bel_spark.operators.caching import release_cached
    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-stageprof",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entrymod.queries()

    for name in names:
        release_cached(spark)
        spark.sparkContext.setJobDescription(f"stageprof:{name}")
        before = {
            s["stageId"]
            for s in json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
            )
        }
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.time() - t0
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        fresh = [s for s in stages if s["stageId"] not in before]
        fresh.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: total {t_total:.2f}s (build {t_build:.2f}s), "
              f"{len(fresh)} stages ===")
        for s in fresh[:18]:
            run = s.get("executorRunTime", 0) / 1000.0
            cpu = s.get("executorCpuTime", 0) / 1e9
            sub = s.get("submissionTime", "")
            wall = ""
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                pass
            print(
                f"  stage {s['stageId']:4d} run={run:7.2f}s cpu={cpu:7.2f}s "
                f"tasks={s.get('numCompleteTasks', 0):3d} "
                f"in={s.get('inputBytes', 0) >> 20}MB "
                f"sh_r={s.get('shuffleReadBytes', 0) >> 20}MB "
                f"sh_w={s.get('shuffleWriteBytes', 0) >> 20}MB  "
                f"{(s.get('name') or '')[:80]}"
            )
        release_cached(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
