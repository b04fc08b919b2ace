#!/usr/bin/env python3
"""Quiet-host bench FLOOR: min-of-3 steady-state timings for the plan-heavy
queries at sf0.1, recorded into PLANS.md with the 1-min loadavg per sample —
the per-round baseline the bench-history deltas are judged against (the
co-tenant band on this box spans ±25%; a floor row with loadavg <= 2 is a
real plan cost, a bench delta without one is weather).

Usage: python scripts/bench_floor.py [round_tag]
Writes/overwrites the "## Quiet-host floor" section under the MANUAL
EVIDENCE marker in PLANS.md. Refuses to record (exits 1) when the host is
not quiet (loadavg > 2 at start), so a noisy sample can never masquerade
as the floor.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the plan-heavy set: every query whose steady state PLANS.md argues
#: about, plus the current round's new surface
FLOOR_SET = [
    "curation_pipeline_v2",
    "winnowing_fingerprints",
    "incremental_fuzzy",
    "ngram_contamination",
    "pagerank",
    "selection_pipeline",
    "selection_pipeline_packed",
    "selection_pipeline_tokens",
    "dsir_maintenance",
    "dedup_quality_survivor",
    "fuzzy_join",
    "png_features",
    "png_phash_pairs",
    "sparql_path_star",
    "sparql_group_count",
    "sparql_group_having",
    # round-10 bench movers >2x on a loaded host (untouched code) — floored
    # to prove they were weather, per the round-10 verdict ask
    "simhash_docs",
    "video_features",
    "kg_pathway_edges",
    # round-11 bench-scale SPARQL surface
    "sparql_scale_bgp",
    "sparql_scale_path",
    "sparql_path_range",
    "sparql_subquery",
    "sparql_scale_builtins",
    "sparql_update_graph",
    "sparql_graph_scale",
    "sparql_from_dataset",
    # round-11 bench movers >2x on a loaded host — floored to triage
    # weather vs real regression, per the round-11 verdict ask #2
    "gene_pathway_counts",
    "pathway_to_symbols",
    "pathway_size_distribution",
    "perplexity_maintenance",
    "hilbert_layout_3d",
    "sparql_values",
    # round-12 bench-scale SPARQL surface
    "sparql_typed_literals",
    "sparql_update_quads",
    "sparql_graph_path",
    "sparql_ntriples_file",
    "sparql_arith",
    # round-13 bench-scale SPARQL surface
    "sparql_typed_order",
    "sparql_datetime",
    "sparql_graph_topk",
    "sparql_nquads_file",
    "sparql_construct_quads",
    "sparql_bnode_iri",
    "sparql_distinct_agg",
    "sparql_tz_histogram",
]

#: round 14 (verdict ask #1): EVERY registry query gets a quiet-host
#: floor, so bench.py's >2x-floor retry gate covers the whole surface —
#: the round-13 lsh_recall 15.4s weather reading had no floor and
#: slipped through. Queries in the plan-heavy FLOOR_SET above keep
#: min-of-N_RUNS; the long tail gets min-of-N_RUNS_TAIL (the tail is
#: 180+ queries — one extra run each costs ~5 quiet-host minutes).
N_RUNS = 3
N_RUNS_TAIL = 2
MARK = "<!-- MANUAL EVIDENCE (preserved by dump_plans.py) -->"
SECTION = "## Quiet-host floor"


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r?"
    start_load = os.getloadavg()[0]
    if start_load > 2.0:
        print(f"host not quiet (loadavg {start_load:.1f} > 2); "
              "refusing to record a floor")
        return 1

    import __spark_entry__ as entrymod
    from bio2bel_spark.operators.caching import release_cached
    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-floor",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = FLOOR_SET + [n for n in qs if n not in FLOOR_SET]
    rows = []
    for name in names:
        fn = qs[name]
        n_runs = N_RUNS if name in FLOOR_SET else N_RUNS_TAIL
        samples, loads = [], []
        for _ in range(n_runs):
            loads.append(os.getloadavg()[0])
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            release_cached(spark)
        rows.append((name, min(samples), max(loads)))
        print(f"{name}: min-of-{n_runs} {min(samples):.2f}s "
              f"(samples {['%.2f' % s for s in samples]}, "
              f"loadavg<= {max(loads):.1f})", flush=True)
    spark.stop()

    lines = [
        SECTION,
        "",
        f"Round {tag} floor: FULL registry ({len(rows)} queries) —",
        f"min-of-{N_RUNS} for the plan-heavy FLOOR_SET, "
        f"min-of-{N_RUNS_TAIL} for the tail — at sf0.1, fresh",
        "session, recorded only when start loadavg <= 2 (this sample",
        f"started at loadavg {start_load:.1f}; the per-query max column",
        "includes the floor run's own 32-core load). Compare bench",
        "deltas against THIS table, not the co-tenant-weather bench line.",
        "",
        "| query | floor s | max loadavg during |",
        "|---|---|---|",
    ]
    for name, best, ld in rows:
        lines.append(f"| {name} | {best:.2f} | {ld:.1f} |")
    lines.append("")
    block = "\n".join(lines)

    # machine-readable floors for bench.py's loadavg retry gate (round
    # 13): merge-update so queries floored in earlier rounds keep their
    # entries when a later FLOOR_SET no longer lists them
    import json

    floors_path = os.path.join(HERE, "FLOORS.json")
    floors = {}
    if os.path.exists(floors_path):
        floors = json.load(open(floors_path))
    floors.update({name: round(best, 2) for name, best, _ in rows})
    with open(floors_path, "w") as fh:
        json.dump(floors, fh, indent=1, sort_keys=True)
    print(f"floors written to FLOORS.json ({len(floors)} total)")

    plans = open(os.path.join(HERE, "PLANS.md")).read()
    if SECTION in plans:
        start = plans.index(SECTION)
        nxt = plans.find("\n## ", start + 1)
        end = nxt if nxt != -1 else len(plans)
        plans = plans[:start] + block + plans[end + 1 if nxt != -1 else end:]
    else:
        mark = plans.index(MARK) + len(MARK)
        plans = plans[:mark] + "\n\n" + block + plans[mark:]
    open(os.path.join(HERE, "PLANS.md"), "w").write(plans)
    print(f"floor table written to PLANS.md ({len(rows)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
