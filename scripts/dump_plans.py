"""Write PLANS.md: annotated physical plans for representative queries.

Each section states the property the plan is supposed to exhibit (pushdown,
single exchange, no nested-loop joins, map-only probe, ...) followed by the
`explain` output so the claim is checkable at a glance. Run after plan
changes: ``python scripts/dump_plans.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

MANUAL_MARK = "<!-- MANUAL EVIDENCE (preserved by dump_plans.py) -->"

#: query -> the plan property worth checking
SHOWCASE = {
    "winnowing_fingerprints": (
        "Single-pass winnowing: gram-hash array built once per row and "
        "folded through ONE ArrayAggregate ring buffer (window mins) — "
        "no explode of the gram stream, no shuffle before the final "
        "rollup. The nested-transform formulation was O(n²) md5 (223 s "
        "at sf0.1); the fold is ~6 s."
    ),
    "zorder_layout": (
        "Morton interleave as unrolled shift/mask arithmetic inside "
        "whole-stage codegen (no UDF); normalization bounds are one "
        "bounded scalar aggregate; the only shuffle is the "
        "repartitionByRange any re-layout must pay."
    ),
    "bloom_join": (
        "Bloom-prefiltered exact join: the small side's keys become a "
        "literal bitmask probed with getbit in codegen (pure map on the "
        "large side), so only surviving rows reach the join's exchange."
    ),
    "ngram_contamination": (
        "Distinct gram hashes per side from the no-explode HOF pipeline; "
        "the benchmark gram set broadcasts onto the training gram stream "
        "— the large side's grams never shuffle."
    ),
    "loop_detection": (
        "Trailing-loop detection entirely in nested array HOFs over the "
        "token array (O(n·P) per row) — one narrow projection, zero "
        "shuffles before the final projection."
    ),
    "oov_rate": (
        "Corpus top-N vocabulary via combinable count + TakeOrdered, "
        "BROADCAST to the per-token membership join — the exploded token "
        "stream is never hash-partitioned."
    ),
    "weighted_sample": (
        "A-ES weighted sampling: score is a pure hash expression, one "
        "window exchange per group, row_number cutoff — no RNG, no sort "
        "of the full table."
    ),
    "hilbert_layout": (
        "Hilbert reflect/rotate fold as ONE ArrayAggregate over the level "
        "sequence — state evaluates once per level (linear in bits); the "
        "normalization bounds are one bounded scalar aggregate."
    ),
    "equiheight_histogram": (
        "Per-group percentile(array) cut points broadcast back; bin "
        "assignment is a fold over the tiny cut array in codegen; the "
        "count is map-side combinable."
    ),
    "split_leakage": (
        "Production LSH pair pipeline (banded equi-join + exact-Jaccard "
        "verify) joined to a pure-projection hash_split column; the final "
        "rollup touches only verified pairs."
    ),
    "edit_distance_pairs": (
        "Length-bucket + prefix blocking equi-join (never all-pairs); "
        "in-block verify is the exact JVM levenshtein; the +1 bucket "
        "probe covers pairs straddling a bucket boundary."
    ),
    "join_size_estimate": (
        "Two map-side-combinable count tables joined on the key; the "
        "output-size sum and hottest-key max are one aggregation — the "
        "join being audited never runs."
    ),
    "soft_cluster": (
        "Centroids inlined as one parsed expression; softmax + entropy "
        "are array arithmetic in codegen — map-only, zero shuffles."
    ),
    "mean_pool": (
        "posexplode to (group, dim, value), ONE combinable average per "
        "(group, dim), ordered reassembly of the dimension-sized "
        "aggregate — constant reducer memory per group."
    ),
    "funnel_counts": (
        "Each funnel stage is a combinable per-user aggregation joined to "
        "the persisted previous stage; the fact table is scanned once per "
        "step, never re-executed per count (stages persist)."
    ),
    "cdc_apply": (
        "Latest-change selection is WindowGroupLimit (per-key top-1, no "
        "full sort); the merge is ONE full-outer join + projection."
    ),
    "srp_near_pairs": (
        "SRP fingerprints are one parsed map-only expression (no joins, no "
        "Python); candidates come from the banded hamming equi-join with "
        "popcount verify — no all-pairs anywhere."
    ),
    "bm25_search": (
        "Tokens are filtered to the query terms BEFORE any aggregation, so "
        "the shuffle carries only matching postings; idf and length norms "
        "join back broadcast-size."
    ),
    "dup_span_profile": (
        "Span-level dedup: the per-span hash pipeline is computed once "
        "(persisted exploded positions feed both the frequency count and "
        "the join-back); union coverage is a window, not a pair join."
    ),
    "timeline_features": (
        "All seven features share ONE exchange (hash partition on user_id); "
        "lag/lead/rolling/range frames are window expressions over the same "
        "sort — no joins, no extra shuffles."
    ),
    "quantile_sketch": (
        "The synopsis is TakeOrderedAndProject(k) over a map-side hash "
        "projection — the full table is never globally sorted and never "
        "shuffled; the estimate aggregates k rows."
    ),
    "hard_negative_samples": (
        "IVF assignment is map-only (literal centroids); ranks are "
        "per-cluster windows; cluster sizes ride a broadcast; the only "
        "real shuffle is the (cluster, rank) self-join."
    ),
    "hilbert_layout_3d": (
        "d-dimensional Skilling transpose as ONE ArrayAggregate over the "
        "level sequence (state = the d coordinates; dimension loop, Gray "
        "chain, interleave unrolled over the BOUND accumulator — nothing "
        "re-evaluates per term); curve values computed per DISTINCT grid "
        "cell and broadcast back."
    ),
    "curation_pipeline_v2": (
        "Four stages, one plan: the contamination-gated corpus persists "
        "once and feeds the split projection, LSH banding, verify "
        "shingles, and train assembly; the benchmark gram set and "
        "fingerprint set ride broadcasts; the only wide ops are the LSH "
        "band join, the per-doc overlap rollup, and the A-ES window."
    ),
    "topk_maintenance": (
        "Each space-saving step is one combinable grouped count merged "
        "with the <= m-row state (left-anti/semi admission credit) and a "
        "TakeOrdered(m+1) — driver transfer bounded by m, never the key "
        "space."
    ),
    "incremental_fuzzy": (
        "Per increment: ONE md5 shingle pass persisted, signature/banding/"
        "verify derived from it; history joins touch only colliding index "
        "rows ((band,bucket) equi-join), never historical text — O(batch) "
        "per increment."
    ),
    "token_budget_select": (
        "Global quality cutoff WITHOUT a single-reducer window: one range "
        "shuffle on (quality desc, id), per-partition subtotals folded "
        "into driver prefix offsets (one row per partition), exhausted "
        "partitions pruned to constant-false, partition-LOCAL cumulative "
        "windows stitched with the offset."
    ),
    "cluster_split": (
        "Leakage-free split: the near-dup component label (LSH + verify + "
        "min-label propagation) is the split key, so the hash split is a "
        "pure projection over the cluster id — near-dup pairs cannot "
        "straddle splits by construction."
    ),
    "join_strategy": (
        "The planner's decision as a 1-row plan: two combinable grouped "
        "counts + 1-row rollups stitched by O(1) scalar cross joins; the "
        "skew test is division-free (max_key*keys > ratio*n); the join "
        "being planned never runs."
    ),
    "pricing_summary": (
        "Filter + column pruning reach the parquet scan: PushedFilters "
        "carries the shipdate predicate and ReadSchema lists only the "
        "aggregated columns."
    ),
    "asof_join": (
        "The union-sort as-of join costs ONE exchange for the unioned "
        "stream (hash partition on user_id) + a window — no inequality "
        "nested-loop, no row explosion."
    ),
    "interval_join": (
        "Point-in-interval range join as a bucketed EQUI-join (explode to "
        "bounded bucket ids) — no CartesianProduct, no "
        "BroadcastNestedLoopJoin anywhere in the plan."
    ),
    "bloom_decontaminate": (
        "The Bloom probe is a PURE MAP: the filter rides in as a literal "
        "bitmask probed with getbit inside codegen; the only exchange is "
        "the final per-source rollup. Zero joins."
    ),
    "cms_counts": (
        "Count-min state is built in a single pass over the input (one "
        "lineitem scan for the state, one for the probe keys), with "
        "map-side partial aggregation before the one shuffle."
    ),
    "cosine_topk": (
        "Exact ANN baseline: scan -> project -> TakeOrderedAndProject; "
        "the global top-k never sorts more than k rows per partition, "
        "no shuffle."
    ),
    "dedup_lsh_fast": (
        "LSH banding: the pair join is an equi-join on (band, bucket) — "
        "bucketed candidate generation, never an all-pairs product."
    ),
    "triangle_count": (
        "Degree-ordered triangle counting: three shuffle stages (degree "
        "agg, wedge self-join on the oriented source, closing semi-join), "
        "each with map-side partial aggregation; no nested loops."
    ),
    "tfidf_top_terms": (
        "TF-IDF: map-only explode, two map-side-combinable aggregations, "
        "a 1-row broadcast for the corpus count, and WindowGroupLimit for "
        "the per-document top-n (partial top-k before the window sort)."
    ),
    "kg_edge_list": (
        "Deterministic node enumeration via RANGE partitioning + per-"
        "partition offsets — no single-reducer global window."
    ),
    "embedding_near_pairs_exact": (
        "Exact all-pairs cosine as a block-matrix grid: ONE hash exchange "
        "keyed by grid cell feeding FlatMapGroupsInPandas (an Arrow matmul "
        "per cell) — the quadratic arithmetic never appears as a "
        "CartesianProduct or a row-exploding join."
    ),
    "embedding_near_pairs_probe2": (
        "Multi-probe near-pairs on the same grid core, keyed by (cluster, "
        "cell); the only post-grid shuffle is the dedup over SURVIVING "
        "pairs (threshold applied inside the cells), not the nprobe²-"
        "inflated candidate set."
    ),
    "dsir_weights": (
        "DSIR scoring: both model fits are bounded-by-buckets groupBys; "
        "the <=B-row log-ratio table hits the exploded doc-gram stream as "
        "ONE BroadcastHashJoin (plus 1-row scalar broadcasts for the "
        "smoothing denominators) — the per-doc sum is the only "
        "data-volume shuffle."
    ),
    "perplexity_buckets": (
        "CCNet cuts without a data-row window: the cumulative walk runs "
        "over the DISTINCT (lang, milli) histogram (bounded by the value "
        "domain), and per-language thresholds broadcast back onto the doc "
        "stream — no full-corpus sort anywhere."
    ),
    "bpe_encode": (
        "Train-then-apply tokenizer: after the bounded merge learning "
        "(driver scalars, k-means-seed convention) the encode is a chain "
        "of literal string rewrites — pure map over the exploded word "
        "stream, one shuffle for the per-doc rollup."
    ),
    "embedding_quantize": (
        "Int8 quantization fidelity is a pure projection: zip_with/"
        "aggregate HOFs inside WholeStageCodegen, zero exchanges before "
        "the scan-to-result pipeline."
    ),
    "sparql_topk": (
        "SPARQL ORDER BY + LIMIT compiles to TakeOrdered (map-side "
        "partial heaps), and the constant-predicate patterns stay "
        "pushable scan filters under the DISTINCT."
    ),
    "quality_gate": (
        "Composite Gopher gate: two of the three signal blocks are pure "
        "projections; the top-word share is one map-side-combinable "
        "aggregation; the gate itself is two equi-joins on the doc id."
    ),
    "sparql_values": (
        "SPARQL VALUES inline data joins as a BROADCAST hash join "
        "(LocalTableScan build side) — the pattern side never shuffles "
        "for a binding table, and an UNDEF cell rides through as NULL."
    ),
    "sparql_path": (
        "A / property path desugars into chained pattern scans: each "
        "hop keeps its constant-predicate filter pushable and the hops "
        "hash-join through the anonymous internal variable."
    ),
    "sparql_not_exists": (
        "FILTER NOT EXISTS compiles to ONE hash anti join on the shared "
        "variable — no per-row subquery, no nested loop."
    ),
    "selection_pipeline_packed": (
        "Gate -> DSIR fit -> Gumbel top-40 -> concat-chunk packing as "
        "ONE plan: the only additions over selection_pipeline are the "
        "TakeOrdered boundary and one per-source window over the 40 "
        "selected rows — packing adds no corpus-scale shuffle."
    ),
    "perplexity_maintenance": (
        "Incremental CCNet bucketing: three histogram increments are "
        "counter-sum merges over the compressed (lang, milli) domain; "
        "thresholds broadcast back onto the scored stream exactly like "
        "the one-pass plan (same eqNullSafe broadcast join)."
    ),
    "sparql_group_having": (
        "HAVING with a direct aggregate call rides the SAME single "
        "aggregation (partial+final HashAggregate over ONE exchange) as "
        "a hidden column; the constraint is a post-aggregation Filter — "
        "no second shuffle, no re-aggregation."
    ),
    "sparql_path_star": (
        "p* = the pointer-doubling pair closure UNION the zero-length "
        "identity rows (a distinct projection of the graph's terms) — "
        "the closing hop joins stay equi-joins; no nested loop, no "
        "per-row recursion."
    ),
    "selection_pipeline_tokens": (
        "Tokenizer-aware packing stays ONE plan: BPE merges are 6 driver "
        "scalars; encoding the 40 SELECTED docs is a map-only chained "
        "rewrite (never the corpus); the pack window is per-source over "
        "40 rows — subword budgeting adds no corpus-scale work."
    ),
    "png_features": (
        "Compressed-image decode is ONE Arrow mapInPandas over a narrow "
        "(doc_id, content) projection — the binary column never reaches "
        "a shuffle; zlib inflate + unfilter happen inside the Python "
        "worker, output is 9 scalar columns."
    ),
    "sparql_scale_builtins": (
        "The builtin library stays scan-side: STRENDS compiles to a "
        "StringEndsWith PUSHED into the parquet scan (check "
        "PushedFilters), STRAFTER/STRBEFORE/ROUND/FLOOR are pure "
        "projections, the brand->price hop is ONE broadcast hash join, "
        "and the grouped SUMs are ONE partial+final aggregation "
        "exchange. Catalyst constant-folds the predicate-literal "
        "comparison on every other union branch to FALSE and prunes "
        "the scans away."
    ),
    "sparql_graph_scale": (
        "Three dataset contexts in ONE plan: GRAPH ?g scans the named "
        "graphs with g riding as a join column, GRAPH <iri> prunes to "
        "one graph (pushed predicate filter), the default-graph pattern "
        "scans only g-IS-NULL rows — all joined as ordinary hash joins, "
        "one aggregation exchange; no per-graph driver loop."
    ),
    "sparql_from_dataset": (
        "FROM/FROM NAMED are a canonicalizing filter+union BEFORE "
        "planning (default graph rebuilt as g-IS-NULL rows), so the "
        "plan below the rewrite is the ordinary pushed-scan / hash-join "
        "/ single-aggregation-exchange shape — dataset construction "
        "adds no new operator, no extra shuffle."
    ),
    "sparql_update_graph": (
        "UPDATE is membership algebra, not mutation: each DELETE is a "
        "hash ANTI join of the graph against the instantiated delete "
        "set, the INSERT templates are projections of ONE shared "
        "solution table (InMemoryRelation reused across all three "
        "consumers), and the final set-semantics dedup is the single "
        "added exchange. Both ops' WHERE filters (StringStartsWith, "
        "EqualTo) push into the parquet scans."
    ),
    "sparql_typed_order": (
        "SPARQL 15.1 VALUE ordering stays codegen-side: MIN/MAX compile "
        "to min_by/max_by over the (bucket, value, raw) key struct — "
        "ONE partial+final aggregation exchange, no extra pass — and "
        "the outer ORDER BY ... LIMIT 10 is a TakeOrderedAndProject "
        "over the expanded key triple (map-side heaps, never a full "
        "sort). The key's regexp gates are single-pass regexp_replace "
        "strips (operand appears once — the round-12 codegen lesson)."
    ),
    "sparql_datetime": (
        "xsd:dateTime comparisons are pure Catalyst: the FILTER "
        "boundary compiles to a cast-to-timestamp comparison inside "
        "the scan-side Filter (whole-stage codegen, no UDF), MIN(?t) "
        "is min_by over the instant-valued key struct in the SAME "
        "single aggregation exchange as the COUNT."
    ),
    "sparql_graph_topk": (
        "Per-graph paging is ONE window, not a per-graph loop: "
        "DISTINCT (g, o) is one aggregation exchange, then row_number "
        "over (PARTITION BY g ORDER BY key-triple DESC) cuts every "
        "graph's page in a single hash-partitioned shuffle on g — the "
        "same plan at 3 graphs or 3 million."
    ),
    "sparql_construct_quads": (
        "The quad CONSTRUCT computes the WHERE solutions ONCE "
        "(persist-shared InMemoryRelation), each template quad is a "
        "projection of it — the variable-graph scatter is just "
        "projecting the bound g column — and the set-semantics dedup "
        "is the single added exchange. The brand filter "
        "(StringStartsWith) pushes into the parquet scan."
    ),
}


def main() -> None:
    import __spark_entry__ as entrymod
    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan evidence for representative queries",
        "",
        f"Generated by `scripts/dump_plans.py` at `{SF_DIR}` "
        "(plan SHAPE is scale-independent; AQE may re-plan exchange "
        "counts at runtime).",
        "",
    ]
    import contextlib
    import io

    queries = entrymod.queries()
    for name, claim in SHOWCASE.items():
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        plan = buf.getvalue()
        out.append(f"## {name}")
        out.append("")
        out.append(claim)
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "PLANS.md")
    # hand-written evidence (triage notes, measured regressions) survives
    # regeneration: everything from the marker down is carried over
    manual = ""
    if os.path.exists(path):
        old = open(path).read()
        if MANUAL_MARK in old:
            manual = old[old.index(MANUAL_MARK):]
    with open(path, "w") as fh:
        fh.write("\n".join(out))
        if manual:
            fh.write("\n" + manual)
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
