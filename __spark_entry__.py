"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ComPath-style enrichment query at
sf0.001. ``queries()`` maps operator names (SURVEY.md §2) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB-
equivalent SQL the driver cross-checks at sf0.01.

Conventions for oracle parity:
* every aggregate/computed column is aliased identically on both sides;
* double-typed aggregates are rounded (2dp money, 6dp ratios) so
  floating-point summation order can't flip the value hash;
* counts are BIGINT on both sides (DuckDB sums are cast explicitly);
* timestamps are reduced to BIGINT epoch seconds on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEED_PART_NAMES = ["cold widget", "small widget", "large bolt"]
_SEED_SQL = "('cold widget', 'small widget', 'large bolt')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from bio2bel_spark.tables import load_table

    return load_table(spark, sf_dir, name)


def _pathway_store(spark: SparkSession, sf_dir: str):
    """Bind the ComPath operators to the driver's M2M trio:
    orders (pathways) ↔ part (proteins) via lineitem (membership)."""
    from bio2bel_spark.operators.pathways import PathwayStore

    return PathwayStore(
        _t(spark, sf_dir, "orders").select(
            F.col("o_orderkey"), F.col("o_orderpriority"), F.col("o_totalprice")
        ),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("l_partkey").alias("p_partkey"),
        ),
        pathway_key="o_orderkey",
        protein_key="p_partkey",
        symbol_col="p_name",
        pathway_name_col="o_orderpriority",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the enrichment query (§3.2) at sf0.001."""
    return q_pathway_enrichment(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------- queries


def q_pathway_enrichment(spark, sf_dir):
    """SURVEY §3.2 / J1-J3 + A5-A6: single-plan enrichment."""
    return _pathway_store(spark, sf_dir).query_symbols(SEED_PART_NAMES)


def q_pathway_size_distribution(spark, sf_dir):
    """A4: GROUP BY + HAVING."""
    return _pathway_store(spark, sf_dir).pathway_size_distribution()


def q_gene_pathway_counts(spark, sf_dir):
    """A4/A5: per-gene pathway-count distribution."""
    return _pathway_store(spark, sf_dir).gene_pathway_count_distribution()


def q_pathway_to_symbols(spark, sf_dir):
    """A6: grouped multidict (collect_set)."""
    return _pathway_store(spark, sf_dir).pathway_to_symbols()


def q_substring_search(spark, sf_dir):
    """P11: case-insensitive disjunctive substring search."""
    return _pathway_store(spark, sf_dir).search_genes("WIDGET")


def q_in_set_lookup(spark, sf_dir):
    """P7: IN-set filter."""
    return _pathway_store(spark, sf_dir).get_proteins_by_symbols(SEED_PART_NAMES)


def q_pricing_summary(spark, sf_dir):
    """A4 + P10 on the fact table (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_by_region(spark, sf_dir):
    """J1-chain over all dims (TPC-H Q5 shape): broadcast dims, one shuffle."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_latest_event_per_user(spark, sf_dir):
    """O1: latest-per-key via row_number window (provenance `ls` pattern)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
    )


def q_upsert_anti(spark, sf_dir):
    """A7/U1: insert-if-absent left-anti join (namespace update semantics)."""
    part = _t(spark, sf_dir, "part")
    existing = part.filter(F.col("p_partkey") < 100).select("p_partkey")
    incoming = part.filter(F.col("p_partkey") < 150).select("p_partkey", "p_name")
    return incoming.join(existing, "p_partkey", "left_anti")


def q_distinct_segments(spark, sf_dir):
    """A3: DISTINCT."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def q_nation_segments(spark, sf_dir):
    """A6 + J1: per-nation sorted set of customer segments."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sort_array(F.collect_set("c_mktsegment")).alias("segments"))
    )


def q_content_hash(spark, sf_dir):
    """F11/A9: order-sensitive dataset content hash (namespace md5 contract,
    reference src/bio2bel/utils.py:189-199)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            F.concat_ws(":", F.col("p_partkey").cast("string"), "p_name").alias("kv")
        )
        .agg(
            F.md5(F.concat_ws("|", F.sort_array(F.collect_list("kv")))).alias(
                "content_hash"
            )
        )
    )


def q_events_hourly(spark, sf_dir):
    """Windowed temporal rollup (batch form of the streaming agg)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_json_props(spark, sf_dir):
    """Semi-structured extraction from the events.props JSON column."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
        )
        .filter(F.col("k") > 50)
    )


def q_word_counts(spark, sf_dir):
    """UDTF-style explode fan-out (J6): token frequencies over documents."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_first_prefixed_token(spark, sf_dir):
    """F2/F3: higher-order-function extractor — first token with a prefix
    (the pubmed:/intact-miscore: pattern, reference intact.py:408-433)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("get(filter(split(text, ' '), x -> x like 's%'), 0)").alias(
            "first_s_token"
        ),
    )


def _kg(spark, sf_dir):
    """Knowledge graph from the driver tables: customer/supplier → nation
    'partOf'-style edges (bipartite star graph, deterministic)."""
    from bio2bel_spark.operators.graph import KnowledgeGraph

    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    c_edges = customer.select(
        F.lit("customer").alias("source_ns"),
        F.col("c_custkey").cast("string").alias("source_id"),
        F.lit("memberOf").alias("relation"),
        F.lit("nation").alias("target_ns"),
        F.col("c_nationkey").cast("string").alias("target_id"),
    )
    s_edges = supplier.select(
        F.lit("supplier").alias("source_ns"),
        F.col("s_suppkey").cast("string").alias("source_id"),
        F.lit("memberOf").alias("relation"),
        F.lit("nation").alias("target_ns"),
        F.col("s_nationkey").cast("string").alias("target_id"),
    )
    edges = c_edges.unionByName(s_edges)
    kg = KnowledgeGraph(None, edges)
    kg.nodes = kg.induced_nodes()
    return kg


def q_kg_triples(spark, sf_dir):
    """G1/S16: edges → (h, r, t) triples export shape."""
    return _kg(spark, sf_dir).triples()


def q_kg_edge_list(spark, sf_dir):
    """S15/J8: integer edge list via sorted node enumeration."""
    return _kg(spark, sf_dir).edge_list()


def q_kg_components(spark, sf_dir):
    """G4: connected components (distributed min-label propagation). Oracle
    by graph theory: each referenced nation forms exactly one component."""
    comp = _kg(spark, sf_dir).connected_components()
    return comp.agg(F.countDistinct("component").alias("n_components"))


def q_kg_descendants(spark, sf_dir):
    """G5: hierarchy BFS — all nodes under region 0 in the
    region←nation←customer containment hierarchy."""
    from bio2bel_spark.operators.graph import KnowledgeGraph

    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    hier = nation.select(
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("child"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("parent"),
    ).unionByName(
        customer.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("child"),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("parent"),
        )
    )
    roots = spark.createDataFrame([("r0",)], "node string")
    return KnowledgeGraph.descendants(hier, roots, "child", "parent")


QUERIES: dict[str, Callable] = {
    "kg_triples": q_kg_triples,
    "kg_edge_list": q_kg_edge_list,
    "kg_components": q_kg_components,
    "kg_descendants": q_kg_descendants,
    "pathway_enrichment": q_pathway_enrichment,
    "pathway_size_distribution": q_pathway_size_distribution,
    "gene_pathway_counts": q_gene_pathway_counts,
    "pathway_to_symbols": q_pathway_to_symbols,
    "substring_search": q_substring_search,
    "in_set_lookup": q_in_set_lookup,
    "pricing_summary": q_pricing_summary,
    "revenue_by_region": q_revenue_by_region,
    "latest_event_per_user": q_latest_event_per_user,
    "upsert_anti": q_upsert_anti,
    "distinct_segments": q_distinct_segments,
    "nation_segments": q_nation_segments,
    "content_hash": q_content_hash,
    "events_hourly": q_events_hourly,
    "json_props": q_json_props,
    "word_counts": q_word_counts,
    "first_prefixed_token": q_first_prefixed_token,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "kg_triples": """
            SELECT 'customer:' || c_custkey AS h, 'memberOf' AS r,
                   'nation:' || c_nationkey AS t
            FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey AS h, 'memberOf' AS r,
                   'nation:' || s_nationkey AS t
            FROM supplier
        """,
        "kg_edge_list": """
            WITH nodes AS (
                SELECT DISTINCT node FROM (
                    SELECT 'customer:' || c_custkey AS node FROM customer
                    UNION ALL SELECT 'supplier:' || s_suppkey FROM supplier
                    UNION ALL SELECT 'nation:' || c_nationkey FROM customer
                    UNION ALL SELECT 'nation:' || s_nationkey FROM supplier
                )
            ), idx AS (
                SELECT node, (ROW_NUMBER() OVER (ORDER BY node) - 1)::BIGINT AS node_id
                FROM nodes
            ), el AS (
                SELECT 'customer:' || c_custkey AS src, 'nation:' || c_nationkey AS dst
                FROM customer
                UNION ALL
                SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            )
            SELECT si.node_id AS source_id, ti.node_id AS target_id
            FROM el JOIN idx si ON el.src = si.node JOIN idx ti ON el.dst = ti.node
        """,
        "kg_components": """
            SELECT COUNT(DISTINCT n)::BIGINT AS n_components FROM (
                SELECT c_nationkey AS n FROM customer
                UNION SELECT s_nationkey FROM supplier
            )
        """,
        "kg_descendants": """
            SELECT 'r0' AS node
            UNION ALL
            SELECT 'n' || n_nationkey FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT 'c' || c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0
        """,
        "pathway_enrichment": f"""
            WITH pairs AS (
                SELECT l_orderkey AS o_orderkey, l_partkey AS p_partkey, p_name
                FROM lineitem JOIN part ON l_partkey = p_partkey
            ), agg AS (
                SELECT o_orderkey,
                       COUNT(DISTINCT p_partkey) FILTER (WHERE p_name IN {_SEED_SQL})
                           AS mapped_proteins,
                       COUNT(DISTINCT p_partkey) AS pathway_size,
                       list_sort(list(DISTINCT p_name) FILTER (WHERE p_name IN {_SEED_SQL}))
                           AS gene_set
                FROM pairs GROUP BY o_orderkey
            )
            SELECT a.o_orderkey, o.o_orderpriority AS pathway_name,
                   a.mapped_proteins, a.pathway_size, a.gene_set
            FROM agg a JOIN orders o ON a.o_orderkey = o.o_orderkey
            WHERE a.mapped_proteins > 0
        """,
        "pathway_size_distribution": """
            SELECT l_orderkey AS o_orderkey,
                   COUNT(DISTINCT l_partkey) AS pathway_size
            FROM lineitem GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) > 0
        """,
        "gene_pathway_counts": """
            SELECT p_name, COUNT(DISTINCT l_orderkey) AS n_pathways
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name IS NOT NULL
            GROUP BY p_name HAVING COUNT(DISTINCT l_orderkey) > 0
        """,
        "pathway_to_symbols": """
            SELECT l_orderkey AS o_orderkey,
                   list_sort(list(DISTINCT p_name)) AS symbols
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name IS NOT NULL
            GROUP BY l_orderkey
        """,
        "substring_search": """
            SELECT * FROM part WHERE lower(p_name) LIKE '%widget%'
        """,
        "in_set_lookup": f"""
            SELECT * FROM part WHERE p_name IN {_SEED_SQL}
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_region": """
            SELECT r_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type,
                   floor(epoch(ts))::BIGINT AS ts_epoch
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "upsert_anti": """
            SELECT p_partkey, p_name FROM part
            WHERE p_partkey < 150
              AND p_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey < 100)
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer
        """,
        "nation_segments": """
            SELECT n_name, list_sort(list(DISTINCT c_mktsegment)) AS segments
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "content_hash": """
            SELECT md5(string_agg(kv, '|' ORDER BY kv)) AS content_hash
            FROM (SELECT p_partkey || ':' || p_name AS kv FROM part)
        """,
        "events_hourly": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
                   event_type,
                   COUNT(*)::BIGINT AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "json_props": """
            SELECT event_id, (props::JSON ->> 'k')::BIGINT AS k
            FROM events WHERE (props::JSON ->> 'k')::BIGINT > 50
        """,
        "word_counts": """
            SELECT word, COUNT(*)::BIGINT AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word
        """,
        "first_prefixed_token": """
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x LIKE 's%')[1]
                       AS first_s_token
            FROM documents
        """,
    }
