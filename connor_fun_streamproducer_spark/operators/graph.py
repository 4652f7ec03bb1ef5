"""Iterative graph analytics: PageRank over the event-transition graph.

The reference treats events as independent records
(/root/reference/regionSpout.go:151-163); this derives the directed
graph BETWEEN event types (which type follows which, per user) and runs
PageRank on it — the iterative-algorithm pattern (loop of join + agg
over a rank frame) that also underlies label propagation
(operators/scale_patterns.py) and connected components. The iteration
count is fixed (5) and the recurrence is pure arithmetic, so unlike
most iterative ops this one is FULLY oracle-checkable: the DuckDB side
unrolls the same five steps as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import epoch_seconds, load
from connor_fun_streamproducer_spark.registry import op

DAMPING = 0.85
N_ITERS = 5


def _oracle() -> str:
    """Unroll the PageRank recurrence as chained CTEs (r0 → r5)."""
    steps = []
    for k in range(1, N_ITERS + 1):
        steps.append(
            f"""r{k} AS (
        SELECT n.node,
               (1 - {DAMPING}) / (SELECT count(*) FROM nodes)
               + {DAMPING} * coalesce(sum(r.rank * e.p), 0) AS rank
        FROM nodes n
        LEFT JOIN e ON e.dst = n.node
        LEFT JOIN r{k - 1} r ON r.node = e.src
        GROUP BY n.node
    )"""
        )
    return f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                              event_id) AS prev
        FROM events
    ), edges AS (
        SELECT prev AS src, event_type AS dst, CAST(count(*) AS DOUBLE) AS w
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), outw AS (
        SELECT src, sum(w) AS tot FROM edges GROUP BY 1
    ), e AS (
        SELECT edges.src, edges.dst, edges.w / outw.tot AS p
        FROM edges JOIN outw USING (src)
    ), nodes AS (
        SELECT DISTINCT event_type AS node FROM events
    ), r0 AS (
        SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS rank FROM nodes
    ), {", ".join(steps)}
    SELECT node, round(rank, 6) AS rank
    FROM r{N_ITERS}
    """


@op("graph_pagerank", oracle=_oracle(), tags=("ext", "graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 5 iterations) on the event-type transition graph.

    Two phases with opposite scale profiles. Phase 1 is the heavy one at
    100 TB and is fully distributed: per-user event sequences (one
    (user_id) exchange for the lag window) collapse into a weighted
    edge list — the graph is the |types|² transition matrix, so the agg
    exchange carries ≤25 partial rows however large the log is, and it
    runs EXACTLY ONCE: the bounded edge/node frames are then collected
    (≤25 + ≤5 rows — dim-scale driver work, the IVF-codebook pattern,
    llm/similarity.py) so the five unrolled iterations operate on local
    relations instead of re-deriving the window tower per branch (the
    lazy-plan form re-ran the lag window 10×). For web-scale graphs
    (unbounded node sets) the same recurrence runs with keyed shuffles
    on un-collected frames plus a checkpoint every few rounds — the
    shape of dedup_minhash_cluster's label propagation. Dangling mass
    (a node with no out-edges) is dropped identically on both sides;
    the oracle unrolls the same five steps as CTEs, making this a rare
    fully hash-checked iterative operator.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", epoch_seconds("ts").alias("sec")
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(order))
    edges = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").cast("double").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    e = edges.join(outw, "src").select("src", "dst", (F.col("w") / F.col("tot")).alias("p"))

    # ONE distributed pass; both results are bounded by |event types|.
    edge_rows = e.collect()  # ≤ |types|² rows
    node_rows = sorted(
        {r["node"] for r in ev.select(F.col("event_type").alias("node")).distinct().collect()}
    )
    n_nodes = len(node_rows)

    nodes = spark.createDataFrame([(n,) for n in node_rows], "node string")
    local_e = spark.createDataFrame(
        [(r["src"], r["dst"], r["p"]) for r in edge_rows], "src string, dst string, p double"
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(N_ITERS):
        contrib = local_e.join(ranks, local_e.src == ranks.node).select(
            F.col("dst").alias("node"), (F.col("rank") * F.col("p")).alias("c")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .groupBy("node")
            .agg(
                (
                    F.lit((1 - DAMPING) / n_nodes)
                    + DAMPING * F.coalesce(F.sum("c"), F.lit(0.0))
                ).alias("rank")
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
