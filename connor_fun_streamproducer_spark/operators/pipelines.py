"""Composite end-to-end analytical pipelines (TPC-H query shapes).

Single-operator ops prove each §2 primitive in isolation; these prove the
primitives COMPOSE — multi-table join chains + selective filters +
aggregation + deterministic top-k, the shape every real report query takes.
They are also the plans where Catalyst's global decisions (join ordering,
broadcast selection, partial aggregation placement, AQE re-plan) actually
matter, so they anchor the bench headline set.

The reference has no query language (SURVEY §3 — its one dataflow is
hard-wired, regionSpout.go:57-124); these pipelines are the EXT-tier
"what its downstream analytics would run" surface, exercised on the
driver's TPC-H-ish fixtures.

Scale notes (100 TB):
- Dims (region, nation) broadcast — never shuffled, asserted in
  tests/test_plans.py.
- The fact-fact joins (orders ⋈ lineitem) shuffle both sides once on the
  join key; the downstream group-by reuses that partitioning when it
  groups on the same key (shipping_priority groups on l_orderkey — zero
  extra exchange for the agg).
- Top-k is TakeOrderedAndProject (per-task heaps, driver merges k rows ×
  partitions), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "pipeline_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
    tags=("ext", "pipeline"),
)
def pipeline_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue ranking.

    customer(filtered segment) ⋈ orders(date-bounded) ⋈ lineitem
    (ship-after cutoff) → revenue per order → top 10. The customer side
    is selective (1 of 5 segments) and only contributes its key, so
    Catalyst broadcasts it into the orders scan; orders ⋈ lineitem is the
    one real shuffle, and the group-by on l_orderkey reuses its
    partitioning. Ties broken (o_orderdate, l_orderkey) for determinism.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@op(
    "pipeline_shipping_priority_bucketed",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
    tags=("ext", "pipeline", "scale"),
)
def pipeline_shipping_priority_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 on the bucketed layout: the same query, ZERO shuffle exchanges.

    Same semantics and oracle as pipeline_shipping_priority, but orders
    and lineitem come from the write-once bucketBy(orderkey) tables
    (operators/scale_patterns.bucketed_table — the same layout
    join_bucketed reads). The fact-fact join needs no exchange (bucket i
    joins bucket i), and the group-by on l_orderkey is satisfied by the
    same bucketing (HashPartitioning(l_orderkey) clusters any key set
    containing it), so the only data movement in the whole plan is the
    broadcast of the filtered customer keys and the final top-10 heap
    merge — asserted shuffle-free in tests/test_plans.py. At 100 TB this
    is the difference between re-shuffling 40 TB of lineitem per report
    query and never shuffling it again after the one layout write.
    """
    from connor_fun_streamproducer_spark.operators.scale_patterns import bucketed_table

    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@op(
    "pipeline_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("ext", "pipeline"),
)
def pipeline_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join, revenue where supplier and customer
    share a nation, grouped by nation.

    The join graph mixes two genuinely bounded dims (region 5 rows,
    nation 25 rows — fixed cardinality at ANY scale factor, so they get
    explicit broadcast hints) with the orders ⋈ lineitem fact join; the
    supplier⋈customer nation equality is the classic "local volume"
    correlated predicate. customer and supplier GROW with the scale
    factor (billions of rows at 100 TB), so they carry no broadcast
    hint — AQE broadcasts them at small sf from observed sizes and
    falls back to shuffle joins at scale, instead of an OOM-forcing
    hint that Catalyst obeys regardless of size. The final 5-group agg
    is partial+final.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@op(
    "pipeline_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           round(c.c_acctbal, 4) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    tags=("ext", "pipeline"),
)
def pipeline_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    half-year window, with nation enrichment.

    lineitem(returnflag) ⋈ orders(quarter) is the fact join; nation (25
    rows at any scale) broadcasts by hint. customer grows with the scale
    factor, so it gets NO hint — AQE broadcasts it at small sf and
    shuffles it at 100 TB, where a forced broadcast would OOM the
    executors. Group keys include the non-aggregated display columns
    (TPC-H idiom) so no second join is needed to re-attach them.
    Top-20 is TakeOrderedAndProject with c_custkey tie-break.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
