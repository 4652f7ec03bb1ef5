"""Subquery-shaped pipelines: the query forms relational users actually
write that are NOT plain join chains — grouped-HAVING membership, scalar
subqueries, and correlated (NOT) EXISTS with extra predicates.

Catalyst de-correlates all of these into joins (semi/anti + broadcast of
scalar aggregates), which is exactly the 100 TB story: none of them
executes per-row re-evaluation of the inner query — each plans as one
additional hash join against a (usually tiny) aggregated frame. The
DataFrame forms below build the de-correlated shape explicitly so the plan
is deterministic and auditable.

The reference has no query language (SURVEY.md §3); these extend the EXT
pipeline tier alongside the Q1/Q3/Q5/Q10 shapes in operators/pipelines.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "pipeline_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 4) AS o_totalprice,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 200
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    tags=("ext", "pipeline", "subquery"),
)
def pipeline_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders.

    The IN (GROUP BY … HAVING) membership subquery becomes a left-semi
    join against the aggregated order-quantity frame — computed ONCE,
    shuffled on the same l_orderkey key the main join uses, so the
    pre-filter rides the existing partitioning. At 100 TB the semi join
    prunes the orders side before the expensive customer join, which is
    the point of the Q18 shape: aggregate-driven selectivity, no
    correlated re-execution.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@op(
    "pipeline_dormant_accounts",
    oracle="""
    WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
    SELECT c.c_mktsegment,
           count(*) AS n_cust,
           round(sum(c.c_acctbal), 4) AS total_bal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
    tags=("ext", "pipeline", "subquery"),
)
def pipeline_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no recent orders.

    Two subquery forms in one query: a scalar subquery (global positive-
    balance average) that becomes a 1-row broadcast cross join, and a
    correlated NOT EXISTS with an extra predicate that becomes a left-anti
    join against the date-filtered orders keys. Both decorrelate to joins:
    the scalar costs one tiny aggregate, the anti join shuffles only
    (custkey) pairs of one quarter's orders. No per-row subquery
    re-execution anywhere — the 100 TB plan is scan + two joins.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    )
    recent = o.filter(F.col("o_orderdate") >= "1998-01-01").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@op(
    "pipeline_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("ext", "pipeline", "subquery"),
)
def pipeline_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with a late line.

    Correlated EXISTS whose inner predicate references BOTH sides
    (l_shipdate > o_orderdate + 60 days) — the decorrelation is a
    left-semi join with the cross-side comparison as part of the join
    condition, so semi-join semantics (at most one match counted per
    order) replace DISTINCT-after-join. One quarter of orders semi-joined
    against lineitem on the natural key: the probe side is filter-pruned
    at the scan before the shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )
