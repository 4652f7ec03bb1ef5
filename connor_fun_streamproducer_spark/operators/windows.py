"""Window (analytic) functions.

Not present in the reference (its only stateful computation is the counter
array, regionSpout.go:77). Window functions are the relational twin of its
per-region running state: partition = region/user, frame = history.

Determinism rules for the oracle hash (registry.py conventions):
- row_number/ntile ORDER BY must be a total order (composite key) —
  otherwise tie order is engine- and run-dependent.
- rank/dense_rank are deterministic under ties by definition, so they get
  a deliberately tie-ful ORDER BY to exercise real rank semantics.
- last_value needs an explicit unbounded-following frame on both engines
  (the SQL-standard default frame stops at CURRENT ROW).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey)      AS rn,
           ntile(4)     OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey)      AS quartile,
           rank()       OVER (PARTITION BY c_mktsegment
                              ORDER BY c_nationkey)                    AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_nationkey)                    AS drnk
    FROM customer
    """,
    tags=("ext", "window"),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number + ntile (total order), rank + dense_rank
    (tie-ful order, exercising gap semantics). One shuffle per distinct
    partitioning — both windows share PARTITION BY c_mktsegment, so
    Catalyst plans a single exchange."""
    c = load(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_ties = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w_total).alias("rn"),
        F.ntile(4).over(w_total).alias("quartile"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


@op(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS first_type,
           last_value(event_type)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("ext", "window"),
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user session ordered by event time."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w_full).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@op(
    "win_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
    FROM events
    """,
    tags=("ext", "window"),
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average — explicit ROWS frames.

    ROWS frames evaluate incrementally in one pass per partition; RANGE
    frames on floats would re-scan peers. The per-user running sum is the
    event-history generalization of the reference's per-region counter.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias("running_sum"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )
