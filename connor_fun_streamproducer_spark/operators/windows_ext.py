"""Window extensions: event-time RANGE frames.

operators/windows.py covers rank/analytic/ROWS-frame windows; this adds
the time-interval RANGE frame — "total over this key's trailing 30
days" — which a ROWS frame cannot express (row counts per day vary).
Reference anchor: the 30 s tumbling window of regionSpout.go:102-117 is
the stream form; this is the batch form over arbitrary lookback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

LOOKBACK_S = 30 * 86400  # 30 days


@op(
    "win_range_interval",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec
        FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT)        AS n_orders_30d,
           round(sum(o_totalprice) OVER w, 2)     AS total_30d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY sec
                 RANGE BETWEEN {LOOKBACK_S} PRECEDING AND CURRENT ROW)
    """,
    tags=("ext", "window", "temporal"),
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day per-customer totals via an event-time RANGE frame.

    The frame is value-based (orderdate seconds ± lookback), not
    row-based, so days with many orders widen the frame correctly —
    the canonical "rolling spend" feature every fraud/abuse pipeline
    derives. Both engines run the identical numeric RANGE spec over
    epoch seconds (no interval-type semantics to diverge on). One
    (o_custkey) exchange serves the sort and the frame scan; a RANGE
    frame aggregates all peer rows of equal sec, so ties need no
    tie-break column — the result per row is order-independent and
    hash-stable. At 100 TB the plan is scan → one keyed exchange →
    per-partition sorted sliding aggregation, bounded by each
    customer's own history.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        # o_orderdate loads as TIMESTAMP_NTZ (no direct long cast);
        # session TZ is pinned UTC so the timestamp hop is exact.
        F.col("o_orderdate").cast("timestamp").cast("long").alias("sec"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("sec")
        .rangeBetween(-LOOKBACK_S, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).cast("bigint").alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("total_30d"),
    )
