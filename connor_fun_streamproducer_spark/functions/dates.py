"""Date/time function family (fn_date).

The reference's only time handling is wall-clock sleeps
(/root/reference/regionSpout.go:98,103) — event time never leaves the
opaque payload. Here event time is first-class: all bucketing below is the
same epoch-aligned arithmetic the streaming windows use, pinned to UTC by
the session (session.py) so Spark and DuckDB agree bit-for-bit.

Engine deltas handled explicitly: DuckDB dayofweek() is 0=Sunday while
Spark's is 1=Sunday (+1 in the oracle); Spark datediff returns INT while
DuckDB date_diff returns BIGINT (cast in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)                AS order_month,
           CAST(year(o_orderdate) AS INTEGER)                                 AS order_year,
           CAST(month(o_orderdate) AS INTEGER)                                AS order_mon,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)                        AS order_dow,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2002-01-01 00:00:00') AS INTEGER)        AS days_to_2002,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)                          AS order_unix,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)                       AS plus_3_months
    FROM orders
    """,
    tags=("ext", "fn"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation, field extraction, diffs, epoch, and month arithmetic."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), "o_orderdate").alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("order_unix"),
        F.add_months("o_orderdate", 3).alias("plus_3_months"),
    )


@op(
    "fn_date_bucket",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*)                    AS n,
           round(sum(value), 4)        AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("ext", "fn"),
)
def fn_date_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bucketing of the event stream — batch twin of a 1-day
    tumbling window (window(ts, '1 day').start == date_trunc('day', ts)
    for epoch-aligned UTC sessions)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
