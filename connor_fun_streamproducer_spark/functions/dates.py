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


@op(
    "fn_timestamp_format",
    oracle="""
    WITH f AS (
        SELECT event_id, ts,
               strftime(ts, '%Y-%m-%d %H') AS fmt_hour
        FROM events
    )
    SELECT event_id,
           fmt_hour,
           strptime(fmt_hour, '%Y-%m-%d %H')          AS parsed_hour,
           make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000)
                                                       AS from_epoch,
           CAST(weekofyear(ts) AS INTEGER)             AS iso_week
    FROM f
    """,
    tags=("ext", "fn"),
)
def fn_timestamp_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting / parsing round trip: format to a truncated
    string form, parse it back, rebuild from epoch seconds, ISO week —
    the string-boundary surface every ingest touches (log lines,
    filenames, API payloads all carry formatted time).

    Format-token dialects differ per engine (Spark's SimpleDateFormat
    ``yyyy-MM-dd HH`` vs strftime ``%Y-%m-%d %H``); the op pins one
    canonical hour-truncated interchange format and proves the full
    round trip — format → parse → timestamp — lands on the identical
    instant on both engines under the session's pinned UTC zone.
    Pure map-side codegen, zero shuffles, and the parse path is the
    explicit-format fast path (pattern-inferred parsing row by row is
    the slow path the docstring's production advice forbids).
    """
    ev = load(spark, sf_dir, "events")
    fmt = F.date_format("ts", "yyyy-MM-dd HH")
    return ev.select(
        "event_id",
        fmt.alias("fmt_hour"),
        F.to_timestamp(fmt, "yyyy-MM-dd HH").alias("parsed_hour"),
        F.timestamp_seconds(
            F.col("ts").cast("timestamp_ltz").cast("long")
        ).alias("from_epoch"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
    )
