"""Table profiling — the ANALYZE-TABLE stage every warehouse runs before
trusting its optimizer.

The reference never inspects its data (it forwards whatever Twitter sends,
/root/reference/regionSpout.go:98-124); a 100 TB engine cannot afford
that: join ordering, broadcast thresholds, and skew handling all start
from per-column statistics. ``stats_table_profile`` computes the standard
profile — row count, null count, exact NDV, min, max — for the numeric
measure columns of ``lineitem`` in ONE scan.

Scale design: the table is unpivoted (Expand) to (column, value) rows and
profiled with a single grouped aggregation, so the input is read once
regardless of how many columns are profiled; the expand factor equals the
profiled-column count, and the distinct aggregation runs as the standard
two-phase partial/final on (column, value) — per-column cardinality, not
table cardinality, crosses the wire. At production scale the exact NDV
would be ``approx_count_distinct`` (one pass, mergeable HLL, see
operators/scale_patterns.py agg_sketch_merge for the sketch tier); it is
exact here so the DuckDB oracle can hash-match it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _col_oracle(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT)                 AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT)    AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT)      AS ndv,
           min({c})                                 AS min_v,
           max({c})                                 AS max_v
    FROM lineitem
    """


@op(
    "stats_table_profile",
    oracle=" UNION ALL ".join(_col_oracle(c) for c in PROFILE_COLS),
    tags=("ext", "agg", "stats", "scale"),
)
def stats_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan per-column statistics for the lineitem measures.

    One row per profiled column: row count, null count, exact NDV, min,
    max — the inputs a cost-based optimizer needs for selectivity and
    broadcast decisions. Implemented as ``unpivot`` → one grouped
    aggregation, so profiling N columns still reads the table once (the
    alternative, N separate aggregations, is N scans of 100 TB).
    """
    li = load(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    long = li.unpivot([], PROFILE_COLS, "col_name", "value")
    return long.groupBy("col_name").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).cast("bigint").alias("n_null"),
        F.count_distinct("value").cast("bigint").alias("ndv"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
