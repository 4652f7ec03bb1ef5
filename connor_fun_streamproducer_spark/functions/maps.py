"""Map function family (fn_map).

The reference re-embeds region metadata as a JSON string field
(/root/reference/regionSpout.go:50,87) — a stringly-typed map. Here the
same payload becomes a real MapType column (from_json), manipulated with
map_* built-ins, then flattened back to rows so the oracle hash is
representation-independent (DuckDB has no MAP literal semantics matching
Spark's hash form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "fn_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           1                                          AS n_keys,
           'k'                                        AS first_key
    FROM events
    """,
    tags=("ext", "fn"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType → element_at / map_keys / size → flat columns.

    The fixture's props always carries the single key 'k' (verified by
    json_keys over the fixture), so the oracle's constants are exact; the
    Spark side computes them from the map for real.
    """
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.sort_array(F.map_keys(m))[0].alias("first_key"),
    )


@op(
    "fn_map_entries",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS k, count(*) AS v
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("ext", "fn"),
)
def fn_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map aggregate, then explode it back to rows.

    map_from_entries(collect_list(struct(k, v))) per group → explode —
    the map is real on the Spark side; the flattened rows are what the
    oracle reproduces directly.
    """
    o = load(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))
    as_map = per_group.groupBy("o_orderstatus").agg(
        F.map_from_entries(F.collect_list(F.struct("o_orderpriority", "cnt"))).alias("prio_counts")
    )
    return as_map.select(
        F.col("o_orderstatus").alias("status"),
        F.explode("prio_counts").alias("k", "v"),
    )
