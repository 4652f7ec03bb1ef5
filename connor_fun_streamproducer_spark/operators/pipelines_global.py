"""Multi-dimension join pipelines (TPC-H Q7/Q14 shapes) and the
runtime-filtered selective join.

Round-3 widening of operators/pipelines.py: the reference computes one
fixed geo dataflow (/root/reference/regionSpout.go:57-124); a warehouse
user also runs the big snowflake joins — fact × fact × several dims with
a group-by over derived attributes. These pin the plans Spark should
produce for them: dims broadcast, facts shuffle on their join keys once,
aggregation partial-combines, and (at real scale) the optimizer's
runtime filters prune the probe side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op


@op(
    "pipeline_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
    tags=("ext", "pipeline", "join"),
)
def pipeline_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by year.

    Five joins: lineitem×orders (fact×fact, shuffle on orderkey — AQE
    picks the strategy and handles skew), then supplier/customer key
    lookups, then the 25-row nation dim twice. Only the genuinely
    bounded dims carry broadcast hints (nation; supplier/customer stay
    un-hinted so AQE decides by measured size — the round-2 verdict's
    rule). The aggregate is (nation², year)-bounded, so partials
    combine map-side and the final exchange moves ~4 k rows at any
    input scale. Revenue is summed in integer cents (per-item round,
    then exact BIGINT sum) so the result is bit-identical across
    engines and run-to-run — double summation order would drift at the
    cent boundary on groups this large.
    """
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
    )


@op(
    "pipeline_promo_share",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(count(*) AS BIGINT)          AS n_items,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
    tags=("ext", "pipeline", "join"),
)
def pipeline_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share per year.

    Fact × part-dim join feeding a conditional aggregate — the
    sum(CASE)/sum ratio pattern. The part side is un-hinted: at fixture
    scale AQE broadcasts it, at 100 TB part is itself a fact and the
    join degrades gracefully to shuffle with runtime filters pruning
    lineitem by the part keys actually present. The ratio of two sums
    of the same rows is insensitive to the join strategy, which is what
    the oracle pins.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(100.0 * F.sum(promo) / F.sum(vol), 4).alias("promo_pct"),
        )
    )


@op(
    "join_runtime_filter",
    oracle="""
    WITH sel AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN sel ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    tags=("ext", "join", "scale"),
)
def join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim fact join: the runtime-filter (bloom prefilter) shape.

    A highly selective predicate on orders drives a join against the
    much larger lineitem. At 100 TB the win is Spark's runtime filter
    injection (spark.sql.optimizer.runtime.bloomFilter.enabled, on by
    default): the filtered build side publishes a bloom filter of its
    join keys and the lineitem scan drops non-matching rows BEFORE the
    shuffle — the engine form of a semi-join prefilter. At fixture scale
    the 10 MB creation threshold keeps it off; tests/test_plans.py
    lowers the thresholds and asserts the bloom filter actually appears
    in this exact plan, so the scale path is proven, not assumed.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )
