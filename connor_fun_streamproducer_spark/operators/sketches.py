"""Mergeable Datasketches aggregations: KLL quantiles and theta set
algebra.

The 100 TB answer to "what's the p99?" and "how many distinct users do
two cohorts share?": exact percentile needs a global sort and exact
set-intersection needs a shuffle of every key, but a KLL / theta sketch
is a few KB, merges associatively, and rolls up along any hierarchy —
the partial-aggregate pattern (sketch per partition -> merge) is what
makes these answerable on a 1000-executor cluster with one tiny
exchange. Spark 4.1 ships both as native JVM aggregates
(``kll_sketch_agg_*`` / ``theta_sketch_agg``).

Estimates are engine-specific (DuckDB has no KLL/theta), so both ops are
rows-only for the driver; their accuracy contracts are pinned against
exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from connor_fun_streamproducer_spark.registry import op

# KLL accuracy knob: k=200 gives ~1.65% normalized rank error (published
# Datasketches bound for the default parameterization).
KLL_K = 200

QUANTILES = (0.5, 0.9, 0.99)


@op("agg_kll_quantile", tags=("ext", "agg", "sketch", "scale"))
def agg_kll_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile rollup: per-group KLL sketches merged to ALL.

    Builds one KLL(k=200) sketch of o_totalprice per order priority
    (partial aggregation combines map-side: each executor core sketches
    its partition, the exchange carries five ~KB sketches per core), then
    demonstrates the property exact percentiles lack — the ALL row is
    ``kll_merge_agg`` over the five group sketches, never a second scan:
    at runtime the ALL branch binds to the per-group shuffle via
    ReusedExchange (asserted in tests/test_plans.py).
    At 100 TB the same two-level plan computes any quantile of any
    rollup level from one pass; the accuracy contract (±1.65% rank
    error vs exact) is pinned in tests/test_sketches.py. Rows-only:
    sketch estimates are engine-specific.
    """
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.kll_sketch_agg_double("o_totalprice", KLL_K).alias("sk"),
    )
    all_row = per.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.kll_merge_agg_double("sk", KLL_K).alias("sk"),
    ).select(F.lit("ALL").alias("o_orderpriority"), "n", "sk")
    both = per.unionByName(all_row)
    cols = [
        F.round(
            F.kll_sketch_get_quantile_double("sk", F.lit(q)), 2
        ).alias(f"p{int(q * 100)}")
        for q in QUANTILES
    ]
    return both.select("o_orderpriority", "n", *cols)


@op("agg_theta_setops", tags=("ext", "agg", "sketch", "scale"))
def agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra across cohorts via theta sketches.

    One pass sketches the distinct customer set per order status; the
    3-row sketch frame then self-joins (status_a < status_b) and theta
    union/intersection answer "customers active in BOTH cohorts" without
    ever shuffling customer keys — the exact version is a distinct +
    self-join that moves every key at 100 TB, the sketch version moves
    KBs. Jaccard falls out as inter/union. Rows-only (estimates are
    engine-specific); accuracy vs exact distinct counts is pinned in
    tests/test_sketches.py.
    """
    o = load(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.theta_sketch_agg("o_custkey").alias("sk")
    )
    a = sk.select(F.col("o_orderstatus").alias("status_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("o_orderstatus").alias("status_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("status_a") < F.col("status_b"))
    est = lambda c: F.round(F.theta_sketch_estimate(c), 1)  # noqa: E731
    inter = F.theta_intersection("sk_a", "sk_b")
    union = F.theta_union("sk_a", "sk_b")
    return pairs.select(
        "status_a",
        "status_b",
        est("sk_a").alias("est_a"),
        est("sk_b").alias("est_b"),
        est(inter).alias("est_inter"),
        est(union).alias("est_union"),
        F.round(F.theta_sketch_estimate(inter) / F.theta_sketch_estimate(union), 4).alias(
            "jaccard"
        ),
    )


@op(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ext", "agg", "sketch", "scale"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bucketed roaring-style bitmaps — the
    dense-integer-domain alternative to HLL (agg_approx) that pays fixed
    mergeable state for an exact answer.

    Spark 3.5+ bitmap built-ins: keys bucket by bitmap_bucket_number
    (32768-bit buckets), each (group, bucket) aggregates positions into
    one bitmap (map-side combinable byte-OR), bitmap_count sizes each
    bucket, and a second dim-bounded aggregate sums buckets per group.
    vs count(DISTINCT): no exact-distinct shuffle of raw keys — the
    exchange carries ≤4 KB per (group, bucket) however many duplicates
    exist; vs HLL: exact, at the cost of state proportional to the KEY
    DOMAIN rather than a fixed sketch — the right trade for dense
    surrogate-key domains (partkey/custkey), wrong for sparse 64-bit
    hashes. The oracle is plain count(DISTINCT): exactness IS the
    contract.
    """
    li = load(spark, sf_dir, "lineitem")
    per_bucket = (
        li.groupBy(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_partkey)").alias("bucket"),
        )
        .agg(
            F.expr(
                "bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey)))"
            ).alias("cnt")
        )
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum("cnt").cast("bigint").alias("n_parts")
    )
