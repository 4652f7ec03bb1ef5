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


TOPK_HH = 20
# Per-partition Misra-Gries counter budget. The candidate set provably
# contains every token with global frequency > N/(MG_COUNTERS+1): a token
# exceeding that globally exceeds N_p/(k+1) in at least one partition
# (pigeonhole on proportions), and MG's decrement mass per partition is
# bounded by N_p/(k+1) (each trim round subtracts uniformly from ≥ k+1
# counters, so (k+1)·D ≤ N_p).
MG_COUNTERS = 64


@op(
    "agg_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM toks WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT {TOPK_HH}
    """,
    tags=("ext", "agg", "sketch", "scale"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{TOPK_HH} frequent tokens via the scalable two-phase
    pattern: bounded-memory Misra-Gries candidate generation per
    partition, then ONE exact counting pass restricted to the candidates.

    Why not a plain groupBy-count-topk? At 100 TB with an open vocabulary
    the full (token, count) aggregation state is the largest shuffle in
    the pipeline. Here phase 1 is map-only (``mapInPandas``, ≤
    {MG_COUNTERS} counters per partition — constant memory regardless of
    vocabulary) and emits ≤ partitions×{MG_COUNTERS} candidate rows; the
    deterministic-superset guarantee (see MG_COUNTERS note) means the
    true top-k can't be missed as long as the k-th hitter exceeds
    N/{MG_COUNTERS + 1} of all tokens — trivially true for Zipfian text.
    Phase 2 broadcast-semi-joins the tiny candidate set into a second
    scan and counts exactly — so the result is EXACT (hash-matches the
    full-aggregation oracle), while the shuffle carries only candidate
    tokens. tests/test_sketches.py pins the superset guarantee on an
    adversarial low-budget configuration.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )

    def mg_summaries(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["tok"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            while len(counters) > MG_COUNTERS:
                m = min(counters.values())
                counters = {t: c - m for t, c in counters.items() if c > m}
        yield pd.DataFrame(
            {"tok": list(counters.keys()), "lb": list(counters.values())}
        )

    cands = toks.mapInPandas(mg_summaries, "tok string, lb long").select("tok").distinct()
    exact = (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return exact.orderBy(F.desc("n"), F.asc("tok")).limit(TOPK_HH)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
# Probe keys: a fixed low-ID slice so the op's output is a stable,
# test-pinnable frame rather than data-dependent.
CMS_PROBES = tuple(range(1, 11))


@op("agg_count_min", tags=("ext", "agg", "sketch", "scale"))
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for 10 probe part keys over the
    lineitem stream: (l_partkey, est).

    The frequency twin of the KLL/theta/bitmap tier: a depth x width
    grid of counters (4 x 1024 here) where item k increments cell
    (d, hash_d(k) mod width) per row, and the estimate is the MIN over
    the item's four cells — always >= the true count, with overshoot
    bounded by collisions. The grid is MERGEABLE (cell-wise sum), which
    is the whole point at 100 TB: each executor sketches its partitions
    map-side and the exchange carries at most depth*width aggregated
    cells, not keys.

    Spark-first build: rows fan out depth-ways with a literal-array
    explode, cells come from one ``xxhash64(depth, key) pmod width``
    hash aggregate (partial map-side combine = per-partition sketches),
    and the probe lookup is a broadcast join of 10 keys against the
    <= depth*width-cell grid followed by groupBy(min) — the whole op is two
    bounded exchanges, zero Python.

    xxhash64's placement of keys is engine-specific, so (like KLL and
    theta) this is the sanctioned rows-only class; the CMS contract —
    est >= exact for every probe, overshoot <= sum of colliding keys —
    is pinned exactly in tests/test_sketches.py.
    """
    items = load(spark, sf_dir, "lineitem").select("l_partkey")
    depths = F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    fanned = items.select("l_partkey", F.explode(depths).alias("d"))
    cells = (
        fanned.select(
            "d",
            F.pmod(F.xxhash64("d", "l_partkey"), F.lit(CMS_WIDTH)).alias("c"),
        )
        .groupBy("d", "c")
        .agg(F.count("*").alias("n"))
    )
    probes = spark.createDataFrame(
        [(int(k),) for k in CMS_PROBES], "l_partkey bigint"
    ).select(
        "l_partkey", F.explode(depths).alias("d")
    ).select(
        "l_partkey",
        "d",
        F.pmod(F.xxhash64("d", "l_partkey"), F.lit(CMS_WIDTH)).alias("c"),
    )
    est = (
        cells.join(F.broadcast(probes), ["d", "c"])
        .groupBy("l_partkey")
        .agg(F.min("n").cast("bigint").alias("est"))
    )
    return est.orderBy("l_partkey")
