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

DuckDB has no KLL/theta, but both ops are still hash-checked end to end
(VERDICT r6 #4) because each has an EXACT law at verification scale:

- theta: a QuickSelect sketch is in exact mode (theta == 1, every key
  hash retained) while the distinct count stays under its nominal-entry
  capacity — below that threshold every estimate IS the true
  cardinality, and intersections/unions of exact sketches are exact.
  With lgNomEntries=14 (16384 entries) the fixture cohorts (~1.5k
  distinct customers at sf0.01) are far under capacity, so the whole
  output frame equals the DuckDB exact-set answer.
- KLL: estimates are randomized, so the hashed columns are exact
  percentiles (bitwise-identical interpolation in Spark and DuckDB —
  both use the type-7 (n-1)*q rule) plus booleans asserting each KLL
  estimate lies inside a generous exact-quantile rank band (±0.08,
  ~5x the published k=200 error) — TRUE on both sides.

Tighter accuracy contracts (±1.65%-scale rank error, exact-mode
equality) stay pinned in tests/test_sketches.py.
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

# Rank band for the hash-checked "estimate is sane" booleans: ±8
# normalized-rank points, ~5x the published k=200 error (1.65% @ 99%
# conf) — KLL's tail decays exponentially in (band/eps)^2, so a FALSE
# here is practically impossible while still being a real property of
# the sketch output. p99's upper band clips at 1.0 (the max).
KLL_BAND = 0.08
_BAND_QS = sorted(
    {q for base in QUANTILES for q in (max(0.0, base - KLL_BAND), base, min(1.0, base + KLL_BAND))}
)
_QI = {q: i for i, q in enumerate(_BAND_QS)}


def _kll_cols(prefix_sk: str = "sk", ex: str = "ex") -> list:
    """Exact companions + band booleans from a sketch col and an exact
    percentile array col (order of _BAND_QS)."""
    out = []
    for q in QUANTILES:
        lo = F.col(ex).getItem(_QI[max(0.0, q - KLL_BAND)])
        hi = F.col(ex).getItem(_QI[min(1.0, q + KLL_BAND)])
        est = F.kll_sketch_get_quantile_double(prefix_sk, F.lit(q))
        out.append(
            F.round(F.col(ex).getItem(_QI[q]), 2).alias(f"exact_p{int(q * 100)}")
        )
        out.append(
            ((est >= lo - F.lit(0.01)) & (est <= hi + F.lit(0.01))).alias(
                f"kll_p{int(q * 100)}_ok"
            )
        )
    return out


_KLL_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
       TRUE AS kll_p50_ok,
       round(quantile_cont(o_totalprice, 0.9), 2) AS exact_p90,
       TRUE AS kll_p90_ok,
       round(quantile_cont(o_totalprice, 0.99), 2) AS exact_p99,
       TRUE AS kll_p99_ok
FROM orders GROUP BY 1
UNION ALL
SELECT 'ALL', CAST(count(*) AS BIGINT),
       round(quantile_cont(o_totalprice, 0.5), 2), TRUE,
       round(quantile_cont(o_totalprice, 0.9), 2), TRUE,
       round(quantile_cont(o_totalprice, 0.99), 2), TRUE
FROM orders
"""


@op("agg_kll_quantile", oracle=_KLL_ORACLE, tags=("ext", "agg", "sketch", "scale"))
def agg_kll_quantile(
    spark: SparkSession, sf_dir: str, with_exact: bool = True
) -> DataFrame:
    """Mergeable quantile rollup: per-group KLL sketches merged to ALL.

    Builds one KLL(k=200) sketch of o_totalprice per order priority
    (partial aggregation combines map-side: each executor core sketches
    its partition, the exchange carries five ~KB sketches per core), then
    demonstrates the property exact percentiles lack — the ALL row's
    sketch is ``kll_merge_agg`` over the five group sketches, never a
    second sketch pass: at runtime the ALL branch binds to the per-group
    shuffle via ReusedExchange (asserted in tests/test_plans.py).

    Verification shape (``with_exact=True``, the registry binding): the
    output carries exact percentiles (hash-compared against DuckDB
    ``quantile_cont`` — identical type-7 interpolation) plus booleans
    pinning each KLL estimate inside the exact q±0.08 rank band, making
    the op hash-checked rather than rows-only (VERDICT r6 #4). The exact
    companions buffer each group's values (Spark's ``percentile``), so a
    100 TB caller wanting only the sketch rollup passes
    ``with_exact=False`` and gets the original one-pass estimate frame;
    the two-level sketch plan is identical either way. Accuracy contract
    (±2.5% rank) stays pinned in tests/test_sketches.py.
    """
    o = load(spark, sf_dir, "orders")
    if not with_exact:
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

    qs = F.array(*[F.lit(q) for q in _BAND_QS])
    # 5-row checkpoint: the union branch consumes (n, sk, ex) while the
    # ALL-merge branch prunes ex, so the two subtrees are no longer
    # identical and Catalyst cannot ReusedExchange them — without a cut
    # the merge branch would re-scan the table. Materializing the 5-row
    # group frame keeps the sketch side single-scan in this shape too.
    per = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.kll_sketch_agg_double("o_totalprice", KLL_K).alias("sk"),
        F.percentile("o_totalprice", qs).alias("ex"),
    ).localCheckpoint()
    # ALL: merged sketch from the per-group shuffle (ReusedExchange) +
    # exact percentiles over the table (1-row scalar cross join — exact
    # quantiles do not merge, that asymmetry is the point of the op).
    all_ex = o.agg(F.percentile("o_totalprice", qs).alias("ex"))
    all_row = (
        per.agg(
            F.sum("n").cast("bigint").alias("n"),
            F.kll_merge_agg_double("sk", KLL_K).alias("sk"),
        )
        .crossJoin(all_ex)
        .select(F.lit("ALL").alias("o_orderpriority"), "n", "sk", "ex")
    )
    both = per.unionByName(all_row)
    return both.select("o_orderpriority", "n", *_kll_cols())


# Nominal entries 2^14 = 16384: the sketch stays in EXACT mode (theta=1,
# estimate == true distinct count) while a cohort's distinct keys stay
# under capacity — true at every verification scale (≤ ~15k customers at
# sf0.1), which is what makes this op hash-checkable against DuckDB's
# exact set algebra (VERDICT r6 #4).
THETA_LG_K = 14

_THETA_ORACLE = """
WITH d AS (SELECT DISTINCT o_orderstatus AS s, o_custkey AS k FROM orders),
cnt AS (SELECT s, count(*) AS c FROM d GROUP BY 1),
inter AS (
    SELECT a.s AS sa, b.s AS sb, count(*) AS ci
    FROM d a JOIN d b ON a.k = b.k AND a.s < b.s
    GROUP BY 1, 2
)
SELECT ca.s AS status_a, cb.s AS status_b,
       CAST(ca.c AS BIGINT) AS est_a,
       CAST(cb.c AS BIGINT) AS est_b,
       CAST(coalesce(ci, 0) AS BIGINT) AS est_inter,
       CAST(ca.c + cb.c - coalesce(ci, 0) AS BIGINT) AS est_union,
       CAST(coalesce(ci, 0) * 10000 // (ca.c + cb.c - coalesce(ci, 0))
            AS BIGINT) AS jaccard_bp
FROM cnt ca
JOIN cnt cb ON ca.s < cb.s
LEFT JOIN inter ON inter.sa = ca.s AND inter.sb = cb.s
"""


@op("agg_theta_setops", oracle=_THETA_ORACLE, tags=("ext", "agg", "sketch", "scale"))
def agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra across cohorts via theta sketches.

    One pass sketches the distinct customer set per order status; the
    3-row sketch frame then self-joins (status_a < status_b) and theta
    union/intersection answer "customers active in BOTH cohorts" without
    ever shuffling customer keys — the exact version is a distinct +
    self-join that moves every key at 100 TB, the sketch version moves
    KBs. Jaccard falls out in integer basis points.

    Hash-checked (VERDICT r6 #4) via the sketch's exact-mode law: a
    QuickSelect theta sketch retains every distinct key hash (theta = 1)
    until it exceeds its nominal 2^14 entries, and intersections/unions
    of exact sketches are exact, so below capacity every "estimate"
    column equals DuckDB's exact distinct-set answer — bit-for-bit, no
    tolerance. Beyond capacity (real scale) the same columns become
    ±1/sqrt(k) estimates; that regime's accuracy contract is pinned in
    tests/test_sketches.py.
    """
    o = load(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.theta_sketch_agg("o_custkey", THETA_LG_K).alias("sk")
    )
    a = sk.select(F.col("o_orderstatus").alias("status_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("o_orderstatus").alias("status_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("status_a") < F.col("status_b"))
    est = lambda c: F.round(F.theta_sketch_estimate(c), 0).cast("bigint")  # noqa: E731
    inter = F.theta_intersection("sk_a", "sk_b")
    union = F.theta_union("sk_a", "sk_b", THETA_LG_K)
    return pairs.select(
        "status_a",
        "status_b",
        est("sk_a").alias("est_a"),
        est("sk_b").alias("est_b"),
        est(inter).alias("est_inter"),
        est(union).alias("est_union"),
        F.expr(
            f"cast(round(theta_sketch_estimate(theta_intersection(sk_a, sk_b)), 0) as bigint)"
            f" * 10000 div "
            f"cast(round(theta_sketch_estimate(theta_union(sk_a, sk_b, {THETA_LG_K})), 0) as bigint)"
        )
        .cast("bigint")
        .alias("jaccard_bp"),
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


_CMS_ORACLE = f"""
SELECT k.l_partkey,
       CAST(coalesce(c.n, 0) AS BIGINT) AS exact,
       TRUE AS est_ge_exact, TRUE AS within_band
FROM (SELECT unnest(generate_series(1, 10)) AS l_partkey) k
LEFT JOIN (
    SELECT l_partkey, count(*) AS n FROM lineitem
    WHERE l_partkey BETWEEN 1 AND 10 GROUP BY 1
) c USING (l_partkey)
ORDER BY k.l_partkey
"""


@op("agg_count_min", oracle=_CMS_ORACLE, tags=("ext", "agg", "sketch", "scale"))
def agg_count_min(spark: SparkSession, sf_dir: str, with_exact: bool = True) -> DataFrame:
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

    xxhash64's placement of keys is engine-specific, so the raw
    estimates can't hash-match another engine. Verification shape
    (``with_exact=True``, the registry binding; the agg_kll_quantile
    discipline): emit each probe's EXACT count (one isin-pushed filter
    agg — 10 keys, pruned at the scan) plus two law booleans —
    ``est_ge_exact`` (the CMS one-sided guarantee, true by construction)
    and ``within_band`` (overshoot ≤ 2N/width: twice the expected
    collision mass; observed ≤ N/width at every fixture scale). A 100 TB
    caller wanting the estimates themselves passes ``with_exact=False``
    for the original (l_partkey, est) frame. The exact overshoot
    accounting stays pinned in tests/test_sketches.py.
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
    probe_keys = spark.createDataFrame(
        [(int(k),) for k in CMS_PROBES], "l_partkey bigint"
    )
    probes = probe_keys.select(
        "l_partkey", F.explode(depths).alias("d")
    ).select(
        "l_partkey",
        "d",
        F.pmod(F.xxhash64("d", "l_partkey"), F.lit(CMS_WIDTH)).alias("c"),
    )
    # Probe side drives a LEFT join: a grid cell never incremented holds
    # an implicit 0, so a probe whose cell is empty reads n=0 (true CMS
    # semantics — the min must see the zero) instead of dropping the key
    # or taking min over only its colliding cells. The aggregated grid is
    # bounded by depth*width cells, so it broadcasts.
    est = (
        probes.join(F.broadcast(cells), ["d", "c"], "left")
        .fillna(0, ["n"])
        .groupBy("l_partkey")
        .agg(F.min("n").cast("bigint").alias("est"))
    )
    if not with_exact:
        return est.orderBy("l_partkey")
    n_total = items.count()
    bound = 2 * n_total // CMS_WIDTH
    exact = (
        items.filter(F.col("l_partkey").isin([int(k) for k in CMS_PROBES]))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("exact"))
    )
    return (
        est.join(exact, "l_partkey", "left")
        .fillna(0, ["exact"])
        .select(
            "l_partkey",
            F.col("exact").cast("bigint").alias("exact"),
            (F.col("est") >= F.col("exact")).alias("est_ge_exact"),
            (F.col("est") - F.col("exact") <= F.lit(bound)).alias("within_band"),
        )
        .orderBy("l_partkey")
    )


# ---------------------------------------------------------------------------
# Hand-rolled HyperLogLog (md5-derandomized, hash-checkable, round 13)
# ---------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256 registers
# alpha_m * m^2 for m = 256 (Flajolet et al. 2007), spliced as one literal
# so both engines use the identical constant
_HLL_ALPHA_M2 = repr(0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M)
# bit length of the 56-bit suffix as a SUM of integer comparisons — no
# float log2 anywhere near a power-of-two boundary
_HLL_BITLEN = " + ".join(
    f"(CASE WHEN s >= {1 << k} THEN 1 ELSE 0 END)" for k in range(56)
)

_HLL_ORACLE = f"""
WITH h AS (
    SELECT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS BIGINT)
               AS bucket,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 14)) AS BIGINT)
               AS s
    FROM events
), rho AS (
    SELECT event_type, bucket, 57 - ({_HLL_BITLEN}) AS r FROM h
), reg AS (
    SELECT event_type, bucket, max(r) AS m FROM rho GROUP BY 1, 2
), z AS (
    SELECT event_type,
           count(*) AS used,
           {_HLL_M} - count(*) AS zeros,
           list_sort(list(m)) AS l
    FROM reg GROUP BY event_type
), est AS (
    SELECT event_type, used, zeros,
           {_HLL_ALPHA_M2} / (CAST(zeros AS DOUBLE)
               + list_reduce(list_prepend(0.0,
                     list_transform(l, p -> pow(0.5, p))),
                     (x, y) -> x + y)) AS e_raw
    FROM z
), ex AS (
    SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
), fin AS (
    SELECT est.event_type, ex.n_exact, est.used, est.zeros,
           CASE WHEN est.e_raw <= {2.5 * _HLL_M} AND est.zeros > 0
                THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / est.zeros)
                ELSE est.e_raw END AS e
    FROM est JOIN ex ON ex.event_type = est.event_type
)
SELECT event_type,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(used AS BIGINT) AS registers_used,
       round(e, 4) + 0.0 AS hll_estimate,
       CAST(floor(abs(e - n_exact) * 10000 / n_exact + 0.5) AS BIGINT)
           AS err_bp
FROM fin
"""


@op("agg_hll_manual", oracle=_HLL_ORACLE, tags=("ext", "agg", "sketch", "scale"))
def agg_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, built BY HAND
    from md5 so every register value is reproducible cross-engine —
    unlike approx_count_distinct (agg_approx), whose sketch is
    engine-internal and only rows-checkable, this one is hash-checked
    end to end and doubles as an executable spec of the algorithm:
    bucket = first 8 hash bits, rho = leading-zero count of the 56-bit
    suffix + 1, register = max rho per bucket, estimate = alpha·m²
    divided by the harmonic sum, with the linear-counting small-range
    correction. The measured err_bp column IS the point: HLL's ~1.04/√m
    ≈ 6.5% error bound at m = 256 becomes an observable, not a claim.

    Exact determinism: rho comes from a SUM of 56 integer comparisons
    (no float log2 at power-of-two boundaries); each harmonic term
    pow(0.5, rho) is an exact power of two folded in sorted register
    order; alpha·m² is one shared literal.

    Scale: registers are a (type, bucket) hash agg with map-side MAX
    partials — 256 rows per type no matter the corpus; this is the
    mergeable-sketch shape (union = elementwise max) that makes HLL
    THE distributed distinct counter. The exact countDistinct rides
    along only as the audit column.
    """
    md5 = F.md5(F.col("user_id").cast("string"))
    h = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.conv(F.substring(md5, 1, 2), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring(md5, 3, 14), 16, 10).cast("bigint").alias("s"),
    )
    rho = h.select(
        "event_type",
        "user_id",
        "bucket",
        (F.lit(57) - F.expr(_HLL_BITLEN)).alias("r"),
    )
    reg = rho.groupBy("event_type", "bucket").agg(F.max("r").alias("m"))
    z = reg.groupBy("event_type").agg(
        F.count("*").alias("used"),
        (F.lit(_HLL_M) - F.count("*")).alias("zeros"),
        F.array_sort(F.collect_list("m")).alias("l"),
    )
    e_raw = F.lit(float(_HLL_ALPHA_M2)) / (
        F.col("zeros").cast("double")
        + F.expr("aggregate(l, CAST(0.0 AS DOUBLE), (x, p) -> x + pow(0.5D, p))")
    )
    ex = h.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    est = z.select("event_type", "used", "zeros", e_raw.alias("e_raw"))
    fin = est.join(ex, "event_type").select(
        "event_type",
        "n_exact",
        "used",
        F.when(
            (F.col("e_raw") <= F.lit(2.5 * _HLL_M)) & (F.col("zeros") > 0),
            F.lit(float(_HLL_M))
            * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    return fin.select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.col("used").cast("bigint").alias("registers_used"),
        (F.round("e", 4) + F.lit(0.0)).alias("hll_estimate"),
        F.floor(
            F.abs(F.col("e") - F.col("n_exact")) * 10000 / F.col("n_exact")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("err_bp"),
    )
