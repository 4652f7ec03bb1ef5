"""Behavioral event analytics: retention cohorts and conversion funnels.

The reference ships a raw per-region event stream and its only analytic
is a 30-second message count (/root/reference/regionSpout.go:102-117).
The first two questions any consumer of that stream asks are the two
canonical behavioral rollups this module provides:

- ``pipeline_retention_cohort`` — classic weekly retention triangle:
  users bucketed by first-seen week (cohort), counted per week-offset
  of later activity.
- ``pipeline_funnel_conversion`` — ordered multi-stage funnel
  (signup → click → purchase), each stage within 7 days of the
  previous, counting users reaching each stage.

Week arithmetic is integer epoch-week (``epoch_sec div 604800``) on
both engines — pure int64 math, bit-identical between Spark and DuckDB,
immune to the date_trunc('week') locale/start-of-week divergence class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connor_fun_streamproducer_spark.catalog import (
    dim_window,
    epoch_div,
    epoch_seconds,
    load,
)
from connor_fun_streamproducer_spark.registry import op

_WEEK_S = 604_800
# Funnel stage window: each stage must land within 7 days of the one before.
_FUNNEL_WINDOW_S = 604_800

_RETENTION_ORACLE = """
WITH uw AS (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
    FROM events GROUP BY 1, 2
), anchored AS (
    SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS cohort_week
    FROM uw
)
SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS users
FROM anchored GROUP BY 1, 2
"""


@op(
    "pipeline_retention_cohort",
    oracle=_RETENTION_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: (cohort_week, week_offset, users).

    100 TB design — ONE exchange on user_id, then one bounded agg:

    - the per-user distinct week set is built with ``collect_set`` in a
      single groupBy(user_id) — partial (map-side) merge applies, and
      the per-user state is bounded by the calendar (≤52 entries per
      user-year), not by event volume, so the only full-volume shuffle
      carries pre-deduplicated partial sets;
    - cohort anchor = ``array_min`` over that set (per-row expression,
      no second exchange — where a window-function formulation would
      re-shuffle on user_id after a (user, week) distinct);
    - the final (cohort_week, week_offset) aggregate is over
      |users| × |active weeks| rows — already the answer's own scale.

    ``users`` is count(*): after the per-user week dedup a user
    contributes at most one row per (cohort, offset), so count(*) ==
    count(distinct user) without the distinct-agg expansion.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        epoch_div("ts", _WEEK_S).alias("week"),
    )
    per_user = ev.groupBy("user_id").agg(F.collect_set("week").alias("weeks"))
    exploded = per_user.select(
        F.array_min("weeks").alias("cohort_week"),
        F.explode("weeks").alias("week"),
    )
    return exploded.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.count("*").alias("users"))


_FUNNEL_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
), s AS (
    SELECT user_id, min(sec) AS s_sec FROM ev
    WHERE event_type = 'signup' GROUP BY 1
), c AS (
    SELECT e.user_id, min(e.sec) AS c_sec
    FROM ev e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'click'
      AND e.sec > s.s_sec AND e.sec <= s.s_sec + {_FUNNEL_WINDOW_S}
    GROUP BY 1
), p AS (
    SELECT e.user_id, min(e.sec) AS p_sec
    FROM ev e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.sec > c.c_sec AND e.sec <= c.c_sec + {_FUNNEL_WINDOW_S}
    GROUP BY 1
), reached AS (
    SELECT '1_signup' AS stage, user_id FROM s
    UNION ALL SELECT '2_click', user_id FROM c
    UNION ALL SELECT '3_purchase', user_id FROM p
)
SELECT stage, count(*) AS users FROM reached GROUP BY stage
"""


@op(
    "pipeline_funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel signup → click → purchase, each stage
    within 7 days of the previous; (stage, users) with users reaching
    each stage (monotone non-increasing down the funnel).

    The dependency chain (first qualifying click is defined relative to
    the FIRST signup, first purchase relative to that click) cannot be
    one conditional aggregate — it is the classic iterated
    filter-join-agg ladder:

    100 TB design:

    - every join and aggregate in the ladder keys on user_id, so
      Catalyst reuses one hash partitioning end to end (plan shows a
      single exchange per funnel arm, no re-shuffles between rungs);
    - each rung's frame only SHRINKS (stage-k users ⊆ stage-k-1
      users), so join inputs decay down the funnel and AQE picks
      broadcast for the deep rungs at real-world conversion rates;
    - the final count is one union of (stage, user) markers + a
      6-ish-row aggregate: counting users AT each rung via the union
      trick costs one shuffle total, instead of three scalar count
      jobs.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_seconds("ts").alias("sec")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("s_sec"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("sec") > F.col("s_sec"))
            & (F.col("sec") <= F.col("s_sec") + _FUNNEL_WINDOW_S)
        )
        .groupBy("user_id")
        .agg(F.min("sec").alias("c_sec"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("sec") > F.col("c_sec"))
            & (F.col("sec") <= F.col("c_sec") + _FUNNEL_WINDOW_S)
        )
        .groupBy("user_id")
        .agg(F.min("sec").alias("p_sec"))
    )
    reached = (
        s.select(F.lit("1_signup").alias("stage"), "user_id")
        .unionAll(c.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionAll(p.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return reached.groupBy("stage").agg(F.count("*").alias("users"))


_TOP_PAIRS = 20
# Apriori-style item prune: a pair can only reach pair-support >= 2 if both
# items appear in >= 2 baskets, so the pre-filter drops nothing qualifying.
_MIN_ITEM_SUPPORT = 2

_BASKET_ORACLE = f"""
WITH baskets AS (
    SELECT l_orderkey AS bid, l_partkey AS item
    FROM lineitem GROUP BY 1, 2
), item_n AS (
    SELECT item, count(*) AS na FROM baskets GROUP BY 1
    HAVING count(*) >= {_MIN_ITEM_SUPPORT}
), kept AS (
    SELECT b.bid, b.item, i.na FROM baskets b JOIN item_n i USING (item)
), pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
           max(a.na) AS na, max(b.na) AS nb, count(*) AS nab
    FROM kept a JOIN kept b ON a.bid = b.bid AND a.item < b.item
    GROUP BY 1, 2
), total AS (
    SELECT count(DISTINCT bid) AS n_baskets FROM baskets
)
SELECT item_a, item_b, nab AS support,
       round(CAST(nab AS DOUBLE) * n_baskets / (na * nb), 4) AS lift
FROM pairs, total
ORDER BY support DESC, item_a, item_b
LIMIT {_TOP_PAIRS}
"""


@op(
    "pipeline_basket_affinity",
    oracle=_BASKET_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top co-ordered part pairs with support and
    lift — (item_a, item_b, support, lift), total-order ranked.

    The association-rules shape every retail/recommendation warehouse
    runs; the reference's event stream has no such second-order
    analytics at all.

    100 TB design:

    - baskets dedupe on (order, part) first — one keyed exchange with
      map-side partials;
    - APRIORI PRUNE before pairing: items below pair-qualifying support
      are dropped by a pre-aggregate, provably lossless for pair
      support >= {_MIN_ITEM_SUPPORT} (a pair needs both items in >= that
      many baskets) — this is what keeps the self-join's fan-out from
      exploding on the long tail of one-off items;
    - the pair generator is a self-equi-join ON THE BASKET KEY with
      ``item_a < item_b`` — per-basket fan-out is quadratic in basket
      WIDTH (bounded, ~single digits for order lines), never in corpus
      size, and AQE handles any hot mega-basket via skew split;
    - item frequencies ride along via max(na)/max(nb) instead of two
      extra joins; lift's scalar total is a 1-row broadcast (the
      decorrelated-scalar-subquery pattern, operators/subqueries.py);
    - integer counts divide in double at the end, so both engines do
      the identical arithmetic — hash-exact despite the ratio.
    """
    b = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("bid"), F.col("l_partkey").alias("item")
    )
    # The distinct-basket frame feeds FOUR consumers (item_n, both pair
    # sides, the scalar total): checkpoint it once so the scan+distinct
    # never replays (graph.py:318 discipline — r6 this op planned 5
    # parquet scans, 0 reuse; now 1 scan). The pruned `kept` frame is NOT
    # checkpointed: both pair sides re-derive it with one cheap broadcast
    # join over the materialized baskets — a second sync barrier costs
    # more than that replay at every tested scale. At 100 TB substitute
    # persist(DISK_ONLY) if the lineage cut's re-derive is a concern.
    baskets = b.distinct().localCheckpoint()
    item_n = (
        baskets.groupBy("item")
        .agg(F.count("*").alias("na"))
        .filter(F.col("na") >= _MIN_ITEM_SUPPORT)
    )
    kept = baskets.join(item_n, "item")
    a = kept.select("bid", F.col("item").alias("item_a"), F.col("na").alias("na_a"))
    c2 = kept.select("bid", F.col("item").alias("item_b"), F.col("na").alias("na_b"))
    pairs = (
        a.join(c2, "bid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.max("na_a").alias("na"),
            F.max("na_b").alias("nb"),
            F.count("*").alias("nab"),
        )
    )
    total = baskets.select(F.countDistinct("bid").alias("n_baskets"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            F.col("nab").alias("support"),
            F.round(
                F.col("nab").cast("double")
                * F.col("n_baskets")
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "item_a", "item_b")
        .limit(_TOP_PAIRS)
    )


_RFM_ORACLE = """
WITH rfm AS (
    SELECT o.o_custkey AS c_custkey, c.c_mktsegment AS segment,
           max(CAST(floor(epoch(o.o_orderdate)) AS BIGINT)) AS recency_sec,
           CAST(count(*) AS BIGINT) AS frequency,
           sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS monetary_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
)
SELECT c_custkey, segment,
       CAST(ntile(5) OVER (PARTITION BY segment
                           ORDER BY recency_sec, c_custkey) AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (PARTITION BY segment
                           ORDER BY frequency, c_custkey) AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (PARTITION BY segment
                           ORDER BY monetary_cents, c_custkey) AS BIGINT) AS m_score
FROM rfm
"""


@op(
    "pipeline_rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: quintile ranks of Recency / Frequency /
    Monetary value per market segment — (c_custkey, segment, r_score,
    f_score, m_score), each score in 1..5.

    The marketing-analytics workhorse over exactly the data the
    reference's stream feeds (who did something, when, worth how
    much). Shape:

    - ONE pass over the fact table builds all three metrics in a
      single groupBy(custkey) (recency = max epoch-sec, frequency =
      count, monetary = exact integer cents);
    - the customer dim joins AFTER aggregation — the join input is
      |customers|, not |orders|;
    - quintiles are ntile(5) windows PARTITIONED BY segment: the
      window input is the already-reduced per-customer table, and the
      partition key distributes it. Scores for all three metrics are
      computed in the same stage (three sorts, one exchange on
      hash(segment), since all windows share the partition key).

    At 100 TB the per-partition sort is over customers-per-segment; if
    one tenant/segment is pathologically hot the production variant
    swaps exact ntile for boundaries from approx_percentile broadcast
    back as a range lookup — exact ntile is kept here because its tie
    behavior (ORDER BY metric, custkey — a total order) is identical
    in DuckDB, making the scores hash-checkable.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rfm = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(epoch_seconds("o_orderdate")).alias("recency_sec"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("monetary_cents"),
        )
        .join(
            c.select("c_custkey", F.col("c_mktsegment").alias("segment")),
            "c_custkey",
        )
    )
    w_r = Window.partitionBy("segment").orderBy("recency_sec", "c_custkey")
    w_f = Window.partitionBy("segment").orderBy("frequency", "c_custkey")
    w_m = Window.partitionBy("segment").orderBy("monetary_cents", "c_custkey")
    return rfm.select(
        "c_custkey",
        "segment",
        F.ntile(5).over(w_r).cast("bigint").alias("r_score"),
        F.ntile(5).over(w_f).cast("bigint").alias("f_score"),
        F.ntile(5).over(w_m).cast("bigint").alias("m_score"),
    )


_ABC_ORACLE = """
WITH pr AS (
    SELECT l.l_partkey AS p_partkey, p.p_brand AS p_brand,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)) AS cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT p_partkey, p_brand, cents,
           sum(cents) OVER (PARTITION BY p_brand
                            ORDER BY cents DESC, p_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
           sum(cents) OVER (PARTITION BY p_brand) AS tot
    FROM pr
)
SELECT p_brand, p_partkey,
       round(cents / 100.0, 2) AS revenue,
       CAST(cum * 10000 // tot AS BIGINT) AS cum_bp,
       CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""


@op(
    "pipeline_abc_pareto",
    oracle=_ABC_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification per brand: parts ranked by
    discounted revenue, running share of brand revenue, class A within
    the top 80%, B to 95%, C after — (brand, part, revenue, cum_bp,
    abc_class).

    The 80/20 analysis every inventory/catalog owner runs. The
    classification is ENTIRELY in exact integers: revenue accumulates
    in cents (repo-wide convention), and class boundaries compare
    cum*100 <= tot*80 — integer cross-multiplication instead of a
    cumulative-share double, so no summation-order or division ulp can
    flip a boundary row between engines. (At 100 TB-scale totals the
    cross products approach int64 range; the production variant lifts
    the comparison to decimal(38,0) — same plan.)

    Shape: one (partkey, brand) aggregate over the fact table, then
    running-sum and total windows PARTITIONED BY brand sharing one
    hash(brand) exchange of the already part-level-reduced frame. The
    part dim joins pre-aggregation to carry the brand key into the
    grouping — fact×dim equi-join, AQE picks broadcast.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")
    pr = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_brand")
        .agg(F.sum(cents).alias("cents"))
    )
    w_run = (
        Window.partitionBy("p_brand")
        .orderBy(F.desc("cents"), F.asc("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("p_brand")
    ranked = pr.select(
        "p_brand",
        "p_partkey",
        "cents",
        F.sum("cents").over(w_run).alias("cum"),
        F.sum("cents").over(w_tot).alias("tot"),
    )
    return ranked.select(
        "p_brand",
        "p_partkey",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.expr("cum * 10000 div tot").cast("bigint").alias("cum_bp"),
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


# ---------------------------------------------------------------------------
# Year-over-year growth (lag-window comparative analytics)

_YOY_ORACLE = """
WITH rev AS (
    SELECT n.n_name,
           year(o.o_orderdate) AS yr,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
)
SELECT n_name, yr, rev_cents,
       CASE WHEN lag(yr) OVER w = yr - 1
            THEN lag(rev_cents) OVER w END                  AS prev_cents,
       rev_cents - CASE WHEN lag(yr) OVER w = yr - 1
                        THEN lag(rev_cents) OVER w END      AS delta_cents
FROM rev
WINDOW w AS (PARTITION BY n_name ORDER BY yr)
"""


@op("pipeline_yoy_growth", oracle=_YOY_ORACLE, tags=("ext", "pipeline", "window"))
def pipeline_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue per nation — the lag-window comparative
    report every warehouse runs.

    Revenue aggregates in exact integer cents per (nation, year), then a
    lag window fetches the prior YEAR's figure — guarded by
    ``prev.yr == yr - 1`` so a nation with a gap year compares against
    null, not against whatever year happened to precede it in the sort
    (the classic YoY bug). Delta stays in integer cents; no
    float division anywhere, so summation order can't move the result.

    Scale: dims broadcast (nation always, customer while it fits; at
    true scale customer⋈orders is the one sort-merge), the (nation,
    year) aggregate partial-combines map-side to ~nations × years rows,
    and the lag window runs on that tiny rollup — cost lives entirely
    in the first join, exactly where it should.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "yr")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag(F.struct("yr", "rev_cents")).over(w)
    prev_cents = F.when(prev["yr"] == F.col("yr") - 1, prev["rev_cents"])
    return rev.select(
        "n_name",
        "yr",
        "rev_cents",
        prev_cents.alias("prev_cents"),
        (F.col("rev_cents") - prev_cents).alias("delta_cents"),
    )


# ---------------------------------------------------------------------------
# Marketing-touch attribution (first/last touch in a bounded lookback)

_ATTR_W = 172_800  # 2-day lookback
_TOUCH_TYPES = ("click", "view", "signup")

_ATTR_ORACLE = f"""
WITH p AS (
    SELECT event_id AS purchase_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS psec
    FROM events WHERE event_type = 'purchase'
), t AS (
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
           event_id AS tid, event_type AS ttype
    FROM events WHERE event_type IN {_TOUCH_TYPES!r}
), c AS (
    SELECT p.purchase_id, p.user_id, p.psec, t.tsec, t.tid, t.ttype
    FROM p JOIN t ON t.user_id = p.user_id
               AND t.tsec <= p.psec AND t.tsec >= p.psec - {_ATTR_W}
), f AS (
    SELECT purchase_id, psec, tsec, tid, ttype,
           row_number() OVER (PARTITION BY purchase_id
                              ORDER BY tsec ASC, tid ASC)  AS rf,
           row_number() OVER (PARTITION BY purchase_id
                              ORDER BY tsec DESC, tid DESC) AS rl
    FROM c
)
SELECT p.purchase_id, p.user_id,
       ff.ttype            AS first_type,
       p.psec - ff.tsec    AS first_gap_sec,
       ll.ttype            AS last_type,
       p.psec - ll.tsec    AS last_gap_sec
FROM p
LEFT JOIN f ff ON ff.purchase_id = p.purchase_id AND ff.rf = 1
LEFT JOIN f ll ON ll.purchase_id = p.purchase_id AND ll.rl = 1
"""


@op("pipeline_attribution_touch", oracle=_ATTR_ORACLE, tags=("ext", "pipeline", "scale"))
def pipeline_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: every purchase credited to
    the user's earliest and latest marketing touch (click/view/signup)
    inside a 2-day lookback; purchases with no touch stay, unattributed.

    The range predicate (0 <= psec − tsec <= W) is turned into an
    EQUI-join by time binning at exactly the lookback width: a touch
    lives in bin tsec div W, a purchase probes its own bin and the one
    before — any in-window touch is in one of those two, and each touch
    matches at most one probe (the probes differ), so candidates need
    no dedup. First/last selection is min/max over a struct
    (tsec, tid, ttype) — lexicographic struct ordering makes the
    tie-break (same-second touches → lowest/highest event id)
    deterministic AND partial-aggregatable, so each task collapses its
    local candidates before the one purchase-keyed exchange. The same
    shape as join_range_bucketed, pointed at the attribution question;
    never a theta join, never a window over raw events.
    """
    e = load(spark, sf_dir, "events")
    sec = epoch_seconds("ts")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        sec.alias("psec"),
    )
    t = e.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        sec.alias("tsec"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("ttype"),
    ).withColumn("tbin", F.floor(F.col("tsec") / _ATTR_W).cast("bigint"))
    probes = p.withColumn(
        "pbin", F.explode(F.array(F.floor(F.col("psec") / _ATTR_W) - 1, F.floor(F.col("psec") / _ATTR_W)))
    )
    cand = probes.join(
        t,
        (F.col("t_user") == F.col("user_id")) & (F.col("tbin") == F.col("pbin")),
        "left",
    )
    in_window = (
        (F.col("tsec") <= F.col("psec")) & (F.col("tsec") >= F.col("psec") - _ATTR_W)
    )
    touch = F.when(in_window, F.struct("tsec", "tid", "ttype"))
    agg = cand.groupBy("purchase_id", "user_id", "psec").agg(
        F.min(touch).alias("first_t"),
        F.max(touch).alias("last_t"),
    )
    return agg.select(
        "purchase_id",
        "user_id",
        F.col("first_t.ttype").alias("first_type"),
        (F.col("psec") - F.col("first_t.tsec")).alias("first_gap_sec"),
        F.col("last_t.ttype").alias("last_type"),
        (F.col("psec") - F.col("last_t.tsec")).alias("last_gap_sec"),
    )


# ---------------------------------------------------------------------------
# Event-transition (clickstream path) analysis

_TRANSITION_ORACLE = """
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
), seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY sec, event_id) AS prev_type
    FROM e
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * 10000 //
            sum(count(*)) OVER (PARTITION BY prev_type) AS BIGINT)
           AS share_bp
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@op(
    "pipeline_event_transitions",
    oracle=_TRANSITION_ORACLE,
    tags=("ext", "pipeline", "window"),
)
def pipeline_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (clickstream path analysis):
    for each (previous type → next type) pair, its count and its share
    of all transitions out of the previous type, in integer basis
    points — the Markov-chain summary behind "what do users do after a
    signup?" and the input to next-event prediction baselines.

    One lag window builds the transition pairs on a (user) exchange
    bounded by each user's own history; the count aggregate then
    reduces to |types|² rows, and the row-share normalization runs as a
    window over THAT tiny matrix — so the only corpus-sized stage is
    the first exchange, shared with every other per-user window op.
    Shares use floor division over exact counts (no float ratio to
    drift); each row of the matrix sums to ≤ 10000 with the remainder
    being truncation, which downstream consumers re-derive from n.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", epoch_seconds("ts").alias("sec")
    )
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(order))
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    row_total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.sum("n").over(row_total).alias("_tot"),
    ).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 10000 div _tot").cast("bigint").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness

_STICKINESS_ORACLE = """
WITH d AS (
    SELECT DISTINCT
           CAST(floor(epoch(ts)) AS BIGINT) // 86400  AS day,
           user_id
    FROM events
), daily AS (
    SELECT day, count(*) AS dau FROM d GROUP BY day
), monthly AS (
    SELECT (day * 86400) // 2592000 AS mkey,
           CAST(count(DISTINCT user_id) AS BIGINT) AS mau
    FROM d GROUP BY 1
)
SELECT daily.day,
       CAST(daily.dau AS BIGINT)     AS dau,
       monthly.mau                   AS mau,
       CAST(daily.dau * 10000 // monthly.mau AS BIGINT) AS stickiness_bp
FROM daily
JOIN monthly ON (daily.day * 86400) // 2592000 = monthly.mkey
"""


@op(
    "pipeline_dau_mau_stickiness",
    oracle=_STICKINESS_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / MAU stickiness per day — the product-engagement headline
    metric: what fraction of the 30-day active base showed up today,
    in integer basis points.

    Both granularities roll up from ONE distinct (day, user) frame —
    the same collapse the retention triangle rides — so the corpus is
    deduplicated once and every later stage runs on ≤ users×days rows:
    a per-day count, a per-30-day-bucket distinct count, and a
    broadcast-scale join between the two rollups. The 30-day window is
    a fixed epoch bucket (epoch_sec div 2592000) rather than a
    calendar month: identical integer arithmetic on both engines, and
    at 100 TB it keeps MAU a plain mergeable distinct-count per bucket
    instead of a 30-day sliding distinct (which is what the HLL sketch
    tier is for when the product wants the sliding form).
    """
    d = (
        load(spark, sf_dir, "events")
        .select(
            epoch_div("ts", 86400).alias("day"),
            "user_id",
        )
        .distinct()
    )
    daily = d.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    monthly = d.groupBy(
        F.expr("(day * 86400) div 2592000").alias("mkey")
    ).agg(F.count_distinct("user_id").cast("bigint").alias("mau"))
    out = daily.withColumn(
        "mkey", F.expr("(day * 86400) div 2592000")
    ).join(F.broadcast(monthly), "mkey")
    return out.select(
        "day",
        "dau",
        "mau",
        F.expr("dau * 10000 div mau").cast("bigint").alias("stickiness_bp"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves

_LTV_ORACLE = """
WITH e AS (
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week,
           CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                ELSE 0 END AS cents
    FROM events
), anchored AS (
    SELECT user_id, week, cents,
           min(week) OVER (PARTITION BY user_id) AS cohort_week
    FROM e
), cw AS (
    SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(sum(cents) AS BIGINT) AS rev_cents
    FROM anchored GROUP BY 1, 2
)
SELECT cohort_week, week_offset, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
                                 ORDER BY week_offset
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rev_cents
FROM cw
"""


@op("pipeline_cohort_ltv", oracle=_LTV_ORACLE, tags=("ext", "pipeline", "behavior"))
def pipeline_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: per signup-week cohort, revenue in
    each week-offset and its running cumulative — the money companion
    to the retention triangle (retention counts who came back; LTV
    counts what they spent, and the cumulative column IS the payback
    curve marketing reads break-even from).

    Same skeleton as pipeline_retention_cohort — cohort anchor from a
    per-user min-week window on the one user-keyed exchange, then a
    (cohort, offset) aggregate — plus one more window: the cumulative
    sum runs over the ~cohorts×offsets rollup, not the corpus, so it
    costs nothing at any scale. Revenue stays in exact integer cents
    end to end; non-purchase events contribute zero rather than being
    filtered, so the cohort anchor still sees every user's true first
    week (filtering first would wrongly anchor purchase-less users'
    cohorts — the subtle bug this formulation avoids).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        epoch_div("ts", 604800).alias("week"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    anchor = Window.partitionBy("user_id")
    anchored = e.withColumn("cohort_week", F.min("week").over(anchor))
    cw = anchored.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cw.select(
        "cohort_week",
        "week_offset",
        "rev_cents",
        F.sum("rev_cents").over(cum).cast("bigint").alias("cum_rev_cents"),
    )


# ---------------------------------------------------------------------------
# Inter-purchase intervals

_INTERPURCHASE_ORACLE = """
WITH p AS (
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events WHERE event_type = 'purchase'
), g AS (
    SELECT user_id,
           sec - lag(sec) OVER (PARTITION BY user_id
                                ORDER BY sec, event_id) AS gap
    FROM p
)
SELECT user_id,
       CAST(count(*) + 1 AS BIGINT)          AS n_purchases,
       CAST(sum(gap) // count(*) AS BIGINT)  AS avg_gap_sec,
       CAST(max(gap) AS BIGINT)              AS max_gap_sec
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
"""


@op(
    "pipeline_interpurchase_time",
    oracle=_INTERPURCHASE_ORACLE,
    tags=("ext", "behavior", "window"),
)
def pipeline_interpurchase_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time per user: count of purchases plus the mean and
    max gap in seconds between consecutive purchases — the cadence
    feature behind replenishment reminders and churn-risk scoring (a
    user whose current silence far exceeds their own max historical gap
    has likely churned).

    One lag window per user over the purchase-filtered stream (filter
    pushes to the scan; the window sort runs per user partition), then a
    per-user aggregate that reuses the window's hash(user_id)
    partitioning — one exchange total. Gaps stay exact integer seconds;
    the mean uses integral division so the row hash-matches at any
    scale (the engine-wide `div`-not-floor(double) discipline).
    """
    p = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = p.select(
        "user_id", "event_id", epoch_seconds("ts").alias("sec")
    ).withColumn("gap", F.col("sec") - F.lag("sec").over(w))
    return (
        g.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.count("*") + 1).cast("bigint").alias("n_purchases"),
            F.expr("sum(gap) div count(*)").cast("bigint").alias("avg_gap_sec"),
            F.max("gap").cast("bigint").alias("max_gap_sec"),
        )
    )


# ---------------------------------------------------------------------------
# Session-scoped navigation paths

_PATH_GAP_S = 1800  # 30-min inactivity gap (tighter than win_sessionize's 6h
                    # batch sessions: navigation analysis wants visit-scale cuts)

_SESSION_PATHS_ORACLE = f"""
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
), flagged AS (
    SELECT user_id, event_id, event_type, sec,
           CASE WHEN lag(sec) OVER w IS NULL
                  OR sec - lag(sec) OVER w > {_PATH_GAP_S}
                THEN 1 ELSE 0 END AS new_sess
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
), sess AS (
    SELECT user_id, event_id, event_type, sec,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
), hops AS (
    SELECT event_type AS next_type,
           lag(event_type) OVER (PARTITION BY user_id, session_seq
                                 ORDER BY sec, event_id) AS prev_type
    FROM sess
), counts AS (
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM hops WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n * 10000 // (SELECT sum(n) FROM counts) AS BIGINT) AS share_bp
FROM counts
"""


@op(
    "pipeline_session_paths",
    oracle=_SESSION_PATHS_ORACLE,
    tags=("ext", "behavior", "window"),
)
def pipeline_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped navigation transitions: (prev → next) event-type
    hop counts WITHIN 30-minute-gap sessions, plus each hop's share of
    all in-session navigation — the "where do users actually go next"
    table. pipeline_event_transitions counts the same hops over a user's
    whole history; scoping to sessions removes the overnight
    false-transitions (last event yesterday → first event today is not
    navigation), which is the version product analytics wants.

    Three window passes — session flags, session ids, in-session lag —
    all partitioned by user (the lag adds session_seq to the partition
    key, a strict refinement hash(user) already satisfies), so the whole
    ladder rides ONE user exchange; the hop aggregate is its own small
    exchange and the global total is a 1-row broadcast. Integral-div
    share in basis points, the engine-wide discipline.
    """
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_seconds("ts").alias("sec")
    )
    wu = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("sec").over(wu).isNull()
            | (F.col("sec") - F.lag("sec").over(wu) > _PATH_GAP_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy("sec", "event_id")
    hops = sess.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(ws).alias("prev_type"),
    )
    counts = (
        hops.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # Global total as an empty-frame window over the COUNTS table (at
    # most |types|^2 rows — explicitly bounded), not a crossJoin of a
    # re-aggregated subtree: the scalar-subquery form compiles the whole
    # hop ladder TWICE; this form scans it once.
    tot = dim_window(Window.partitionBy(), bound="\u2264|event_types|\u00b2 hop cells")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.sum("n").over(tot).alias("_tot"),
    ).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 10000 div _tot").cast("bigint").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# Frequent 3-event sequences (sequence mining, funnels beyond pairs)
# ---------------------------------------------------------------------------

_TRIGRAM_TOPK = 10

_TRIGRAM_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type, 1) OVER w AS p1,
           lag(event_type, 2) OVER w AS p2
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
), tri AS (
    SELECT p2 AS e1, p1 AS e2, event_type AS e3, count(*) AS n
    FROM seq WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
), ranked AS (
    SELECT e1, e2, e3, n,
           row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS rk
    FROM tri
)
SELECT e1, e2, e3, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_TRIGRAM_TOPK}
"""


@op("pipeline_event_trigrams", oracle=_TRIGRAM_ORACLE, tags=("ext", "behavior"))
def pipeline_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-event sequences across all users — the
    sequence-mining step past pipeline_event_transitions' pair matrix:
    pairs say what follows what, trigrams expose the actual journeys
    (view→click→purchase vs view→click→error) that funnel design and
    anomaly triage read.

    Two lags over one per-user window produce every consecutive triple
    in a single pass (no self-joins — the naive sequence join is
    events³); the count agg is |types|³-bounded and the global top-10
    is a WindowGroupLimit over that bounded frame with a total-order
    tie-break (count DESC, then lexicographic triple).

    Scale: one (user) exchange for the lag scan — the same exchange
    every sessionization op here shares — then dimension-bounded
    aggregation; nothing downstream scales with rows.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(epoch_seconds("ts"), F.col("event_id"))
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    tri = (
        seq.filter(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("e1"),
            F.col("p1").alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .agg(F.count("*").alias("n"))
    )
    wr = dim_window(
        Window.orderBy(F.desc("n"), "e1", "e2", "e3"),
        bound="\u2264|event_types|\u00b3 trigram cells",
    )
    return (
        tri.select("e1", "e2", "e3", "n", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") <= _TRIGRAM_TOPK)
        .select(
            "e1",
            "e2",
            "e3",
            F.col("n").cast("bigint").alias("n"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Audience overlap matrix (distinct-user intersection per event-type pair)
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH au AS (
    SELECT DISTINCT event_type, user_id FROM events
), deg AS (
    SELECT event_type, count(*) AS n FROM au GROUP BY 1
), pair AS (
    SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS n_both
    FROM au x JOIN au y
      ON x.user_id = y.user_id AND x.event_type < y.event_type
    GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST(da.n AS BIGINT) AS n_a,
       CAST(db.n AS BIGINT) AS n_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       CAST(p.n_both * 10000 // (da.n + db.n - p.n_both) AS BIGINT)
           AS jaccard_bp
FROM pair p
JOIN deg da ON da.event_type = p.type_a
JOIN deg db ON db.event_type = p.type_b
"""


@op("pipeline_audience_overlap", oracle=_OVERLAP_ORACLE, tags=("ext", "behavior"))
def pipeline_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how many
    distinct users did BOTH, with the Jaccard share in basis points —
    the segment-overlap table that targeting, dedup-of-audiences, and
    cross-sell analyses read first ("are purchasers a subset of
    clickers, or a disjoint tribe?").

    The intersection is a MIDDLE-VERTEX equi-join on user (the
    graph_jaccard wedge decomposition applied to the bipartite
    user×type incidence): one distinct pass, then pairs form per user
    — a user in k types contributes C(k,2) wedges, bounded by
    |types|=5, so the join output is ≤10·|users| rows into a
    |types|²-bounded agg. Unions come from degrees, never materialized.
    Exact integers end to end.

    Scale: distinct (type,user) is the one corpus-sized exchange; the
    wedge join reuses the user partitioning; at 100 TB with a large
    type vocabulary you band the per-user type-set (the _pair_edges
    cap) — with 5 types the fanout bound is constant.
    """
    au = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    deg = au.groupBy("event_type").agg(F.count("*").alias("n"))
    x = au.select(F.col("event_type").alias("type_a"), "user_id")
    y = au.select(F.col("event_type").alias("type_b"), "user_id")
    pair = (
        x.join(y, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    da = deg.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    db = deg.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    out = pair.join(F.broadcast(da), "type_a").join(F.broadcast(db), "type_b")
    return out.select(
        "type_a",
        "type_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_both").cast("bigint").alias("n_both"),
        F.expr("n_both * 10000 div (n_a + n_b - n_both)")
        .cast("bigint")
        .alias("jaccard_bp"),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) of suppliers on (cost, volume)
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH s AS (
    SELECT l_suppkey,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cost_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY 1
), pairs AS (
    SELECT cost_cents, total_qty FROM s GROUP BY 1, 2
), marked AS (
    SELECT cost_cents, total_qty,
           max(total_qty) OVER (ORDER BY cost_cents, total_qty DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max
    FROM pairs
), frontier AS (
    SELECT cost_cents, total_qty FROM marked
    WHERE prev_max IS NULL OR total_qty > prev_max
)
SELECT s.l_suppkey, s.cost_cents, s.total_qty
FROM s JOIN frontier USING (cost_cents, total_qty)
"""


@op("pipeline_skyline_frontier", oracle=_SKYLINE_ORACLE, tags=("ext", "behavior", "scale"))
def pipeline_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of suppliers on (total cost MIN, total
    volume MAX): a supplier survives iff no other is at-most-as-costly
    AND at-least-as-voluminous with one strict — the multi-objective
    shortlist query (Börzsönyi'01's SKYLINE OF) that "ORDER BY one
    column" cannot express and engines do not ship natively.

    The 2-D skyline needs NO pairwise dominance join: over DISTINCT
    (cost, qty) pairs sorted by (cost asc, qty desc), every preceding
    row is weakly better on cost (or equal-cost with strictly more
    volume), so a pair is dominated iff the running max of preceding
    volume reaches it — one window with an UNBOUNDED..1 PRECEDING
    frame replaces the O(n²) NOT EXISTS, and equal pairs (mutually
    non-dominating by the strict-somewhere rule) are collapsed before
    the window so the tie case cannot misfire. Exact integer cents and
    quantities; frontier membership joins back to supplier keys.

    Scale: one supplier aggregation (the corpus-sized exchange), then
    the window runs on distinct metric pairs — ≤ |suppliers| rows,
    single sort. A d>2 skyline needs the block-nested-loop or
    divide-and-conquer forms; the sort-window identity is exactly the
    2-D specialization worth hard-coding.
    """
    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("cost_cents"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"),
    )
    pairs = s.select("cost_cents", "total_qty").distinct()
    w = dim_window(
        Window.orderBy(F.asc("cost_cents"), F.desc("total_qty")).rowsBetween(
            Window.unboundedPreceding, -1
        ),
        bound="\u2264|suppliers| distinct (cost, qty) frontier points",
    )
    frontier = (
        pairs.select(
            "cost_cents", "total_qty", F.max("total_qty").over(w).alias("prev_max")
        )
        .filter(F.col("prev_max").isNull() | (F.col("total_qty") > F.col("prev_max")))
        .select("cost_cents", "total_qty")
    )
    return s.join(F.broadcast(frontier), ["cost_cents", "total_qty"]).select(
        "l_suppkey", "cost_cents", "total_qty"
    )


# ---------------------------------------------------------------------------
# Customer segment migration matrix between eras
# ---------------------------------------------------------------------------

_MIG_CUT = "1998-01-01"
_MIG_LOW_CENTS = 20_000_000   # < $200k era spend -> low
_MIG_HIGH_CENTS = 50_000_000  # >= $500k -> high

_MIGRATION_ORACLE = f"""
WITH spend AS (
    SELECT o_custkey,
           CASE WHEN o_orderdate < DATE '{_MIG_CUT}' THEN 'a' ELSE 'b' END AS era,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
    FROM orders GROUP BY 1, 2
), seg AS (
    SELECT o_custkey, era,
           CASE WHEN cents < {_MIG_LOW_CENTS} THEN 'low'
                WHEN cents < {_MIG_HIGH_CENTS} THEN 'mid'
                ELSE 'high' END AS seg
    FROM spend
), m AS (
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
           coalesce(a.seg, 'none') AS seg_a,
           coalesce(b.seg, 'none') AS seg_b
    FROM (SELECT * FROM seg WHERE era = 'a') a
    FULL OUTER JOIN (SELECT * FROM seg WHERE era = 'b') b USING (o_custkey)
)
SELECT seg_a, seg_b, CAST(count(*) AS BIGINT) AS n_customers
FROM m GROUP BY 1, 2
"""


@op("pipeline_segment_migration", oracle=_MIGRATION_ORACLE, tags=("ext", "behavior"))
def pipeline_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix between two eras: each
    customer's spend tier (low/mid/high on fixed cent thresholds)
    before and after the cut, counted per (from, to) cell — with
    'none' rows capturing churn (active→absent) and acquisition
    (absent→active). The lifecycle flow table every retention team
    reads before intervening: upgrades, downgrades, and silent churn in
    one dimension-bounded matrix.

    Fixed VALUE thresholds, not quantiles, keep the segmentation exact
    integer comparisons (quantile tiers at scale are the KLL sketch
    tier's job); the era pivot is a full outer join on customer —
    both sides are per-customer aggregates, so the join input is
    |customers|, not orders, and the output is a ≤4×4 matrix.

    Scale: two-branch single scan (era is a projected CASE, one
    groupBy(cust, era) exchange), self-pivot via full outer join on
    the customer partitioning, then a 16-cell count. Nothing after the
    first aggregation scales with row count.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderdate") < F.lit(_MIG_CUT).cast("date"), "a")
        .otherwise("b")
        .alias("era"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    spend = o.groupBy("o_custkey", "era").agg(F.sum("cents").alias("cents"))
    seg = spend.select(
        "o_custkey",
        "era",
        F.when(F.col("cents") < _MIG_LOW_CENTS, "low")
        .when(F.col("cents") < _MIG_HIGH_CENTS, "mid")
        .otherwise("high")
        .alias("seg"),
    )
    a = seg.filter(F.col("era") == "a").select("o_custkey", F.col("seg").alias("sa"))
    b = seg.filter(F.col("era") == "b").select("o_custkey", F.col("seg").alias("sb"))
    m = a.join(b, "o_custkey", "full_outer").select(
        F.coalesce(F.col("sa"), F.lit("none")).alias("seg_a"),
        F.coalesce(F.col("sb"), F.lit("none")).alias("seg_b"),
    )
    return m.groupBy("seg_a", "seg_b").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# New vs returning users per day (first-seen attribution)
# ---------------------------------------------------------------------------

_NEW_RET_ORACLE = """
WITH e AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), first_seen AS (
    SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id
), daily AS (
    SELECT DISTINCT e.user_id, e.day, f.first_day
    FROM e JOIN first_seen f USING (user_id)
)
SELECT day,
       CAST(count(*) AS BIGINT)                                   AS dau,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
                                                                  AS new_users,
       CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
                                                                  AS returning_users,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT)                                AS new_share_bp
FROM daily GROUP BY day
"""


@op(
    "pipeline_new_returning_users",
    oracle=_NEW_RET_ORACLE,
    tags=("ext", "pipeline", "behavior"),
)
def pipeline_new_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into NEW (first-ever activity today) vs
    RETURNING — the growth-accounting decomposition every product
    dashboard leads with (DAU alone conflates acquisition with
    retention; pipeline_dau_mau_stickiness measures the ratio, this
    attributes each day's count to its driver). First-seen is
    min(activity day) per user — exact, no sessionization heuristics.

    Scale: one scan → distinct (user, day) pairs; first-seen is one
    (user)-keyed min agg joined back on the same user key (the
    text_ngram_novelty first-seen shape on the events axis); the daily
    rollup is |days|-bounded. All integers, integral share.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    )
    daily = e.distinct()
    first_seen = daily.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = daily.join(first_seen, "user_id")
    return j.groupBy("day").agg(
        F.count("*").cast("bigint").alias("dau"),
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("bigint")
        .alias("returning_users"),
        F.expr(
            "sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) * 10000"
            " div count(*)"
        )
        .cast("bigint")
        .alias("new_share_bp"),
    )


# ---------------------------------------------------------------------------
# Order-to-ship lead time (exact rank percentiles per order priority)
# ---------------------------------------------------------------------------

_LEAD_SLA_DAYS = 90  # order-to-ship SLA for the miss-rate column

_LEAD_TIME_ORACLE = f"""
WITH d AS (
    SELECT o.o_orderpriority,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS lead_days,
           CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                    > {_LEAD_SLA_DAYS} THEN 1 ELSE 0 END AS late,
           row_number() OVER (
               PARTITION BY o.o_orderpriority
               ORDER BY CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT),
                        l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey
           ) AS rk,
           count(*) OVER (PARTITION BY o.o_orderpriority) AS n
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), cuts AS (
    SELECT o_orderpriority,
           max(n) AS n,
           sum(late) AS n_late,
           min(CASE WHEN rk = (n + 1) // 2 THEN lead_days END) AS p50_days,
           min(CASE WHEN rk = (n * 9 + 9) // 10 THEN lead_days END) AS p90_days,
           min(CASE WHEN rk = (n * 99 + 99) // 100 THEN lead_days END) AS p99_days
    FROM d GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n,
       CAST(p50_days AS BIGINT) AS p50_days,
       CAST(p90_days AS BIGINT) AS p90_days,
       CAST(p99_days AS BIGINT) AS p99_days,
       CAST(n_late * 10000 // n AS BIGINT) AS late_bp
FROM cuts
"""


@op(
    "pipeline_order_lead_time",
    oracle=_LEAD_TIME_ORACLE,
    tags=("ext", "pipeline", "stats"),
)
def pipeline_order_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time SLA profile per order priority: exact
    p50/p90/p99 of orderdate→shipdate days plus the 90-day SLA-miss
    rate in basis points — the fulfillment-latency distribution behind
    every delivery promise. pipeline_late_shipment_priority finds WHICH
    late orders hurt; this is the latency DISTRIBUTION per priority
    class, tails included — means hide exactly the p99 an SLA is
    written against. (Fixtures carry no l_receiptdate/l_shipmode —
    FIXTURES.md — so the latency is the order→ship leg per priority,
    the same rank-percentile machinery either way.)

    Exact: lead days are integer date arithmetic; percentiles are
    rank-indexed picks on the (days, orderkey, linenumber, partkey,
    suppkey) total order (duplicate (orderkey, linenumber) rows exist
    in the fixture — the extra key columns keep the order total);
    ceil(q·n) ranks, no interpolation, no floats; the miss rate is
    integral basis points.

    Scale: the orderkey equi-join is the one fact-fact shuffle; the
    rank window exchanges on the 5-value priority key (coarse — the
    same rank-pick form runs per (priority, week) when finer
    partitioning is needed), then a dim-bounded agg.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    days = F.datediff("l_shipdate", "o_orderdate").cast("bigint")
    wp = Window.partitionBy("o_orderpriority")
    d = j.select(
        "o_orderpriority",
        days.alias("lead_days"),
        F.when(days > _LEAD_SLA_DAYS, 1).otherwise(0).alias("late"),
        F.row_number()
        .over(
            Window.partitionBy("o_orderpriority").orderBy(
                days.asc(),
                F.col("l_orderkey").asc(),
                F.col("l_linenumber").asc(),
                F.col("l_partkey").asc(),
                F.col("l_suppkey").asc(),
            )
        )
        .alias("rk"),
        F.count("*").over(wp).alias("n"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("lead_days")))  # noqa: E731
    cuts = d.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.sum("late").alias("n_late"),
        pick(F.col("rk") == F.expr("(n + 1) div 2")).alias("p50_days"),
        pick(F.col("rk") == F.expr("(n * 9 + 9) div 10")).alias("p90_days"),
        pick(F.col("rk") == F.expr("(n * 99 + 99) div 100")).alias("p99_days"),
    )
    return cuts.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.col("p50_days").cast("bigint").alias("p50_days"),
        F.col("p90_days").cast("bigint").alias("p90_days"),
        F.col("p99_days").cast("bigint").alias("p99_days"),
        F.expr("n_late * 10000 div n").cast("bigint").alias("late_bp"),
    )
