"""Property-based algebraic invariants (SURVEY.md §5.2 layer 3).

Each property is checked over hypothesis-generated parameters against the
real engine. Example counts are small (Spark jobs per example) but the
invariants are exact, not statistical.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from connor_fun_streamproducer_spark.catalog import load
from tests.conftest import SF_DIR

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(threshold=st.floats(min_value=0.0, max_value=300000.0, allow_nan=False))
@_settings
def test_filter_commutes_with_projection(spark, threshold):
    o = load(spark, SF_DIR, "orders")
    a = o.filter(F.col("o_totalprice") > threshold).select("o_orderkey", "o_totalprice")
    b = o.select("o_orderkey", "o_totalprice").filter(F.col("o_totalprice") > threshold)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@given(status=st.sampled_from(["O", "F", "P"]), prio=st.sampled_from(["1-URGENT", "3-MEDIUM"]))
@_settings
def test_union_count_is_sum_of_counts(spark, status, prio):
    o = load(spark, SF_DIR, "orders")
    x = o.filter(F.col("o_orderstatus") == status)
    y = o.filter(F.col("o_orderpriority") == prio)
    assert x.unionByName(y).count() == x.count() + y.count()


@given(seed=st.integers(min_value=0, max_value=10))
@_settings
def test_dedup_idempotent(spark, seed):
    d = load(spark, SF_DIR, "documents")
    doubled = d.unionByName(d).withColumn("salt", F.lit(seed))
    once = doubled.dropDuplicates(["doc_id"])
    twice = once.dropDuplicates(["doc_id"])
    assert once.count() == twice.count() == d.count()


def test_window_counts_sum_to_enriched_total(spark):
    """Tumbling-window per-region counts must partition the enriched rows."""
    from connor_fun_streamproducer_spark.streaming.pipeline import (
        agg_window_count,
        enrich_region,
    )

    total = enrich_region(spark, SF_DIR).count()
    windowed = agg_window_count(spark, SF_DIR)
    assert windowed.agg(F.sum("n_events")).collect()[0][0] == total


@given(k=st.integers(min_value=1, max_value=10))
@_settings
def test_topk_per_group_bounded_and_subset(spark, k):
    from pyspark.sql.window import Window

    o = load(spark, SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    topk = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    sizes = topk.groupBy("o_custkey").count()
    assert sizes.filter(F.col("count") > k).count() == 0
    # top-1 of top-k equals top-1 overall
    top1 = o.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    assert topk.filter("rn = 1").count() == top1.count()


def test_set_algebra_partition(spark):
    """A = (A∩B) ⊎ (A∖B) in bag semantics."""
    o = load(spark, SF_DIR, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    assert a.count() == a.intersectAll(b).count() + a.exceptAll(b).count()


def test_hll_sketch_estimate_close_to_exact(spark):
    """Merged per-day HLL sketches must estimate per-type distinct users
    within 5% of exact (64-dim default lgK) — the decomposable-distinct
    invariant the 100 TB rollup path relies on."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    est = {
        r["event_type"]: r["approx_users"]
        for r in registry.OPS["agg_sketch_merge"]
        .fn(spark, SF_DIR, with_exact=False)
        .collect()
    }
    ev = load(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) / n <= 0.05, (t, est[t], n)


def test_rollup_hierarchy_equals_direct_aggregation(spark):
    """Month-from-daily must equal month-from-raw (decomposability)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rolled = {
        (r["event_type"], r["month"]): (r["n"], r["total"])
        for r in registry.OPS["rollup_time_hierarchy"].fn(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events")
    direct = {
        (r["event_type"], r["month"]): (r["n"], r["total"])
        for r in ev.groupBy("event_type", F.date_trunc("month", "ts").alias("month"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    assert rolled == direct


def test_grid_join_equals_nested_loop_join(spark):
    """The grid-cell equi-join rewrite must return exactly the nested-loop
    containment join's rows — the rewrite is an optimization, never a
    semantic change."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    nlj = {tuple(r) for r in registry.OPS["enrich_region"].fn(spark, SF_DIR).collect()}
    grid = {
        tuple(r) for r in registry.OPS["enrich_region_grid"].fn(spark, SF_DIR).collect()
    }
    assert nlj == grid and len(nlj) > 0


def test_chunks_reconstruct_documents(spark):
    """Dropping each chunk's overlap prefix (stride-aligned suffix keeps
    chunk 0 whole, later chunks contribute tokens beyond the previous
    chunk's window) and concatenating in chunk order must reproduce every
    document exactly — chunking loses nothing and invents nothing."""
    from connor_fun_streamproducer_spark import registry
    from connor_fun_streamproducer_spark.llm.corpus import CHUNK_SIZE, CHUNK_STRIDE

    registry._ensure_loaded()
    chunks = registry.OPS["text_chunk"].fn(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    rebuilt: dict[int, list[str]] = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_id"])):
        toks = r["chunk_text"].split(" ")
        keep = toks if r["chunk_id"] == 0 else toks[CHUNK_SIZE - CHUNK_STRIDE:]
        rebuilt.setdefault(r["doc_id"], []).extend(keep)
    assert set(rebuilt) == set(docs)
    for did, toks in rebuilt.items():
        assert " ".join(toks) == docs[did], f"doc {did} not reconstructed"


def test_sample_split_partitions_and_fractions(spark):
    """Every doc lands in exactly one split; observed fractions are within
    a loose tolerance of 90/5/5 (deterministic hash, so this is a fixed
    property of the fixture, not a flaky statistical test)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = registry.OPS["sample_split"].fn(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    from collections import Counter

    frac = Counter(r["split"] for r in rows)
    assert set(frac) <= {"train", "valid", "test"}
    assert frac["train"] / n_docs > 0.85
    assert frac["test"] / n_docs < 0.10


def test_stratified_sample_is_subset_with_per_lang_rates(spark):
    """The kept set is a subset of the corpus; 'de' keeps everything,
    'en' keeps roughly half (deterministic — exact counts are fixed by
    the hash, the loose bounds just avoid coupling to the fixture)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    kept = registry.OPS["sample_stratified"].fn(spark, SF_DIR).collect()
    d = load(spark, SF_DIR, "documents").select("doc_id", "lang").collect()
    all_ids = {r["doc_id"]: r["lang"] for r in d}
    assert all(r["doc_id"] in all_ids for r in kept)
    from collections import Counter

    tot = Counter(all_ids.values())
    got = Counter(r["lang"] for r in kept)
    assert got["de"] == tot["de"], "de stratum must keep 100%"
    if tot["en"] >= 20:
        assert 0.3 <= got["en"] / tot["en"] <= 0.7, (got["en"], tot["en"])


def test_tfidf_ranks_rare_terms_above_common(spark):
    """For any doc, a returned term's score must be >= the tf/df score of
    every non-returned term of that doc (top-3 really is the top)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    top = registry.OPS["tfidf_top_terms"].fn(spark, SF_DIR)
    # Recompute all scores independently with plain aggregations.
    d = load(spark, SF_DIR, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").count().withColumnRenamed("count", "tf")
    df_ = tf.groupBy("term").count().withColumnRenamed("count", "df")
    all_scores = {
        (r["doc_id"], r["term"]): r["tf"] / r["df"]
        for r in tf.join(df_, "term").collect()
    }
    got = top.collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    sample = dict(list(by_doc.items())[:25])
    for did, rows in sample.items():
        min_top = min(all_scores[(did, r["term"])] for r in rows)
        others = [v for (d2, t), v in all_scores.items() if d2 == did
                  and t not in {r["term"] for r in rows}]
        assert all(v <= min_top + 1e-12 for v in others), f"doc {did}"


@given(
    docs=st.lists(
        st.sets(st.integers(min_value=0, max_value=25), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    )
)
@_settings
def test_jaccard_prefix_filter_is_complete(spark, docs):
    """The prefix-filtering principle behind dedup_ngram_jaccard, checked
    on hypothesis-generated token sets: EVERY pair with Jaccard > 0.8
    must appear among the prefix-join candidates — tiny vocab (0..25)
    maximizes shared tokens and ties in the df ordering, the adversarial
    regime for a completeness bug."""
    from pyspark.sql import functions as F

    from connor_fun_streamproducer_spark.llm.dedup import jaccard_prefix_candidates

    rows = [(i, "xx", 0, [f"t{t}" for t in sorted(s)]) for i, s in enumerate(docs)]
    toks = spark.createDataFrame(
        rows, "doc_id long, lang string, len_bucket int, toks array<string>"
    )
    cand = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_prefix_candidates(toks).collect()
    }
    true_pairs = set()
    for i, a in enumerate(docs):
        for j in range(i + 1, len(docs)):
            b = docs[j]
            jac = len(a & b) / len(a | b)
            if jac > 0.8:
                true_pairs.add((i, j))
    missed = true_pairs - cand
    assert not missed, f"prefix filter dropped qualifying pairs: {missed}"


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10)),  # (user, ts)
        min_size=1,
        max_size=15,
    ),
    orders=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10)),  # (cust, ts)
        min_size=1,
        max_size=15,
    ),
)
@_settings
def test_asof_join_forms_agree_on_tie_heavy_data(spark, events, orders):
    """join_asof (equi-join + max(struct)) and join_asof_sorted (merge
    carry-forward) must pick the SAME match everywhere — including the
    adversarial cases hypothesis hits constantly at this tiny domain:
    order timestamp exactly equal to event timestamp (<= bound), several
    orders sharing one timestamp (highest-key tie-break), users with no
    earlier order (row dropped)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    e = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(events)], "event_id long, user_id long, ts long"
    )
    o = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(orders)], "o_orderkey long, o_custkey long, o_orderdate long"
    )

    # Form 1: equi-join + max(struct) (join_asof's shape)
    j = e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
    a = {
        (r["event_id"], r["k"], r["d"])
        for r in j.groupBy("event_id")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("b"))
        .select("event_id", F.col("b.o_orderkey").alias("k"), F.col("b.o_orderdate").alias("d"))
        .collect()
    }
    # Form 2: union tape + carry-forward (join_asof_sorted's shape)
    et = e.select("user_id", F.col("ts").alias("t"), F.lit(1).alias("kind"), "event_id",
                  F.lit(None).cast("long").alias("o_orderkey"), F.lit(None).cast("long").alias("o_orderdate"))
    ot = o.select(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("t"),
                  F.lit(0).alias("kind"), F.lit(None).cast("long").alias("event_id"),
                  "o_orderkey", "o_orderdate")
    w = (Window.partitionBy("user_id").orderBy("t", "kind", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = ot.unionByName(et).withColumn(
        "asof",
        F.last(F.when(F.col("kind") == 0, F.struct("o_orderdate", "o_orderkey")),
               ignorenulls=True).over(w),
    )
    b = {
        (r["event_id"], r["k"], r["d"])
        for r in carried.filter((F.col("kind") == 1) & F.col("asof").isNotNull())
        .select("event_id", F.col("asof.o_orderkey").alias("k"), F.col("asof.o_orderdate").alias("d"))
        .collect()
    }
    assert a == b, f"asof forms diverged: only_join={sorted(a-b)} only_sorted={sorted(b-a)}"


def test_scd2_intervals_partition_each_users_timeline(spark):
    """merge_scd2 output invariants: per user, versions are contiguous
    ([valid_to == next valid_from), exactly one open interval flagged
    is_current, version_seq dense from 1, and adjacent versions never
    carry the same attribute value (a run collapse happened)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = registry.OPS["merge_scd2"].fn(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r["version_seq"])
        assert [v["version_seq"] for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v["is_current"] for v in vs) == 1 and vs[-1]["is_current"]
        for cur, nxt in zip(vs, vs[1:]):
            assert cur["valid_to_s"] == nxt["valid_from_s"], (user, cur, nxt)
            assert cur["attr_value"] != nxt["attr_value"], (user, cur, nxt)
        assert vs[-1]["valid_to_s"] is None


@given(
    vals=st.lists(st.integers(min_value=0, max_value=70000), min_size=1, max_size=60),
)
@_settings
def test_bitmap_distinct_exact_on_random_multisets(spark, vals):
    """agg_bitmap_distinct's bucketed-bitmap pattern must be EXACT on
    arbitrary multisets — including values straddling the 32768-bit
    bucket boundary (the 0..70000 domain forces 2-3 buckets) and heavy
    duplication."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals + vals], "k long")
    got = (
        df.groupBy(F.expr("bitmap_bucket_number(k)").alias("b"))
        .agg(F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(k)))").alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert got == len(set(vals))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 8), st.booleans(), st.integers(0, 99)),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_fill_forward_matches_sequential_fold(spark, rows):
    """win_fill_forward's window must equal the obvious per-key sequential
    LOCF fold, including all-null prefixes and timestamp ties (broken on
    event_id)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    data = [
        (i, user, sec, float(v) if has else None)
        for i, (user, sec, has, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, sec long, v double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["event_id"]: r["f"]
        for r in df.select(
            "event_id", F.last("v", ignorenulls=True).over(w).alias("f")
        ).collect()
    }
    # sequential reference fold
    expected = {}
    last: dict = {}
    for eid, user, sec, v in sorted(data, key=lambda t: (t[1], t[2], t[0])):
        if v is not None:
            last[user] = v
        expected[eid] = last.get(user)
    assert got == expected


def test_haversine_distances_stay_off_rounding_boundaries(spark):
    """fn_geo_haversine rounds at 3 decimals; cross-engine trig agrees to
    ~1e-8 km, so the oracle contract is only platform-safe if every
    distance in the synthesized coordinate domain keeps a healthy margin
    from the .xxx5 boundaries. Pin that margin (measured 9.4e-7 km) at
    >= 1e-7 km, ~10x the worst-case libm deviation."""
    import math

    from connor_fun_streamproducer_spark.functions.math_fns import (
        _EARTH_R_KM,
        _GEO_REF_LAT,
        _GEO_REF_LON,
    )

    min_slack = 1.0
    for lon in range(-126, -126 + 59):
        for lat in range(25, 50):
            dlat = math.radians(lat - _GEO_REF_LAT) / 2
            dlon = math.radians(lon - _GEO_REF_LON) / 2
            h = (
                math.sin(dlat) ** 2
                + math.cos(math.radians(lat))
                * math.cos(math.radians(_GEO_REF_LAT))
                * math.sin(dlon) ** 2
            )
            d = 2 * _EARTH_R_KM * math.asin(math.sqrt(h))
            min_slack = min(min_slack, abs((d * 1000) % 1 - 0.5))
    assert min_slack >= 1e-4, f"distance too close to a .xxx5 boundary: {min_slack}"


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@_settings
def test_ewma_closed_form_equals_iterative_fold(spark, seed):
    """The end-anchored closed form win_ewma evaluates must equal the
    textbook recursive fold y_i = a*x_i + (1-a)*y_{i-1} on random series
    — checked in plain Python against the operator's per-key output."""
    import random

    from connor_fun_streamproducer_spark.operators.timeseries import _EWMA_ALPHA

    rng = random.Random(seed)
    n = rng.randint(1, 50)
    xs = [rng.uniform(-100, 100) for _ in range(n)]

    y = xs[0]
    for x in xs[1:]:
        y = _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * y

    beta = 1 - _EWMA_ALPHA
    closed = beta ** (n - 1) * xs[0] + sum(
        _EWMA_ALPHA * beta ** (n - i) * xs[i - 1] for i in range(2, n + 1)
    )
    assert abs(closed - y) < 1e-9


def test_interpolation_preserves_observed_and_bounds_interior(spark):
    """Observed buckets must pass through unchanged (interpolated=False
    rows equal the quantized hourly average), and every interpolated
    value must lie within [min(prev, next), max(prev, next)] of its
    anchors — linearity can't overshoot."""
    from connor_fun_streamproducer_spark import registry

    rows = sorted(
        registry.OPS["ts_interpolate_linear"].fn(spark, SF_DIR).collect(),
        key=lambda r: (r["user_id"], r["bucket"]),
    )
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
    checked = 0
    for seq in by_key.values():
        observed = [(i, r["value"]) for i, r in enumerate(seq) if not r["interpolated"]]
        obs_idx = [i for i, _ in observed]
        for i, r in enumerate(seq):
            if not r["interpolated"]:
                continue
            prev_v = next(v for j, v in reversed(observed) if j < i)
            next_v = next(v for j, v in observed if j > i)
            lo, hi = min(prev_v, next_v), max(prev_v, next_v)
            assert lo - 1e-4 <= r["value"] <= hi + 1e-4, (r, lo, hi)
            checked += 1
        assert obs_idx, "every key must retain at least one observed bucket"
    assert checked > 0, "fixture produced no interpolated buckets"


def test_zorder_interleave_is_bijective_and_monotone_in_quadrants(spark):
    """The bit interleave must be a bijection on the 8-bit × 8-bit grid
    (no two (x, y) share a z-value) and its top 2k bits must recover the
    quadrant of both coordinates — the property that makes z-ranges
    rectangle-local."""
    from connor_fun_streamproducer_spark.sources.layout import Z_BITS, _z_interleave_sql

    import duckdb

    expr = _z_interleave_sql("x", "y")
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH g AS (SELECT a.x, b.y
                   FROM range(0, 256) a(x), range(0, 256) b(y))
        SELECT x, y, {expr} AS z FROM g
        """
    ).fetchall()
    assert len(rows) == 65536
    zs = {r[2] for r in rows}
    assert len(zs) == 65536  # bijection
    # quadrant recovery: bit b of x lives at z-bit 2b, bit b of y at 2b+1
    for x, y, z in rows:
        assert ((z >> (2 * (Z_BITS - 1))) & 1) == ((x >> (Z_BITS - 1)) & 1)
        assert ((z >> (2 * (Z_BITS - 1) + 1)) & 1) == ((y >> (Z_BITS - 1)) & 1)


def test_min_label_propagation_converges_on_worst_case_path(spark):
    """A path graph is the worst case for min-label propagation (diameter
    = n-1, one hop of label movement per round). Pin: a 12-node path
    collapses to a single component within CC_MAX_ROUNDS, an isolated
    node keeps its own label, and a separate 3-cycle keeps its own min —
    i.e. the fixpoint is exactly per-component min, not a global min."""
    from connor_fun_streamproducer_spark.operators.graph import (
        CC_MAX_ROUNDS,
        propagate_min_label,
    )

    path = [(i, i + 1) for i in range(100, 111)]  # 12-node path, min 100
    cycle = [(7, 8), (8, 9), (9, 7)]  # separate 3-cycle, min 7
    directed = path + cycle
    e0 = spark.createDataFrame(directed, "src bigint, dst bigint")
    edges = e0.union(e0.selectExpr("dst as src", "src as dst"))
    node_ids = sorted({n for e in directed for n in e} | {999})  # 999 isolated
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node bigint")

    assert 11 < CC_MAX_ROUNDS  # path diameter must fit the round budget
    got = {r["node"]: r["component"] for r in propagate_min_label(edges, nodes).collect()}
    assert all(got[n] == 100 for n in range(100, 112))
    assert all(got[n] == 7 for n in (7, 8, 9))
    assert got[999] == 999


def test_pca_projection_matches_numpy_reference(spark):
    """embedding_pca_project (hash-checked since r13: the driver eigh
    was replaced by a PI_ROUNDS-round deflated power iteration that the
    DuckDB oracle replays as unrolled CTEs) pinned against an
    INDEPENDENT third implementation: the covariance and projection are
    recomputed here with numpy matrix algebra (not the op's per-term
    loop), the iteration replayed from that independently-built matrix,
    and the captured variance checked against numpy eigh's eigenvalues
    — the quantity the fixed-round iteration is supposed to optimize.
    With the fixture's near-degenerate spectrum the iterate need not
    equal eigh's VECTORS, but its Rayleigh quotient must sit within a
    few percent of the true top eigenvalues."""
    import numpy as np
    import pyarrow.parquet as pq

    from connor_fun_streamproducer_spark import registry
    from connor_fun_streamproducer_spark.llm.pca import (
        D_SEL,
        _Q,
        _pca_components,
    )

    registry._ensure_loaded()
    rows = registry.OPS["embedding_pca_project"].fn(spark, SF_DIR).collect()

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    m = np.stack(tbl["embedding"].to_numpy())[:, :D_SEL].astype("float64")
    q = np.floor(m * _Q + 0.5)
    n = len(m)
    sd = q.sum(axis=0).astype("int64")
    covq = np.floor(
        ((q.T @ q / n - np.outer(sd / n, sd / n)) / _Q**2) * _Q + 0.5
    ).astype("int64")
    cov_rows = [
        {"i": i + 1, "j": j + 1, "cq": int(covq[i, j])}
        for i in range(D_SEL)
        for j in range(D_SEL)
    ]
    e1, e2, _lam1, _lam2 = _pca_components(cov_rows)

    # independent matrix-algebra projection (the op sums 16 scalar terms)
    qn = q.astype("int64") * n - sd  # exact in int64 at this scale
    exp1 = np.floor(qn @ np.array(e1) / (float(n) * 1e12) * 1e4 + 0.5) / 1e4
    exp2 = np.floor(qn @ np.array(e2) / (float(n) * 1e12) * 1e4 + 0.5) / 1e4

    by_id = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in rows}
    ids = tbl["vec_id"].to_numpy()
    assert len(by_id) == n
    for i in range(n):
        # the numpy matmul may differ one output quantum from the op's exact
        # fixed-order scalar sum at a floor boundary; never more.
        assert abs(by_id[ids[i]][0] - exp1[i]) <= 1e-4 + 1e-12
        assert abs(by_id[ids[i]][1] - exp2[i]) <= 1e-4 + 1e-12

    # Rayleigh quotients vs the true spectrum: the iterate must capture
    # nearly the top eigenvalue's variance, and PC1 >= PC2 variance.
    C = covq / float(_Q)
    vals = np.sort(np.linalg.eigvalsh(C))[::-1]
    u1 = np.array(e1, dtype=float)
    u1 /= np.linalg.norm(u1)
    u2 = np.array(e2, dtype=float)
    u2 /= np.linalg.norm(u2)
    ray1, ray2 = u1 @ C @ u1, u2 @ C @ u2
    assert ray1 >= 0.97 * vals[0]
    assert ray2 >= 0.93 * vals[1]
    assert abs(u1 @ u2) < 0.05  # deflation kept the directions near-orthogonal
    p1 = np.array([v[0] for v in by_id.values()])
    p2 = np.array([v[1] for v in by_id.values()])
    assert p1.var() >= p2.var()


def test_triangle_corner_mass_divisible_by_three(spark):
    """Every triangle contributes exactly 3 corner rows, so total corner
    mass ≡ 0 (mod 3) — broken orientation (double-generated triangles)
    would typically break this before it breaks row counts."""
    from connor_fun_streamproducer_spark.operators.graph import graph_triangle_count

    # sf0.001 has only 15 users and no triangles; the invariant needs a
    # graph that actually closes wedges — pin it at sf0.01.
    df = graph_triangle_count(spark, "/root/testdata/sf0.01")
    total = df.agg(F.sum("triangles").alias("s")).collect()[0]["s"]
    assert total is not None and total > 0, "fixture should contain triangles"
    assert total % 3 == 0


def test_bfs_levels_start_at_source_and_are_contiguous(spark):
    """dist 0 is exactly the global min user; levels are contiguous
    (a non-empty level k>0 implies a non-empty level k-1) — BFS cannot
    skip a hop."""
    from connor_fun_streamproducer_spark.operators.graph import graph_bfs_distance

    rows = graph_bfs_distance(spark, SF_DIR).collect()
    ev = load(spark, SF_DIR, "events")
    src = ev.agg(F.min("user_id").alias("m")).collect()[0]["m"]
    zero = [r for r in rows if r["dist"] == 0]
    assert [r["user_id"] for r in zero] == [src]
    levels = sorted({r["dist"] for r in rows})
    assert levels == list(range(len(levels)))


def test_fuzzy_pairs_are_oriented_blocked_and_nontrivial(spark):
    """Each pair appears once (name_a < name_b), respects the blocking
    token (same last word), and has 1 <= dist <= 4 (0 would mean the
    distinct-names precondition broke)."""
    from connor_fun_streamproducer_spark.operators.entity import join_fuzzy_blocked

    rows = join_fuzzy_blocked(spark, SF_DIR).collect()
    assert rows, "fixture vocabulary should produce fuzzy pairs"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["dist"] <= 4
        assert r["name_a"].split(" ")[-1] == r["name_b"].split(" ")[-1]


def test_reservoir_sample_is_stable_and_exact_k(spark):
    """Deterministic priority sampling: exactly k distinct docs, and two
    independent evaluations select the identical set."""
    from connor_fun_streamproducer_spark.llm.corpus import sample_reservoir

    a = {r["doc_id"] for r in sample_reservoir(spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in sample_reservoir(spark, SF_DIR).collect()}
    assert len(a) == 200 and a == b


def test_rolling_stats_frame_invariants(spark):
    """1 <= roll_n <= 4 and min <= avg <= max on every row (small float
    slack for the 4dp-rounded mean)."""
    from connor_fun_streamproducer_spark.operators.windows_ext import win_rolling_stats

    bad = (
        win_rolling_stats(spark, SF_DIR)
        .filter(
            ~F.col("roll_n").between(1, 4)
            | (F.col("roll_avg") < F.col("roll_min") - 1e-4)
            | (F.col("roll_avg") > F.col("roll_max") + 1e-4)
        )
        .count()
    )
    assert bad == 0


def test_snapshot_diff_classes_match_modular_construction(spark):
    """The diff must recover exactly the synthetic edit classes:
    removed == keys%97==0, added == re-keyed %79 inserts, changed ⊆
    (%89 ∪ %83) minus deleted."""
    from connor_fun_streamproducer_spark.operators.incremental import snapshot_diff

    rows = snapshot_diff(spark, SF_DIR).collect()
    o = load(spark, SF_DIR, "orders")
    n97 = o.filter(F.col("o_orderkey") % 97 == 0).count()
    n79 = o.filter((F.col("o_orderkey") % 79 == 0) & (F.col("o_orderkey") > 0)).count()
    removed = [r for r in rows if r["change_type"] == "removed"]
    added = [r for r in rows if r["change_type"] == "added"]
    changed = [r for r in rows if r["change_type"] == "changed"]
    assert len(removed) == n97
    assert len(added) == n79
    assert all(r["o_orderkey"] < 0 for r in added)
    assert all(
        r["o_orderkey"] % 89 == 0 or r["o_orderkey"] % 83 == 0 for r in changed
    )
    # a changed row must actually change something
    assert all(
        r["cents_before"] != r["cents_after"]
        or r["status_before"] != r["status_after"]
        for r in changed
    )


def test_temperature_rates_flatten_toward_uniform(spark):
    """α<1 temperature sampling must keep 100% of the rarest source and
    assign monotonically smaller rates to bigger sources; kept counts
    never exceed originals."""
    from connor_fun_streamproducer_spark.llm.corpus import sample_temperature

    rows = sample_temperature(spark, SF_DIR).collect()
    assert rows
    by_n = sorted(rows, key=lambda r: r["n_orig"])
    assert by_n[0]["accept_bp"] == 10000  # rarest keeps everything
    rates = [r["accept_bp"] for r in by_n]
    assert rates == sorted(rates, reverse=True)
    assert all(r["n_kept"] <= r["n_orig"] for r in rows)


def test_schema_merge_nulls_exactly_on_v1_rows(spark):
    """The evolved column must be NULL on every v1 (even-key) row and
    populated on every v2 row — added-column evolution semantics."""
    from connor_fun_streamproducer_spark.sources.layout import scan_schema_merge

    df = scan_schema_merge(spark, SF_DIR)
    assert df.filter((F.col("doc_id") % 2 == 0) & F.col("n_chars").isNotNull()).count() == 0
    assert df.filter((F.col("doc_id") % 2 == 1) & F.col("n_chars").isNull()).count() == 0


def test_abc_classes_are_contiguous_and_exhaust_each_brand(spark):
    """Within a brand, ranked by cumulative share, classes must read
    A..A B..B C..C with the final row at exactly 10000 bp."""
    from connor_fun_streamproducer_spark.operators.behavior import pipeline_abc_pareto

    rows = pipeline_abc_pareto(spark, SF_DIR).collect()
    brands = {}
    for r in rows:
        brands.setdefault(r["p_brand"], []).append(r)
    assert brands
    for seq in brands.values():
        seq.sort(key=lambda r: r["cum_bp"])
        classes = "".join(r["abc_class"] for r in seq)
        assert classes == "A" * classes.count("A") + "B" * classes.count("B") + "C" * classes.count("C")
        assert seq[-1]["cum_bp"] == 10000


def test_quality_gate_keep_iff_pass_and_covers_corpus(spark):
    """keep must be exactly (reason == 'pass'), one decision per doc."""
    from connor_fun_streamproducer_spark.llm.corpus_prep import corpus_quality_gate

    rows = corpus_quality_gate(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    assert all(r["keep"] == (r["reason"] == "pass") for r in rows)


def test_degree_histogram_mass_equals_twice_edges(spark):
    """Σ degree·n_nodes == 2|E| — the handshake lemma over the pair
    graph; breaks if an edge is dropped or double-counted."""
    from connor_fun_streamproducer_spark.operators.graph import (
        _pair_edges,
        graph_degree_distribution,
    )

    sf = "/root/testdata/sf0.01"
    hist = graph_degree_distribution(spark, sf).collect()
    mass = sum(r["degree"] * r["n_nodes"] for r in hist)
    assert mass == 2 * _pair_edges(spark, sf).count()


def test_temperature_rates_on_skewed_sources(spark, tmp_path):
    """The fixture corpus has perfectly uniform sources (rate == 1.0
    everywhere), which makes the oracle check vacuous for the α-math —
    so pin share^(α−1) on a SKEWED synthetic corpus against an
    independent Python computation: 400/100/25 docs per source must
    yield floor(pow(n/25, -0.3)·10000) basis points."""
    import math

    from connor_fun_streamproducer_spark.llm.corpus import (
        _TEMP_ALPHA,
        sample_temperature,
    )

    rows = []
    did = 0
    for src, n in (("web", 400), ("books", 100), ("code", 25)):
        for _ in range(n):
            rows.append((did, "t", "en", src, 1))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: r
        for r in sample_temperature(spark, str(tmp_path)).collect()
    }
    for src, n in (("web", 400), ("books", 100), ("code", 25)):
        expect_bp = math.floor(math.pow(n / 25, _TEMP_ALPHA - 1.0) * 10000)
        assert got[src]["accept_bp"] == expect_bp, (src, got[src])
    assert got["code"]["accept_bp"] == 10000
    assert got["code"]["n_kept"] == 25  # rarest source keeps everything
    # dominant sources are genuinely downsampled
    assert got["web"]["n_kept"] < 400
    assert got["books"]["n_kept"] < 100


def test_group_holdout_no_source_straddles_splits(spark):
    """THE leakage invariant: every source is wholly in one split."""
    from connor_fun_streamproducer_spark.llm.splits import sample_group_holdout

    per_source = (
        sample_group_holdout(spark, SF_DIR)
        .groupBy("source")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert per_source and all(r["n_splits"] == 1 for r in per_source)


def test_group_holdout_skewed_group_stays_whole(spark, tmp_path):
    """A dominant source (90% of docs) still lands entirely on one side —
    group hashing ignores group size by construction."""
    from connor_fun_streamproducer_spark.llm.splits import sample_group_holdout

    rows = [(i, "t", "en", "megacrawl" if i < 900 else f"tail{i}", 1)
            for i in range(1000)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = sample_group_holdout(spark, str(tmp_path))
    mega = {r["split"] for r in out.filter(F.col("source") == "megacrawl").collect()}
    assert len(mega) == 1
    # and the tail sources actually split both ways (the op is not a
    # constant function)
    tails = {r["split"] for r in out.filter(F.col("source") != "megacrawl").collect()}
    assert tails == {"train", "heldout"}


def test_kfold_partition_properties(spark):
    """Folds partition the corpus: every doc exactly one fold, all folds
    in range, assignment reproducible across invocations."""
    from connor_fun_streamproducer_spark.llm.splits import N_FOLDS, sample_kfold

    a = {r["doc_id"]: r["fold"] for r in sample_kfold(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["fold"] for r in sample_kfold(spark, SF_DIR).collect()}
    assert a == b
    assert set(a.values()) <= set(range(N_FOLDS))
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(a) == n_docs


def test_chunk_dedup_keeps_one_copy_per_digest(spark, tmp_path):
    """Constructed duplication: doc 0 and doc 1 share an identical
    20-token paragraph; exactly one copy of it survives, and unique
    chunks all survive."""
    from connor_fun_streamproducer_spark.llm.splits import DEDUP_CHUNK, dedup_chunk_exact

    para = " ".join(f"w{i}" for i in range(DEDUP_CHUNK))
    uniq0 = " ".join(f"a{i}" for i in range(DEDUP_CHUNK))
    uniq1 = " ".join(f"b{i}" for i in range(DEDUP_CHUNK))
    rows = [
        (0, f"{para} {uniq0}", "en", "s0", 1),
        (1, f"{para} {uniq1}", "en", "s1", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in dedup_chunk_exact(spark, str(tmp_path)).collect()}
    assert got[0]["n_chunks"] == 2 and got[0]["n_kept"] == 2  # first copy wins
    assert got[1]["n_chunks"] == 2 and got[1]["n_kept"] == 1  # shared para dropped


def test_chunk_dedup_total_kept_equals_distinct_digests(spark):
    """Global conservation: sum(n_kept) == |distinct chunk digests|."""
    from connor_fun_streamproducer_spark.llm.splits import DEDUP_CHUNK, dedup_chunk_exact

    out = dedup_chunk_exact(spark, SF_DIR)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    toks = F.split("text", " ")
    d = load(spark, SF_DIR, "documents").select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    )
    distinct_digests = (
        d.select(
            F.explode(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(31)),
                        lambda i: F.when(
                            i * DEDUP_CHUNK < F.col("n"),
                            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i * DEDUP_CHUNK + 1, DEDUP_CHUNK))),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("digest")
        )
        .agg(F.count_distinct("digest"))
        .collect()[0][0]
    )
    assert total_kept == distinct_digests


def test_table_profile_bounds(spark):
    """Profile sanity: every profiled column reports the full row count,
    ndv <= non-null count, min <= max."""
    from connor_fun_streamproducer_spark.operators.profiling import (
        PROFILE_COLS,
        stats_table_profile,
    )

    n = load(spark, SF_DIR, "lineitem").count()
    rows = {r["col_name"]: r for r in stats_table_profile(spark, SF_DIR).collect()}
    assert set(rows) == set(PROFILE_COLS)
    for r in rows.values():
        assert r["n_rows"] == n
        assert r["ndv"] <= r["n_rows"] - r["n_null"]
        assert r["min_v"] <= r["max_v"]


def test_asof_nearest_never_farther_than_backward(spark):
    """Bidirectional nearest must be at least as close as the backward
    as-of match for every event the backward form matches."""
    from connor_fun_streamproducer_spark.catalog import epoch_seconds
    from connor_fun_streamproducer_spark.operators.joins import (
        join_asof_nearest,
        join_asof_sorted,
    )

    near = {r["event_id"]: r["dist_sec"] for r in join_asof_nearest(spark, SF_DIR).collect()}
    e_sec = {
        r["event_id"]: r["sec"]
        for r in load(spark, SF_DIR, "events")
        .select("event_id", epoch_seconds("ts").alias("sec"))
        .collect()
    }
    back = join_asof_sorted(spark, SF_DIR).collect()
    assert back
    for r in back:
        o_sec = int(r["asof_orderdate"].timestamp())
        back_dist = e_sec[r["event_id"]] - o_sec
        assert near[r["event_id"]] <= back_dist


def test_islands_conserve_active_days(spark):
    """sum(active_days) == |distinct (user, day)| and every streak fits
    inside the user's active-day budget."""
    from connor_fun_streamproducer_spark.catalog import epoch_seconds
    from connor_fun_streamproducer_spark.operators.windows_ext import (
        win_islands_consecutive,
    )

    rows = win_islands_consecutive(spark, SF_DIR).collect()
    n_user_days = (
        load(spark, SF_DIR, "events")
        .select("user_id", F.floor(epoch_seconds("ts") / 86400).alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["active_days"] for r in rows) == n_user_days
    assert all(r["max_run"] <= r["active_days"] for r in rows)
    assert all(r["n_islands"] >= 1 for r in rows)


def test_attribution_keeps_every_purchase_and_orders_touches(spark):
    """Row conservation (one row per purchase, attributed or not) and
    the first-touch is never later than the last-touch."""
    from connor_fun_streamproducer_spark.operators.behavior import (
        pipeline_attribution_touch,
    )

    rows = pipeline_attribution_touch(spark, SF_DIR).collect()
    n_purchases = (
        load(spark, SF_DIR, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert len(rows) == n_purchases
    attributed = [r for r in rows if r["first_type"] is not None]
    assert attributed  # fixture always has in-window touches
    for r in attributed:
        assert r["first_gap_sec"] >= r["last_gap_sec"] >= 0


def test_yoy_delta_consistency(spark):
    """delta == rev − prev wherever prev exists; prev is null exactly
    when the nation has no yr−1 row."""
    from connor_fun_streamproducer_spark.operators.behavior import pipeline_yoy_growth

    rows = pipeline_yoy_growth(spark, SF_DIR).collect()
    have = {(r["n_name"], r["yr"]): r["rev_cents"] for r in rows}
    for r in rows:
        prior = have.get((r["n_name"], r["yr"] - 1))
        if prior is None:
            assert r["prev_cents"] is None and r["delta_cents"] is None
        else:
            assert r["prev_cents"] == prior
            assert r["delta_cents"] == r["rev_cents"] - prior


def test_bpe_estimate_bounds(spark):
    """Subword estimate is bounded by words below and chars above, and
    equals the independent per-word Python computation on a sample."""
    import math

    from connor_fun_streamproducer_spark.llm.text import text_tokens_bpe_est

    rows = text_tokens_bpe_est(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["bpe_est"] <= max(r["n_chars"], 1)
    texts = dict(
        load(spark, SF_DIR, "documents").select("doc_id", "text").limit(20).collect()
    )
    by_id = {r["doc_id"]: r for r in rows}
    for did, text in texts.items():
        expect = sum(math.ceil(len(w) / 4) for w in text.split(" "))
        assert by_id[did]["bpe_est"] == expect


def test_shuffle_shard_is_a_permutation_and_balanced(spark):
    """Every doc appears once, positions are contiguous 1..n per shard,
    and md5 uniformity keeps shards non-degenerate."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.llm.splits import N_SHARDS, corpus_shuffle_shard

    rows = corpus_shuffle_shard(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    per = defaultdict(list)
    for r in rows:
        per[r["shard"]].append(r["pos"])
    assert set(per) <= set(range(N_SHARDS))
    for shard, poss in per.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert len(per) == N_SHARDS  # 500 docs over 8 shards: all occupied
    # determinism across invocations
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in corpus_shuffle_shard(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_normalize_l2_unit_property(spark):
    """Norms are positive and the reported unit checksums match an
    independent Python recomputation on a sample."""
    import math

    from connor_fun_streamproducer_spark.llm.embedding_ops import embedding_normalize_l2

    rows = {r["vec_id"]: r for r in embedding_normalize_l2(spark, SF_DIR).collect()}
    sample = load(spark, SF_DIR, "embeddings").limit(10).collect()
    assert rows and all(r["norm"] > 0 for r in rows.values())
    for s in sample:
        v = [float(x) for x in s["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v))
        r = rows[s["vec_id"]]
        assert abs(r["norm"] - nrm) < 1e-4
        assert abs(r["unit_sum"] - sum(x / nrm for x in v)) < 1e-3
        assert abs(r["unit_max"] - max(abs(x) / nrm for x in v)) < 1e-3


def test_audio_energy_matches_python_reference(spark):
    """The Arrow/numpy path reproduces a straight-Python recomputation of
    the synthetic PCM features for a sample of clips."""
    from connor_fun_streamproducer_spark.llm.multimodal import (
        AUDIO_FRAME,
        AUDIO_SAMPLES,
        multimodal_audio_energy,
        synth_pcm,
    )

    got = {
        (r["doc_id"], r["frame_id"]): (r["energy"], r["peak"])
        for r in multimodal_audio_energy(spark, SF_DIR).collect()
    }
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(got) == n_docs * (AUDIO_SAMPLES // AUDIO_FRAME)
    for doc_id in (0, 1, 7):
        pcm = synth_pcm(doc_id)
        samples = [b - 128 for b in pcm]
        for fid in range(AUDIO_SAMPLES // AUDIO_FRAME):
            fr = samples[fid * AUDIO_FRAME:(fid + 1) * AUDIO_FRAME]
            assert got[(doc_id, fid)] == (sum(x * x for x in fr), max(abs(x) for x in fr))


def test_mv_rollup_is_day_grained_and_mergeable(spark):
    """The MV holds day rows; month answers from it equal month answers
    from raw fact (mergeability), and the rollup is much smaller."""
    from connor_fun_streamproducer_spark.operators.incremental import (
        daily_revenue_rollup_path,
        mv_answer_from_rollup,
    )

    rollup = spark.read.parquet(daily_revenue_rollup_path(spark, SF_DIR))
    raw_n = load(spark, SF_DIR, "lineitem").count()
    # |rollup| is bounded by distinct ship DAYS — at sf0.001 that is ~2.6x
    # smaller than the fact; the ratio grows linearly with sf since the
    # day count is fixed by the date range.
    assert rollup.count() < raw_n / 2
    assert rollup.groupBy("yr", "mo", "dy").count().filter(F.col("count") > 1).count() == 0
    months = mv_answer_from_rollup(spark, SF_DIR)
    direct = (
        load(spark, SF_DIR, "lineitem")
        .groupBy(F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("mo"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")).alias("rev_cents"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )
    assert months.exceptAll(direct).count() == 0
    assert direct.exceptAll(months).count() == 0


def test_rolling_median_python_reference(spark):
    """Rolling lower-median matches a straight-Python sliding window for
    every customer (sf0.001 is small enough to check exhaustively)."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.operators.windows_ext import (
        MEDIAN_FRAME,
        win_median_rolling,
    )

    got = {
        (r["o_custkey"], r["o_orderkey"]): (r["med_cents"], r["n_in_frame"])
        for r in win_median_rolling(spark, SF_DIR).collect()
    }
    orders = defaultdict(list)
    for r in load(spark, SF_DIR, "orders").collect():
        cents = int(r["o_totalprice"] * 100 + 0.5)
        orders[r["o_custkey"]].append((int(r["o_orderdate"].timestamp()), r["o_orderkey"], cents))
    for cust, rows in orders.items():
        rows.sort()
        for i, (_, okey, _c) in enumerate(rows):
            frame = sorted(c for _, _, c in rows[max(0, i - MEDIAN_FRAME + 1): i + 1])
            expect = frame[(len(frame) + 1) // 2 - 1]
            assert got[(cust, okey)] == (expect, len(frame))


def test_corr_pairs_bounds_and_python_reference(spark):
    """All correlations lie in [-1, 1] and the qty/dollars pair matches
    an independent Python recomputation from the raw table (the fixture
    draws measures independently, so values sit near 0 — the reference
    computation, not a structural assumption, is the check)."""
    import math

    from connor_fun_streamproducer_spark.operators.profiling import agg_corr_pairs

    rows = {(r["col_a"], r["col_b"]): r["corr"] for r in agg_corr_pairs(spark, SF_DIR).collect()}
    assert len(rows) == 6
    assert all(-1.0 <= v <= 1.0 for v in rows.values())
    raw = load(spark, SF_DIR, "lineitem").select("l_quantity", "l_extendedprice").collect()
    xs = [int(r["l_quantity"]) for r in raw]
    ys = [math.floor(r["l_extendedprice"]) for r in raw]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    expect = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(rows[("qty", "dollars")] - round(expect, 6)) <= 1e-6


def test_jaccard_neighbors_matches_brute_force(spark):
    """Wedge-join Jaccard equals a brute-force Python set computation
    over the same edge list."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.operators.graph import (
        _pair_edges,
        graph_jaccard_neighbors,
    )

    edges = [(r["a"], r["c"]) for r in _pair_edges(spark, SF_DIR).collect()]
    nbrs = defaultdict(set)
    for a, c in edges:
        nbrs[a].add(c)
        nbrs[c].add(a)
    got = {
        (r["user_a"], r["user_b"]): (r["n_common"], r["n_union"], r["jaccard_bp"])
        for r in graph_jaccard_neighbors(spark, SF_DIR).collect()
    }
    expect = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = len(nbrs[a] & nbrs[b])
            if common:
                union = len(nbrs[a] | nbrs[b])
                expect[(a, b)] = (common, union, common * 10000 // union)
    assert got == expect
    # the sf0.001 graph may have no 2-paths at all; when it does, the op
    # must surface them (non-vacuity tied to the data, not a guess)
    assert bool(got) == bool(expect)


def test_try_arith_null_contract(spark):
    """try_divide is null exactly on zero divisors; the JSON-digit cast
    always succeeds; the non-numeric cast always fails to NULL."""
    from connor_fun_streamproducer_spark.functions.math_fns import fn_try_arith

    rows = fn_try_arith(spark, SF_DIR).collect()
    users = {
        r["event_id"]: r["user_id"]
        for r in load(spark, SF_DIR, "events").select("event_id", "user_id").collect()
    }
    assert rows
    for r in rows:
        assert (r["safe_ratio"] is None) == (users[r["event_id"]] % 5 == 0)
        assert r["k_val"] is not None
        assert r["bad_cast"] is None


def test_point_in_time_respects_interval_semantics(spark):
    """Every matched purchase's version interval actually contains the
    purchase time; unmatched purchases predate the user's non-purchase
    history entirely — and both classes occur in the fixture."""
    from connor_fun_streamproducer_spark.operators.incremental import (
        join_point_in_time,
        scd2_nonpurchase_history,
    )

    hist = {}
    for r in scd2_nonpurchase_history(spark, SF_DIR).collect():
        hist.setdefault(r["user_id"], {})[r["version_seq"]] = (
            r["valid_from_s"],
            r["valid_to_s"],
            r["attr_value"],
        )
    purchases = {
        r["event_id"]: (r["user_id"], int(r["ts"].timestamp()))
        for r in load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .collect()
    }
    rows = join_point_in_time(spark, SF_DIR).collect()
    assert len(rows) == len(purchases)
    matched = nulls = 0
    for r in rows:
        user, t = purchases[r["purchase_id"]]
        assert user == r["user_id"]
        if r["version_seq"] is None:
            versions = hist.get(user)
            assert versions is None or t < min(v[0] for v in versions.values())
            nulls += 1
        else:
            lo, hi, attr = hist[user][r["version_seq"]]
            assert lo <= t and (hi is None or t < hi)
            assert attr == r["attr_value"]
            matched += 1
    assert matched > 0 and nulls > 0


def test_bootstrap_replica_structure_and_mass(spark):
    """Replicas are numbered 1..n_copies per doc; expected total mass is
    ~input size (Poisson(1) quantized), and the draw is reproducible."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.llm.splits import sample_bootstrap

    rows = sample_bootstrap(spark, SF_DIR).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["doc_id"]].append((r["replica"], r["n_copies"]))
    for did, reps in per.items():
        n = reps[0][1]
        assert sorted(x[0] for x in reps) == list(range(1, n + 1))
        assert all(x[1] == n for x in reps)
    n_docs = load(spark, SF_DIR, "documents").count()
    # quantized Poisson(1): E[copies] = .3679*1+.1839*2+.0613*3+.019*4 ≈ 1.0
    assert 0.7 * n_docs <= len(rows) <= 1.3 * n_docs
    again = {(r["doc_id"], r["replica"]) for r in sample_bootstrap(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["replica"]) for r in rows}


def test_entropy_bounds_and_python_reference(spark):
    """0 <= H <= log2(n_types); matches an independent Python
    computation per source."""
    import math
    from collections import Counter, defaultdict

    from connor_fun_streamproducer_spark.llm.text import text_entropy_source

    got = {r["source"]: r for r in text_entropy_source(spark, SF_DIR).collect()}
    toks = defaultdict(Counter)
    for r in load(spark, SF_DIR, "documents").select("source", "text").collect():
        toks[r["source"]].update(r["text"].split(" "))
    assert set(got) == set(toks)
    for src, counter in toks.items():
        n = sum(counter.values())
        h = math.log2(n) - sum(c * math.log2(c) for c in counter.values()) / n
        r = got[src]
        assert r["n_tokens"] == n and r["n_types"] == len(counter)
        assert abs(r["entropy_bits"] - h) < 1e-5
        assert 0.0 <= r["entropy_bits"] <= math.log2(max(r["n_types"], 2))


def test_event_transitions_conserve_and_shares_bound(spark):
    """Total transition count == events − users-with-events (each user's
    first event has no predecessor); per-row shares sum to <= 10000 with
    truncation remainder < row count."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.operators.behavior import (
        pipeline_event_transitions,
    )

    rows = pipeline_event_transitions(spark, SF_DIR).collect()
    ev = load(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    by_prev = defaultdict(list)
    for r in rows:
        by_prev[r["prev_type"]].append(r)
    for prev, rs in by_prev.items():
        total_bp = sum(r["share_bp"] for r in rs)
        assert 10000 - len(rs) < total_bp <= 10000, (prev, total_bp)


def test_kcore_matches_python_peel_at_sf001(spark):
    """The sf0.001 2-core is empty (vacuous oracle there), so pin the
    non-degenerate behavior at sf0.01 against an exhaustive Python
    peel run to ITS OWN fixpoint — also proving the fixed 6-round
    unroll had converged (idempotence)."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.operators.graph import (
        _KCORE_K,
        _pair_edges,
        graph_kcore,
    )

    sf = "/root/testdata/sf0.01"
    edges = [(r["a"], r["c"]) for r in _pair_edges(spark, sf).collect()]
    nbrs = defaultdict(set)
    for a, c in edges:
        nbrs[a].add(c)
        nbrs[c].add(a)
    core = set(nbrs)
    while True:
        drop = {u for u in core if len(nbrs[u] & core) < _KCORE_K}
        if not drop:
            break
        core -= drop
    expect = {u: len(nbrs[u] & core) for u in core}
    got = {r["user_id"]: r["core_degree"] for r in graph_kcore(spark, sf).collect()}
    assert got == expect
    assert got and all(d >= _KCORE_K for d in got.values())


def test_stickiness_bounds_and_day_mass(spark):
    """DAU <= MAU always (stickiness <= 10000 bp); per-day DAU sums to
    the distinct (day, user) mass."""
    from connor_fun_streamproducer_spark.catalog import epoch_seconds
    from connor_fun_streamproducer_spark.operators.behavior import (
        pipeline_dau_mau_stickiness,
    )

    rows = pipeline_dau_mau_stickiness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["dau"] <= r["mau"]
        assert 0 < r["stickiness_bp"] <= 10000
    mass = (
        load(spark, SF_DIR, "events")
        .select(F.floor(epoch_seconds("ts") / 86400).alias("d"), "user_id")
        .distinct()
        .count()
    )
    assert sum(r["dau"] for r in rows) == mass


def test_gini_matches_python_and_is_in_range(spark):
    """Gini in [0, 1); equals the textbook computation over the exact
    per-customer cents."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.operators.profiling import (
        agg_gini_concentration,
    )

    r = agg_gini_concentration(spark, SF_DIR).collect()[0]
    cents = defaultdict(int)
    for o in load(spark, SF_DIR, "orders").collect():
        cents[o["o_custkey"]] += int(o["o_totalprice"] * 100 + 0.5)
    xs = [c for _, c in sorted(cents.items(), key=lambda kv: (kv[1], kv[0]))]
    n, total = len(xs), sum(xs)
    weighted = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (2.0 * weighted) / (n * total) - (n + 1) / n
    assert r["n"] == n and r["total"] == total and r["weighted"] == weighted
    assert abs(r["gini"] - round(gini, 6)) <= 1e-6
    assert 0.0 <= r["gini"] < 1.0


def test_cohort_ltv_monotone_and_conserves_revenue(spark):
    """Cumulative LTV is non-decreasing within each cohort and the last
    cumulative per cohort sums to total purchase revenue."""
    from collections import defaultdict

    from connor_fun_streamproducer_spark.operators.behavior import pipeline_cohort_ltv

    rows = pipeline_cohort_ltv(spark, SF_DIR).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["cohort_week"]].append((r["week_offset"], r["rev_cents"], r["cum_rev_cents"]))
    grand = 0
    for cohort, rs in per.items():
        rs.sort()
        run = 0
        for off, rev, cum in rs:
            run += rev
            assert cum == run, (cohort, off)
        grand += run
    total = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")))
        .collect()[0][0]
    )
    assert grand == total


def test_surrogate_keys_unique_and_well_formed(spark):
    """Minted keys are unique over the natural-key domain, UUID-shaped,
    positive, and reproducible."""
    import re

    from connor_fun_streamproducer_spark.functions.strings import fn_surrogate_key

    rows = fn_surrogate_key(spark, SF_DIR).collect()
    uuids = [r["sk_uuid"] for r in rows]
    ints = [r["sk_int"] for r in rows]
    assert len(set(uuids)) == len(rows) and len(set(ints)) == len(rows)
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
    assert all(pat.match(u) for u in uuids)
    assert all(i > 0 for i in ints)
    again = {(r["doc_id"], r["sk_uuid"]) for r in fn_surrogate_key(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["sk_uuid"]) for r in rows}


def test_lorenz_deciles_consistency_with_gini_inputs(spark):
    """Decile masses partition total revenue; cumulative shares are
    non-decreasing and end at (or within truncation of) 10000; decile
    counts differ by at most one (ntile contract)."""
    from connor_fun_streamproducer_spark.operators.profiling import (
        agg_gini_concentration,
        win_lorenz_deciles,
    )

    rows = sorted(win_lorenz_deciles(spark, SF_DIR).collect(), key=lambda r: r["decile"])
    g = agg_gini_concentration(spark, SF_DIR).collect()[0]
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["decile_cents"] for r in rows) == g["total"]
    assert sum(r["n_cust"] for r in rows) == g["n"]
    counts = [r["n_cust"] for r in rows]
    assert max(counts) - min(counts) <= 1
    shares = [r["cum_share_bp"] for r in rows]
    assert shares == sorted(shares)
    assert 9999 <= shares[-1] <= 10000


def test_syllable_density_python_reference(spark):
    """Vowel-run counts match a Python regex recomputation; density is
    floor-division-consistent."""
    import re

    from connor_fun_streamproducer_spark.llm.text import text_syllable_density

    got = {r["doc_id"]: r for r in text_syllable_density(spark, SF_DIR).collect()}
    sample = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(25).collect()
    pat = re.compile(r"[aeiouy]+")
    for s in sample:
        words = s["text"].split(" ")
        syll = sum(max(len(pat.findall(w)), 1) for w in words)
        r = got[s["doc_id"]]
        assert r["n_words"] == len(words) and r["n_syll"] == syll
        assert r["syll_per_word_bp"] == syll * 10000 // len(words)


def test_versioned_manifest_concurrent_commit_exactly_one_winner(spark, tmp_path):
    """Two writers race an append commit on the same snapshot (VERDICT r5
    item 6): the manifest-number CAS must admit EXACTLY one, the loser's
    staged data files must be cleaned up, and both the pre-race snapshots
    (time travel) and the winner's new snapshot must stay consistent."""
    import os
    import shutil
    import threading

    from connor_fun_streamproducer_spark.sources.layout import (
        _part_files,
        commit_append,
        read_snapshot,
        versioned_orders_root,
    )

    # Race on a private COPY so the shared per-sf cached root (used by the
    # sink_versioned_manifest op) never sees snapshot 3.
    shared = versioned_orders_root(spark, SF_DIR)
    root = str(tmp_path / "versioned_orders")
    shutil.copytree(shared, root)

    v2_count = read_snapshot(spark, root, version=2).count()
    v1_count = read_snapshot(spark, root, version=1).count()
    donor = _part_files(os.path.join(root, "data", "base"))[0]
    donor_rows = spark.read.parquet(donor).count()

    # Each writer stages its own schema-identical data file (append-only:
    # existing files untouched), then both hit commit_append at a barrier.
    rels, results = [], [None, None]
    for i in range(2):
        d = os.path.join(root, "data", f"append-{i}")
        os.makedirs(d)
        shutil.copy(donor, os.path.join(d, "part-0.parquet"))
        rels.append(os.path.relpath(os.path.join(d, "part-0.parquet"), root))

    barrier = threading.Barrier(2)

    def writer(i: int) -> None:
        barrier.wait()
        results[i] = commit_append(root, [rels[i]], expected_version=2)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # Exactly one winner, committed as snapshot 3.
    assert sorted(results, key=lambda r: (r is None, r)) == [3, None], results
    winner = results.index(3)
    loser = 1 - winner
    # Loser's staged file is cleaned; winner's is live.
    assert not os.path.exists(os.path.join(root, rels[loser]))
    assert os.path.exists(os.path.join(root, rels[winner]))
    # Pointer advanced to the winner's snapshot.
    with open(os.path.join(root, "VERSION")) as fh:
        assert int(fh.read().strip()) == 3
    # Time-travel reads are untouched; the new snapshot is exactly the old
    # table plus the winner's file — nothing lost, nothing duplicated.
    assert read_snapshot(spark, root, version=1).count() == v1_count
    assert read_snapshot(spark, root, version=2).count() == v2_count
    assert read_snapshot(spark, root).count() == v2_count + donor_rows
    # A retry on top of the NEW snapshot (the Iceberg/Delta retry loop)
    # succeeds: stale expected_version refuses, refreshed one commits.
    d = os.path.join(root, "data", "append-retry")
    os.makedirs(d)
    shutil.copy(donor, os.path.join(d, "part-0.parquet"))
    rel = os.path.relpath(os.path.join(d, "part-0.parquet"), root)
    assert commit_append(root, [rel], expected_version=2) is None  # stale
    shutil.copy(donor, os.path.join(d, "part-0.parquet"))  # re-stage
    assert commit_append(root, [rel], expected_version=3) == 4
    assert read_snapshot(spark, root).count() == v2_count + 2 * donor_rows


def test_join_cardinality_estimator_degenerate_profiles(spark):
    """The estimator divides by max NDV (VERDICT r5 item 7): pin the
    guard's behavior on zero-row (NDV=0) and single-value (NDV=1) inputs
    instead of assuming it. Uses the same integral-div formula as the op,
    driven through temp views so the degenerate profiles are real frames,
    not mocked scalars."""
    from pyspark.sql import Row

    def run(orders_rows, cust_rows):
        o = spark.createDataFrame(orders_rows or [], "o_custkey bigint")
        c = spark.createDataFrame(cust_rows or [], "c_custkey bigint")
        s = o.agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.count_distinct("o_custkey").cast("bigint").alias("ndv_orders"),
        )
        cu = c.agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.count_distinct("c_custkey").cast("bigint").alias("ndv_cust"),
        )
        a = o.join(c, o.o_custkey == c.c_custkey).agg(
            F.count("*").cast("bigint").alias("actual")
        )
        return (
            s.crossJoin(cu)
            .crossJoin(a)
            .select(
                F.expr(
                    "n_orders * n_cust div nullif(greatest(ndv_orders, ndv_cust), 0)"
                ).alias("estimated"),
                F.expr(
                    "abs(n_orders * n_cust"
                    " div nullif(greatest(ndv_orders, ndv_cust), 0)"
                    " - actual) * 10000 div nullif(actual, 0)"
                ).alias("err_bp"),
            )
            .collect()[0]
        )

    one = [Row(o_custkey=7)] * 3  # three orders, ONE distinct customer key
    matching = [Row(c_custkey=7)]

    # Zero-row side: NDV=0 on both -> greatest()=0 -> integral div by zero
    # is NULL (not a crash) on both engines; err_bp NULL because actual=0.
    r = run([], [])
    assert r["estimated"] is None and r["err_bp"] is None

    # Single-value columns: NDV=1, est = 3*1/1 = 3 = actual -> 0 bp error.
    r = run(one, matching)
    assert r["estimated"] == 3 and r["err_bp"] == 0

    # One empty side with a populated other side: est = 0, actual = 0 ->
    # err_bp NULL (0/0), estimated well-defined.
    r = run(one, [])
    assert r["estimated"] == 0 and r["err_bp"] is None


@pytest.mark.parametrize("sf_dir", [SF_DIR, "/root/testdata/sf0.01"])
def test_kmeans_and_pca_cross_run_determinism_both_scales(spark, sf_dir):
    """VERDICT r5 item 8: the quantization discipline (1e-4 centroid /
    covariance rounding -> bit-reproducible fixpoints) is claimed for any
    partitioning; observe it at the driver's correctness scale (sf0.01),
    not only at the sf0.001 numpy-pin fixture. Two full runs inside one
    test must agree bit-for-bit on every assignment and every projected
    coordinate."""
    from connor_fun_streamproducer_spark import registry
    from connor_fun_streamproducer_spark.llm.clustering import kmeans_assignments

    registry._ensure_loaded()

    a1, h1 = kmeans_assignments(spark, sf_dir)
    a2, h2 = kmeans_assignments(spark, sf_dir)
    assert h1 == h2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))

    pca = registry.OPS["embedding_pca_project"].fn
    p1 = sorted(map(tuple, pca(spark, sf_dir).collect()))
    p2 = sorted(map(tuple, pca(spark, sf_dir).collect()))
    assert p1 == p2  # exact equality: quantized outputs, not approx


def test_clamped_cumsum_reflection_identity_vs_sequential_walk(spark):
    """win_clamped_cumsum claims the Skorokhod-reflection identity
    (clamped walk == running sum − min(0, running min)); pin it against
    the literal sequential recurrence bal = max(0, bal + Δ) replayed in
    Python over the same ordering."""
    import duckdb

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               event_type, value
        FROM read_parquet('{SF_DIR}/events.parquet')
        ORDER BY user_id, sec, event_id
        """
    ).fetchall()
    bal: dict = {}
    expect: dict = {}
    for u, eid, sec, et, v in rows:
        d = int(v * 100 + 0.5) if et == "purchase" else -int(v * 25 + 0.5)
        bal[u] = max(0, bal.get(u, 0) + d)
        expect[eid] = bal[u]
    got = {
        r["event_id"]: r["balance"]
        for r in registry.OPS["win_clamped_cumsum"].fn(spark, SF_DIR).collect()
    }
    assert got == expect
    assert min(got.values()) == 0  # the floor actually binds somewhere


def test_footer_minmax_spans_all_row_groups(tmp_path):
    """footer_minmax must fold statistics across EVERY row group — a
    multi-row-group file whose extremes live in different groups is the
    case a first-group-only harvest gets silently wrong."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from connor_fun_streamproducer_spark.sources.layout import footer_minmax

    path = str(tmp_path / "multi_rg.parquet")
    vals = list(range(50, 100)) + list(range(0, 50)) + list(range(100, 150))
    pq.write_table(
        pa.table({"x": pa.array(vals, type=pa.int64())}),
        path,
        row_group_size=50,  # 3 groups; global min in g2, global max in g3
    )
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups == 3
    lo, hi = footer_minmax(path, "x")
    assert (lo, hi) == (0, 149)


@pytest.mark.parametrize("sf_dir", [SF_DIR, "/root/testdata/sf0.01"])
def test_graph_fixpoints_deterministic_and_converged_both_scales(spark, sf_dir):
    """VERDICT r6 item 5: the graph fixpoints (CC, BFS, k-core) were
    pinned only at sf0.001; the r6 embedding ops got cross-scale
    determinism treatment, graph didn't. Two full runs at each scale must
    agree bit-for-bit, and the CC labeling must be a TRUE fixpoint (every
    edge's endpoints share a component — a stronger convergence witness
    than a round count)."""
    from connor_fun_streamproducer_spark.operators.graph import (
        _cc_edges,
        graph_bfs_distance,
        graph_connected_components,
        graph_kcore,
        _KCORE_K,
    )

    cc1 = sorted(map(tuple, graph_connected_components(spark, sf_dir).collect()))
    cc2 = sorted(map(tuple, graph_connected_components(spark, sf_dir).collect()))
    assert cc1 == cc2 and cc1

    # Convergence witness: joining the labeling onto the edge list must
    # find zero cross-component edges.
    edges, _nodes = _cc_edges(spark, sf_dir)
    lab = graph_connected_components(spark, sf_dir)
    ls = lab.selectExpr("user_id AS src", "component AS comp_src")
    ld = lab.selectExpr("user_id AS dst", "component AS comp_dst")
    unconverged = (
        edges.join(ls, "src").join(ld, "dst").filter("comp_src <> comp_dst").count()
    )
    assert unconverged == 0

    bfs1 = sorted(map(tuple, graph_bfs_distance(spark, sf_dir).collect()))
    bfs2 = sorted(map(tuple, graph_bfs_distance(spark, sf_dir).collect()))
    assert bfs1 == bfs2 and bfs1

    k1 = sorted(map(tuple, graph_kcore(spark, sf_dir).collect()))
    k2 = sorted(map(tuple, graph_kcore(spark, sf_dir).collect()))
    assert k1 == k2
    # every surviving node meets the core threshold
    assert all(row[-1] >= _KCORE_K for row in k1)


def test_benford_contrast_price_vs_quantity(spark):
    """The two profiled columns separate: l_quantity (uniform 1..50 —
    bounded support, far from Benford) deviates consistently more than
    l_extendedprice (a qty×price product with partial digit mixing);
    the gap is ~420-500 bp at every fixture scale. Shares must be a
    near-partition of 10000 (floor division loses <9 bp per column)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = registry.OPS["stats_benford_profile"].fn(spark, SF_DIR).collect()
    by_col = {}
    for r in rows:
        by_col.setdefault(r.column_name, []).append(r)
    assert set(by_col) == {"l_extendedprice", "l_quantity"}
    for col, rs in by_col.items():
        assert {r.digit for r in rs} == set(range(1, 10))
        share = sum(r.observed_bp for r in rs)
        assert 10000 - 9 <= share <= 10000
    dev = {c: sum(r.dev_bp for r in rs) for c, rs in by_col.items()}
    assert dev["l_quantity"] > dev["l_extendedprice"] + 300, dev


def test_mad_outliers_robust_where_zscore_blinds(spark):
    """The 50% breakdown claim, demonstrated: a user whose series is
    [100]*20 + [10**6]*6 has 23% contamination — MAD stays 0-ish on the
    clean mass... actually MAD=0 excludes; use mild spread. Construct
    [100,102,...,138]*1 + [10**6]*5: the mean/std z-score of each 10^6
    point is pulled under 2 by its own mass (sigma inflation), while the
    median/MAD screen flags all five at z_bp >= 30000."""
    import statistics

    from pyspark.sql import functions as F

    from connor_fun_streamproducer_spark.operators.profiling import (
        _MAD_Z_BP,
    )

    clean = [100 + 2 * i for i in range(20)]
    big = [10**6] * 5
    vals = clean + big
    mu = statistics.mean(vals)
    sigma = statistics.pstdev(vals)
    assert all(abs(v - mu) / sigma < 2.1 for v in big)  # σ-screen blind

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)],
        "user_id long, event_id long, value double",
    )
    base = df.select(
        "user_id", "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    med = base.groupBy("user_id").agg((2 * F.median("cents")).cast("bigint").alias("m2"))
    dev = base.join(med, "user_id").select(
        "user_id", "event_id", "cents",
        F.abs(2 * F.col("cents") - F.col("m2")).alias("dev2"),
    )
    mad = dev.groupBy("user_id").agg((2 * F.median("dev2")).cast("bigint").alias("mad4"))
    out = (
        dev.join(mad, "user_id")
        .filter(F.col("mad4") > 0)
        .withColumn("z_bp", F.expr("13490 * dev2 div mad4"))
        .filter(F.col("z_bp") >= _MAD_Z_BP)
        .collect()
    )
    flagged = sorted(r.event_id for r in out)
    assert flagged == list(range(20, 25)), flagged


def test_seasonal_index_weighted_mean_law(spark):
    """Ratio-of-means law: the n-weighted mean of seasonal_bp over a
    series' hours is 10000 up to floor-division loss (<24 bp), and
    traffic_bp sums to 24*10000 up to the same loss — per series."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = registry.OPS["ts_seasonal_index"].fn(spark, SF_DIR).collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    assert len(by_series) == 5
    for et, rs in by_series.items():
        assert len(rs) <= 24
        n_tot = sum(r.n for r in rs)
        wmean = sum(r.seasonal_bp * r.n for r in rs) / n_tot
        assert 10000 - 24 <= wmean <= 10000, (et, wmean)
        tsum = sum(r.traffic_bp for r in rs)
        assert 24 * 10000 - 24 * 24 <= tsum <= 24 * 10000, (et, tsum)


def test_cusum_finds_constructed_mean_shift(spark):
    """A constructed series with a clean level shift at index 40 (value
    100 -> 300) must put the CUSUM argmax exactly at the shift boundary:
    the max of |n*prefix_i - i*total| for a two-level series is at the
    last low-level index."""
    import datetime

    from pyspark.sql import functions as F

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
         "shifted", 100.0 if i < 40 else 300.0)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    from connor_fun_streamproducer_spark.operators import timeseries as ts

    # drive the op body directly on the constructed frame via a temp view
    # by reusing its exact formula
    base = df.select(
        "event_type", "ts", "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    tot = base.groupBy("event_type").agg(
        F.count("*").alias("n_tot"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_tot"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = base.select(
        "event_type", "ts",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")
        ).alias("i"),
        F.sum(F.col("cents").cast("decimal(38,0)")).over(w).alias("prefix"),
    ).join(tot, "event_type")
    s = pre.withColumn(
        "cs", F.abs(F.col("n_tot") * F.col("prefix") - F.col("i") * F.col("s_tot"))
    )
    top = s.orderBy(F.desc("cs"), F.asc("ts")).first()
    assert top["i"] == 40, top


def test_drawdown_law_nonneg_and_peak_dominates(spark):
    """Drawdown laws on the real fixture: 0 <= max_dd <= peak, dd_bp in
    [0, 10000), and a strictly-increasing user's drawdown is 0."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = registry.OPS["win_drawdown"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.max_drawdown_cents <= r.peak_cents
        assert 0 <= r.max_dd_bp < 10000, r


def test_clustering_coefficient_bounds_and_triangle_consistency(spark):
    """cc_bp in [0, 10000]; triangle counts agree with graph_triangle_count
    on shared nodes; zero-triangle degree>=2 nodes are present with cc 0."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    sf = "/root/testdata/sf0.01"  # banded graph is empty at sf0.001
    cc = registry.OPS["graph_clustering_coefficient"].fn(spark, sf).collect()
    tri = {
        r.user_id: r.triangles
        for r in registry.OPS["graph_triangle_count"].fn(spark, sf).collect()
    }
    assert cc
    for r in cc:
        assert 0 <= r.cc_bp <= 10000
        assert r.degree >= 2
        assert tri.get(r.user_id, 0) == r.triangles
    assert any(r.triangles == 0 for r in cc), "zero-tri nodes must be kept"


def test_budget_apportionment_quota_property(spark):
    """Largest-remainder guarantees: allocations sum exactly to the
    budget, and every source's allocation is its exact float quota
    rounded down or up (never off by more than one)."""
    from connor_fun_streamproducer_spark import registry
    from connor_fun_streamproducer_spark.llm.corpus import _BUDGET_TOKENS

    registry._ensure_loaded()
    rows = registry.OPS["corpus_budget_apportion"].fn(spark, SF_DIR).collect()
    total_tok = sum(r.tok for r in rows)
    assert sum(r.alloc for r in rows) == _BUDGET_TOKENS
    for r in rows:
        exact = r.tok * _BUDGET_TOKENS / total_tok
        assert r.floor_alloc == (r.tok * _BUDGET_TOKENS) // total_tok
        assert r.alloc in (r.floor_alloc, r.floor_alloc + 1)
        assert r.floor_alloc <= exact < r.floor_alloc + 1


def test_ks_statistic_zero_for_identical_eras(spark):
    """KS law: if both eras hold EXACTLY the same multiset of values,
    n2·cumA − n1·cumB is identically zero at every support point —
    pinning the scaled-integer formula itself (any off-by-one in the
    cumulative alignment would break this before it breaks the
    fixture oracle)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    vals = [100, 200, 200, 300, 500, 500, 500, 900]
    rows = [("g", v, 1) for v in vals] + [("g", v, 0) for v in vals]
    df = spark.createDataFrame(rows, "grp string, cents long, in_a int")
    v = df.groupBy("grp", "cents").agg(
        F.sum("in_a").alias("ca"), F.sum(1 - F.col("in_a")).alias("cb")
    )
    tot = v.groupBy("grp").agg(F.sum("ca").alias("n1"), F.sum("cb").alias("n2"))
    w = Window.partitionBy("grp").orderBy("cents")
    cum = v.join(tot, "grp").select(
        "grp", "n1", "n2",
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b"),
    )
    d = cum.agg(
        F.max(F.abs(F.col("n2") * F.col("cum_a") - F.col("n1") * F.col("cum_b"))).alias("d")
    ).collect()[0]["d"]
    assert d == 0


def test_snapshot_expire_gc_contract(spark):
    """sink_snapshot_expire: after GC the expired snapshot must be
    GONE (its manifest deleted, its files reclaimed) while every
    retained snapshot still reads completely — reference-counted
    deletion, not directory cleanup."""
    import os

    from connor_fun_streamproducer_spark.sources.layout import (
        _gc_orders_root,
        read_snapshot,
    )

    root = _gc_orders_root(spark, SF_DIR)
    # expired snapshot: manifest physically gone
    assert not os.path.exists(os.path.join(root, "manifest-1.txt"))
    # retained snapshots both resolve and agree where they should:
    # v2 is the compaction of the pre-cut rows, v3 appends the rest
    v2 = read_snapshot(spark, root, version=2).count()
    v3 = read_snapshot(spark, root, version=3).count()
    from connor_fun_streamproducer_spark.catalog import load

    o = load(spark, SF_DIR, "orders")
    n_early = o.filter(F.col("o_orderdate") < "1997-01-01").count()
    assert v2 == n_early
    assert v3 == o.count()
    # reclaimed files are actually off disk: only 2 live data files
    data_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(root, "data"))
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(data_files) == 2, data_files


def test_wap_rejected_batch_invisible(spark):
    """sink_write_audit_publish: the poisoned batch's files must be
    orphans — unreachable from every manifest — and the published
    snapshot must contain zero NULL order keys."""
    import os

    from connor_fun_streamproducer_spark.sources.layout import (
        _wap_root,
        read_snapshot,
    )

    root = _wap_root(spark, SF_DIR)
    assert not os.path.exists(os.path.join(root, "manifest-3.txt"))
    referenced = set()
    for v in (1, 2):
        with open(os.path.join(root, f"manifest-{v}.txt")) as fh:
            referenced.update(line for line in fh.read().splitlines() if line)
    bad_dir = os.path.join(root, "data", "delta_bad")
    bad_files = {
        os.path.relpath(os.path.join(bad_dir, f), root)
        for f in os.listdir(bad_dir)
        if f.endswith(".parquet")
    }
    assert bad_files and not (bad_files & referenced)
    cur = read_snapshot(spark, root)
    assert cur.filter(F.col("o_orderkey").isNull()).count() == 0


def test_minhash_banded_identical_docs_always_collide(spark):
    """LSH law on a constructed corpus: token-identical documents have
    identical minhash signatures, hence identical buckets in EVERY
    band — the md5-stream pipeline must detect all of them with
    jaccard 1.0 and assign the min-id keeper; a token-disjoint doc
    must never be detected."""
    from connor_fun_streamproducer_spark.llm.dedup import (
        _minhash_banded_pipeline,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),       # exact token copy
        (3, "delta gamma beta alpha"),       # same token SET (order-free)
        (4, "zz yy xx ww vv uu tt ss"),      # disjoint vocabulary
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.keeper_doc_id, r.jaccard) for r in _minhash_banded_pipeline(d).collect()}
    # docs 2 and 3 collapse onto keeper 1 with exact jaccard 1.0
    assert got == {2: (1, 1.0), 3: (1, 1.0)}


def test_kcenter_coreset_trajectory_laws(spark):
    """sample_kcenter_coreset: the greedy farthest-first trajectory's
    exact invariants — the cover radius (dist2 at selection) is
    NON-INCREASING round over round (each pick shrinks or holds the
    worst gap; Gonzalez's 2-approx argument rests on this), the seed is
    the smallest vec_id at distance 0, and no vector is picked twice."""
    from connor_fun_streamproducer_spark.llm.embedding_ops import (
        sample_kcenter_coreset,
    )

    rows = sorted(
        sample_kcenter_coreset(spark, SF_DIR).collect(),
        key=lambda r: r.sel_round,
    )
    e_min = load(spark, SF_DIR, "embeddings").agg(F.min("vec_id")).collect()[0][0]
    assert rows[0].sel_round == 0 and rows[0].vec_id == e_min and rows[0].dist2 == 0
    d = [r.dist2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(d, d[1:])), d
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)
    assert all(r.dist2 > 0 for r in rows[1:])


def test_minhash_estimate_covers_verified_pairs(spark):
    """dedup_minhash_estimate audits the PRE-verify candidate set, so
    every pair the verified dedup op emits must appear in the estimator
    output, with est_bp = match_lanes*625 and both bp columns in
    [0, 10000]."""
    from connor_fun_streamproducer_spark.llm.dedup import (
        dedup_minhash_banded,
        dedup_minhash_estimate,
    )

    est = {
        (r.doc_id, r.keeper_doc_id): r
        for r in dedup_minhash_estimate(spark, SF_DIR).collect()
    }
    for r in est.values():
        assert 0 <= r.match_lanes <= 16
        assert r.est_bp == r.match_lanes * 625
        assert 0 <= r.jaccard_bp <= 10000
        assert r.err_bp == r.est_bp - r.jaccard_bp
    verified = dedup_minhash_banded(spark, SF_DIR).collect()
    assert verified, "fixture should contain near-dups"
    for v in verified:
        assert (v.doc_id, v.keeper_doc_id) in est


def test_event_lateness_partitions_the_stream(spark):
    """stats_event_lateness: bands partition the events exactly (counts
    sum to |events|, shares to <= 10000 with integral-floor slack), and
    the in-order band exists (the frontier row itself is on time)."""
    from connor_fun_streamproducer_spark.operators.profiling import (
        stats_event_lateness,
    )

    rows = stats_event_lateness(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows) == n
    assert sum(r.share_bp for r in rows) <= 10000
    bands = {r.band for r in rows}
    assert "on_time" in bands
    by = {r.band: r for r in rows}
    assert by["on_time"].max_late_s == 0


def test_epoch_plan_budget_identities(spark):
    """corpus_epoch_plan: per-source target decomposes exactly into
    full_epochs*tok + rem_tokens, targets sum exactly to the global
    budget (equal-share largest-remainder), and the remainder prefix
    never overshoots its token allowance."""
    from connor_fun_streamproducer_spark.llm.corpus import (
        _EPOCH_BUDGET,
        corpus_epoch_plan,
    )

    rows = corpus_epoch_plan(spark, SF_DIR).collect()
    assert sum(r.target for r in rows) == _EPOCH_BUDGET
    for r in rows:
        assert r.full_epochs * r.tok + r.rem_tokens == r.target
        assert 0 <= r.rem_tokens < r.tok
        assert 0 <= r.rem_docs


def test_mutual_info_bounds(spark):
    """stats_mutual_info_cat: MI >= 0 (Gibbs) up to round-off, and the
    normalization stays in [0, 1]."""
    from connor_fun_streamproducer_spark.operators.profiling import (
        stats_mutual_info_cat,
    )

    r = stats_mutual_info_cat(spark, SF_DIR).collect()[0]
    assert r.mi_nats >= -1e-6
    assert -1e-6 <= r.mi_normalized <= 1.0
    assert r.n_cells <= r.n_a * r.n_b


def test_ann_recall_companions_consistent(spark):
    """sim_search_ivf / sim_search_lsh recall companions: recall_bp is
    constant per query and equals 2000 * (hits in the query's rows);
    hit rows must actually be exact-top-k members."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in registry.OPS["sim_search_topk"].fn(spark, SF_DIR).collect()
    }
    for key in ("sim_search_ivf", "sim_search_lsh"):
        rows = registry.OPS[key].fn(spark, SF_DIR).collect()
        per_q: dict = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r)
            assert r.hit == ((r.query_id, r.neighbor_id) in exact), (key, r)
        for q, rs in per_q.items():
            hits = sum(1 for r in rs if r.hit)
            assert {r.recall_bp for r in rs} == {hits * 2000}, (key, q)


def test_hits_ranking_laws(spark):
    """graph_hits: top-1 carries 10000 bp by construction (max scales to
    itself), ranks are 1..k dense, and authority is non-increasing in
    rank (the integral div preserves the exact-score order)."""
    from connor_fun_streamproducer_spark.operators.graph import graph_hits

    rows = sorted(graph_hits(spark, SF_DIR).collect(), key=lambda r: r.rk)
    assert rows[0].authority_bp == 10000
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    bps = [r.authority_bp for r in rows]
    assert all(a >= b for a, b in zip(bps, bps[1:]))


def test_holt_reduces_to_constant_series(spark):
    """ts_holt_forecast on a CONSTANT series must learn level = the
    constant and trend = 0 exactly (each smoothing step is an exact
    halving of equal values) — the closed-form fixed point of the
    recurrence, checked through the real op machinery."""
    from pyspark.sql import functions as SF

    rows = [("x", f"2024-01-{d:02d} 00:00:00", 7.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", SF.to_timestamp("ts"))
    df.createOrReplaceTempView("__holt_const")
    # replicate the op's pipeline on the synthetic frame
    d = (
        df.select(
            "event_type",
            SF.date_trunc("day", SF.col("ts")).cast("date").alias("day"),
            SF.floor(SF.col("value") * 100 + SF.lit(0.5)).cast("bigint").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(SF.sum("c").alias("cents"))
    )
    from connor_fun_streamproducer_spark.operators.timeseries import _HOLT_FOLD_SPARK

    s = d.groupBy("event_type").agg(
        SF.expr(
            "transform(array_sort(collect_list(struct(day, cents))),"
            " p -> CAST(p.cents AS DOUBLE))"
        ).alias("v")
    )
    lb = s.select(SF.expr(_HOLT_FOLD_SPARK).alias("lb")).collect()[0].lb
    assert lb[0] == 700.0 and lb[1] == 0.0


def test_neyman_allocation_laws(spark):
    """sample_neyman_alloc: allocations sum exactly to the budget,
    every alloc is within one seat of exact proportionality (the
    Hamilton quota property), and the cap never exceeds the stratum."""
    from connor_fun_streamproducer_spark.llm.corpus import (
        _NEYMAN_BUDGET,
        sample_neyman_alloc,
    )

    rows = sample_neyman_alloc(spark, SF_DIR).collect()
    assert sum(r.alloc for r in rows) == _NEYMAN_BUDGET
    tw = sum(r.w_sd_scaled for r in rows)
    for r in rows:
        exact = r.w_sd_scaled * _NEYMAN_BUDGET / tw
        assert exact - 1 <= r.alloc <= exact + 1
        assert r.alloc_capped <= min(r.alloc, r.n_docs)


def test_capture_recapture_identities(spark):
    """stats_capture_recapture: overlap can't exceed either capture,
    the true total is the union bound, and Chapman >= overlap-only
    lower bound."""
    from connor_fun_streamproducer_spark.operators.profiling import (
        stats_capture_recapture,
    )

    r = stats_capture_recapture(spark, SF_DIR).collect()[0]
    assert r.n_both <= min(r.n_a, r.n_b)
    assert max(r.n_a, r.n_b) <= r.n_true <= r.n_a + r.n_b
    assert r.est_total >= max(r.n_a, r.n_b) - 1
    assert r.err_bp == (r.est_total - r.n_true) * 10000 // r.n_true


def test_walk_pairs_are_real_edges(spark):
    """sample_walk_pairs: every consecutive (cur -> next) hop must be an
    actual edge of the banded purchase graph, every start walks exactly
    _WALK_STEPS steps, and a re-run reproduces identical trajectories
    (hash-driven, not RNG)."""
    from connor_fun_streamproducer_spark.operators.graph import (
        _WALK_STEPS,
        _pair_edges,
        sample_walk_pairs,
    )

    rows = sample_walk_pairs(spark, SF_DIR).collect()
    e = _pair_edges(spark, SF_DIR).collect()
    adj = set()
    for r in e:
        adj.add((r.a, r.c))
        adj.add((r.c, r.a))
    walks: dict = {}
    for r in rows:
        walks.setdefault(r.user_id, {})[r.step] = r.node_id
    for start, steps in walks.items():
        assert set(steps) == set(range(1, _WALK_STEPS + 1))
        cur = start
        for k in range(1, _WALK_STEPS + 1):
            assert (cur, steps[k]) in adj, (start, k, cur, steps[k])
            cur = steps[k]


def test_cluster_canonical_consistency_with_pairs(spark):
    """dedup_cluster_canonical: every verified pair lands in ONE
    cluster, the canonical is the cluster minimum, sizes are
    consistent, and exactly one member per cluster is canonical."""
    from connor_fun_streamproducer_spark.llm.dedup import (
        _minhash_banded_pipeline,
        dedup_cluster_canonical,
    )
    from connor_fun_streamproducer_spark.catalog import load as _load

    rows = dedup_cluster_canonical(spark, SF_DIR).collect()
    comp = {r.doc_id: r.canonical_id for r in rows}
    sizes: dict = {}
    for r in rows:
        sizes.setdefault(r.canonical_id, []).append(r)
    for cid, members in sizes.items():
        assert min(m.doc_id for m in members) == cid
        assert all(m.cluster_size == len(members) for m in members)
        assert sum(1 for m in members if m.is_canonical) == 1
    pairs = _minhash_banded_pipeline(_load(spark, SF_DIR, "documents")).collect()
    for p in pairs:
        assert comp[p.doc_id] == comp[p.keeper_doc_id], p


def test_cross_source_dup_mass_matches_pairs(spark):
    """corpus_cross_source_dup: the matrix's pair mass equals the
    verified pair count, and every avg is a valid bp."""
    from connor_fun_streamproducer_spark.llm.dedup import (
        _minhash_banded_pipeline,
        corpus_cross_source_dup,
    )
    from connor_fun_streamproducer_spark.catalog import load as _load

    rows = corpus_cross_source_dup(spark, SF_DIR).collect()
    n_pairs = _minhash_banded_pipeline(_load(spark, SF_DIR, "documents")).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert 8000 <= r.avg_jaccard_bp <= 10000  # verify threshold is 0.8


def test_bounded_series_guard_trips_on_hot_key(spark):
    """The bounded-series contract is ENFORCED, not narrated (VERDICT r8
    #3/#7): a synthetic hot key whose collected series exceeds the cap
    must fail the task with the contract message, and a series within
    the cap must pass through untouched."""
    import pytest
    from pyspark.sql import functions as F

    from connor_fun_streamproducer_spark.catalog import bounded_series

    df = spark.range(20).select(F.lit("hot").alias("k"), F.col("id"))
    collected = df.groupBy("k").agg(
        bounded_series(
            F.array_sort(F.collect_list("id")), cap=10, what="test series"
        ).alias("l")
    )
    with pytest.raises(Exception, match="bounded-series contract violated"):
        collected.collect()

    ok = df.groupBy("k").agg(
        bounded_series(
            F.array_sort(F.collect_list("id")), cap=100, what="test series"
        ).alias("l")
    )
    assert ok.collect()[0]["l"] == list(range(20))


def test_bounded_series_guard_is_in_the_hot_ops_plans(spark):
    """ts_holt_forecast and the chi2/MI contingency collects carry the
    guard in their physical plans — the enforcement can't silently be
    dropped by a refactor."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    for key in ("ts_holt_forecast", "stats_cramers_v", "stats_mutual_info_cat"):
        df = registry.OPS[key].fn(spark, SF_DIR)
        # optimized (not executed) plan: the physical toString truncates
        # deep expression trees, but the optimizer can never legally
        # remove a raise_error, so its presence here proves enforcement
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "raise_error" in plan, f"{key} lost its bounded-series guard"


def test_peak_concurrency_carries_across_midnight(spark, tmp_path):
    """r9 self-review scenario: sessions open just before midnight must
    count toward the NEXT day's peak (a day-partitioned sweep with no
    carry reports the post-midnight burst alone)."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    base = pd.Timestamp("2024-03-01 23:59:30")
    rows = [
        # three opens 30s before midnight — their 15-min intervals span it
        *[
            dict(event_id=i, ts=base, user_id=i, event_type="view", value=1.0,
                 props="{}")
            for i in range(3)
        ],
        # one open at 00:05 next day: true concurrency there is 4
        dict(event_id=9, ts=pd.Timestamp("2024-03-02 00:05:00"), user_id=9,
             event_type="view", value=1.0, props="{}"),
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = {
        str(r["day"]): (r["peak_concurrency"], r["first_peak_epoch"])
        for r in registry.OPS["ts_peak_concurrency"].fn(spark, str(tmp_path)).collect()
    }
    assert out["2024-03-01"][0] == 3
    # day 2's peak is 4 (3 carried-in + 1 new), first reached at 00:05
    assert out["2024-03-02"][0] == 4
    assert out["2024-03-02"][1] == int(pd.Timestamp("2024-03-02 00:05:00").timestamp())


def test_peak_concurrency_close_only_day(spark, tmp_path):
    """r10 ADVICE scenario: a day whose ONLY boundary points are closes
    (sessions carried in from the prior day, no events of its own) must
    still report the carried-in midnight level as its peak — sentinels
    come from opens UNION closes, not opens alone."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    base = pd.Timestamp("2024-03-01 23:59:30")
    rows = [
        # three opens 30s before midnight; day 2 has NO events of its own,
        # only the three carried-in closes at 00:14:30
        dict(event_id=i, ts=base, user_id=i, event_type="view", value=1.0,
             props="{}")
        for i in range(3)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = {
        str(r["day"]): (r["peak_concurrency"], r["first_peak_epoch"])
        for r in registry.OPS["ts_peak_concurrency"].fn(spark, str(tmp_path)).collect()
    }
    assert out["2024-03-01"][0] == 3
    # day 2's true peak is the carried-in 3, first at midnight (sentinel)
    assert out["2024-03-02"][0] == 3
    assert out["2024-03-02"][1] == int(pd.Timestamp("2024-03-02 00:00:00").timestamp())


def test_var_es_tail_ordering_and_mann_kendall_monotone(spark, tmp_path):
    """Structural invariants of the r10 risk/trend ops: expected
    shortfall can never exceed VaR (the tail mean is a mean of values
    at-or-below the cut), and a strictly increasing daily series drives
    Mann-Kendall to its maximum S = n(n-1)/2 with a rejection verdict."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    eid = 0
    for day in range(30):
        # strictly increasing daily revenue: 1 event/day, value = day+1
        rows.append(
            dict(event_id=eid, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=day),
                 user_id=1, event_type="buy", value=float(day + 1), props="{}")
        )
        eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    var_es = registry.OPS["ts_var_es"].fn(spark, str(tmp_path)).collect()
    assert len(var_es) == 1
    r = var_es[0]
    assert r["es5_cents"] <= r["var5_cents"]
    # n=30 -> k = ceil(1.5) = 2; tail = days 1,2 -> var = 200c, es = 150c
    assert r["k_tail"] == 2 and r["var5_cents"] == 200 and r["es5_cents"] == 150

    mk = registry.OPS["ts_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]
    n = 30
    assert mk["s_stat"] == n * (n - 1) // 2  # every pair ascending
    assert mk["reject_no_trend"] is True or mk["reject_no_trend"] == True  # noqa: E712


def test_welch_ttest_constructed_shift_rejects(spark, tmp_path):
    """stats_welch_ttest verdict calibration (r10 verdict fix): the t
    statistic is dimensionless, so a constructed era shift with |t|≈3
    must trip the 5% verdict, and an identical-eras control must not.

    Construction: 50 events/era, values alternating ±$1.00 around the
    era mean (population variance exactly 10000 cents²), era-B mean
    shifted +61 cents. va+vb = 2·10000/49 → se ≈ 20.2 cents →
    |t| ≈ 61/20.2 ≈ 3.02. Before the fix the verdict compared
    |t|/100 against 1.96 (i.e. |t| > 196) and could never fire here.
    """
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["stats_welch_ttest"].fn

    def build(shift_cents):
        rows, eid = [], 0
        for era, (t0, mean_c) in enumerate(((0, 1000), (100000, 1000 + shift_cents))):
            for i in range(50):
                cents = mean_c + (100 if i % 2 == 0 else -100)
                rows.append(
                    dict(event_id=eid,
                         ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t0 + i),
                         user_id=1, event_type="buy",
                         value=cents / 100.0, props="{}")
                )
                eid += 1
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    build(61)
    r = fn(spark, str(tmp_path)).collect()[0]
    assert 2.5 < abs(r["t_stat"]) < 3.5, r  # |t|≈3.02 by construction
    assert bool(r["reject_equal_means"]) is True, r

    build(0)
    r0 = fn(spark, str(tmp_path)).collect()[0]
    assert abs(r0["t_stat"]) < 0.5, r0
    assert bool(r0["reject_equal_means"]) is False, r0


def test_materialize_once_prunes_and_cleans_staging(spark, tmp_path):
    """catalog.materialize_once hygiene (r10 ADVICE): a failed build must
    not leak its staging dir; a successful build prunes superseded
    sibling artifacts — same tag with a stale fingerprint, a rev-less
    ancestor of the same tag, and orphaned staging dirs — while leaving
    OTHER tags and the fresh artifact alone."""
    import os

    from connor_fun_streamproducer_spark.catalog import materialize_once

    root = tmp_path / "idx"
    root.mkdir()
    # fingerprint layout: 8-hex path head + 8-hex content tail
    fp = "a" * 8 + "1" * 8        # this fixture path, current content
    oldfp = "a" * 8 + "2" * 8     # SAME path, superseded content
    otherfp = "b" * 8 + "1" * 8   # a DIFFERENT live fixture path
    path = str(root / f"{fp}-bands-v1-rdeadbeef")

    # 1. failing build leaves no staging turds
    with pytest.raises(RuntimeError):
        materialize_once(spark, path, lambda: (_ for _ in ()).throw(RuntimeError("x")))
    assert os.listdir(root) == []

    # 2. successful build prunes exactly the superseded family members
    stale = [
        f"{oldfp}-bands-v1-rdeadbeef",        # same path, rewritten fixture
        f"{fp}-bands-v1-r00000000",           # superseded construction rev
        f"{fp}-bands-v1",                     # rev-less ancestor
        f"{fp}-bands-v1-rdeadbeef.build-1-x", # orphaned staging
    ]
    keep = [
        f"{fp}-cand-v1-rdeadbeef",            # different artifact kind
        f"{otherfp}-bands-v1-rdeadbeef",      # different LIVE fixture (sf0.01
                                              # next to sf0.1 — never touched)
        f"{oldfp}-closure-v1",                # different kind, old content
    ]
    for d in stale + keep:
        (root / d).mkdir()
    # a same-tag sibling whose recorded _SOURCE fixture no longer exists
    # (a dead tmp_path artifact) must go; one whose source LIVES must stay
    dead_src = tmp_path / "gone.parquet"
    live_src = tmp_path / "alive.parquet"
    live_src.write_bytes(b"x")
    for head, src in (("c" * 8, dead_src), ("d" * 8, live_src)):
        d = root / f"{head}{'9' * 8}-bands-v1-rdeadbeef"
        d.mkdir()
        (d / "_SOURCE").write_text(str(src))
    stale.append(f"{'c' * 8}{'9' * 8}-bands-v1-rdeadbeef")
    keep.append(f"{'d' * 8}{'9' * 8}-bands-v1-rdeadbeef")

    df = materialize_once(
        spark,
        path,
        lambda: spark.range(3).select(F.col("id").alias("v")),
        source=str(live_src),
    )
    assert df.count() == 3
    left = set(os.listdir(root))
    assert os.path.basename(path) in left
    assert (root / os.path.basename(path) / "_SOURCE").read_text() == str(live_src)
    assert left.issuperset(keep)
    assert not left.intersection(stale), left


def test_fixture_fingerprint_handles_spark_written_dirs(spark, tmp_path):
    """fixture_fingerprint must work for BOTH fixture shapes: the
    driver's single-file tables and Spark-written directory tables
    (scale probes, artifact consumers over .scratch replicas) — and the
    content probe must change when a part file's bytes change under a
    preserved (mtime, size)."""
    import os

    from connor_fun_streamproducer_spark.catalog import fixture_fingerprint

    spark.range(10).selectExpr("id AS doc_id").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fp1 = fixture_fingerprint(str(tmp_path), "documents")
    assert fp1 == fixture_fingerprint(str(tmp_path), "documents")
    # rewrite with different contents -> different fingerprint
    spark.range(11).selectExpr("id AS doc_id").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fp2 = fixture_fingerprint(str(tmp_path), "documents")
    assert fp2 != fp1
    # file-shaped table: flipping one byte with preserved mtime+size must
    # still change the fingerprint (the content-probe case)
    d = tmp_path / "f"
    d.mkdir()
    f = d / "events.parquet"
    f.write_bytes(b"A" * 64)
    st = os.stat(f)
    fa = fixture_fingerprint(str(d), "events")
    f.write_bytes(b"A" * 63 + b"B")
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    fb = fixture_fingerprint(str(d), "events")
    assert st.st_size == os.stat(f).st_size
    assert fa != fb


def test_era_suite_constructed_shifts(spark, tmp_path):
    """Calibration of the r11 era suite on constructed fixtures — each
    test must FIRE on the effect it exists for and stay QUIET on the
    null, so a welch-style dead-verdict bug (r10) can't hide in any of
    them.

    Era A: 50 values alternating ±$1.00 around $10.00.
    - spread case: era B alternates ±$3.00 around $10.00 (same mean,
      3× the deviation) → brown_forsythe rejects, welch/mood must not.
    - location case: era B alternates ±$1.00 around $11.00 → mood and
      cohens_d (large) fire; brown_forsythe must not (same spread).
    """
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    def build(amp_b, mean_b):
        rows, eid = [], 0
        for t0, mean_c, amp in ((0, 1000, 100), (100000, mean_b, amp_b)):
            for i in range(50):
                cents = mean_c + (amp if i % 2 == 0 else -amp)
                rows.append(
                    dict(event_id=eid,
                         ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t0 + i),
                         user_id=1, event_type="buy",
                         value=cents / 100.0, props="{}")
                )
                eid += 1
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    bf = registry.OPS["stats_brown_forsythe"].fn
    mood = registry.OPS["stats_mood_median"].fn
    cohen = registry.OPS["stats_cohens_d_eras"].fn
    mw = registry.OPS["stats_mann_whitney"].fn
    cliff = registry.OPS["stats_cliff_delta"].fn

    build(amp_b=300, mean_b=1000)  # spread tripled, mean unchanged
    r = bf(spark, str(tmp_path)).collect()[0]
    assert bool(r["reject_equal_spread"]) is True, r
    rm = mood(spark, str(tmp_path)).collect()[0]
    assert bool(rm["reject_equal_medians"]) is False, rm
    # rank-sum and delta are LOCATION measures: a pure spread change is
    # pairwise-symmetric (n_gt == n_lt), so both must stay quiet
    rw = mw(spark, str(tmp_path)).collect()[0]
    assert bool(rw["reject_equal_location"]) is False, rw
    rcd = cliff(spark, str(tmp_path)).collect()[0]
    assert rcd["magnitude"] == "negligible" and rcd["cliff_delta"] == 0.0, rcd

    # mean +$3, spread unchanged (a ±$1 shift is invisible to Mood on
    # this two-point fixture: both eras straddle the pooled median
    # symmetrically — the shift must clear the alternation amplitude)
    build(amp_b=100, mean_b=1300)
    r = bf(spark, str(tmp_path)).collect()[0]
    assert bool(r["reject_equal_spread"]) is False, r
    rm = mood(spark, str(tmp_path)).collect()[0]
    assert bool(rm["reject_equal_medians"]) is True, rm
    rc = cohen(spark, str(tmp_path)).collect()[0]
    # |d| = 300 cents / ~100.5 cents sd ≈ 3.0 → 'large'
    assert rc["magnitude"] == "large" and abs(rc["cohens_d"]) > 0.8, rc
    rw = mw(spark, str(tmp_path)).collect()[0]
    assert bool(rw["reject_equal_location"]) is True, rw
    # era A values {900, 1100}, era B {1200, 1400}: every B beats every
    # A, so delta = P(a>b) - P(a<b) = -1 exactly — the 'computed, not
    # estimated' claim, pinned
    rcd = cliff(spark, str(tmp_path)).collect()[0]
    assert rcd["cliff_delta"] == -1.0 and rcd["magnitude"] == "large", rcd

    build(amp_b=100, mean_b=1000)  # null: identical eras
    assert bool(bf(spark, str(tmp_path)).collect()[0]["reject_equal_spread"]) is False
    assert bool(mood(spark, str(tmp_path)).collect()[0]["reject_equal_medians"]) is False
    rc0 = cohen(spark, str(tmp_path)).collect()[0]
    assert rc0["magnitude"] == "negligible", rc0
    assert bool(mw(spark, str(tmp_path)).collect()[0]["reject_equal_location"]) is False
    rcd0 = cliff(spark, str(tmp_path)).collect()[0]
    assert rcd0["cliff_delta"] == 0.0 and rcd0["magnitude"] == "negligible", rcd0


def test_pps_draws_sum_to_quota(spark):
    """sample_pps_systematic: Σ n_draws per stratum must equal the
    stratum quota EXACTLY (telescoping floor sums), and every weight
    must be positive-representable — the certainty-unit multiplicity
    accounting, not approximately."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    df = registry.OPS["sample_pps_systematic"].fn(spark, SF_DIR).toPandas()
    assert len(df) > 0
    g = df.groupby("source").agg(
        draws=("n_draws", "sum"), q=("stratum_quota", "first")
    )
    assert (g["draws"] == g["q"]).all(), g[g["draws"] != g["q"]]
    assert (df["n_draws"] >= 1).all()


def test_bollinger_constructed_breakout(spark, tmp_path):
    """ts_bollinger_breakout calibration: a flat daily series has a
    zero-width band and NO breakouts (dev = 0 fails the strict >); a
    single spiked day after 7 flat days is exactly one upside breakout;
    a crashed day exactly one downside."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["ts_bollinger_breakout"].fn

    def build(day9_cents):
        rows = []
        for day in range(9):
            cents = day9_cents if day == 8 else 500
            rows.append(
                dict(event_id=day, ts=pd.Timestamp("2024-01-01")
                     + pd.Timedelta(days=day), user_id=1,
                     event_type="buy", value=cents / 100.0, props="{}")
            )
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    build(500)  # flat: 9 days, 2 evaluable, zero breakouts
    r = fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["n_eval"], r["n_up"], r["n_down"]) == (9, 2, 0, 0), r

    build(5000)  # spike: strictly above the zero-width band
    r = fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_up"], r["n_down"]) == (1, 0), r

    build(5)  # crash
    r = fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_up"], r["n_down"]) == (0, 1), r


def test_quantile_ci_constructed_exact_ranks(spark, tmp_path):
    """stats_quantile_ci on cents 1..100: median is the rank-50 pick
    (lower median), and the order-statistic cutoffs are rank 40 =
    floor((100 − 1.959964·10)/2) and rank 61 = 101 − 40 — pinned
    against the closed form, not against the engine."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = [
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
             user_id=1, event_type="buy", value=(i + 1) / 100.0, props="{}")
        for i in range(100)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    r = registry.OPS["stats_quantile_ci"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["median_cents"], r["ci_lo_cents"], r["ci_hi_cents"]) == (
        100, 50, 40, 61,
    ), r


def test_seasonality_strength_constructed_weekend(spark, tmp_path):
    """ts_seasonality_strength: 28 days with a 10× weekend level (plus a
    small per-day drift so within-group variance is nonzero — SSW = 0
    makes F degenerate-NULL by the nullif guard, the documented edge)
    must read weekly_seasonal=True with eta² near 1; the drift-only
    series must stay quiet with small eta²."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["ts_seasonality_strength"].fn

    def build(weekend_cents):
        rows = []
        for day in range(28):
            ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
            cents = (weekend_cents if ts.dayofweek >= 5 else 500) + day
            rows.append(dict(event_id=day, ts=ts, user_id=1,
                             event_type="buy", value=cents / 100.0, props="{}"))
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    build(5000)
    r = fn(spark, str(tmp_path)).collect()[0]
    assert bool(r["weekly_seasonal"]) is True and r["eta_sq"] > 0.9, r

    build(500)  # pure linear drift: dow means differ only by the 0..6 offset
    r = fn(spark, str(tmp_path)).collect()[0]
    assert bool(r["weekly_seasonal"]) is False and r["eta_sq"] < 0.1, r


def test_dispersion_index_constructed(spark, tmp_path):
    """ts_dispersion_index: a constant-rate day grid has D = 0 (quiet);
    one 100-event burst day in a 1/day month must trip the
    overdispersion verdict."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["ts_dispersion_index"].fn

    def build(burst):
        rows, eid = [], 0
        for day in range(30):
            k = burst if day == 15 else 1
            for j in range(k):
                rows.append(dict(
                    event_id=eid,
                    ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=day, seconds=j),
                    user_id=1, event_type="buy", value=1.0, props="{}"))
                eid += 1
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    build(1)
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r["dispersion_index"] == 0.0 and not r["overdispersed"], r

    build(100)
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r["dispersion_index"] > 50 and bool(r["overdispersed"]) is True, r


def test_centroid_drift_constructed_shift(spark, tmp_path):
    """embedding_centroid_drift: a label whose second-half vectors shift
    +0.5 in one dimension reads exactly 0.5; an unmoved label reads 0."""
    import numpy as np
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    for vec_id in range(40):
        for label in (0, 1):
            v = np.zeros(64, dtype=np.float32)
            v[1] = 1.0
            if label == 1 and vec_id >= 20:
                v[0] = 0.5
            rows.append(dict(vec_id=vec_id * 2 + label, embedding=v.tolist(),
                             label=label))
    pd.DataFrame(rows).to_parquet(tmp_path / "embeddings.parquet", index=False)
    out = {
        r["label"]: r
        for r in registry.OPS["embedding_centroid_drift"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0]["centroid_shift_l2"] == 0.0, out[0]
    # era split is by vec_id midpoint (39): era B holds 21 label-1
    # vectors of which 20 carry the +0.5 shift -> 0.5 * 20/21 exactly
    assert abs(out[1]["centroid_shift_l2"] - 0.5 * 20 / 21) < 1e-4, out[1]


def test_asof_forward_constructed_direction(spark, tmp_path):
    """join_asof_forward: the >= bound picks the event AT the order time
    (not the nearest earlier one); an order with only earlier events
    drops (inner semantics); equal-time ties resolve to the lowest
    event_id."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    t0 = pd.Timestamp("2024-06-01 12:00:00")
    pd.DataFrame([
        dict(event_id=1, ts=t0 - pd.Timedelta(days=1), user_id=7,
             event_type="before", value=1.0, props="{}"),
        dict(event_id=3, ts=t0, user_id=7, event_type="at_tie_hi", value=1.0, props="{}"),
        dict(event_id=2, ts=t0, user_id=7, event_type="at_tie_lo", value=1.0, props="{}"),
        dict(event_id=4, ts=t0 + pd.Timedelta(days=3), user_id=7,
             event_type="after", value=1.0, props="{}"),
        dict(event_id=5, ts=t0 - pd.Timedelta(days=2), user_id=9,
             event_type="only_before", value=1.0, props="{}"),
    ]).to_parquet(tmp_path / "events.parquet", index=False)
    pd.DataFrame([
        dict(o_orderkey=100, o_custkey=7, o_orderstatus="O", o_totalprice=1.0,
             o_orderdate=t0, o_orderpriority="1-URGENT"),
        dict(o_orderkey=200, o_custkey=9, o_orderstatus="O", o_totalprice=1.0,
             o_orderdate=t0, o_orderpriority="1-URGENT"),
    ]).to_parquet(
        tmp_path / "orders.parquet", index=False, coerce_timestamps="us"
    )  # the real orders fixture is µs; ns would read as BIGINT (nanosAsLong)
    rows = registry.OPS["join_asof_forward"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1, rows  # user 9's order has no later event
    r = rows[0]
    assert (r["o_orderkey"], r["next_event_id"], r["next_event_type"],
            r["gap_days"]) == (100, 2, "at_tie_lo", 0), r


def test_r12_stats_suite_constructed_calibration(spark, tmp_path):
    """Calibration of the r12 stats additions on constructed fixtures —
    each test/effect-size must FIRE on the effect it exists for and stay
    QUIET on the null (the r11 era-suite template, VERDICT r11 #8).

    - anova: two types with equal means → eta² ≈ 0; means $10 vs $13 at
      ±$1 alternation → between-variance dominates (eta² large).
    - jarque_bera: a 12-fold-uniform sum (Irwin-Hall, near-normal) must
      NOT reject; a one-sided heavy-tail construction must.
    - cohens_h / trend: a monotone quarterly drift fires the trend z
      and shifts the above-median share (h large, by construction);
      flat series stay quiet on both.
    """
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    anova = registry.OPS["stats_anova_oneway"].fn
    jb = registry.OPS["stats_jarque_bera"].fn
    h = registry.OPS["stats_cohens_h"].fn
    trend = registry.OPS["stats_trend_proportions"].fn

    def write(rows):
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    def ev(eid, sec, typ, cents):
        return dict(
            event_id=eid,
            ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec),
            user_id=1, event_type=typ, value=cents / 100.0, props="{}",
        )

    # --- anova: equal means → negligible; shifted type → large -------
    def two_types(mean_b):
        rows, eid = [], 0
        for typ, mean_c in (("a", 1000), ("b", mean_b)):
            for i in range(50):
                rows.append(ev(eid, eid, typ, mean_c + (100 if i % 2 == 0 else -100)))
                eid += 1
        return rows

    write(two_types(1000))
    r = anova(spark, str(tmp_path)).collect()[0]
    assert r["magnitude"] == "negligible" and r["eta_squared"] == 0.0, r
    write(two_types(1300))
    r = anova(spark, str(tmp_path)).collect()[0]
    # SSB = N/4·(Δmean)² = 100/4·300² vs SSW = N·100² → eta² = 9/13 ≈ 0.69
    assert r["magnitude"] == "large" and r["eta_squared"] > 0.5, r

    # --- jarque_bera: Irwin-Hall(12) quiet, heavy-tail fires ---------
    import hashlib

    def u(i, j):  # deterministic uniform in [0, 1)
        return int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8], 16) / 16**8

    near_normal = [
        ev(i, i, "n", int(1000 + 200 * (sum(u(i, j) for j in range(12)) - 6)))
        for i in range(500)
    ]
    write(near_normal)
    r = jb(spark, str(tmp_path)).collect()[0]
    assert bool(r["normal_rejected"]) is False, r
    heavy = [
        ev(i, i, "t", 1000 + (100000 if i % 50 == 0 else int(100 * u(i, 0))))
        for i in range(500)
    ]
    write(heavy)
    r = jb(spark, str(tmp_path)).collect()[0]
    assert bool(r["normal_rejected"]) is True and r["skewness"] > 1, r

    # --- trend + cohens_h: monotone drift fires both, flat neither ---
    def quarterly(drift_cents_per_q):
        rows = []
        for i in range(200):
            q = (i * 4) // 200
            rows.append(
                ev(i, i * 450, "d",
                   1000 + q * drift_cents_per_q + (100 if i % 2 == 0 else -100))
            )
        return rows

    write(quarterly(0))
    rt = trend(spark, str(tmp_path)).collect()[0]
    assert bool(rt["reject_no_trend"]) is False, rt
    rh = h(spark, str(tmp_path)).collect()[0]
    assert rh["magnitude"] == "negligible", rh
    write(quarterly(300))  # +$3/quarter: quarters 2,3 fully above median
    rt = trend(spark, str(tmp_path)).collect()[0]
    assert bool(rt["reject_no_trend"]) is True and rt["trend_z"] > 0, rt
    rh = h(spark, str(tmp_path)).collect()[0]
    assert rh["magnitude"] == "large" and rh["cohens_h"] > 0, rh


def test_spearman_binned_monotone_and_known_value(spark, tmp_path):
    """stats_spearman_binned calibration: a perfectly monotone
    (discount, quantity) relation gives rho = 1 exactly; reversing one
    cell's direction drops it below 1; a two-point antithetic relation
    gives rho = -1."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["stats_spearman_binned"].fn

    def write(pairs):
        pd.DataFrame([
            dict(l_orderkey=i, l_partkey=1, l_suppkey=1, l_linenumber=1,
                 l_quantity=float(q), l_extendedprice=1.0, l_discount=d,
                 l_tax=0.0, l_returnflag="N", l_linestatus="O",
                 l_shipdate=pd.Timestamp("2024-01-01"))
            for i, (d, q) in enumerate(pairs)
        ]).to_parquet(tmp_path / "lineitem.parquet", index=False,
                      coerce_timestamps="us")
        pd.DataFrame([
            dict(p_partkey=1, p_name="p", p_brand="B1", p_type="t",
                 p_size=1, p_retailprice=1.0)
        ]).to_parquet(tmp_path / "part.parquet", index=False)

    write([(0.00, 1), (0.02, 5), (0.04, 9), (0.06, 12)])  # monotone up
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r["spearman_rho"] == 1.0, r
    write([(0.00, 12), (0.02, 9), (0.04, 5), (0.06, 1)])  # monotone down
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r["spearman_rho"] == -1.0, r
    write([(0.00, 1), (0.02, 9), (0.04, 5), (0.06, 12)])  # one swap
    r = fn(spark, str(tmp_path)).collect()[0]
    assert 0 < r["spearman_rho"] < 1, r


def test_r12_ts_suite_constructed_calibration(spark, tmp_path):
    """Calibration of the r12 timeseries additions on constructed
    fixtures (the era-suite template): each diagnostic must FIRE on the
    structure it exists for and stay QUIET on its null."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    tp = registry.OPS["ts_turning_points"].fn
    burst = registry.OPS["ts_burstiness"].fn
    rec = registry.OPS["ts_records_count"].fn

    def daily(cents_seq, typ="t"):
        return [
            dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
                 user_id=1, event_type=typ, value=c / 100.0, props="{}")
            for i, c in enumerate(cents_seq)
        ]

    def write(rows):
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    # turning points: monotone -> T=0 fires low; alternation -> T=n-2
    # fires high; an up-up-down comb sits at ~2n/3 ≈ E[T] and is quiet
    write(daily([1000 + 10 * i for i in range(30)]))
    r = tp(spark, str(tmp_path)).collect()[0]
    assert r["n_turning"] == 0 and bool(r["reject_random"]) and r["z"] < 0, r
    write(daily([1000 + (100 if i % 2 == 0 else -100) for i in range(30)]))
    r = tp(spark, str(tmp_path)).collect()[0]
    assert r["n_turning"] == 28 and bool(r["reject_random"]) and r["z"] > 0, r
    write(daily([1000 + (i % 3) * 100 for i in range(30)]))
    r = tp(spark, str(tmp_path)).collect()[0]
    assert bool(r["reject_random"]) is False, r

    # records: strict growth -> every day a record; flat -> only day 1
    write(daily([1000 + 10 * i for i in range(30)]))
    r = rec(spark, str(tmp_path)).collect()[0]
    assert r["n_records"] == 30 and bool(r["trend_detected"]), r
    write(daily([1000] * 30))
    r = rec(spark, str(tmp_path)).collect()[0]
    assert r["n_records"] == 1 and not bool(r["trend_detected"]), r

    # burstiness: metronome -> B = -1 (regular); rare huge gaps -> bursty
    write([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=60 * i),
             user_id=1, event_type="m", value=1.0, props="{}")
        for i in range(50)
    ])
    r = burst(spark, str(tmp_path)).collect()[0]
    assert r["burstiness"] == -1.0 and r["regime"] == "regular", r
    secs, t = [], 0
    for i in range(50):
        t += 10000 if i % 10 == 9 else 1
        secs.append(t)
    write([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s),
             user_id=1, event_type="b", value=1.0, props="{}")
        for i, s in enumerate(secs)
    ])
    r = burst(spark, str(tmp_path)).collect()[0]
    assert r["regime"] == "bursty" and r["burstiness"] > 0.4, r


def test_cross_correlation_shifted_twin_peaks_at_its_lag(spark, tmp_path):
    """ts_cross_correlation: type b = type a delayed by exactly 2 days
    → ccf(a, b, lag=2) = 1.0 exactly (zero-padded grid convention makes
    the aligned moments identical), and the lag-0 value is strictly
    smaller."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows, eid = [], 0
    counts = [1, 3, 2, 5, 1, 4, 2, 6, 3, 1]
    for day, c in enumerate(counts):
        for typ, off in (("a", 0), ("b", 2)):
            for _ in range(c):
                rows.append(
                    dict(event_id=eid,
                         ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=day + off),
                         user_id=1, event_type=typ, value=1.0, props="{}")
                )
                eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    df = registry.OPS["ts_cross_correlation"].fn(spark, str(tmp_path)).collect()
    by = {(r["type_a"], r["type_b"], r["lag_days"]): r["ccf"] for r in df}
    assert by[("a", "b", 2)] == 1.0, by
    assert by[("a", "b", 0)] < 1.0, by


def test_spectral_entropy_pure_tone_vs_flat(spark, tmp_path):
    """ts_spectral_entropy: an hourly count series tracing one 24 h
    cosine concentrates its power at the 24 h bank entry (dominant
    period 24, entropy well below 1); a FLAT series has zero deviation
    power everywhere and emits no row (total power 0 is filtered —
    stated)."""
    import math
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["ts_spectral_entropy"].fn

    def write(counts_fn):
        rows, eid = [], 0
        for h in range(24 * 14):
            for _ in range(counts_fn(h)):
                rows.append(
                    dict(event_id=eid,
                         ts=pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                         user_id=1, event_type="x", value=1.0, props="{}")
                )
                eid += 1
        pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    write(lambda h: 10 + round(5 * math.cos(2 * math.pi * h / 24)))
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r["dominant_period_h"] == 24 and r["spectral_entropy_norm"] < 0.6, r
    write(lambda h: 7)
    assert fn(spark, str(tmp_path)).count() == 0


def test_r12_pipeline_invariants(spark):
    """Structural invariants of the r12 pipeline additions on the real
    fixture: trade balances sum to zero globally (every line is exactly
    one nation's export and one's import), the final backlog equals
    opened-minus-closed totals, fill rate is a valid share, and brand
    HHI is bounded by [top_share², 10000²]."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    tb = registry.OPS["pipeline_nation_trade_balance"].fn(spark, SF_DIR).toPandas()
    assert tb["balance_cents"].sum() == 0
    assert tb["export_cents"].sum() == tb["import_cents"].sum()

    bl = registry.OPS["pipeline_backlog_burndown"].fn(spark, SF_DIR).toPandas()
    bl = bl.sort_values("week")
    assert (bl["backlog_orders"].iloc[-1]
            == bl["n_opened"].sum() - bl["n_closed"].sum())
    assert (bl["backlog_orders"] >= 0).all()

    fr = registry.OPS["pipeline_fill_rate"].fn(spark, SF_DIR).toPandas()
    assert (fr["on_time_qty"] <= fr["total_qty"]).all()
    assert (fr["fill_rate_bp"] <= 10000).all() and (fr["fill_rate_bp"] >= 0).all()

    hh = registry.OPS["pipeline_brand_supplier_hhi"].fn(spark, SF_DIR).toPandas()
    assert (hh["hhi_bp2"] <= 10000 * 10000).all()
    assert (hh["hhi_bp2"] >= hh["top_share_bp"] ** 2).all()


def test_r12_llm_batch_invariants(spark, tmp_path):
    """Structural invariants + constructed calibration for the r12
    LLM-tier additions."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    # balanced downsample: every class is cut to EXACTLY the min size
    bal = registry.OPS["sample_balanced_downsample"].fn(spark, SF_DIR).toPandas()
    per = bal.groupby("lang").size()
    assert per.nunique() == 1 and per.iloc[0] == bal["cap_n"].iloc[0]

    # HH estimator: tokens/char is near-constant on the fixture, so the
    # size-biased design must estimate token totals within a few percent
    hh = registry.OPS["sample_horvitz_thompson"].fn(spark, SF_DIR).toPandas()
    # quota is only ~2 draws/stratum at this sf — 8% is the loose bound
    assert (hh["err_bp"].abs() <= 800).all(), hh

    # triplets: full budget per label on the fixture; rate is a valid bp
    tv = registry.OPS["embedding_triplet_violation"].fn(spark, SF_DIR).toPandas()
    assert (tv["n_triplets"] == 8).all()
    assert (tv["violation_bp"] <= 10000).all()

    # band occupancy: every doc appears once per band; pair mass and
    # singleton counts are internally consistent
    oc = registry.OPS["dedup_band_occupancy"].fn(spark, SF_DIR).toPandas()
    assert oc["n_docs"].nunique() == 1
    assert (oc["singleton_buckets"] <= oc["n_buckets"]).all()
    assert ((oc["max_bucket_size"] > 1) | (oc["candidate_pairs"] == 0)).all()

    # doc-length gini: equal lengths -> exactly 0
    pd.DataFrame([
        dict(doc_id=i, text="a b c d e f g h", lang="en", source="s0", n_chars=15)
        for i in range(20)
    ]).to_parquet(tmp_path / "documents.parquet", index=False)
    g = registry.OPS["corpus_doc_length_gini"].fn(spark, str(tmp_path)).collect()[0]
    assert g["length_gini"] == 0.0, g

    # prefix template rate: 3 docs share an 8-token opening, 2 are
    # unique, 1 is too short to qualify
    docs = (
        [dict(doc_id=i, text="the quick brown fox jumps over lazy dog tail " + "x" * i,
              lang="en", source="s0", n_chars=50) for i in range(3)]
        + [dict(doc_id=10, text="one unique opening sentence goes right here now ok",
                lang="en", source="s0", n_chars=50),
           dict(doc_id=11, text="another unique opening sentence goes right here now",
                lang="en", source="s0", n_chars=50),
           dict(doc_id=12, text="too short", lang="en", source="s0", n_chars=9)]
    )
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet", index=False)
    r = registry.OPS["text_prefix_template_rate"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_docs"], r["n_templated"], r["n_distinct_prefixes"]) == (5, 3, 3), r


def test_r12_batch5_invariants(spark):
    """AM >= GM per type (the inequality agg_geometric_mean exposes);
    homophily and knn-curve internal consistency on the real fixture."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    gm = registry.OPS["agg_geometric_mean"].fn(spark, SF_DIR).toPandas()
    assert (gm["arith_mean_cents"] >= gm["geo_mean_cents"]).all()

    el = registry.OPS["graph_edge_locality"].fn(spark, SF_DIR).toPandas()
    assert (el["n_intra_edges"] <= el["n_incident_edges"]).all()
    assert (el["homophily_bp"] <= 10000).all()

    kc = registry.OPS["graph_knn_degree_curve"].fn(spark, SF_DIR).toPandas()
    # slots = k * n_nodes exactly; avg neighbor degree is >= 1 on any
    # non-empty graph (every neighbor has at least the shared edge)
    assert (kc["sum_neighbor_degree"] >= kc["degree"] * kc["n_nodes"]).all()
    assert (kc["avg_neighbor_degree"] >= 1).all()


def test_spearman_binned_matches_python_reference(spark, tmp_path):
    """stats_spearman_binned vs a pure-Python average-rank Spearman on
    deterministic tie-heavy fixtures — the engine-independent
    cross-check (the same defense-in-depth class as the era-suite
    constructed shifts: a shared oracle error can't survive a third
    implementation)."""
    import hashlib

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["stats_spearman_binned"].fn

    def h(seed, i, mod):
        return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16) % mod

    def py_spearman(pairs):
        def avg_ranks(vals):
            sv = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(sv):
                j = i
                while j + 1 < len(sv) and vals[sv[j + 1]] == vals[sv[i]]:
                    j += 1
                r = (i + j) / 2 + 1
                for k in range(i, j + 1):
                    ranks[sv[k]] = r
                i = j + 1
            return ranks

        xs = [p[0] for p in pairs]
        ys = [p[1] for p in pairs]
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(pairs)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = (
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        ) ** 0.5
        return num / den if den else None

    for seed in range(4):
        pairs = [
            (h(seed, i, 6), 1 + h(seed * 7 + 1, i, 8)) for i in range(30)
        ]
        pd.DataFrame([
            dict(l_orderkey=i, l_partkey=1, l_suppkey=1, l_linenumber=1,
                 l_quantity=float(q), l_extendedprice=1.0, l_discount=d / 100.0,
                 l_tax=0.0, l_returnflag="N", l_linestatus="O",
                 l_shipdate=pd.Timestamp("2024-01-01"))
            for i, (d, q) in enumerate(pairs)
        ]).to_parquet(tmp_path / "lineitem.parquet", index=False,
                      coerce_timestamps="us")
        pd.DataFrame([
            dict(p_partkey=1, p_name="p", p_brand="B1", p_type="t",
                 p_size=1, p_retailprice=1.0)
        ]).to_parquet(tmp_path / "part.parquet", index=False)
        got = fn(spark, str(tmp_path)).collect()[0]["spearman_rho"]
        ref = py_spearman(pairs)
        assert ref is not None and abs(got - ref) < 2e-6, (seed, got, ref)


def test_jarque_bera_matches_python_reference(spark, tmp_path):
    """stats_jarque_bera vs pure-Python population moments on a
    deterministic skewed fixture."""
    import hashlib

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["stats_jarque_bera"].fn
    cents = [
        1000 + int(hashlib.md5(f"x{i}".encode()).hexdigest()[:4], 16) % 700
        + (5000 if i % 37 == 0 else 0)
        for i in range(400)
    ]
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
             user_id=1, event_type="t", value=c / 100.0, props="{}")
        for i, c in enumerate(cents)
    ]).to_parquet(tmp_path / "events.parquet", index=False)
    n = len(cents)
    m1 = sum(cents) / n
    m2 = sum((c - m1) ** 2 for c in cents) / n
    m3 = sum((c - m1) ** 3 for c in cents) / n
    m4 = sum((c - m1) ** 4 for c in cents) / n
    skew = m3 / m2**1.5
    kurt = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + kurt**2 / 4)
    r = fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["skewness"] - skew) < 1e-4, (r["skewness"], skew)
    assert abs(r["kurtosis_excess"] - kurt) < 1e-4, (r["kurtosis_excess"], kurt)
    assert abs(r["jb_stat"] - jb) < 0.05, (r["jb_stat"], jb)


def test_anova_and_ccf_match_python_references(spark, tmp_path):
    """stats_anova_oneway and ts_cross_correlation vs direct NumPy /
    pure-Python computation on deterministic fixtures (third-
    implementation defense, as for spearman/jarque-bera)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    def h(tag, i, mod):
        return int(hashlib.md5(f"{tag}|{i}".encode()).hexdigest()[:8], 16) % mod

    # --- anova: 3 groups, deterministic cents -----------------------
    groups = {
        "a": [1000 + h("a", i, 400) for i in range(60)],
        "b": [1200 + h("b", i, 300) for i in range(50)],
        "c": [900 + h("c", i, 500) for i in range(70)],
    }
    rows, eid = [], 0
    for typ, cs in groups.items():
        for c in cs:
            rows.append(
                dict(event_id=eid, ts=pd.Timestamp("2024-01-01")
                     + pd.Timedelta(seconds=eid), user_id=1,
                     event_type=typ, value=c / 100.0, props="{}")
            )
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    allv = np.array([c for cs in groups.values() for c in cs], dtype=float)
    sst = ((allv - allv.mean()) ** 2).sum()
    ssb = sum(
        len(cs) * (np.mean(cs) - allv.mean()) ** 2 for cs in groups.values()
    )
    k, n = len(groups), len(allv)
    f_ref = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    eta_ref = ssb / sst
    r = registry.OPS["stats_anova_oneway"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["eta_squared"] - eta_ref) < 1e-5, (r["eta_squared"], eta_ref)
    assert abs(r["f_stat"] - f_ref) < 1e-3, (r["f_stat"], f_ref)

    # --- ccf: two series on a 12-day grid, zero-padded convention ---
    ca = [h("x", i, 7) + 1 for i in range(10)]  # days 0..9
    cb = [h("y", i, 5) + 1 for i in range(9)]   # days 1..9 (offset 1)
    rows, eid = [], 0
    for day, c in enumerate(ca):
        for _ in range(c):
            rows.append(dict(event_id=eid, ts=pd.Timestamp("2024-01-01")
                             + pd.Timedelta(days=day), user_id=1,
                             event_type="p", value=1.0, props="{}"))
            eid += 1
    for day, c in enumerate(cb):
        for _ in range(c):
            rows.append(dict(event_id=eid, ts=pd.Timestamp("2024-01-01")
                             + pd.Timedelta(days=day + 1), user_id=1,
                             event_type="q", value=1.0, props="{}"))
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    D = 10  # union span: days 0..9
    a = np.zeros(D + 3)
    b = np.zeros(D + 3)
    a[:10] = ca
    b[1:10] = cb
    out = registry.OPS["ts_cross_correlation"].fn(spark, str(tmp_path)).collect()
    got = {(r["type_a"], r["type_b"], r["lag_days"]): r["ccf"] for r in out}
    for lag in range(4):
        # reference on the zero-padded grid: corr(a_t, b_{t+lag}) with
        # means/variances over the D-day grid
        sab = float((a[:D] * b[lag:D + lag]).sum())
        sa, sb = a[:D].sum(), b[:D].sum()
        qa = float((a[:D] ** 2).sum())
        qb = float((b[:D] ** 2).sum())
        num = D * sab - sa * sb
        den = ((D * qa - sa * sa) * (D * qb - sb * sb)) ** 0.5
        ref = num / den
        assert abs(got[("p", "q", lag)] - ref) < 2e-6, (lag, got[("p", "q", lag)], ref)


def test_trend_h_burstiness_records_match_python_references(spark, tmp_path):
    """Cochran-Armitage z, Cohen's h, burstiness B, and the record-count
    z vs direct Python computation on one deterministic drifting fixture
    (third-implementation defense, completing the r12 suite)."""
    import hashlib
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    def h32(tag, i, mod):
        return int(hashlib.md5(f"{tag}|{i}".encode()).hexdigest()[:8], 16) % mod

    n = 200
    cents = [1000 + (i * 4 // n) * 150 + h32("c", i, 100) for i in range(n)]
    secs = []
    t = 0
    for i in range(n):
        t += (1 + h32("g", i, 50)) * 400  # span ~23 days, bursty gaps
        secs.append(t)
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s),
             user_id=1, event_type="d", value=c / 100.0, props="{}")
        for i, (s, c) in enumerate(zip(secs, cents))
    ]).to_parquet(tmp_path / "events.parquet", index=False)

    # --- shared era machinery in Python -----------------------------
    te = secs
    mid = (min(te) + max(te)) // 2
    order = sorted(range(n), key=lambda i: (cents[i], i))
    lower_median = cents[order[(n + 1) // 2 - 1]]
    above = [1 if c > lower_median else 0 for c in cents]

    # Cohen's h over the two halves
    era = [0 if s < mid else 1 for s in te]
    na = era.count(0); nb = era.count(1)
    xa = sum(a for a, e in zip(above, era) if e == 0)
    xb = sum(a for a, e in zip(above, era) if e == 1)
    h_ref = 2 * math.asin(math.sqrt(xb / nb)) - 2 * math.asin(math.sqrt(xa / na))
    rh = registry.OPS["stats_cohens_h"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(rh["cohens_h"] - h_ref) < 2e-6, (rh["cohens_h"], h_ref)

    # Cochran-Armitage over span quartiles
    mn, mx = min(te), max(te)
    q = [min((s - mn) * 4 // (mx - mn + 1), 3) for s in te]
    nq = [q.count(j) for j in range(4)]
    rq = [sum(a for a, qq in zip(above, q) if qq == j) for j in range(4)]
    N = sum(nq); R = sum(rq)
    T = sum(j * rq[j] for j in range(4))
    W = sum(j * nq[j] for j in range(4))
    W2 = sum(j * j * nq[j] for j in range(4))
    pbar = R / N
    z_ref = (T - pbar * W) / math.sqrt(pbar * (1 - pbar) * (W2 - W * W / N))
    rt = registry.OPS["stats_trend_proportions"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(rt["trend_z"] - z_ref) < 2e-6, (rt["trend_z"], z_ref)

    # Burstiness over inter-event gaps (population sd)
    gaps = [b - a for a, b in zip(te, te[1:])]
    mu = sum(gaps) / len(gaps)
    sd = math.sqrt(sum(g * g for g in gaps) / len(gaps) - mu * mu)
    b_ref = (sd - mu) / (sd + mu)
    rb = registry.OPS["ts_burstiness"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(rb["burstiness"] - b_ref) < 2e-6, (rb["burstiness"], b_ref)

    # Record count z over daily totals
    daily = {}
    epoch0 = int(pd.Timestamp("2024-01-01").timestamp())
    for s, c in zip(te, cents):
        daily.setdefault((epoch0 + s) // 86400, 0)
        daily[(epoch0 + s) // 86400] += c
    xs = [daily[d] for d in sorted(daily)]
    recs, mx_run = 0, None
    for x in xs:
        if mx_run is None or x > mx_run:
            recs += 1
            mx_run = x
    nd = len(xs)
    hn = sum(1.0 / k for k in range(1, nd + 1))
    hn2 = sum(1.0 / k / k for k in range(1, nd + 1))
    z_rec = (recs - hn) / math.sqrt(hn - hn2)
    rr = registry.OPS["ts_records_count"].fn(spark, str(tmp_path)).collect()[0]
    assert rr["n_records"] == recs and abs(rr["z"] - z_rec) < 2e-6, (rr, recs, z_rec)


def test_horvitz_thompson_matches_python_replay(spark):
    """sample_horvitz_thompson vs a pure-Python replay of the PPS
    systematic selection and the integral floor-form HH estimator on the
    real fixture — every intermediate (md5 order, cumulative weights,
    threshold crossings, per-term floors) recomputed outside both
    engines."""
    import hashlib

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    docs = pd.read_parquet(SF_DIR + "/documents.parquet")
    got = {
        r["source"]: r
        for r in registry.OPS["sample_horvitz_thompson"].fn(spark, SF_DIR).collect()
    }
    SCALE = 1_000_000
    for src, grp in docs.groupby("source"):
        rows = sorted(
            grp.itertuples(),
            key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id),
        )
        tot = sum(r.n_chars for r in rows)
        q = max(1, len(rows) // 10)
        cum, est_u, n_draws = 0, 0, 0
        true_tok = 0
        for r in rows:
            tok = len(r.text.split(" "))
            true_tok += tok
            cum += r.n_chars
            draws = (cum * q) // tot - ((cum - r.n_chars) * q) // tot
            if draws >= 1:
                n_draws += draws
                est_u += (draws * tok * tot * SCALE) // (q * r.n_chars)
        g = got[src]
        assert g["stratum_quota"] == q and g["n_draws"] == n_draws, (src, g)
        assert g["true_tokens"] == true_tok, (src, g)
        assert g["est_tokens"] == est_u // SCALE, (src, g)
        err_bp = (est_u - true_tok * SCALE) * 10000 // (true_tok * SCALE)
        # Python // floors while the engines' div truncates toward zero:
        # reconcile on the truncated form
        err_tr = int((est_u - true_tok * SCALE) * 10000 / (true_tok * SCALE))
        assert g["err_bp"] in (err_bp, err_tr), (src, g["err_bp"], err_bp, err_tr)


def test_era_suite_matches_python_references(spark, tmp_path):
    """The r11 era suite (welch, cohens_d, mood, mann-whitney, cliff,
    brown-forsythe) vs direct Python computation on one deterministic
    tie-heavy fixture — the r12 third-implementation defense applied
    retroactively to the statistics the r11 judge hand-verified, so the
    verification is now executable instead of archival."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    n = 200
    secs = [i * 60 for i in range(n)]
    cents = [
        (1000 if i < 100 else 1080) + (i % 7) * 50 for i in range(n)
    ]  # overlapping tie values across the era boundary
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s),
             user_id=1, event_type="t", value=c / 100.0, props="{}")
        for i, (s, c) in enumerate(zip(secs, cents))
    ]).to_parquet(tmp_path / "events.parquet", index=False)

    mid = (min(secs) + max(secs)) // 2
    era = [0 if s < mid else 1 for s in secs]
    a = [c for c, e in zip(cents, era) if e == 0]
    b = [c for c, e in zip(cents, era) if e == 1]
    na, nb = len(a), len(b)

    # welch + cohens_d
    ma, mb = sum(a) / na, sum(b) / nb
    qa, qb = sum(c * c for c in a), sum(c * c for c in b)
    va = (qa / na - ma * ma) / (na - 1)
    vb = (qb / nb - mb * mb) / (nb - 1)
    t_ref = (ma - mb) / math.sqrt(va + vb)
    ssa = qa - sum(a) ** 2 / na
    ssb = qb - sum(b) ** 2 / nb
    d_ref = (ma - mb) / math.sqrt((ssa + ssb) / (na + nb - 2))

    # pooled lower median (rank pick over (cents, event_id))
    pooled = sorted(range(n), key=lambda i: (cents[i], i))
    med = cents[pooled[(n + 1) // 2 - 1]]
    xa = sum(1 for c in a if c > med)
    xb = sum(1 for c in b if c > med)
    A, B2, C2, D = xa, xb, na - xa, nb - xb
    chi_ref = (
        (A + B2 + C2 + D)
        * (A * D - B2 * C2) ** 2
        / ((A + B2) * (C2 + D) * (A + C2) * (B2 + D))
    )

    # doubled average ranks over the pooled (cents, event_id) order
    rank_of = {idx: r + 1 for r, idx in enumerate(pooled)}
    by_val = {}
    for i in range(n):
        by_val.setdefault(cents[i], []).append(rank_of[i])
    r2 = {v: min(rs) + max(rs) for v, rs in by_val.items()}
    ra2 = sum(r2[cents[i]] for i in range(n) if era[i] == 0)
    tie3 = sum(len(by_val[cents[i]]) ** 2 - 1 for i in range(n))
    u2 = ra2 - na * (na + 1)
    z_ref = (u2 - na * nb) / (
        2
        * math.sqrt(
            na * nb / 12
            * ((na + nb + 1) - tie3 / ((na + nb) * (na + nb - 1)))
        )
    )
    delta_ref = (u2 - na * nb) / (na * nb)

    # brown-forsythe on |c - per-era lower median|
    def era_med(vals, ids):
        srt = sorted(range(len(vals)), key=lambda j: (vals[j], ids[j]))
        return vals[srt[(len(vals) + 1) // 2 - 1]]

    ida = [i for i in range(n) if era[i] == 0]
    idb = [i for i in range(n) if era[i] == 1]
    meda = era_med(a, ida)
    medb = era_med(b, idb)
    za = [abs(c - meda) for c in a]
    zb = [abs(c - medb) for c in b]
    sza, szb = sum(za), sum(zb)
    grand = (sza + szb) / (na + nb)
    between = na * (sza / na - grand) ** 2 + nb * (szb / nb - grand) ** 2
    within = (sum(z * z for z in za) - sza**2 / na) + (
        sum(z * z for z in zb) - szb**2 / nb
    )
    f_ref = (na + nb - 2) * between / within

    ops = registry.OPS
    got = {
        k: ops[k].fn(spark, str(tmp_path)).collect()[0]
        for k in [
            "stats_welch_ttest", "stats_cohens_d_eras", "stats_mood_median",
            "stats_mann_whitney", "stats_cliff_delta", "stats_brown_forsythe",
        ]
    }
    assert abs(got["stats_welch_ttest"]["t_stat"] - t_ref) < 2e-6
    assert abs(got["stats_cohens_d_eras"]["cohens_d"] - d_ref) < 2e-6
    assert abs(got["stats_mood_median"]["mood_chi2"] - chi_ref) < 2e-6
    assert got["stats_mann_whitney"]["u_doubled"] == u2
    assert abs(got["stats_mann_whitney"]["z_stat"] - z_ref) < 2e-6
    assert abs(got["stats_cliff_delta"]["cliff_delta"] - delta_ref) < 2e-6
    assert abs(got["stats_brown_forsythe"]["bf_stat"] - f_ref) < 2e-6


def test_kendall_tau_matches_python_pair_counting(spark, tmp_path):
    """stats_kendall_tau_binned vs the direct O(n²) pair-counting tau-b
    on tie-heavy fixtures — validates the bounded-contingency rewrite
    against the definition it optimizes."""
    import hashlib
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    fn = registry.OPS["stats_kendall_tau_binned"].fn

    def h(seed, i, mod):
        return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16) % mod

    for seed in range(3):
        pairs = [(h(seed, i, 5), 1 + h(seed * 3 + 1, i, 6)) for i in range(40)]
        pd.DataFrame([
            dict(l_orderkey=i, l_partkey=1, l_suppkey=1, l_linenumber=1,
                 l_quantity=float(q), l_extendedprice=1.0, l_discount=d / 100.0,
                 l_tax=0.0, l_returnflag="N", l_linestatus="O",
                 l_shipdate=pd.Timestamp("2024-01-01"))
            for i, (d, q) in enumerate(pairs)
        ]).to_parquet(tmp_path / "lineitem.parquet", index=False,
                      coerce_timestamps="us")
        pd.DataFrame([
            dict(p_partkey=1, p_name="p", p_brand="B1", p_type="t",
                 p_size=1, p_retailprice=1.0)
        ]).to_parquet(tmp_path / "part.parquet", index=False)
        nn = len(pairs)
        conc = disc = 0
        for i in range(nn):
            for j in range(i + 1, nn):
                dx = (pairs[i][0] > pairs[j][0]) - (pairs[i][0] < pairs[j][0])
                dy = (pairs[i][1] > pairs[j][1]) - (pairs[i][1] < pairs[j][1])
                if dx * dy > 0:
                    conc += 1
                elif dx * dy < 0:
                    disc += 1
        from collections import Counter

        tx = Counter(p[0] for p in pairs)
        ty = Counter(p[1] for p in pairs)
        n0 = nn * (nn - 1) / 2
        n1 = sum(t * (t - 1) / 2 for t in tx.values())
        n2 = sum(t * (t - 1) / 2 for t in ty.values())
        tau_ref = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        r = fn(spark, str(tmp_path)).collect()[0]
        assert r["n_concordant"] == conc and r["n_discordant"] == disc, (seed, r)
        assert abs(r["kendall_tau_b"] - tau_ref) < 2e-6, (seed, r, tau_ref)


def test_mk_mde_quantile_ci_match_python_references(spark, tmp_path):
    """ts_mann_kendall (tie-corrected, continuity-corrected z),
    stats_power_mde (welch SE × z-sum), and stats_quantile_ci
    (order-statistic rank picks) vs direct Python computation on one
    deterministic fixture — more of the judge-verified algebra made
    executable."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    n = 160
    cents = [(1000 if i < 80 else 1100) + (i % 5) * 40 for i in range(n)]
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=i // 4,
             seconds=(i % 4) * 600), user_id=1, event_type="t",
             value=c / 100.0, props="{}")
        for i, c in enumerate(cents)
    ]).to_parquet(tmp_path / "events.parquet", index=False)

    # --- mann-kendall over daily cents totals -----------------------
    daily = {}
    for i, c in enumerate(cents):
        daily.setdefault(i // 4, 0)
        daily[i // 4] += c
    xs = [daily[d] for d in sorted(daily)]
    nd = len(xs)
    S = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(nd) for j in range(i + 1, nd)
    )
    from collections import Counter

    tc = Counter(xs)
    var18 = nd * (nd - 1) * (2 * nd + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in tc.values()
    )
    zmk = ((S - 1) if S > 0 else (S + 1) if S < 0 else 0) / math.sqrt(var18 / 18)
    r = registry.OPS["ts_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]
    assert r["s_stat"] == S and r["var_s_x18"] == var18, (r, S, var18)
    assert abs(r["z_stat"] - zmk) < 2e-6, (r["z_stat"], zmk)

    # --- power/MDE over the era split -------------------------------
    secs = [(i // 4) * 86400 + (i % 4) * 600 for i in range(n)]
    mid = (min(secs) + max(secs)) // 2
    a = [c for s, c in zip(secs, cents) if s < mid]
    b = [c for s, c in zip(secs, cents) if s >= mid]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(c * c for c in a) / na - ma * ma) / (na - 1)
    vb = (sum(c * c for c in b) / nb - mb * mb) / (nb - 1)
    se = math.sqrt(va + vb)
    r = registry.OPS["stats_power_mde"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["se_cents"] - se) < 1e-3, (r["se_cents"], se)
    assert abs(r["mde_cents"] - (1.959964 + 0.841621) * se) < 1e-3, r

    # --- order-statistic median CI ----------------------------------
    srt = [c for c, _ in sorted(zip(cents, range(n)))]
    lo = max(1, math.floor((n - 1.959964 * math.sqrt(n)) / 2))
    hi = min(n, n + 1 - lo)
    med = srt[(n + 1) // 2 - 1]
    r = registry.OPS["stats_quantile_ci"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["median_cents"], r["ci_lo_cents"], r["ci_hi_cents"]) == (
        med, srt[lo - 1], srt[hi - 1],
    ), (r, med, srt[lo - 1], srt[hi - 1])


def test_ks_eras_matches_python_reference(spark, tmp_path):
    """stats_ks_eras vs a direct Python two-sample KS over a
    constructed two-priority orders fixture straddling the era cut —
    the scaled-integer D against the max-|ΔECDF| definition."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows, ok = [], 0
    data = {}
    for prio, shift in (("1-URGENT", 0), ("3-MEDIUM", 700)):
        vals_a = [10.00 + (i % 9) * 1.25 for i in range(40)]
        vals_b = [10.00 + shift / 100.0 + (i % 7) * 1.10 for i in range(35)]
        data[prio] = (vals_a, vals_b)
        for v in vals_a:
            rows.append(dict(o_orderkey=ok, o_custkey=1, o_orderstatus="F",
                             o_totalprice=v,
                             o_orderdate=pd.Timestamp("1995-06-01"),
                             o_orderpriority=prio)); ok += 1
        for v in vals_b:
            rows.append(dict(o_orderkey=ok, o_custkey=1, o_orderstatus="O",
                             o_totalprice=v,
                             o_orderdate=pd.Timestamp("1998-06-01"),
                             o_orderpriority=prio)); ok += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet", index=False,
                                  coerce_timestamps="us")
    got = {
        r["grp"]: r
        for r in registry.OPS["stats_ks_eras"].fn(spark, str(tmp_path)).collect()
    }
    for prio, (va, vb) in data.items():
        ca = [round(v * 100) for v in va]
        cb = [round(v * 100) for v in vb]
        n1, n2 = len(ca), len(cb)
        pts = sorted(set(ca) | set(cb))
        d_scaled = max(
            abs(n2 * sum(1 for c in ca if c <= p) - n1 * sum(1 for c in cb if c <= p))
            for p in pts
        )
        g = got[prio]
        assert (g["n1"], g["n2"], g["d_scaled"]) == (n1, n2, d_scaled), (prio, g)
        assert g["d_bp"] == d_scaled * 10000 // (n1 * n2), g


def test_theil_sen_runs_gini_match_python_references(spark, tmp_path):
    """ts_theil_sen (lower-median of pairwise slopes), stats_runs_test
    (Wald-Wolfowitz on daily diff signs), and agg_gini_concentration
    (customer-revenue Gini) vs direct Python computation."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    # --- events fixture: 20 daily values with a kink + flats ---------
    daily = [1000, 1040, 1040, 990, 1100, 1150, 1150, 1120, 1210, 1260,
             1230, 1310, 1310, 1290, 1400, 1450, 1420, 1500, 1500, 1560]
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
             user_id=1, event_type="t", value=c / 100.0, props="{}")
        for i, c in enumerate(daily)
    ]).to_parquet(tmp_path / "events.parquet", index=False)

    # theil-sen: lower median of pairwise slopes under (slope, d1, d2)
    nd = len(daily)
    slopes = sorted(
        ((daily[j] - daily[i]) / (j - i), i, j)
        for i in range(nd) for j in range(i + 1, nd)
    )
    sen_ref = slopes[(len(slopes) + 1) // 2 - 1][0]
    r = registry.OPS["ts_theil_sen"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] == len(slopes), r
    assert abs(r["sen_slope_cents_per_day"] - sen_ref) < 2e-6, (r, sen_ref)

    # runs test: signs of nonzero daily diffs
    sgns = [1 if b > a else -1 for a, b in zip(daily, daily[1:]) if b != a]
    n_pos = sgns.count(1); n_neg = sgns.count(-1); n = len(sgns)
    runs = 1 + sum(1 for a, b in zip(sgns, sgns[1:]) if a != b)
    mu = 1 + 2 * n_pos * n_neg / n
    var = 2 * n_pos * n_neg * (2 * n_pos * n_neg - n) / (n * n * (n - 1))
    z_ref = (runs - mu) / math.sqrt(var)
    rr = registry.OPS["stats_runs_test"].fn(spark, str(tmp_path)).collect()[0]
    assert (rr["n_pos"], rr["n_neg"], rr["n_runs"]) == (n_pos, n_neg, runs), rr
    assert abs(rr["z_score"] - z_ref) < 2e-6, (rr["z_score"], z_ref)

    # --- orders fixture: skewed customer revenue for the Gini --------
    cust_rev = {c: 100 * (c + 1) ** 3 for c in range(12)}  # heavy skew
    rows, ok = [], 0
    for c, cents in cust_rev.items():
        for part in (0.25, 0.75):  # two orders per customer
            rows.append(dict(o_orderkey=ok, o_custkey=c, o_orderstatus="F",
                             o_totalprice=cents * part / 100.0,
                             o_orderdate=pd.Timestamp("1996-01-01"),
                             o_orderpriority="1-URGENT")); ok += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet", index=False,
                                  coerce_timestamps="us")
    totals = sorted(
        (round(cents * 0.25) + round(cents * 0.75), c)
        for c, cents in cust_rev.items()
    )
    n = len(totals)
    tot = sum(t for t, _ in totals)
    weighted = sum((i + 1) * t for i, (t, _) in enumerate(totals))
    gini_ref = 2 * weighted / (n * tot) - (n + 1) / n
    rg = registry.OPS["agg_gini_concentration"].fn(spark, str(tmp_path)).collect()[0]
    assert rg["n"] == n and rg["total"] == tot, rg
    assert abs(rg["gini"] - gini_ref) < 2e-6, (rg["gini"], gini_ref)


def test_psi_and_cramers_v_match_python_references(spark, tmp_path):
    """stats_psi_stability (Laplace-smoothed per-bin PSI) and
    stats_cramers_v (fold-deterministic chi²) vs direct Python on
    constructed fixtures."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    # --- PSI: two shifted price eras over $50k bins ------------------
    rows, ok = [], 0
    prices_a = [20000 + (i % 8) * 40000 for i in range(60)]   # era A
    prices_b = [60000 + (i % 6) * 50000 for i in range(45)]   # era B (shifted)
    for p, dt in [(p, "1996-03-01") for p in prices_a] + [
        (p, "1998-09-01") for p in prices_b
    ]:
        rows.append(dict(o_orderkey=ok, o_custkey=1, o_orderstatus="F",
                         o_totalprice=float(p), o_orderdate=pd.Timestamp(dt),
                         o_orderpriority="1-URGENT")); ok += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet", index=False,
                                  coerce_timestamps="us")
    bins = {}
    for p in prices_a:
        bins.setdefault(p // 50000, [0, 0])[0] += 1
    for p in prices_b:
        bins.setdefault(p // 50000, [0, 0])[1] += 1
    n_a, n_b, nbins = len(prices_a), len(prices_b), len(bins)
    got = {
        r["bin"]: r
        for r in registry.OPS["stats_psi_stability"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(bins)
    for bn, (ca, cb) in bins.items():
        p = (ca + 1) / (n_a + nbins)
        q = (cb + 1) / (n_b + nbins)
        ref = (p - q) * math.log(p / q)
        g = got[bn]
        assert (g["c_a"], g["c_b"]) == (ca, cb), (bn, g)
        assert abs(g["psi_contrib"] - ref) < 2e-6, (bn, g["psi_contrib"], ref)

    # --- Cramér's V over (type × day-part) ---------------------------
    rows = []
    eid = 0
    for typ, hshift in (("x", 0), ("y", 6), ("z", 12)):
        for i in range(70):
            rows.append(dict(event_id=eid,
                             ts=pd.Timestamp("2024-01-01")
                             + pd.Timedelta(hours=(hshift + i * 5) % 24,
                                            days=i),
                             user_id=1, event_type=typ, value=1.0, props="{}"))
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    cells = {}
    for r0 in rows:
        key = (r0["event_type"], r0["ts"].hour // 6)
        cells[key] = cells.get(key, 0) + 1
    N = sum(cells.values())
    ra = {}
    cb2 = {}
    for (a, b), obs in cells.items():
        ra[a] = ra.get(a, 0) + obs
        cb2[b] = cb2.get(b, 0) + obs
    chi2 = sum(
        (obs * N - ra[a] * cb2[b]) ** 2 / (ra[a] * cb2[b] * N)
        for (a, b), obs in cells.items()
    )
    dfm = min(len(ra) - 1, len(cb2) - 1)
    v_ref = math.sqrt(chi2 / (N * dfm))
    rc = registry.OPS["stats_cramers_v"].fn(spark, str(tmp_path)).collect()[0]
    assert rc["n_total"] == N and rc["df_min"] == dfm, rc
    assert abs(rc["chi2"] - chi2) < 1e-4, (rc["chi2"], chi2)
    assert abs(rc["cramers_v"] - v_ref) < 1e-5, (rc["cramers_v"], v_ref)


def test_acf_and_ljung_box_match_python_references(spark, tmp_path):
    """ts_autocorr (lag-pair Pearson in integral bp) and stats_ljung_box
    (global-mean ACF → Q) vs direct Python on a short deterministic
    series with real autocorrelation."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    cents = []
    x = 1000
    for i in range(60):
        x = x + (37 if i % 4 < 2 else -35) + (i % 3) * 4  # sticky up/down
        cents.append(x)
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
             user_id=1, event_type="t", value=c / 100.0, props="{}")
        for i, c in enumerate(cents)
    ]).to_parquet(tmp_path / "events.parquet", index=False)

    n = len(cents)
    # ts_autocorr: plain Pearson over the lag-k pair set, floored bp
    got = {
        r["lag"]: r
        for r in registry.OPS["ts_autocorr"].fn(spark, str(tmp_path)).collect()
    }
    for k in (1, 2, 3):
        xs = cents[:-k]
        ys = cents[k:]
        m = len(xs)
        num = m * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        den = math.sqrt(m * sum(a * a for a in xs) - sum(xs) ** 2) * math.sqrt(
            m * sum(b * b for b in ys) - sum(ys) ** 2
        )
        ref_bp = math.floor(num * 10000 / den)
        assert got[k]["n_pairs"] == m and got[k]["r_bp"] == ref_bp, (k, got[k], ref_bp)

    # ljung-box: global-mean ACF and the Q statistic
    xbar = sum(cents) / n
    denom = sum((c - xbar) ** 2 for c in cents)
    q = 0.0
    for k in (1, 2, 3):
        rho = sum(
            (cents[t] - xbar) * (cents[t + k] - xbar) for t in range(n - k)
        ) / denom
        q += rho * rho / (n - k)
    q_ref = n * (n + 2) * q
    r = registry.OPS["stats_ljung_box"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n"] == n and abs(r["q_stat"] - q_ref) < 1e-3, (r, q_ref)


def test_zipf_alpha_matches_python_reference(spark, tmp_path):
    """text_zipf_alpha vs a direct Python log-log OLS over the same
    (count desc, token) ranking on a constructed skewed vocabulary."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    # vocabulary with a clean power-ish profile + ties
    words = []
    freq = {"alpha": 64, "beta": 32, "gamma": 16, "delta": 16, "eps": 8,
            "zeta": 6, "eta": 4, "theta": 3, "iota": 2, "kappa": 1}
    for w, c in freq.items():
        words += [w] * c
    text = " ".join(words)
    pd.DataFrame([
        dict(doc_id=1, text=text, lang="en", source="s0", n_chars=len(text))
    ]).to_parquet(tmp_path / "documents.parquet", index=False)

    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(r + 1) for r in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    slope_ref = (n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        n * sum(a * a for a in xs) - sum(xs) ** 2
    )
    r = registry.OPS["text_zipf_alpha"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_ranks"] == n and r["top_count"] == 64, r
    assert abs(r["zipf_slope"] - slope_ref) < 2e-6, (r["zipf_slope"], slope_ref)


def test_dispersion_and_trimmed_mean_match_python_references(spark, tmp_path):
    """ts_dispersion_index (daily-count variance/mean + chi²-approx
    verdict) and stats_trimmed_mean (10% rank trim / winsorize) vs
    direct Python on deterministic fixtures."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    # dispersion: bursty daily counts (2 quiet days then a spike)
    counts = [(3 if i % 3 else 24) for i in range(30)]
    rows, eid = [], 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(dict(event_id=eid,
                             ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=day),
                             user_id=1, event_type="t", value=1.0, props="{}"))
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    n = len(counts)
    s = sum(counts)
    q = sum(c * c for c in counts)
    var = (q - s * s / n) / (n - 1)
    mean = s / n
    d_ref = var / mean
    thresh = 1 + 1.644854 * math.sqrt(2 / (n - 1))
    r = registry.OPS["ts_dispersion_index"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == n and abs(r["dispersion_index"] - d_ref) < 2e-6, (r, d_ref)
    assert bool(r["overdispersed"]) == (round(d_ref, 6) > thresh), r

    # trimmed/winsorized mean: tail-heavy values, ties at the cut
    cents = sorted(
        [900] * 5 + [1000 + 7 * i for i in range(40)] + [5000, 9000, 12000]
    )
    pd.DataFrame([
        dict(event_id=i, ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
             user_id=1, event_type="t", value=c / 100.0, props="{}")
        for i, c in enumerate(cents)
    ]).to_parquet(tmp_path / "events.parquet", index=False)
    m = len(cents)
    k = m * 1000 // 10000
    core = cents[k : m - k]
    lo, hi = cents[k], cents[m - k - 1]
    trimmed = sum(core) / len(core) / 100
    win = (sum(core) + k * lo + k * hi) / m / 100
    r = registry.OPS["stats_trimmed_mean"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_trim_each"] == k, r
    assert abs(r["trimmed_mean"] - trimmed) < 2e-6, (r["trimmed_mean"], trimmed)
    assert abs(r["winsorized_mean"] - win) < 2e-6, (r["winsorized_mean"], win)


def test_capture_recapture_matches_python_replay(spark, tmp_path):
    """stats_capture_recapture vs a pure-Python replay of the md5 doc
    split and the Chapman estimator on a constructed vocabulary with
    known half overlaps."""
    import hashlib

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    docs = []
    vocab = [f"w{i:03d}" for i in range(60)]
    for d in range(24):
        toks = [vocab[(d * 7 + j) % 60] for j in range(18)]  # overlapping slices
        docs.append(dict(doc_id=d, text=" ".join(toks), lang="en",
                         source="s0", n_chars=len(" ".join(toks))))
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet", index=False)

    seen_a, seen_b = set(), set()
    for d in docs:
        half_a = hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[0] in "01234567"
        for t in set(d["text"].split(" ")):
            (seen_a if half_a else seen_b).add(t)
    n_a, n_b = len(seen_a), len(seen_b)
    n_both = len(seen_a & seen_b)
    n_true = len(seen_a | seen_b)
    est = (n_a + 1) * (n_b + 1) // (n_both + 1) - 1
    r = registry.OPS["stats_capture_recapture"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_both"], r["n_true"]) == (
        n_a, n_b, n_both, n_true,
    ), r
    assert r["est_total"] == est, (r["est_total"], est)
    assert r["err_bp"] == (est - n_true) * 10000 // n_true, r


def test_srm_and_chi2_cells_match_python_replay(spark, tmp_path):
    """stats_srm_check (md5 arm assignment + 50/50 chi²) and
    stats_chi2_independence (per-cell N-scaled integral contributions)
    vs pure-Python replays."""
    import hashlib

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    for i in range(300):
        rows.append(dict(event_id=i,
                         ts=pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=(i * 5) % 24, days=i % 9),
                         user_id=i % 97, event_type="t" if i % 3 else "u",
                         value=1.0, props="{}"))
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)

    # srm: replay the md5 arm hash per event row
    arms = {}
    for r0 in rows:
        h8 = hashlib.md5(f"srm:{r0['user_id']}".encode()).hexdigest()[:8]
        arm = int(h8, 16) % 2
        k = r0["event_type"]
        arms.setdefault(k, [0, 0])[arm] += 1
    got = {
        r["event_type"]: r
        for r in registry.OPS["stats_srm_check"].fn(spark, str(tmp_path)).collect()
    }
    for k, (na, nb) in arms.items():
        g = got[k]
        chi = round((na - nb) ** 2 / (na + nb), 6)
        assert (g["n_arm_a"], g["n_arm_b"]) == (na, nb), (k, g)
        assert g["chi2_stat"] == chi and bool(g["srm_detected"]) == (chi > 3.841459)

    # chi2 independence: per (type, day-part) cell contributions
    cells = {}
    for r0 in rows:
        key = (r0["event_type"], r0["ts"].hour // 6)
        cells[key] = cells.get(key, 0) + 1
    N = sum(cells.values())
    ra, cb = {}, {}
    for (a, b), obs in cells.items():
        ra[a] = ra.get(a, 0) + obs
        cb[b] = cb.get(b, 0) + obs
    got = {
        (r["a"], r["b"]): r
        for r in registry.OPS["stats_chi2_independence"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(cells)
    for (a, b), obs in cells.items():
        g = got[(a, b)]
        exp_floor = ra[a] * cb[b] // N
        scaled = (obs * N - ra[a] * cb[b]) ** 2 // (ra[a] * cb[b] * N)
        assert (g["obs"], g["expected_floor"], g["chi2_n_scaled"]) == (
            obs, exp_floor, scaled,
        ), (a, b, g)


# ---------------------------------------------------------------------------
# Round-13 third-implementation references (kruskal/theil/lambda/mcnemar/
# wilcoxon/page-hinkley/sampen/hurst/hll) — pure-Python replays on
# deterministic fixtures, independent of both Spark and DuckDB.
# ---------------------------------------------------------------------------


def _md5i(tag, mod):
    import hashlib

    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % mod


def _write_events(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)


def test_kruskal_wallis_matches_python_reference(spark, tmp_path):
    """stats_kruskal_wallis vs a textbook average-rank H with tie
    correction (the op carries doubled min+max ranks; avg ranks here —
    algebraically identical, independently coded)."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    groups = {"a": [], "b": [], "c": []}
    rows = []
    i = 0
    for g in groups:
        for k in range(120):
            c = 1000 + _md5i(f"kw|{g}|{k}", 40) * 10  # heavy ties
            if g == "c":
                c += 60  # shifted group
            groups[g].append(c)
            rows.append(
                dict(
                    event_id=i,
                    ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                    user_id=1,
                    event_type=g,
                    value=c / 100.0,
                    props="{}",
                )
            )
            i += 1
    _write_events(tmp_path, rows)
    pooled = sorted(
        (v, g, j) for g, vs in groups.items() for j, v in enumerate(vs)
    )
    n = len(pooled)
    # average ranks with ties
    ranks = {}
    pos = 0
    while pos < n:
        q = pos
        while q < n and pooled[q][0] == pooled[pos][0]:
            q += 1
        avg = (pos + 1 + q) / 2
        for t in range(pos, q):
            ranks[(pooled[t][1], pooled[t][2])] = avg
        pos = q
    rsum = {g: sum(ranks[(g, j)] for j in range(len(vs))) for g, vs in groups.items()}
    h = 12 / (n * (n + 1)) * sum(
        rsum[g] ** 2 / len(vs) for g, vs in groups.items()
    ) - 3 * (n + 1)
    ties = {}
    for v, _, _ in pooled:
        ties[v] = ties.get(v, 0) + 1
    corr = 1 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    expected = h / corr
    r = registry.OPS["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_total"] == n and r["k_groups"] == 3
    assert abs(r["h_stat"] - expected) < 1e-4, (r["h_stat"], expected)


def test_theil_u_and_gk_lambda_match_python_reference(spark, tmp_path):
    """stats_theil_u and stats_gk_lambda vs direct contingency-table
    computation on a deterministic (lang, source) fixture."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    cells = {}
    for i in range(600):
        lang = ["en", "de", "fr"][_md5i(f"tl|{i}", 3)]
        # source correlated with lang: refine en into two sources
        if lang == "en":
            src = ["web", "wiki"][_md5i(f"ts|{i}", 2)]
        else:
            src = {"de": "news", "fr": "books"}[lang]
        cells[(lang, src)] = cells.get((lang, src), 0) + 1
        rows.append(
            dict(doc_id=i, text="w x", lang=lang, source=src, n_chars=3)
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    n = sum(cells.values())

    def ent(counts):
        return -sum(c / n * math.log(c / n) for c in counts)

    la = {}
    sb = {}
    for (a, b), c in cells.items():
        la[a] = la.get(a, 0) + c
        sb[b] = sb.get(b, 0) + c
    h_a, h_b, h_ab = ent(la.values()), ent(sb.values()), ent(cells.values())
    u_ab = (h_a + h_b - h_ab) / h_a
    u_ba = (h_a + h_b - h_ab) / h_b
    r = registry.OPS["stats_theil_u"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["u_lang_given_source"] - u_ab) < 1e-5
    assert abs(r["u_source_given_lang"] - u_ba) < 1e-5

    rowmax = sum(max(c for (a, b2), c in cells.items() if b2 == b) for b in sb)
    colmax = sum(max(c for (a2, b), c in cells.items() if a2 == a) for a in la)
    lam_ab = (rowmax - max(la.values())) * 10000 // (n - max(la.values()))
    lam_ba = (colmax - max(sb.values())) * 10000 // (n - max(sb.values()))
    g = registry.OPS["stats_gk_lambda"].fn(spark, str(tmp_path)).collect()[0]
    assert g["lambda_lang_given_source_bp"] == lam_ab
    assert g["lambda_source_given_lang_bp"] == lam_ba


def test_mcnemar_and_wilcoxon_match_python_reference(spark, tmp_path):
    """stats_mcnemar and stats_wilcoxon_signed_rank vs direct paired
    computation: one event type, users with known era activity."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    i = 0
    per_user = {}
    # era A: seconds 0..999, era B: 1000..1999 (mid = ~1000)
    for u in range(80):
        ca = _md5i(f"wa|{u}", 2000) if u % 5 != 0 else 0  # some A-silent
        cb = _md5i(f"wb|{u}", 2000) if u % 7 != 0 else 0  # some B-silent
        per_user[u] = (ca, cb)
        for era, c in ((0, ca), (1, cb)):
            if c:
                rows.append(
                    dict(
                        event_id=i,
                        ts=pd.Timestamp("2024-01-01")
                        + pd.Timedelta(seconds=era * 1000 + u),
                        user_id=u,
                        event_type="t",
                        value=c / 100.0,
                        props="{}",
                    )
                )
                i += 1
    # anchor rows pinning the span so mid splits at 1000 exactly
    rows.append(dict(event_id=i, ts=pd.Timestamp("2024-01-01"),
                     user_id=999, event_type="t", value=1.0, props="{}"))
    rows.append(dict(event_id=i + 1,
                     ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=2000),
                     user_id=999, event_type="t", value=1.0, props="{}"))
    per_user[999] = (100, 100)
    _write_events(tmp_path, rows)

    b10 = sum(1 for ca, cb in per_user.values() if ca and not cb)
    b01 = sum(1 for ca, cb in per_user.values() if cb and not ca)
    chi2 = (b10 - b01) ** 2 / (b10 + b01)
    r = registry.OPS["stats_mcnemar"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_active_a_only"] == b10 and r["n_active_b_only"] == b01
    assert abs(r["chi2"] - chi2) < 1e-6

    diffs = [cb - ca for ca, cb in per_user.values() if cb != ca]
    diffs_abs = sorted((abs(d), d) for d in diffs)
    nW = len(diffs)
    # average ranks of |d| with ties
    wplus = 0.0
    pos = 0
    tie3 = 0
    while pos < nW:
        q = pos
        while q < nW and diffs_abs[q][0] == diffs_abs[pos][0]:
            q += 1
        avg = (pos + 1 + q) / 2
        t = q - pos
        tie3 += t**3 - t
        for k in range(pos, q):
            if diffs_abs[k][1] > 0:
                wplus += avg
        pos = q
    z = (wplus - nW * (nW + 1) / 4) / math.sqrt(
        nW * (nW + 1) * (2 * nW + 1) / 24 - tie3 / 48
    )
    w = registry.OPS["stats_wilcoxon_signed_rank"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert w["n_nonzero"] == nW
    assert abs(w["z_stat"] - z) < 1e-4, (w["z_stat"], z)


def test_page_hinkley_matches_python_reference(spark, tmp_path):
    """ts_page_hinkley vs a sequential pure-Python replay with a
    planted level shift."""
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    days = [1000 + _md5i(f"ph|{k}", 200) for k in range(40)]
    days += [2500 + _md5i(f"ph2|{k}", 200) for k in range(40)]  # shift up
    rows = [
        dict(
            event_id=k,
            ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=k),
            user_id=1,
            event_type="t",
            value=c / 100.0,
            props="{}",
        )
        for k, c in enumerate(days)
    ]
    _write_events(tmp_path, rows)
    i = s = g = gmin = dmax = 0.0
    darg = 1.0
    g2 = gmin2 = dmax2 = 0.0
    darg2 = 1.0
    for x in [float(c) for c in days]:
        i += 1
        s += x
        mean = s / i
        g += x - mean
        gmin = min(gmin, g)
        d = g - gmin
        if d > dmax:
            dmax, darg = d, i
        g2 += mean - x
        gmin2 = min(gmin2, g2)
        d2 = g2 - gmin2
        if d2 > dmax2:
            dmax2, darg2 = d2, i
    r = registry.OPS["ts_page_hinkley"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == len(days)
    assert abs(r["ph_drift_inc"] - dmax) < 1e-3
    assert r["drift_inc_day"] == int(darg)
    assert abs(r["ph_drift_dec"] - dmax2) < 1e-3
    # the planted upward shift must dominate and be detected after day 40
    assert r["ph_drift_inc"] > r["ph_drift_dec"]
    assert r["drift_inc_day"] > 40


def test_sample_entropy_matches_python_reference(spark, tmp_path):
    """ts_sample_entropy vs a direct O(n^2) template-matching replay."""
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    days = [1500 + _md5i(f"se|{k}", 300) for k in range(60)]
    rows = [
        dict(
            event_id=k,
            ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=k),
            user_id=1,
            event_type="t",
            value=c / 100.0,
            props="{}",
        )
        for k, c in enumerate(days)
    ]
    _write_events(tmp_path, rows)
    n = len(days)
    mu = sum(days) / n
    var = sum(c * c for c in days) / n - mu * mu
    r_c = math.floor(0.2 * math.sqrt(var) + 0.5)
    t = [(days[k], days[k + 1], days[k + 2]) for k in range(n - 2)]
    b = a = 0
    for x in range(len(t)):
        for y in range(x + 1, len(t)):
            if max(abs(t[x][0] - t[y][0]), abs(t[x][1] - t[y][1])) <= r_c:
                b += 1
                if abs(t[x][2] - t[y][2]) <= r_c:
                    a += 1
    r = registry.OPS["ts_sample_entropy"].fn(spark, str(tmp_path)).collect()[0]
    assert r["r_cents"] == r_c
    assert r["matches_m2"] == b and r["matches_m3"] == a
    assert abs(r["sample_entropy"] - (-math.log(a / b))) < 1e-5


def test_hurst_rs_matches_python_reference(spark, tmp_path):
    """ts_hurst_rs vs a direct numpy block R/S computation (without the
    op's 1e-6 cross-block quantization — tolerance covers it)."""
    import math

    import numpy as np
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    days = [2000 + _md5i(f"hu|{k}", 500) for k in range(128)]
    rows = [
        dict(
            event_id=k,
            ts=pd.Timestamp("2024-01-01") + pd.Timedelta(days=k),
            user_id=1,
            event_type="t",
            value=c / 100.0,
            props="{}",
        )
        for k, c in enumerate(days)
    ]
    _write_events(tmp_path, rows)
    x = np.array(days, dtype=float)
    pts = []
    for sz in (8, 16, 32, 64):
        rss = []
        for b in range(len(x) // sz):
            blk = x[b * sz : (b + 1) * sz]
            dev = np.cumsum(blk) - np.arange(1, sz + 1) * blk.mean()
            s = math.sqrt((blk**2).mean() - blk.mean() ** 2)
            if s > 0:
                rss.append((dev.max() - dev.min()) / s)
        if rss:
            pts.append((math.log(sz), math.log(sum(rss) / len(rss))))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    r = registry.OPS["ts_hurst_rs"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_scales"] == k
    assert abs(r["hurst"] - slope) < 1e-3, (r["hurst"], slope)
    assert 0.0 < r["hurst"] < 1.0


def test_hll_manual_matches_python_reference(spark, tmp_path):
    """agg_hll_manual vs an independent hashlib/bit_length HLL replay,
    and the estimate must sit within the theoretical error band."""
    import hashlib
    import math

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    users = [_md5i(f"hl|{k}", 100_000) for k in range(3000)]
    rows = [
        dict(
            event_id=k,
            ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=k),
            user_id=u,
            event_type="t",
            value=1.0,
            props="{}",
        )
        for k, u in enumerate(users)
    ]
    _write_events(tmp_path, rows)
    regs = {}
    for u in set(users):
        h = hashlib.md5(str(u).encode()).hexdigest()
        bucket = int(h[:2], 16)
        s = int(h[2:16], 16)
        rho = 57 - s.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    zeros = 256 - len(regs)
    zsum = zeros + sum(2.0 ** -m for m in sorted(regs.values()))
    alpha_m2 = 0.7213 / (1 + 1.079 / 256) * 256 * 256
    e = alpha_m2 / zsum
    if e <= 2.5 * 256 and zeros > 0:
        e = 256 * math.log(256 / zeros)
    exact = len(set(users))
    r = registry.OPS["agg_hll_manual"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_exact"] == exact
    assert abs(r["hll_estimate"] - e) < 1e-2, (r["hll_estimate"], e)
    # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
    assert abs(e - exact) / exact < 0.195


def test_permutation_shift_matches_python_reference(spark, tmp_path):
    """stats_permutation_shift vs an independent hashlib replay of the
    md5 sign-flip replicas on a deterministic paired fixture."""
    import hashlib

    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    diffs = {}
    i = 0
    for u in range(60):
        ca = 500 + _md5i(f"pa|{u}", 900)
        cb = 700 + _md5i(f"pb|{u}", 900)  # planted upward shift
        diffs[u] = cb - ca
        for era, c in ((0, ca), (1, cb)):
            rows.append(
                dict(
                    event_id=i,
                    ts=pd.Timestamp("2024-01-01")
                    + pd.Timedelta(seconds=era * 1000 + u),
                    user_id=u,
                    event_type="t",
                    value=c / 100.0,
                    props="{}",
                )
            )
            i += 1
    rows.append(dict(event_id=i, ts=pd.Timestamp("2024-01-01"),
                     user_id=999, event_type="t", value=1.0, props="{}"))
    rows.append(dict(event_id=i + 1,
                     ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=2000),
                     user_id=999, event_type="t", value=1.0, props="{}"))
    diffs[999] = 0  # zero diff -> dropped
    _write_events(tmp_path, rows)

    nz = {u: d for u, d in diffs.items() if d != 0}
    t_obs = sum(nz.values())
    n_extreme = 0
    for b in range(64):
        tb = 0
        for u, d in nz.items():
            hx = hashlib.md5(f"{u}_{b}".encode()).hexdigest()
            tb += d if hx[0] < "8" else -d
        if abs(tb) >= abs(t_obs):
            n_extreme += 1
    r = registry.OPS["stats_permutation_shift"].fn(spark, str(tmp_path)).collect()
    row = next(x for x in r if x["event_type"] == "t")
    assert row["n_users"] == len(nz)
    assert row["t_obs_cents"] == t_obs
    assert row["n_extreme"] == n_extreme
    assert row["p_value_milli"] == (1 + n_extreme) * 1000 // 65
    # the planted +200-cent mean shift over 60 users must be significant
    assert row["p_value_milli"] <= 50


def test_ego_density_consistent_with_triangles_and_degrees(spark):
    """graph_ego_density must agree row-for-row with the independently
    computed graph_triangle_count and graph_degree_distribution ops on
    the shared artifact (cross-operator identity, not a replay)."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    sf = "/root/testdata/sf0.01"
    ego = {r["user_id"]: r for r in registry.OPS["graph_ego_density"].fn(spark, sf).collect()}
    tri = {r["user_id"]: r["triangles"] for r in registry.OPS["graph_triangle_count"].fn(spark, sf).collect()}
    assert ego, "fixture graph should have degree>=2 nodes"
    for uid, r in ego.items():
        assert r["triangles"] == tri.get(uid, 0), uid
        d = r["n_neighbors"]
        assert r["ego_density_bp"] == r["triangles"] * 2 * 10000 // (d * (d - 1))
        assert 0 <= r["ego_density_bp"] <= 10000


def test_distributed_rank_is_exact_permutation_under_adversarial_keys(spark):
    """scale_patterns.distributed_rank invariants, directly (the r13
    flakiness class): for constant keys, two-value keys, heavy-skew
    keys, and distinct keys — with and without partition_cols — the
    produced rk must be EXACTLY the ranks row_number would assign under
    the total order: a permutation of 1..n per group, matching a
    driver-side sort. Run twice per shape (the failure mode was
    plan-to-plan divergence)."""
    from connor_fun_streamproducer_spark.operators.scale_patterns import (
        distributed_rank,
    )

    def check(rows, partition_cols):
        df = spark.createDataFrame(rows, "g string, k bigint, id bigint")
        for _ in range(2):
            got = {
                (r["g"], r["id"]): r["rk"]
                for r in distributed_rank(
                    df, "k", ["id"], partition_cols=partition_cols
                ).collect()
            }
            groups = {}
            for g, k, i in rows:
                groups.setdefault(g if partition_cols else "", []).append((k, i, g))
            for members in groups.values():
                members.sort()
                for rank, (k, i, g) in enumerate(members, start=1):
                    assert got[(g, i)] == rank, (g, i, got[(g, i)], rank)

    import hashlib

    def h(t, m):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % m

    n = 500
    shapes = {
        "constant": [("a", 7, i) for i in range(n)],
        "two-values": [("a", h(f"t|{i}", 2), i) for i in range(n)],
        "heavy-skew": [("a", 0 if i % 10 else h(f"s|{i}", 1000), i) for i in range(n)],
        "distinct": [("a", h(f"d|{i}", 10**9) * n + i, i) for i in range(n)],
    }
    for rows in shapes.values():
        check(rows, None)
    mixed = [
        (["x", "y", "z"][h(f"g|{i}", 3)], h(f"k|{i}", 5), i) for i in range(n)
    ]
    check(mixed, ["g"])


def test_pca_degenerate_and_tiny_fixtures_cross_engine(spark, tmp_path):
    """embedding_pca_project on a CONSTANT-embedding corpus (all-zero
    covariance — the r13 guard: the power iteration collapses to the
    zero direction instead of a 0/0 crash, projecting every doc to 0)
    and on a 3-vector corpus, each compared directly against the DuckDB
    oracle — the hash gate exercised on spectra the fixtures never
    produce."""
    import duckdb
    import pandas as pd
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    o = registry.OPS["embedding_pca_project"]

    def run(dirname, vecs):
        d = tmp_path / dirname
        d.mkdir()
        pd.DataFrame(
            [
                dict(vec_id=i, embedding=v, label=i % 2)
                for i, v in enumerate(vecs)
            ]
        ).to_parquet(d / "embeddings.parquet", index=False)
        got = sorted(
            (r["vec_id"], r["label"], r["pc1"], r["pc2"])
            for r in o.fn(spark, str(d)).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        want = sorted(map(tuple, con.sql(o.oracle).fetchall()))
        assert got == want, (dirname, got[:3], want[:3])
        return got

    const = run("const", [[0.25] * 16 for _ in range(6)])
    assert all(r[2] == 0.0 and r[3] == 0.0 for r in const)

    tiny = run(
        "tiny",
        [
            [0.1 * ((i * 7 + j * 3) % 11 - 5) for j in range(16)]
            for i in range(3)
        ],
    )
    assert len(tiny) == 3


def _write_documents(tmp_path, rows):
    import pandas as pd

    df = pd.DataFrame(rows)
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["text"].str.len().astype("int64")
    df[["doc_id", "text", "lang", "source", "n_chars"]].to_parquet(
        tmp_path / "documents.parquet", index=False
    )


def test_dunn_posthoc_matches_python_reference(spark, tmp_path):
    """stats_dunn_posthoc vs a textbook average-rank Dunn z with tie
    correction (the op carries doubled min+max ranks; plain average
    ranks here — algebraically identical, independently coded)."""
    import math

    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    groups = {"a": [], "b": [], "c": []}
    rows = []
    i = 0
    for g in groups:
        for k in range(120):
            c = 1000 + _md5i(f"dunn|{g}|{k}", 40) * 10  # heavy ties
            if g == "c":
                c += 120  # shifted group: at least one pair should reject
            groups[g].append(c)
            rows.append(
                dict(
                    event_id=i,
                    ts=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                    user_id=1,
                    event_type=g,
                    value=c / 100.0,
                    props="{}",
                )
            )
            i += 1
    _write_events(tmp_path, rows)
    pooled = sorted((v, g, j) for g, vs in groups.items() for j, v in enumerate(vs))
    n = len(pooled)
    ranks = {}
    pos = 0
    while pos < n:
        q = pos
        while q < n and pooled[q][0] == pooled[pos][0]:
            q += 1
        avg = (pos + 1 + q) / 2
        for t in range(pos, q):
            ranks[(pooled[t][1], pooled[t][2])] = avg
        pos = q
    ties = {}
    for v, _, _ in pooled:
        ties[v] = ties.get(v, 0) + 1
    tie_term = sum(t**3 - t for t in ties.values())
    mean_rank = {
        g: sum(ranks[(g, j)] for j in range(len(vs))) / len(vs)
        for g, vs in groups.items()
    }
    base = n * (n + 1) / 12 - tie_term / (12 * (n - 1))
    expected = {}
    names = sorted(groups)
    for x in range(len(names)):
        for y in range(x + 1, len(names)):
            ga, gb = names[x], names[y]
            z = (mean_rank[ga] - mean_rank[gb]) / math.sqrt(
                base * (1 / len(groups[ga]) + 1 / len(groups[gb]))
            )
            expected[(ga, gb)] = z
    out = {
        (r["type_a"], r["type_b"]): r
        for r in registry.OPS["stats_dunn_posthoc"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(expected)
    crit = 2.39398  # m = 3 pairs, two-sided Bonferroni alpha = 0.05
    any_reject = False
    for pair, z in expected.items():
        got = out[pair]
        assert abs(got["z_dunn"] - z) < 1e-4, (pair, got["z_dunn"], z)
        assert got["reject_bonferroni"] == (abs(round(z, 6)) > crit), pair
        any_reject = any_reject or got["reject_bonferroni"]
    assert any_reject, "shifted group c should reject at least one pair"


def test_vocab_chao1_matches_python_replay(spark, tmp_path):
    """text_vocab_chao1 vs direct abundance-profile computation on a
    fixture with controlled hapax/doubleton counts."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    # source s0: words w0..w9 with abundance k+1 (1,2,3,...,10)
    # source s1: five hapaxes, zero doubletons (f2+1 smoothing path)
    rows = []
    toks0 = []
    for k in range(10):
        toks0.extend([f"w{k}"] * (k + 1))
    rows.append(dict(doc_id=0, text=" ".join(toks0), lang="en", source="s0"))
    rows.append(dict(doc_id=1, text="u0 u1 u2 u3 u4", lang="en", source="s1"))
    _write_documents(tmp_path, rows)
    out = {
        r["source"]: r
        for r in registry.OPS["text_vocab_chao1"].fn(spark, str(tmp_path)).collect()
    }
    # s0: N=55, V=10, f1=1, f2=1 -> chao1 = 10 + 1*0/(2*2) = 10.0,
    # coverage = (55-1)*10000//55 = 9818
    assert out["s0"]["n_tokens"] == 55 and out["s0"]["n_types"] == 10
    assert out["s0"]["f1_hapax"] == 1 and out["s0"]["f2_doubleton"] == 1
    assert out["s0"]["chao1_types"] == 10.0
    assert out["s0"]["coverage_bp"] == (55 - 1) * 10000 // 55
    # s1: N=5, V=5, f1=5, f2=0 -> chao1 = 5 + 5*4/2 = 15.0, coverage 0
    assert out["s1"]["chao1_types"] == 15.0
    assert out["s1"]["coverage_bp"] == 0


def test_perplexity_buckets_matches_python_replay(spark, tmp_path):
    """corpus_perplexity_buckets vs a pure-Python replay of the
    quantized-NLL scoring, per-lang tercile split, and bucket sums."""
    import math
    from collections import Counter, defaultdict

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    vocab = [f"t{j}" for j in range(12)]
    rows = []
    for d in range(30):
        n = 5 + _md5i(f"pplb|len|{d}", 6)
        words = [vocab[_md5i(f"pplb|{d}|{j}", 1 + _md5i(f"sk|{d}", 12))] for j in range(n)]
        rows.append(
            dict(
                doc_id=d,
                text=" ".join(words),
                lang="en" if d % 2 == 0 else "de",
                source="s0",
            )
        )
    _write_documents(tmp_path, rows)
    grid = 1 << 20
    docs = {r["doc_id"]: r for r in rows}
    counts = Counter()
    for r in rows:
        counts.update(r["text"].split(" "))
    nt = sum(counts.values())
    per_doc = {}
    for did, r in docs.items():
        toks = r["text"].split(" ")
        sq = sum(
            math.floor((math.log(nt) - math.log(counts[w])) * grid + 0.5)
            for w in toks
        )
        per_doc[did] = (r["lang"], len(toks), sq)
    expected = defaultdict(lambda: [0, 0, 0])  # (lang,bucket) -> docs, toks, sq
    by_lang = defaultdict(list)
    for did, (lang, ntok, sq) in per_doc.items():
        by_lang[lang].append((sq / ntok, did, ntok, sq))
    for lang, lst in by_lang.items():
        lst.sort()
        n = len(lst)
        for r0, (_, did, ntok, sq) in enumerate(lst, start=1):
            b = "head" if r0 <= n // 3 else ("middle" if r0 <= 2 * n // 3 else "tail")
            e = expected[(lang, b)]
            e[0] += 1
            e[1] += ntok
            e[2] += sq
    out = {
        (r["lang"], r["bucket"]): r
        for r in registry.OPS["corpus_perplexity_buckets"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == set(expected)
    for key, (ndocs, ntoks, sq) in expected.items():
        got = out[key]
        assert got["n_docs"] == ndocs and got["n_tokens"] == ntoks, key
        assert abs(got["nll_mean"] - round(sq / grid / ntoks, 6)) < 2e-6, key


def test_cvm_eras_matches_python_reference(spark, tmp_path):
    """stats_cvm_eras vs Anderson's rank formula computed directly with
    plain average midranks (the op carries doubled min+max ranks;
    algebraically identical, independently coded)."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    rows = []
    samples = {0: [], 1: []}
    i = 0
    for era in (0, 1):
        for k in range(150):
            c = 1000 + _md5i(f"cvm|{era}|{k}", 50) * 10  # heavy ties
            if era == 1:
                # variance change, roughly centered: CvM should see it
                c += (-200, 200)[_md5i(f"cvm|sgn|{k}", 2)]
            samples[era].append(c)
            rows.append(
                dict(
                    event_id=i,
                    ts=pd.Timestamp("2024-01-01")
                    + pd.Timedelta(hours=12 * era, seconds=i),
                    user_id=1,
                    event_type="t",
                    value=c / 100.0,
                    props="{}",
                )
            )
            i += 1
    _write_events(tmp_path, rows)
    pooled = sorted(
        (v, era, j) for era, vs in samples.items() for j, v in enumerate(vs)
    )
    n_all = len(pooled)
    ranks = {}
    pos = 0
    while pos < n_all:
        q = pos
        while q < n_all and pooled[q][0] == pooled[pos][0]:
            q += 1
        avg = (pos + 1 + q) / 2
        for t in range(pos, q):
            ranks[(pooled[t][1], pooled[t][2])] = avg
        pos = q
    n, m = len(samples[0]), len(samples[1])
    big_n = n + m
    u = 0.0
    for era, cnt in ((0, n), (1, m)):
        own = sorted(
            (samples[era][j], j) for j in range(len(samples[era]))
        )
        # within-sample index by the same (value, insertion) order
        for idx, (_, j) in enumerate(own, start=1):
            u += (n if era == 0 else m) * (ranks[(era, j)] - idx) ** 2
    expected = u / (n * m * big_n) - (4 * n * m - 1) / (6 * big_n)
    r = registry.OPS["stats_cvm_eras"].fn(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["n_era_a"] == n and r[0]["n_era_b"] == m
    assert abs(r[0]["t_cvm"] - expected) < 1e-4, (r[0]["t_cvm"], expected)
    assert r[0]["reject_equal_dist"] == (round(r[0]["t_cvm"], 6) > 0.461)


def test_friedman_matches_python_reference(spark, tmp_path):
    """stats_friedman vs a textbook Conover tie-corrected chi2 computed
    with plain average ranks over the per-(day, type) cell means (the op
    carries doubled min+max ranks — algebraically identical, coded
    independently here)."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    types = ["a", "b", "c", "d"]
    shift = {"a": 0, "b": 0, "c": 0, "d": 900}  # type d lifted -> reject
    rows = []
    i = 0
    cells = {}
    for day in range(8):
        for g in types:
            vs = []
            for r in range(5):
                c = 1000 + _md5i(f"fr|{day}|{g}|{r}", 30) * 10 + shift[g]
                vs.append(c)
                rows.append(
                    dict(
                        event_id=i,
                        ts=pd.Timestamp("2024-03-01")
                        + pd.Timedelta(days=day, seconds=i % 3600),
                        user_id=1,
                        event_type=g,
                        value=c / 100.0,
                        props="{}",
                    )
                )
                i += 1
            cells[(day, g)] = sum(vs) / len(vs)
    _write_events(tmp_path, rows)
    b, k = 8, len(types)
    # average ranks of cell means within each day
    a_sum = 0.0  # sum of squared ranks
    rank_sums = {g: 0.0 for g in types}
    for day in range(b):
        vals = sorted((cells[(day, g)], g) for g in types)
        j = 0
        while j < k:
            q = j
            while q < k and vals[q][0] == vals[j][0]:
                q += 1
            avg = (j + 1 + q) / 2
            for t in range(j, q):
                rank_sums[vals[t][1]] += avg
                a_sum += avg * avg
            j = q
    # textbook Conover T1, coded in the centered-deviation form (the op
    # uses the expanded sum-of-squares form; agreeing across the two
    # algebraic routes is the point of this replay)
    c_term = b * k * (k + 1) ** 2 / 4
    dev = sum((r - b * (k + 1) / 2) ** 2 for r in rank_sums.values())
    chi2 = (k - 1) * dev / (a_sum - c_term)
    out = registry.OPS["stats_friedman"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r0 = out[0]
    assert r0["b_blocks"] == b and r0["k_treatments"] == k
    assert abs(r0["chi2_friedman"] - chi2) < 1e-4, (r0["chi2_friedman"], chi2)
    crit = 7.814728  # chi2(3) at 5%
    assert r0["reject_equal_treatments"] == (round(chi2, 6) > crit)
    assert r0["reject_equal_treatments"], "lifted type d should reject"


def test_page_trend_matches_python_and_exact_null_moments(spark, tmp_path):
    """stats_page_trend vs an independent L/z computation on a fixture
    with a built-in intraday rise, PLUS an exhaustive k=4 permutation
    enumeration proving the E[L] and Var[L] literals the op uses
    (b*k(k+1)^2/4 and b*k^2(k+1)^2(k-1)/144)."""
    import itertools
    import math

    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    # exact null moments for one block, k = 4: enumerate all 4! rank
    # permutations of L_block = sum_j j * r_j.
    k = 4
    ls = [
        sum((j + 1) * r for j, r in enumerate(perm))
        for perm in itertools.permutations(range(1, k + 1))
    ]
    mean_l = sum(ls) / len(ls)
    var_l = sum((x - mean_l) ** 2 for x in ls) / len(ls)
    assert mean_l == k * (k + 1) ** 2 / 4
    assert abs(var_l - k * k * (k + 1) ** 2 * (k - 1) / 144) < 1e-12
    # fixture: 6 slots x 10 days, values rising with slot
    rows = []
    i = 0
    cells = {}
    for day in range(10):
        for slot in range(6):
            vs = []
            for r in range(4):
                c = 1000 + _md5i(f"pg|{day}|{slot}|{r}", 200) * 10 + slot * 300
                vs.append(c)
                rows.append(
                    dict(
                        event_id=i,
                        ts=pd.Timestamp("2024-03-01")
                        + pd.Timedelta(
                            days=day, seconds=slot * 14400 + 60 + (i % 600)
                        ),
                        user_id=1,
                        event_type="x",
                        value=c / 100.0,
                        props="{}",
                    )
                )
                i += 1
            cells[(day, slot)] = sum(vs) / len(vs)
    _write_events(tmp_path, rows)
    b, kk = 10, 6
    l_stat = 0.0
    for day in range(b):
        vals = sorted((cells[(day, s)], s) for s in range(kk))
        j = 0
        while j < kk:
            q = j
            while q < kk and vals[q][0] == vals[j][0]:
                q += 1
            avg = (j + 1 + q) / 2
            for t in range(j, q):
                l_stat += (vals[t][1] + 1) * avg
            j = q
    e_l = b * kk * (kk + 1) ** 2 / 4
    v_l = b * kk * kk * (kk + 1) ** 2 * (kk - 1) / 144
    z = (l_stat - e_l) / math.sqrt(v_l)
    out = registry.OPS["stats_page_trend"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r0 = out[0]
    assert r0["b_blocks"] == b and r0["k_slots"] == kk
    assert r0["l2_stat"] == int(round(2 * l_stat))
    assert abs(r0["z_page"] - z) < 1e-4, (r0["z_page"], z)
    assert r0["reject_increasing_trend"], "built-in rise should reject"


def test_jonckheere_matches_bruteforce(spark, tmp_path):
    """stats_jonckheere_terpstra vs the O(n^2) definition: 2U = number
    of (earlier-week, later-week) pairs with later > earlier, twice,
    plus ties once; variance via Lehmann's tie-corrected formula coded
    directly from group lists."""
    import math

    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    groups = []  # per-week value lists, drifting upward
    rows = []
    i = 0
    base = pd.Timestamp("2024-03-04")  # Monday, epoch-week aligned enough
    for wki in range(4):
        vs = []
        for r in range(60):
            c = 1000 + _md5i(f"jt|{wki}|{r}", 25) * 20 + wki * 60  # ties + drift
            vs.append(c)
            rows.append(
                dict(
                    event_id=i,
                    ts=base + pd.Timedelta(days=7 * wki, seconds=i % 86400),
                    user_id=1,
                    event_type="x",
                    value=c / 100.0,
                    props="{}",
                )
            )
            i += 1
        groups.append(vs)
    _write_events(tmp_path, rows)
    u2 = 0
    for gi in range(len(groups)):
        for hi in range(gi + 1, len(groups)):
            for x in groups[gi]:
                for y in groups[hi]:
                    u2 += 2 if y > x else (1 if y == x else 0)
    ns = [len(g) for g in groups]
    n = sum(ns)
    pooled = {}
    for g in groups:
        for v in g:
            pooled[v] = pooled.get(v, 0) + 1
    ties = list(pooled.values())
    e2u = (n * n - sum(x * x for x in ns)) // 2
    varu = (
        (
            n * (n - 1) * (2 * n + 5)
            - sum(x * (x - 1) * (2 * x + 5) for x in ns)
            - sum(t * (t - 1) * (2 * t + 5) for t in ties)
        )
        / 72
        + sum(x * (x - 1) * (x - 2) for x in ns)
        * sum(t * (t - 1) * (t - 2) for t in ties)
        / (36 * n * (n - 1) * (n - 2))
        + sum(x * (x - 1) for x in ns)
        * sum(t * (t - 1) for t in ties)
        / (8 * n * (n - 1))
    )
    z = (u2 - e2u) / (2 * math.sqrt(varu))
    out = (
        registry.OPS["stats_jonckheere_terpstra"].fn(spark, str(tmp_path)).collect()
    )
    assert len(out) == 1
    r0 = out[0]
    assert r0["k_groups"] == len(groups) and r0["n_total"] == n
    assert r0["u2_stat"] == u2, (r0["u2_stat"], u2)
    assert abs(r0["z_jt"] - z) < 1e-4, (r0["z_jt"], z)
    assert r0["reject_increasing_trend"], "built-in weekly drift should reject"


def test_kn_bigram_xent_matches_python_reference(spark, tmp_path):
    """corpus_kn_bigram_xent vs a from-scratch dict-based interpolated
    Kneser-Ney implementation (same discount, same add-one continuation
    smoothing, same doc_id-midpoint split), plus the directional sanity
    check: a held source emitting the train half's bigram chains must
    score lower cross-entropy than one emitting scrambled text."""
    import math

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    vocab = [f"w{j}" for j in range(12)]

    def chain(tag, n):
        # deterministic Markov-ish chain: next word = hash of current
        out = [vocab[_md5i(f"seed|{tag}", 12)]]
        for t in range(n - 1):
            cur = out[-1]
            out.append(vocab[(vocab.index(cur) * 7 + _md5i(f"{tag}|{t}", 3)) % 12])
        return " ".join(out)

    def scramble(tag, n):
        return " ".join(vocab[_md5i(f"scr|{tag}|{t}", 12)] for t in range(n))

    rows = []
    did = 0
    for k in range(12):  # train half: chain text, two sources
        rows.append(dict(doc_id=did, text=chain(f"tr{k}", 30),
                         lang="en", source="nat"))
        did += 1
    for k in range(6):  # held half: 3 chain docs, 3 scrambled docs
        rows.append(dict(doc_id=did, text=chain(f"he{k}", 30),
                         lang="en", source="nat"))
        did += 1
        rows.append(dict(doc_id=did, text=scramble(f"he{k}", 30),
                         lang="en", source="rnd"))
        did += 1
    _write_documents(tmp_path, rows)
    ids = sorted(r["doc_id"] for r in rows)
    bound = ids[len(ids) // 2 - 1]  # (n//2)-th smallest
    train_docs = [r for r in rows if r["doc_id"] < bound]
    held_docs = [r for r in rows if r["doc_id"] >= bound]
    bc, ctx_cv, ctx_n1, cw_n1 = {}, {}, {}, {}
    tr_vocab = set()
    for r in train_docs:
        toks = r["text"].split(" ")
        tr_vocab.update(toks)
        for v, w in zip(toks, toks[1:]):
            bc[(v, w)] = bc.get((v, w), 0) + 1
    for (v, w), c in bc.items():
        ctx_cv[v] = ctx_cv.get(v, 0) + c
        ctx_n1[v] = ctx_n1.get(v, 0) + 1
        cw_n1[w] = cw_n1.get(w, 0) + 1
    nb, vsz, d0 = len(bc), len(tr_vocab), 0.75
    exp = {}
    for r in held_docs:
        toks = r["text"].split(" ")
        s = exp.setdefault(r["source"], dict(n=0, h=0.0, unseen=0))
        for v, w in zip(toks, toks[1:]):
            pc = (cw_n1.get(w, 0) + 1) / (nb + vsz)
            if ctx_cv.get(v, 0) > 0:
                p = (max(bc.get((v, w), 0) - d0, 0.0)
                     + d0 * ctx_n1[v] * pc) / ctx_cv[v]
            else:
                p = pc
                s["unseen"] += 1
            s["n"] += 1
            s["h"] += -math.log2(p)
    out = {
        r["source"]: r
        for r in registry.OPS["corpus_kn_bigram_xent"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(exp)
    for src, e in exp.items():
        got = out[src]
        assert got["n_held_bigrams"] == e["n"]
        assert abs(got["h_bits"] - e["h"] / e["n"]) < 1e-4, (
            src, got["h_bits"], e["h"] / e["n"])
        assert got["ctx_unseen_bp"] == e["unseen"] * 10000 // e["n"]
    assert out["nat"]["h_bits"] < out["rnd"]["h_bits"], (
        "train-matched chains must score below scrambled text")


def test_cochran_q_matches_python_reference(spark, tmp_path):
    """stats_cochran_q vs the textbook row/column-total formula computed
    from an explicit 0/1 matrix, on a fixture where one week's
    conversion propensity is deliberately cut."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    users, weeks = 40, 4
    base = pd.Timestamp("2024-03-04")  # epoch-week aligned Monday
    rows, mat = [], {}
    i = 0
    for u in range(users):
        for wk in range(weeks):
            # week 2 converts rarely; others usually
            thr = 3 if wk == 2 else 24
            active = _md5i(f"cq|{u}|{wk}", 30) < thr
            mat[(u, wk)] = 1 if active else 0
            # every user logs a click each week (must not count as
            # conversion); converters add a purchase event
            rows.append(dict(
                event_id=i, ts=base + pd.Timedelta(days=7 * wk, hours=u % 24),
                user_id=u, event_type="click", value=1.0, props="{}"))
            i += 1
            if active:
                rows.append(dict(
                    event_id=i,
                    ts=base + pd.Timedelta(days=7 * wk + 1, hours=u % 24),
                    user_id=u, event_type="purchase", value=1.0, props="{}"))
                i += 1
    _write_events(tmp_path, rows)
    # python replay over users with >= 1 conversion (others never enter
    # the events-derived panel; all-zero rows cancel anyway)
    cj = [sum(mat[(u, wk)] for u in range(users)) for wk in range(weeks)]
    ri = [sum(mat[(u, wk)] for wk in range(weeks)) for u in range(users)]
    n = sum(cj)
    k = weeks
    q = (k - 1) * (k * sum(c * c for c in cj) - n * n) / (
        k * n - sum(r * r for r in ri)
    )
    out = registry.OPS["stats_cochran_q"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r0 = out[0]
    assert r0["k_weeks"] == k
    assert r0["n_users"] == sum(1 for r in ri if r > 0)
    assert r0["n_active_cells"] == n
    assert abs(r0["q_cochran"] - q) < 1e-4, (r0["q_cochran"], q)
    crit = 7.814728  # chi2(3) 5%
    assert r0["reject_equal_weeks"] == (round(q, 6) > crit)
    assert r0["reject_equal_weeks"], "suppressed week 2 should reject"


def test_whiten_unit_variance_and_degenerate_fixture(spark, tmp_path):
    """embedding_whiten: on a well-conditioned anisotropic fixture the
    whitened coordinates have ~unit variance along both components
    (that IS the definition of whitening); a constant-embedding corpus
    (zero covariance -> degenerate spectrum) whitens to exact 0.0."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    def run(dirname, vecs):
        d = tmp_path / dirname
        d.mkdir()
        pd.DataFrame(
            [dict(vec_id=i, embedding=v, label=i % 2) for i, v in enumerate(vecs)]
        ).to_parquet(d / "embeddings.parquet", index=False)
        return registry.OPS["embedding_whiten"].fn(spark, str(d)).collect()

    const = run("const", [[0.25] * 16 for _ in range(6)])
    assert all(r["w1"] == 0.0 and r["w2"] == 0.0 for r in const)

    # anisotropic: dim0 swings +-0.4, dim1 +-0.05, rest tiny hash noise
    n = 240
    vecs = []
    for i in range(n):
        v = [0.0] * 16
        v[0] = 0.4 if i % 2 == 0 else -0.4
        v[1] = 0.05 if (i // 2) % 2 == 0 else -0.05
        for j in range(2, 16):
            v[j] = (_md5i(f"wh|{i}|{j}", 21) - 10) * 1e-3
        vecs.append(v)
    out = run("aniso", vecs)
    for col in ("w1", "w2"):
        xs = [r[col] for r in out]
        m = sum(xs) / len(xs)
        var = sum((x - m) ** 2 for x in xs) / len(xs)
        assert 0.8 < var < 1.2, (col, var)


def _oracle_agree(spark, tmp_path, key):
    """Exact op-vs-oracle agreement on the fixture in tmp_path (the
    driver's compare, inlined: row count + sorted columns + 6-decimal
    values, order-insensitive)."""
    import duckdb

    from connor_fun_streamproducer_spark import registry

    o = registry.OPS[key]
    sdf = o.fn(spark, str(tmp_path))
    srows = sdf.collect()
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        f = tmp_path / f"{t}.parquet"
        if f.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    res = con.sql(o.oracle)
    drows = res.fetchall()

    def norm(rows, cols):
        idx = [cols.index(c) for c in sorted(cols)]
        out = []
        for r in rows:
            out.append(tuple(
                f"{round(r[i], 6):.6f}" if isinstance(r[i], float) else str(r[i])
                for i in idx
            ))
        return sorted(out)

    assert sorted(sdf.columns) == sorted(res.columns), key
    assert norm(srows, sdf.columns) == norm(drows, res.columns), (
        key, norm(srows, sdf.columns)[:3], norm(drows, res.columns)[:3])
    return srows


def test_blocked_battery_degenerate_fixtures(spark, tmp_path):
    """The round-14 blocked/ordered battery on degenerate designs must
    agree with its oracles INSTEAD of crashing or diverging: a single
    treatment (k=1 -> chi2 0/0 -> NULL verdict), a single ordered group
    (JT variance collapses to EXACTLY zero through the tie-corrected
    formula -- the three terms cancel algebraically -- so z is NULL),
    and a zero-conversion panel (Cochran k=0)."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    # one event type, one week, clicks only (no purchases)
    d = tmp_path / "deg1"
    d.mkdir()
    rows = []
    for i in range(40):
        rows.append(dict(
            event_id=i,
            ts=pd.Timestamp("2024-03-04") + pd.Timedelta(hours=i),
            user_id=i % 7,
            event_type="click",
            value=(1000 + _md5i(f"dg|{i}", 500)) / 100.0,
            props="{}",
        ))
    _write_events(d, rows)
    r = _oracle_agree(spark, d, "stats_friedman")
    assert len(r) == 1 and r[0]["k_treatments"] == 1
    assert r[0]["chi2_friedman"] is None  # 0/0 is NULL, not a crash
    r = _oracle_agree(spark, d, "stats_jonckheere_terpstra")
    assert len(r) == 1 and r[0]["k_groups"] == 1
    assert r[0]["u2_stat"] == 0 and r[0]["z_jt"] is None
    r = _oracle_agree(spark, d, "stats_cochran_q")
    assert len(r) == 1 and r[0]["k_weeks"] == 0
    assert r[0]["q_cochran"] is None
    r = _oracle_agree(spark, d, "stats_page_trend")
    assert len(r) == 1  # 2-hourly events cover all 6 slots; z defined


def test_betweenness_sampled_matches_python_brandes(spark, tmp_path):
    """graph_betweenness_sampled vs an independently coded truncated
    Brandes (dict BFS + grid-quantized dependency pass) on a designed
    two-cluster-plus-bridge topology: the bridge user must out-rank
    everyone, and every score must agree exactly."""
    import hashlib

    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()
    # two 5-cliques bridged through user 100: 0-4 clique, 10-14 clique,
    # bridge edges 4-100 and 100-10
    edges = []
    for base in (0, 10):
        ids = [base + j for j in range(5)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges += [(4, 100), (100, 10)]
    rows = []
    i = 0
    for (u, v) in edges:
        c = 10000 + i * 7  # one distinct cents bucket per edge (size 2)
        for uid in (u, v):
            rows.append(dict(
                event_id=len(rows),
                ts=pd.Timestamp("2024-03-04") + pd.Timedelta(minutes=len(rows)),
                user_id=uid,
                event_type="purchase",
                value=c / 100.0,
                props="{}",
            ))
        i += 1
    _write_events(tmp_path, rows)
    adj = {}
    for (u, v) in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    seeds = sorted(
        nodes,
        key=lambda n: (hashlib.md5(f"bw|{n}".encode()).hexdigest(), n),
    )[:3]
    GRID, HOPS = 1 << 20, 3
    bc = {}
    for s in seeds:
        level = {s: 0}
        sig = {s: 1}
        frontier = [s]
        levels = [[s]]
        for k in range(1, HOPS + 1):
            nxt = {}
            for u in frontier:
                for v in adj[u]:
                    if v not in level:
                        nxt[v] = nxt.get(v, 0) + sig[u]
            for v, sg in nxt.items():
                level[v] = k
                sig[v] = sg
            frontier = sorted(nxt)
            levels.append(frontier)
        dq = {v: 0 for v in levels[HOPS]}
        for k in range(HOPS, 0, -1):
            ndq = {}
            for u in levels[k - 1]:
                t = 0
                for w in adj[u]:
                    if level.get(w) == k:
                        t += (sig[u] * (GRID + dq.get(w, 0))) // sig[w]
                if t:
                    ndq[u] = t
            for u, val in ndq.items():
                if k > 1:  # levels 1..HOPS-1 accumulate; seeds excluded
                    bc[u] = bc.get(u, 0) + val
            dq = ndq
    want = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["user_id"], r["bc_grid"])
        for r in registry.OPS["graph_betweenness_sampled"].fn(spark, str(tmp_path)).collect()
    ]
    assert got == want, (got[:5], want[:5])
    assert got and got[0][0] == 100, "the bridge user must rank first"


def test_mantel_haenszel_matches_python_and_defeats_simpson(spark, tmp_path):
    """stats_mantel_haenszel vs the textbook stratified formula, on two
    fixtures: (1) a Simpson construction — zero within-stratum
    association but era-skewed stratum sizes with different base rates,
    where the POOLED 2x2 would scream association and CMH must stay
    quiet; (2) a genuine within-stratum era shift that must reject."""
    import pandas as pd

    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    def build(dirname, strata):
        # strata: list of (type, era, n_large, n_small)
        d = tmp_path / dirname
        d.mkdir()
        rows = []
        base = pd.Timestamp("2024-01-01")
        late = pd.Timestamp("2024-01-29")
        for (et, era, nl, ns) in strata:
            t0 = base if era == 0 else late
            for j in range(nl):
                rows.append(dict(
                    event_id=len(rows), ts=t0 + pd.Timedelta(seconds=len(rows)),
                    user_id=1, event_type=et, value=150.0, props="{}"))
            for j in range(ns):
                rows.append(dict(
                    event_id=len(rows), ts=t0 + pd.Timedelta(seconds=len(rows)),
                    user_id=1, event_type=et, value=50.0, props="{}"))
        # anchor the span so the midpoint separates the two bursts
        _write_events(d, rows)
        return d

    def cmh_py(strata_cells):
        # strata_cells: per type: (a, b, c, d)
        sa = sum(a for a, _, _, _ in strata_cells)
        se = sum((a + b) * (a + c) / (a + b + c + d) for a, b, c, d in strata_cells)
        sv = sum(
            (a + b) * (c + d) * (a + c) * (b + d)
            / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
            for a, b, c, d in strata_cells
        )
        dev = max(abs(sa - se) - 0.5, 0.0)
        return dev * dev / sv

    # (1) Simpson: type X mostly era0 with high large-rate in BOTH eras;
    # type Y mostly era1 with low large-rate in both eras. No
    # within-stratum shift, big pooled shift.
    d1 = build("simpson", [
        ("X", 0, 160, 240), ("X", 1, 40, 60),    # 40% large both eras
        ("Y", 0, 10, 90),  ("Y", 1, 40, 360),    # 10% large both eras
    ])
    cells1 = [(160, 240, 40, 60), (10, 90, 40, 360)]
    out1 = registry.OPS["stats_mantel_haenszel"].fn(spark, str(d1)).collect()[0]
    assert abs(out1["cmh_chi2"] - cmh_py(cells1)) < 1e-4
    assert not out1["reject_no_association"], "CMH must not buy Simpson's paradox"
    # pooled table WOULD reject: era0 large-rate 170/500 vs era1 80/500
    pooled = cmh_py([(170, 330, 80, 420)])
    assert pooled > 3.841459, "sanity: the pooled test is fooled"
    # (2) genuine within-stratum shift in both strata
    d2 = build("shift", [
        ("X", 0, 120, 280), ("X", 1, 40, 160),   # 30% -> 20%
        ("Y", 0, 150, 350), ("Y", 1, 50, 200),   # 30% -> 20%
    ])
    cells2 = [(120, 280, 40, 160), (150, 350, 50, 200)]
    out2 = registry.OPS["stats_mantel_haenszel"].fn(spark, str(d2)).collect()[0]
    assert abs(out2["cmh_chi2"] - cmh_py(cells2)) < 1e-4
    assert out2["reject_no_association"], "a real within-stratum shift must reject"


def test_cohens_kappa_matches_python_reference(spark, tmp_path):
    """stats_cohens_kappa vs the textbook formula on engineered
    fixtures: perfectly agreeing gates (kappa = 1), perfectly
    anti-agreeing gates with balanced marginals (kappa = -1), and a
    mixed fixture compared cell-by-cell."""
    from connor_fun_streamproducer_spark import registry

    registry._ensure_loaded()

    def doc(i, long, wordy):
        # long: n_chars >= 300; wordy: 2*n_chars >= 11*n_tokens
        if wordy:
            word = "abcdefghijk"  # 11 chars + separator >= 5.5 avg easily
        else:
            word = "abc"  # 4 chars per token incl. separator < 5.5
        n = 40 if long else 10
        text = " ".join(word for _ in range(n))
        while long and len(text) < 300:
            text += " " + word
        return dict(doc_id=i, text=text, lang="en", source="s")

    def run(dirname, flags):
        d = tmp_path / dirname
        d.mkdir()
        _write_documents(d, [doc(i, lg, wd) for i, (lg, wd) in enumerate(flags)])
        return registry.OPS["stats_cohens_kappa"].fn(spark, str(d)).collect()[0]

    def kappa_py(cells):
        n11, n10, n01, n00 = cells
        n = n11 + n10 + n01 + n00
        po = (n11 + n00) / n
        pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * (
            (n10 + n00) / n
        )
        return (po - pe) / (1 - pe)

    # perfect agreement, mixed marginals
    r = run("agree", [(True, True)] * 6 + [(False, False)] * 4)
    assert r["kappa"] == 1.0 and r["agreement_bp"] == 10000
    # perfect anti-agreement, balanced marginals
    r = run("anti", [(True, False)] * 5 + [(False, True)] * 5)
    assert r["kappa"] == -1.0 and r["agreement_bp"] == 0
    # mixed
    flags = [(True, True)] * 5 + [(True, False)] * 3 + [(False, True)] * 2 + [
        (False, False)
    ] * 6
    r = run("mixed", flags)
    assert (r["both_pass"], r["only_length"], r["only_wordlen"], r["both_fail"]) == (
        5, 3, 2, 6)
    assert abs(r["kappa"] - round(kappa_py((5, 3, 2, 6)), 6)) < 1e-9
