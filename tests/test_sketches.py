"""Accuracy contracts for the Datasketches ops (operators/sketches.py).

Since round 7 both KLL and theta are hash-checked by the driver (exact
companion columns / exact-mode law — see the module docstring); these
tests pin the TIGHTER sketch-side contracts the oracle cannot express:
published rank-error bounds on the raw estimates (with_exact=False
shape) and exact-mode equality of theta estimates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from connor_fun_streamproducer_spark import registry
from connor_fun_streamproducer_spark.catalog import load
from tests.conftest import SF_DIR

registry._ensure_loaded()

# KLL k=200 published normalized rank error (~1.65%); widened slightly for
# the rank-interval check below.
KLL_RANK_EPS = 0.025


def test_kll_quantiles_within_rank_error(spark):
    """Each KLL estimate must land between the exact quantiles at
    q ± KLL_RANK_EPS — the definition of normalized rank error."""
    est = {
        (r["o_orderpriority"]): r
        for r in registry.OPS["agg_kll_quantile"]
        .fn(spark, SF_DIR, with_exact=False)
        .collect()
    }
    o = load(spark, SF_DIR, "orders")
    groups = {g: o.filter(F.col("o_orderpriority") == g) for g in est if g != "ALL"}
    groups["ALL"] = o
    assert set(groups) == set(est)
    for g, df in groups.items():
        for q in (0.5, 0.9, 0.99):
            lo, hi = (
                df.select(
                    F.percentile("o_totalprice", F.lit(max(0.0, q - KLL_RANK_EPS))),
                    F.percentile("o_totalprice", F.lit(min(1.0, q + KLL_RANK_EPS))),
                ).first()
            )
            v = est[g][f"p{int(q * 100)}"]
            assert lo - 0.01 <= v <= hi + 0.01, (g, q, v, lo, hi)


def test_kll_merge_consistent_with_global_sketch(spark):
    """Merging per-group sketches must estimate like sketching globally —
    the mergeability property the op exists to demonstrate."""
    rows = registry.OPS["agg_kll_quantile"].fn(spark, SF_DIR, with_exact=False).collect()
    all_row = next(r for r in rows if r["o_orderpriority"] == "ALL")
    o = load(spark, SF_DIR, "orders")
    direct = o.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("o_totalprice", 200), F.lit(0.5)
        ).alias("p50")
    ).first()["p50"]
    exact_n = o.count()
    assert all_row["n"] == exact_n
    # Both are valid KLL estimates of the same distribution: each lies
    # within the rank interval, so they differ by at most the width of
    # the 2*eps exact-quantile band.
    lo, hi = o.select(
        F.percentile("o_totalprice", F.lit(0.5 - KLL_RANK_EPS)),
        F.percentile("o_totalprice", F.lit(0.5 + KLL_RANK_EPS)),
    ).first()
    assert lo - 0.01 <= all_row["p50"] <= hi + 0.01
    assert lo - 0.01 <= direct <= hi + 0.01


def test_theta_estimates_match_exact_sets(spark):
    """At fixture scale the distinct sets are far below the sketch's
    2^14 nominal entries, so theta runs in exact mode: estimates must
    EQUAL exact distinct counts — the law that makes the op
    hash-checkable against DuckDB (no tolerance)."""
    rows = registry.OPS["agg_theta_setops"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3  # (F,O), (F,P), (O,P)
    o = load(spark, SF_DIR, "orders").select("o_orderstatus", "o_custkey")
    sets = {
        s: {r["o_custkey"] for r in o.filter(F.col("o_orderstatus") == s).distinct().collect()}
        for s in ("F", "O", "P")
    }

    for r in rows:
        a, b = sets[r["status_a"]], sets[r["status_b"]]
        assert r["est_a"] == len(a), r
        assert r["est_b"] == len(b), r
        assert r["est_inter"] == len(a & b), r
        assert r["est_union"] == len(a | b), r
        assert r["jaccard_bp"] == len(a & b) * 10000 // len(a | b), r


def test_misra_gries_superset_guarantee_under_adversarial_budget(spark):
    """The heavy-hitter candidate guarantee, stress-tested at a budget far
    below the fixture vocabulary (4 counters vs 31 tokens, forcing real
    decrement rounds): every token with global frequency > N/(k+1) must
    survive into the candidate set. This is the property that makes the
    two-phase top-k EXACT rather than approximate."""
    import pandas as pd

    budget = 4
    toks = (
        load(spark, SF_DIR, "documents")
        .selectExpr("explode(split(text, ' ')) AS tok")
        .filter("tok <> ''")
    )

    def mg4(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["tok"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            while len(counters) > budget:
                m = min(counters.values())
                counters = {t: c - m for t, c in counters.items() if c > m}
        yield pd.DataFrame({"tok": list(counters.keys())})

    cands = {
        r["tok"]
        for r in toks.mapInPandas(mg4, "tok string").select("tok").distinct().collect()
    }
    assert len(cands) <= toks.rdd.getNumPartitions() * budget or cands

    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())
    must_have = {t for t, c in exact.items() if c > n_total / (budget + 1)}
    missed = must_have - cands
    assert not missed, f"MG dropped guaranteed heavy hitters: {missed}"


def test_count_min_overestimates_within_collision_mass(spark):
    """The CMS contract, exactly: for every probe key, est >= true count,
    and est - true equals the colliding-key mass of the LIGHTEST of the
    probe's cells — which by construction is <= the total stream mass
    mapped to that cell minus the key's own. Verified by recomputing the
    cell assignment with Spark's own xxhash64 and summing exact counts."""
    import duckdb

    from connor_fun_streamproducer_spark import registry
    from connor_fun_streamproducer_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_PROBES,
        CMS_WIDTH,
    )

    registry._ensure_loaded()
    est = {
        r["l_partkey"]: r["est"]
        for r in registry.OPS["agg_count_min"]
        .fn(spark, SF_DIR, with_exact=False)
        .collect()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT l_partkey, count(*) FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    # Recompute every key's cells with the engine's own hash, then the
    # exact per-cell mass — the bound est == min_d(cell mass) is EXACT.
    keys = sorted(exact)
    kdf = spark.createDataFrame([(int(k),) for k in keys], "k bigint")
    cells = kdf.selectExpr(
        "k",
        *[
            f"pmod(xxhash64(cast({d} as int), k), {CMS_WIDTH}) AS c{d}"
            for d in range(CMS_DEPTH)
        ],
    ).collect()
    cell_mass: dict[tuple[int, int], int] = {}
    key_cells = {}
    for r in cells:
        key_cells[r["k"]] = [r[f"c{d}"] for d in range(CMS_DEPTH)]
        for d in range(CMS_DEPTH):
            cell_mass[(d, r[f"c{d}"])] = cell_mass.get((d, r[f"c{d}"]), 0) + exact[r["k"]]
    for k in CMS_PROBES:
        true = exact.get(k, 0)
        assert est[k] >= true, f"CMS underestimated key {k}"
        expected = min(cell_mass[(d, key_cells[k][d])] for d in range(CMS_DEPTH))
        assert est[k] == expected, f"CMS estimate for {k} != exact min cell mass"
