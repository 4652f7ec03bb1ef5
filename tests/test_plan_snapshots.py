"""Golden-file snapshots of the headline queries' physical plans
(VERDICT r4 item 8).

The 54 shape assertions in test_plans.py each pin ONE property; a silent
plan change that none of them names (a join strategy flip from a Spark
conf default, an exchange appearing after a refactor, a filter falling
out of PushedFilters) would land unnoticed. These snapshots pin the whole
normalized skeleton: any such change shows up as a readable text diff.

Refresh after an INTENTIONAL plan change:

    SPARK_GRAFT_REFRESH_PLANS=1 python -m pytest tests/test_plan_snapshots.py -q

then review the snapshot diff in git like any other code change.
"""

from __future__ import annotations

import os
import pathlib

import pytest

from connor_fun_streamproducer_spark import registry
from connor_fun_streamproducer_spark.plans.explain import plan_snapshot
from tests.conftest import SF_DIR

SNAP_DIR = pathlib.Path(__file__).parent / "plan_snapshots"
REFRESH = os.environ.get("SPARK_GRAFT_REFRESH_PLANS") == "1"

# Ten headline BATCH queries (streaming ops materialize through the
# memory-sink harness and have no stable batch plan to snapshot), plus
# the five most expensive extended-tier queries (VERDICT r5 item 5) so
# their join strategies and exchange counts are drift-pinned too.
SNAPSHOT_KEYS = [
    "enrich_region",
    "agg_hash",
    "join_sortmerge",
    "pipeline_local_supplier_volume",
    "pipeline_shipping_priority",
    "join_asof",
    "topk_per_group",
    "dedup_near_minhash",
    "sim_search_ivf",
    "pipeline_market_share",
    # extended tier
    "join_interval_overlap",
    "graph_connected_components",
    "pipeline_basket_affinity",
    "sim_search_pq",
    "dedup_chunk_exact",
    # round-6 tier
    "graph_top_similar_user",
    "sample_negative_pairs",
    "win_clamped_cumsum",
    "ts_ohlc_candles",
    "pipeline_session_paths",
    # round-9 tier: the new dedup/ANN/sweep shapes
    "dedup_simhash_banded",
    "sim_search_hamming",
    "dedup_minhash_cluster",
    "ts_peak_concurrency",
    "ts_theil_sen",
    # round-10 tier: artifact-serving closure consumers (the plan IS the
    # point — a regression here re-inlines the O(corpus) pipeline) + the
    # new integer-fold shapes
    "dedup_cluster_canonical",
    "sample_effective_size",
    "pipeline_part_velocity",
    "ts_periodogram_fixed",
    "embedding_norm_profile",
    # round-11 tier: the PPJoin candidate join, the signature-artifact
    # lane join, the Lloyd-artifact separation matrix, and the wedge
    # join (artifact serving + fan-out shapes worth drift-pinning)
    "dedup_containment_prefix",
    "sim_doc_topk_minhash",
    "embedding_cluster_separation",
    "graph_two_hop_reach",
    # round-12 tier: the artifact-served occupancy profile, the shared
    # trade-balance subtree, the lag-exploded CCF join, the dense-grid
    # spectral bank, and the budgeted triplet joins
    "dedup_band_occupancy",
    "pipeline_nation_trade_balance",
    "ts_cross_correlation",
    "ts_spectral_entropy",
    "embedding_triplet_violation",
    # round-13 tier: the sharded exact frontier, the distributed-rank
    # selection shapes, the promoted PCA projection, and the wedge-scored
    # link predictor — the plans that ARE this round's scale claims
    "stats_event_lateness",
    "agg_gini_concentration",
    "agg_median_distributed",
    "stats_kruskal_wallis",
    "graph_adamic_adar",
    "embedding_pca_project",
    # round-14 tier: the blocked/ordered rank batteries' one-corpus-agg
    # shape, the KN bigram LM's two-pass + type-level-join shape, the
    # map-only Arrow segmentation, and the shared-solve whitening
    # projection — this round's scale claims as plans
    "stats_friedman",
    "stats_jonckheere_terpstra",
    "corpus_kn_bigram_xent",
    "multimodal_shot_boundary",
    "embedding_whiten",
    "graph_betweenness_sampled",
]


@pytest.mark.parametrize("key", SNAPSHOT_KEYS)
def test_plan_matches_snapshot(spark, key):
    if SF_DIR.rstrip("/").rsplit("/", 1)[-1] != "sf0.001":
        pytest.skip("snapshots are pinned at the default sf0.001 fixture "
                    "(AQE/broadcast choices are size-dependent)")
    # Hermetic against suite order: a table cached (and leaked) by any
    # earlier test would transparently rewrite these plans to
    # InMemoryTableScan and read as drift.
    spark.catalog.clearCache()
    df = registry.queries()[key](spark, SF_DIR)
    snap = plan_snapshot(df)
    path = SNAP_DIR / f"{key}.txt"
    if REFRESH or not path.exists():
        SNAP_DIR.mkdir(exist_ok=True)
        path.write_text(snap)
        if REFRESH:
            return
    want = path.read_text()
    assert snap == want, (
        f"physical plan for {key!r} drifted from its snapshot.\n"
        f"If the change is intentional, refresh with "
        f"SPARK_GRAFT_REFRESH_PLANS=1 and commit the diff.\n"
        f"--- snapshot\n{want}\n--- current\n{snap}"
    )
