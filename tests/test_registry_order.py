"""Pin the registry registration order contract.

COMPLETE correctness coverage lives in tests/test_oracle.py, which runs
every registered op against its DuckDB oracle on every test run — no op is
ever unguarded locally, whatever an external harness samples.

Separately, the external driver verifies ops in registration order with a
bounded window (each round covers the first 50 keys). The registration
order is freshness-priority, applied the same rule each round: (1) the
stalest externally-green keys (the head of the previous round's
behind-window order); (2) ops changed this round; (3) ops NEW this round
(inside the window since round 10, so new work is externally proven the
round it lands instead of carrying one round of debt). This test pins
round 13's resulting window.
"""

from connor_fun_streamproducer_spark import registry

# (1) The stalest externally-green tier — exactly the r4-vintage keys
# VERDICT r12 pinned as STALEST_FRONT_R13.
STALEST_FRONTED_R13 = [
    "scan_orc",
    "sql_api",
    "sim_search_topk_arrow",
    "join_skew_salted",
    "multimodal_framesample",
    "multimodal_resize",
    "fn_xml_roundtrip",
    "text_chunk",
    "text_repetition",
    "sample_split",
]

# (2) Externally green before, but changed in round 13: the PCA
# power-iteration promotion (VERDICT r12 #2), the sharded lateness
# frontier (#3), the three distributed-rank Gini ops (#4), the HITS
# edge-artifact refactor (#6), the eval-artifact construction-rev fix
# (ADVICE r12), and the nine era-suite ops that now share the
# fingerprint-cached span probe (#5).
CHANGED_IN_ROUND_13 = [
    "embedding_pca_project",
    "stats_event_lateness",
    "agg_gini_concentration",
    "win_lorenz_deciles",
    "corpus_doc_length_gini",
    "graph_hits",
    "dedup_eval_tiers",
    "stats_welch_ttest",
    "stats_cohens_d_eras",
    "stats_brown_forsythe",
    "stats_mood_median",
    "stats_mann_whitney",
    "stats_cliff_delta",
    "stats_power_mde",
    "stats_cohens_h",
    "stats_trend_proportions",
]

# (3) NEW in round 13 — inside the window so they gain an external row
# THIS round (standing policy since r10), budgeted at 24 so the pinned
# stale tier and the changed tier both clear.
NEW_IN_ROUND_13 = [
    "stats_kruskal_wallis",
    "stats_theil_u",
    "stats_gk_lambda",
    "stats_mcnemar",
    "stats_wilcoxon_signed_rank",
    "ts_page_hinkley",
    "ts_sample_entropy",
    "ts_hurst_rs",
    "pipeline_price_dispersion",
    "pipeline_new_vs_repeat_revenue",
    "sample_weighted_topk_es",
    "agg_hll_manual",
    "embedding_prefix_variance",
    "text_ngram_entropy_rate",
    "text_vocab_growth_heaps",
    "dedup_cluster_source_purity",
    "multimodal_silence_runs",
    "graph_adamic_adar",
    "graph_harmonic_centrality",
    "agg_median_distributed",
    "graph_ego_density",
    "pipeline_vendor_consolidation_savings",
    "stats_permutation_shift",
    "agg_quantiles_distributed",
]

# First in line behind the window: the stalest externally-green tier
# after this round's refresh (r4/r5-vintage) — the r14 rotation's input,
# pinned.
STALEST_FRONT_R14 = [
    "sample_stratified",
    "corpus_stats",
    "tfidf_top_terms",
    "corpus_pack",
    "text_pii_scrub",
    "text_boilerplate",
    "text_normalize",
    "embedding_pool",
    "embedding_quantize",
    "fn_url",
    "graph_pagerank",
    "win_range_interval",
    "win_sessionize",
    "merge_upsert",
]

MUST_BE_IN_WINDOW = STALEST_FRONTED_R13 + CHANGED_IN_ROUND_13 + NEW_IN_ROUND_13

WINDOW = 50


def test_round13_priority_ops_register_inside_driver_window():
    keys = list(registry.queries())
    window = set(keys[:WINDOW])
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"ops outside the driver's first-{WINDOW} correctness window: {missing}; "
        "fix registry._WINDOW_PRIORITY"
    )


def test_stalest_debt_leads_the_window():
    # The fronted stale keys must come FIRST (before this round's changes
    # and additions), so even a driver window narrower than 50 covers as
    # many of them as possible — they are the round's refresh ask.
    keys = list(registry.queries())
    assert keys[: len(STALEST_FRONTED_R13)] == STALEST_FRONTED_R13


def test_changed_tier_outranks_new():
    keys = list(registry.queries())
    n = len(STALEST_FRONTED_R13)
    assert keys[n : n + len(CHANGED_IN_ROUND_13)] == CHANGED_IN_ROUND_13
    m = n + len(CHANGED_IN_ROUND_13)
    assert keys[m : m + len(NEW_IN_ROUND_13)] == NEW_IN_ROUND_13


def test_window_is_exactly_filled():
    # 10 stale + 16 changed + 24 new = 50: no dead slots, no extras.
    assert len(MUST_BE_IN_WINDOW) == WINDOW


def test_stalest_tier_leads_the_behind_window_order():
    keys = list(registry.queries())
    n = len(MUST_BE_IN_WINDOW)
    behind = keys[n : n + len(STALEST_FRONT_R14)]
    assert behind == STALEST_FRONT_R14, behind


def test_registry_is_deterministic_and_complete():
    a = list(registry.queries())
    b = list(registry.queries())
    assert a == b
    assert len(a) >= 105
    # every oracle key corresponds to a registered query
    assert set(registry.oracle_sql()) <= set(a)


def test_window_priority_keys_all_exist():
    """_apply_window_priority silently skips unknown keys ('if k in OPS'),
    so a typo or a renamed op would quietly fall out of the intended
    registration order. Pin: every _WINDOW_PRIORITY entry — including the
    behind-window 51+ section — must be a registered op."""
    registry._ensure_loaded()
    missing = [k for k in registry._WINDOW_PRIORITY if k not in registry.OPS]
    assert not missing, f"_WINDOW_PRIORITY names unregistered ops: {missing}"


def test_window_priority_covers_every_registered_key():
    """The rotation regenerates the full priority list each round; every
    registered key must appear exactly once so the behind-window order
    (the next rotation's input) is fully pinned, not import-order luck."""
    registry._ensure_loaded()
    assert sorted(registry._WINDOW_PRIORITY) == sorted(registry.OPS)
