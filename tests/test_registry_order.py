"""Pin the registry registration order contract.

COMPLETE correctness coverage lives in tests/test_oracle.py, which runs
every registered op against its DuckDB oracle on every test run — no op is
ever unguarded locally, whatever an external harness samples.

Separately, the external driver verifies ops in registration order with a
bounded window (each round covers the first 50 keys). The registration
order is freshness-priority, applied the same rule each round: (1) ops
never externally checked (round 3 registered 34 keys behind the r03
window — VERDICT r3 lists them; closing that debt is round 4's top
order); (2) ops changed this round; (3) everything else in prior order.
This test pins round 4's resulting window.
"""

from connor_fun_streamproducer_spark import registry

# The 34 keys with no external CORRECTNESS row across r01-r03, plus
# round-4 changed ops — all must land in the driver's first-50 window.
NEVER_EXTERNALLY_CHECKED = [
    "scan_orc",
    "sql_api",
    "sim_search_topk_arrow",
    "join_skew_salted",
    "multimodal_framesample",
    "multimodal_resize",
    "text_chunk",
    "text_repetition",
    "sample_split",
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
    "stream_cdc_merge",
    "agg_histogram",
    "agg_kll_quantile",
    "agg_theta_setops",
    "sink_partition_prune",
    "join_runtime_filter",
    "pipeline_nation_volume",
    "pipeline_promo_share",
    "pipeline_large_volume_orders",
    "pipeline_dormant_accounts",
    "pipeline_late_shipment_priority",
]

CHANGED_IN_ROUND_4 = [
    "dedup_ngram_jaccard",  # prefix-filter candidate generation
    "dedup_embedding",      # corpus-size-derived quantizer cells
    "multimodal_decode",    # new: real PPM pixel decode
    "graph_pagerank_dist",  # new: un-collected iterative path
    "pipeline_market_share",
    "pipeline_product_profit",
    "pipeline_disjunctive_revenue",
    "merge_scd2",
    "pipeline_top_supplier",
    "win_distribution",
    "agg_stats_moments",
    "fn_conditional",
    "join_asof_sorted",
    "stream_topk_windows",
    "sink_socket_roundtrip",
    "fn_xml_roundtrip",
]

MUST_BE_IN_WINDOW = NEVER_EXTERNALLY_CHECKED + CHANGED_IN_ROUND_4

WINDOW = 50


def test_round4_priority_ops_register_inside_driver_window():
    keys = list(registry.queries())
    window = set(keys[:WINDOW])
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"ops outside the driver's first-{WINDOW} correctness window: {missing}; "
        "fix registry._WINDOW_PRIORITY"
    )


def test_never_checked_keys_lead_the_window():
    # The 34 debt keys must come FIRST (before round-4 changes), so even a
    # driver window narrower than 50 covers as many of them as possible.
    keys = list(registry.queries())
    assert keys[: len(NEVER_EXTERNALLY_CHECKED)] == NEVER_EXTERNALLY_CHECKED


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
