"""Pin the registry registration order contract.

COMPLETE correctness coverage lives in tests/test_oracle.py, which runs
every registered op against its DuckDB oracle on every test run — no op is
ever unguarded locally, whatever an external harness samples.

Separately, the external driver verifies ops in registration order with a
bounded window (each round covers the first 50 keys). The registration
order is freshness-priority, applied the same rule each round: (1) ops
never externally checked / stalest externally-green debt the verdict
fronted; (2) ops changed this round; (3) ops NEW this round (inside the
window since round 10, so new work is externally proven the round it
lands instead of carrying one round of debt). This test pins round 12's
resulting window.
"""

from connor_fun_streamproducer_spark import registry

# (1) The 21 r1-r3-vintage hash-proven keys displaced by round 11's new
# ops — VERDICT r11 pinned them as the round's structural debt and asked
# the r12 window to front them (next-round item #1).
DISPLACED_FRONTED_R12 = [
    "pipeline_local_supplier_volume",
    "pipeline_returned_items",
    "fn_array_explode",
    "fn_date_bucket",
    "fn_json_roundtrip",
    "fn_map_entries",
    "enrich_region_grid",
    "sink_foreachbatch",
    "set_intersect",
    "set_except",
    "set_except_all",
    "set_intersect_all",
    "set_union_all",
    "pipeline_shipping_priority_bucketed",
    "rate_stagger",
    "stream_stateful",
    "stream_stateful_tws",
    "win_analytic",
    "win_frame",
    "win_rank",
    "join_stream_stream",
]

# (2) Externally green before, but changed in round 12: the eval-tiers
# truth-slice materialization (VERDICT r11 #2) and the ADVICE r11 fixes
# (decimal widening before the centroid-drift/gini products, unused
# window removed from the quality-token curve).
CHANGED_IN_ROUND_12 = [
    "embedding_centroid_drift",
    "graph_degree_gini",
    "corpus_quality_token_curve",
    "dedup_eval_tiers",
]

# (3) NEW in round 12 — inside the window so they gain an external row
# THIS round (standing policy since r10), budgeted ≤25 so the fronted
# stale debt still clears.
NEW_IN_ROUND_12 = [
    "stats_anova_oneway",
    "stats_jarque_bera",
    "stats_cohens_h",
    "stats_trend_proportions",
    "stats_spearman_binned",
    "ts_turning_points",
    "ts_burstiness",
    "ts_cross_correlation",
    "ts_spectral_entropy",
    "ts_records_count",
    "pipeline_backlog_burndown",
    "pipeline_nation_trade_balance",
    "pipeline_fill_rate",
    "pipeline_brand_supplier_hhi",
    "sample_balanced_downsample",
    "sample_horvitz_thompson",
    "embedding_triplet_violation",
    "corpus_doc_length_gini",
    "text_prefix_template_rate",
    "dedup_band_occupancy",
    "fn_binary_codec",
    "fn_struct_ops",
    "agg_geometric_mean",
    "graph_edge_locality",
    "graph_knn_degree_curve",
]

# First in line behind the window: the stalest externally-green tier
# (r4-vintage) — the r13 rotation's input, pinned.
STALEST_FRONT_R13 = [
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

MUST_BE_IN_WINDOW = DISPLACED_FRONTED_R12 + CHANGED_IN_ROUND_12 + NEW_IN_ROUND_12

WINDOW = 50


def test_round12_priority_ops_register_inside_driver_window():
    keys = list(registry.queries())
    window = set(keys[:WINDOW])
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"ops outside the driver's first-{WINDOW} correctness window: {missing}; "
        "fix registry._WINDOW_PRIORITY"
    )


def test_displaced_debt_leads_the_window():
    # The fronted stale-debt keys must come FIRST (before this round's
    # changes and additions), so even a driver window narrower than 50
    # covers as many of them as possible — they are the round's ask.
    keys = list(registry.queries())
    assert keys[: len(DISPLACED_FRONTED_R12)] == DISPLACED_FRONTED_R12


def test_changed_tier_outranks_new():
    keys = list(registry.queries())
    n = len(DISPLACED_FRONTED_R12)
    assert keys[n : n + len(CHANGED_IN_ROUND_12)] == CHANGED_IN_ROUND_12
    m = n + len(CHANGED_IN_ROUND_12)
    assert keys[m : m + len(NEW_IN_ROUND_12)] == NEW_IN_ROUND_12


def test_window_is_exactly_filled():
    # 21 fronted + 4 changed + 25 new = 50: no dead slots, no extras.
    assert len(MUST_BE_IN_WINDOW) == WINDOW


def test_stalest_tier_leads_the_behind_window_order():
    keys = list(registry.queries())
    n = len(MUST_BE_IN_WINDOW)
    behind = keys[n : n + len(STALEST_FRONT_R13)]
    assert behind == STALEST_FRONT_R13, behind


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
