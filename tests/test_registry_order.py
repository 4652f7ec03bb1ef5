"""Pin the registry registration order contract.

The driver's correctness harness verifies ops in registration order with a
bounded window (round 1 covered exactly the first 50 keys). Round 1 proved
the relational/function/batch-source tiers green; this test pins that the
tiers that were OUTSIDE round 1's window — the REF-tier streaming pipeline
(incl. the flagship ``agg_window_count``), streaming windows/stateful, the
LLM data-pipeline ops, the UDF surface, the scale patterns, and the fixed
``agg_approx`` — now register inside the first 50 keys, so the driver's
round-2 run produces hard correctness evidence for them.

Reference behaviors being verified by those ops: the 30 s monitor window
(reference regionSpout.go:102-111) and the region enrichment
(regionSpout.go:84-94,128-130).
"""

from connor_fun_streamproducer_spark import registry

# Every op the round-1 driver run never reached, plus the one op that
# errored (agg_approx — now returns scalar quantile columns).
MUST_BE_IN_WINDOW = [
    # REF tier
    "agg_window_count",
    "enrich_region",
    "enrich_region_grid",
    "route_by_key",
    "proj_serialize",
    "sink_kafka",
    "src_config_scan",
    "src_stream_geo",
    "fanout_union",
    "stream_health_monitor",
    # streaming
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark",
    "stream_dedup",
    "stream_stateful",
    "stream_late_policy",
    "join_stream_static",
    "join_stream_stream",
    "src_rate",
    "src_socket",
    "sink_foreachbatch",
    # LLM data-pipeline
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_minhash_cluster",
    "sim_search_topk",
    "sim_search_lsh",
    "sim_search_ivf",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "multimodal_cols",
    # UDF surface
    "udf_scalar",
    "udaf_grouped",
    "udtf_table",
    # scale patterns
    "agg_skew_salted",
    "join_bucketed",
    "rollup_time_hierarchy",
    "agg_sketch_merge",
    # round-1 harness failure, now fixed
    "agg_approx",
    # new in round 2
    "pipeline_shipping_priority_bucketed",
]

WINDOW = 50


def test_previously_unchecked_ops_register_inside_driver_window():
    keys = list(registry.queries())
    window = set(keys[:WINDOW])
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"ops outside the driver's first-{WINDOW} correctness window: {missing}; "
        "reorder registry._ensure_loaded() imports"
    )


def test_registry_is_deterministic_and_complete():
    a = list(registry.queries())
    b = list(registry.queries())
    assert a == b
    assert len(a) >= 92
    # every oracle key corresponds to a registered query
    assert set(registry.oracle_sql()) <= set(a)
