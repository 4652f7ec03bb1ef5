"""Cross-run determinism sweep (engine-wide).

Every oracle hash-compare implicitly assumes an op's output is a pure
function of its input — but Spark re-partitions, re-orders, and
re-schedules between runs, so any op leaning on partition order, float
summation order, or ties without a total order can drift run-to-run and
still pass a single-shot oracle check by luck. This sweep re-runs a
curated slice of the registry TWICE in one session and requires
bit-identical (sorted) rows.

The slice targets the ops most exposed to nondeterminism: iterative
fixpoints, hash/LSH families, sampled/derandomized ops, float-heavy
aggregates, and window stacks with tie-prone orderings. (kmeans/PCA have
their own two-scale determinism test in test_properties.py.)
"""

from __future__ import annotations

import pytest

from connor_fun_streamproducer_spark import registry
from tests.conftest import SF_DIR

registry._ensure_loaded()

SWEEP = [
    "agg_hash",                    # float sums, canonical rounding
    "agg_corr_pairs",              # integer-moment doubles
    "dedup_near_minhash",          # LSH banding + keeper assignment
    "dedup_simhash",               # bit sketches
    "dedup_substring_window",      # digest agg + join
    "sim_search_ivf",              # codebook + pruning
    "sim_search_pq",               # sampled codebooks + ADC
    "graph_connected_components",  # iterative fixpoint
    "graph_pagerank_dist",         # iterative float fixpoint
    "graph_top_similar_user",      # wedge join + tie-broken top-1
    "graph_label_propagation",     # sync LPA, fixed rounds, min-label ties
    "sample_reservoir",            # hash-priority sample
    "sample_negative_pairs",       # hash-probed sampling
    "corpus_shuffle_shard",        # md5-ordered shuffle
    "ts_interpolate_linear",       # quantized anchors
    "win_clamped_cumsum",          # stacked windows
    "ts_ohlc_candles",             # struct argmin/argmax ties
    "agg_heavy_hitters",           # two-phase MG
    "pipeline_basket_affinity",    # pair lift, integer ratios
    "graph_modularity",            # LPA labels + edge-label joins (r7)
    "graph_clustering_coefficient",  # checkpointed wedge/closure (r7)
    "dedup_containment_prefix",    # prefix filter + size guard (r7)
    "dedup_cdc_chunks",            # md5-derived breakpoints (r7)
    "corpus_dedup_pipeline",       # three-tier cascade (r7)
    "agg_extremal_by",             # packed-key max_by/min_by ties (r7)
    "win_rolling_corr",            # duplicate-row window ties (r7)
    "corpus_vocab_coverage",       # count-tie rank ordering (r7)
    "ts_sma_crossover",            # window + lag tie-breaks (r7)
    "dedup_minhash_banded",        # md5-stream LSH keeper assignment (r7)
    "text_zipf_alpha",             # sorted-array float folds (r7)
    "stats_cramers_v",             # sorted-cell chi2 fold (r7)
    "dedup_eval_tiers",            # all-pairs truth + LSH compose (r7)
    "pipeline_event_trigrams",     # count-tie topk ordering (r7)
    "dedup_minhash_estimate",      # LSH candidates + lane agreement (r8)
    "sample_kcenter_coreset",      # iterative argmax trajectory (r8)
    "stats_mutual_info_cat",       # sorted-cell float fold (r8)
    "corpus_epoch_plan",           # md5-ordered remainder cumsum (r8)
    "sim_search_lsh",              # rounded sign buckets + recall join (r8)
    "graph_hits",                  # iterative decimal fixpoint, rank ties (r8)
    "ts_holt_forecast",            # ordered 2-state float fold (r8)
    "sample_walk_pairs",           # md5-driven walk trajectories (r8)
    "dedup_cluster_canonical",     # LSH pairs -> min-label fixpoint (r8)
    "corpus_cross_source_dup",     # integral bp rollup of LSH pairs (r8)
    "text_ngram_novelty",          # first-seen min over exploded grams (r8)
    "ts_seasonal_residual_anomaly",  # deviation top-k tie-breaks (r8)
    "stats_runs_test",             # lag-window run boundaries + z fold (r8)
    "dedup_simhash_banded",        # md5-lane majority bits + band keepers (r9)
    "dedup_threshold_sweep",       # LSH candidates + cumulative window (r9)
    "sim_search_hamming",          # sign-bit words, hamming-tie top-k (r9)
    "embedding_dim_profile",       # integer moments + variance-rank ties (r9)
    "embedding_cluster_kmeans",    # unrolled Lloyd, integer-sum updates (r9)
    "dedup_minhash_cluster",       # bucket-star min-label fixpoint (r9)
    "dedup_embedding",             # cell blocks + rounded threshold (r9)
    "stats_ljung_box",             # ACF moments -> Q polynomial (r9)
    "ts_croston",                  # ordered 3-state float fold (r9)
    "ts_peak_concurrency",         # sweep-line ties at equal instants (r9)
    "stats_trimmed_mean",          # rank-cut tails, duplicate cents ties (r9)
    "sample_systematic",           # md5-rank stride picks (r9)
    "corpus_split_leakage",        # closure x split-hash compose (r9)
    "pipeline_order_lead_time",    # rank-indexed percentile picks (r9)
    "embedding_cluster_label_mix", # kmeans fixpoint + label join (r9)
    "ts_theil_sen",                # slope-tie rank median (r9)
    "ts_forecast_backtest",        # sliced 2-state float fold (r9)
    "corpus_mix_kl_drift",         # sorted-cell KL folds (r9)
    "text_js_divergence_sources",  # vocab-rank JSD folds, count-tie top-K (r9)
    "sample_downweight_duplicates",  # closure sizes -> weights (r9)
    "dedup_cluster_size_profile",  # closure-size histogram (r10)
    "sample_effective_size",       # integral ESS over closure weights (r10)
    "corpus_dedup_savings",        # canonical-membership char rollup (r10)
    "ts_periodogram_fixed",        # shared integer trig-table folds (r10)
    "ts_event_gaps",               # gap rank picks under duplicate gaps (r10)
    "stats_welch_ttest",           # era integer moments -> t polynomial (r10)
    "stats_srm_check",             # md5-parity arm counts (r10)
    "pipeline_part_velocity",      # velocity-tie top-k ordering (r10)
    "text_ttr_by_source",          # distinct-type counting (r10)
    "embedding_norm_profile",      # integer norm² fold + bucketing (r10)
    "ts_mann_kendall",             # pair-sign sums + tie-corrected z (r10)
    "ts_var_es",                   # rank-cut tail picks under value ties (r10)
    "pipeline_order_aging",        # anchored integer age bucketing (r10)
    "win_ratio_to_report",         # whole-partition-denominator window (r10)
    "dedup_exact_normalized",      # regex-normalized digest keeper stars (r10)
    "sample_ipw_weights",          # capped integral reweighting (r10)
    "ts_pacf",                     # Durbin-Levinson float recursion (r10)
    "pipeline_discount_depth",     # integral cross-multiplied money (r10)
    "pipeline_returns_rate",       # indicator-rate integral division (r10)
    "graph_component_sizes",       # CC fixpoint -> size histogram (r10)
    "sim_margin_profile",          # rank-1/2 picks under rounded-sim ties (r10)
    "text_readability_fk",         # regex folds + fixed FK polynomial (r10)
    "ts_outage_windows",           # lag over (te, event_id) total order (r10)
    "dedup_vector_exact",          # quantized-digest distinct counting (r10)
    "stats_cohens_d_eras",         # era integer moments -> d polynomial (r11)
    "stats_brown_forsythe",        # rank-pick medians + |z| moments -> F (r11)
    "stats_mood_median",           # pooled rank-pick median + 2x2 chi2 (r11)
    "stats_mann_whitney",          # doubled-rank integers + tie-corrected z (r11)
    "stats_cliff_delta",           # exact rational of doubled rank-sum (r11)
    "ts_bollinger_breakout",       # all-integer trailing band compare (r11)
    "sample_pps_systematic",       # integral threshold crossings in hash order (r11)
    "text_hapax_rate",             # count-of-count integers per source (r11)
    "pipeline_price_volume_bridge",  # era pivot + fixed rational effects (r11)
    "pipeline_discount_elasticity",  # integer regression moments -> slope (r11)
    "graph_degree_gini",           # rank-weighted degree sum invariance (r11)
    "stats_quantile_ci",           # order-statistic rank picks (r11)
    "ts_seasonality_strength",     # fixed 7-col pivot, order-free SSB (r11)
    "corpus_quality_token_curve",  # banded integral shares + bounded window (r11)
    "ts_dispersion_index",         # integer count moments -> fixed D (r11)
    "corpus_source_overlap_jaccard",  # distinct-set intersections, integral bp (r11)
    "graph_rich_club_coefficient",   # rank-pick club + integer edge counts (r11)
    "embedding_isotropy_pairs",    # md5-bucket pairs, integer micro-unit sums (r11)
    "ts_seasonal_naive_error",     # day-arithmetic lags, integral WMAPE (r11)
    "embedding_centroid_drift",    # undivided common-denominator diffs (r11)
    "sim_search_radius",           # rounded-cos threshold, count window (r11)
    "join_asof_forward",           # mirrored carry tape, total-order ties (r11)
    "stats_power_mde",             # era integer moments -> SE/MDE polynomial (r11)
    "stats_kendall_tau_binned",    # contingency pair counting, integer C/D (r11)
    "pipeline_repeat_buyers",      # two-level distinct-count rollup (r11)
    "text_word_length_profile",    # explode lengths, integral bands (r11)
    "sim_doc_topk_minhash",        # lane-bucket pairs, count-tie top-k (r11)
    "embedding_cluster_separation",  # Lloyd artifact + quantized means (r11)
    "win_active_streak_latest",    # islands grp key + max-day rank pick (r11)
    "ts_hour_of_week_profile",     # integer div/mod buckets + window share (r11)
    "graph_two_hop_reach",         # wedge join + anti-join set counts (r11)
    "stats_anova_oneway",          # sorted-pair moment fold (r12)
    "stats_jarque_bera",           # decimal power sums -> JB polynomial (r12)
    "stats_cohens_h",              # pooled-median rank pick + asin gap (r12)
    "stats_trend_proportions",     # quarter scores + rank-pick median (r12)
    "stats_spearman_binned",       # doubled-rank contingency moments (r12)
    "ts_turning_points",           # integer lag/lead sign compares (r12)
    "ts_burstiness",               # gap moments under total order (r12)
    "ts_cross_correlation",        # zero-padded integer CCF moments (r12)
    "ts_spectral_entropy",         # quantized trig sums + ordered fold (r12)
    "ts_records_count",            # running-max records + harmonic fold (r12)
    "pipeline_backlog_burndown",   # full-join week union + integer cumsum (r12)
    "pipeline_nation_trade_balance",  # shared fact subtree, two rollups (r12)
    "pipeline_fill_rate",          # integer day-diff indicator shares (r12)
    "pipeline_brand_supplier_hhi", # floored integral shares squared (r12)
    "sample_balanced_downsample",  # md5-rank class caps (r12)
    "sample_horvitz_thompson",     # integral HH estimator replay (r12)
    "embedding_triplet_violation", # md5-budgeted triplets, integer d2 (r12)
    "corpus_doc_length_gini",      # per-source rank-weighted length sum (r12)
    "text_prefix_template_rate",   # opening-slice digest groups (r12)
    "dedup_band_occupancy",        # bands-artifact bucket histogram (r12)
    "fn_binary_codec",             # codec roundtrip identities (r12)
    "fn_struct_ops",               # struct lexicographic compares (r12)
    "agg_geometric_mean",          # sorted daily-value ln fold (r12)
    "graph_edge_locality",         # artifact edges + nation lookups (r12)
    "graph_knn_degree_curve",      # integer slot/degree sums (r12)
    "stats_kruskal_wallis",        # distributed pooled rank + tie fold (r13)
    "stats_theil_u",               # sorted entropy folds (r13)
    "stats_gk_lambda",             # all-integer modal counts (r13)
    "stats_mcnemar",               # paired presence flips (r13)
    "stats_wilcoxon_signed_rank",  # per-type |d| ranks, doubled ties (r13)
    "ts_page_hinkley",             # 10-slot sequential IEEE fold (r13)
    "ts_sample_entropy",           # integer Chebyshev template pairs (r13)
    "ts_hurst_rs",                 # quantized block R/S + OLS fold (r13)
    "pipeline_price_dispersion",   # integral milli-cent unit prices (r13)
    "pipeline_new_vs_repeat_revenue",  # per-customer min-date window (r13)
    "sample_weighted_topk_es",     # md5-u priority keys, top-k merge (r13)
    "agg_hll_manual",              # md5 registers, sorted harmonic fold (r13)
    "embedding_prefix_variance",   # quantized variance prefix shares (r13)
    "text_ngram_entropy_rate",     # sufficient-statistic entropies (r13)
    "text_vocab_growth_heaps",     # md5 level curve + OLS fold (r13)
    "dedup_cluster_source_purity", # closure artifact + integer purity (r13)
    "multimodal_silence_runs",     # kernel peaks + islands runs (r13)
    "graph_adamic_adar",           # quantized wedge contributions (r13)
    "graph_harmonic_centrality",   # md5-pinned multi-source BFS (r13)
    "agg_median_distributed",      # rank-selection median (r13)
    "embedding_pca_project",       # fixed-round deflated power iteration (r13)
    "stats_event_lateness",        # sharded two-pass frontier (r13)
    "agg_gini_concentration",      # distributed rank moments (r13)
    "win_lorenz_deciles",          # arithmetic NTILE from ranks (r13)
    "graph_ego_density",           # artifact wedge/degree counts (r13)
    "pipeline_vendor_consolidation_savings",  # integral what-if spend (r13)
    "stats_permutation_shift",     # md5 sign-flip replicas (r13)
    "agg_quantiles_distributed",   # rank-selection quantile vector (r13)
    "text_gopher_rules",           # integer rule gates + per-doc mode (r14)
    "text_vocab_chao1",            # abundance-profile richness ints (r14)
    "stats_dunn_posthoc",          # pooled-rank pairwise z + crit table (r14)
    "corpus_perplexity_buckets",   # quantized NLL rank terciles (r14)
    "stats_cvm_eras",              # doubled-midrank integral distance (r14)
    "multimodal_gain_normalize",   # integer gain staging checksums (r14)
    "stats_friedman",              # blocked midrank chi2, integer terms (r14)
    "stats_page_trend",            # slot-weighted blocked ranks (r14)
    "stats_jonckheere_terpstra",   # count-grid pairwise U + tie var (r14)
    "corpus_kn_bigram_xent",       # integer-count KN, quantized NLL fold (r14)
    "multimodal_shot_boundary",    # sequential cut scan inside Arrow batch (r14)
    "stats_cochran_q",             # integer presence-matrix chi2 (r14)
    "embedding_whiten",            # shared PCA solve + eigenvalue literals (r14)
    "graph_betweenness_sampled",   # md5 seeds, quantized dependency pass (r14)
    "stats_mantel_haenszel",       # stratified 2x2 sorted fold (r14)
    "stats_cohens_kappa",          # integer-gate 2x2 agreement (r14)
]


@pytest.mark.parametrize("key", SWEEP)
def test_two_runs_bit_identical_across_partitionings(spark, key):
    """Second run executes under a DIFFERENT partitioning (prime shuffle
    partition count, small scan splits) — two runs under the same layout
    can agree by accident; surviving a re-partitioned world is the
    actual determinism claim."""
    fn = registry.OPS[key].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    perturb = {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in perturb}
    try:
        for k, v in perturb.items():
            spark.conf.set(k, v)
        b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert a == b, f"{key} drifted under a different partitioning"


# The iterative / sampled subset re-checked at the driver's correctness
# scale: fixpoint round counts and sample strides differ at sf0.01, so
# scale-dependent nondeterminism would hide at sf0.001 alone.
SWEEP_SF001 = [
    "dedup_minhash_banded",
    "dedup_eval_tiers",
    "graph_label_propagation",  # fixed-round sync fixpoint (r8: shared helper)
    "graph_modularity",         # grades the SAME labels via _lpa_labels (r8)
    "sample_kcenter_coreset",   # greedy trajectory must not drift (r8)
    "embedding_knn_label_purity",
    "graph_connected_components",
    "graph_pagerank_dist",
    "sim_search_pq",
    "dedup_near_minhash",
    "sample_reservoir",
    "sample_negative_pairs",
    "agg_heavy_hitters",
    "corpus_shuffle_shard",
    "embedding_triplet_violation",  # md5-budget picks differ by scale (r12)
    "sample_balanced_downsample",   # md5-rank class caps differ by scale (r12)
    "sample_horvitz_thompson",      # threshold crossings differ by scale (r12)
    "stats_kruskal_wallis",         # shard cuts differ by scale (r13)
    "agg_median_distributed",       # rank selection across shards (r13)
    "graph_harmonic_centrality",    # frontier rounds differ by scale (r13)
    "embedding_pca_project",        # iteration inputs differ by scale (r13)
    "agg_quantiles_distributed",    # shard cuts differ by scale (r13)
    "stats_dunn_posthoc",           # pooled-rank shard cuts differ by scale (r14)
    "corpus_perplexity_buckets",    # per-lang rank shard cuts differ by scale (r14)
    "corpus_kn_bigram_xent",        # doc_id-midpoint split differs by scale (r14)
    "embedding_whiten",             # iteration inputs differ by scale (r14)
    "graph_betweenness_sampled",    # seed picks + frontier shapes differ by scale (r14)
]


@pytest.mark.parametrize("key", SWEEP_SF001)
def test_two_runs_bit_identical_at_sf001(spark, key):
    fn = registry.OPS[key].fn
    sf = "/root/testdata/sf0.01"
    a = sorted(map(tuple, fn(spark, sf).collect()))
    b = sorted(map(tuple, fn(spark, sf).collect()))
    assert a == b, f"{key} drifted between runs at sf0.01"
