"""Query registry: the bridge between engine operators and the driver's
correctness harness (``__spark_entry__.py``).

Each implemented operator registers a named callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL string the
DuckDB oracle runs on the same parquet files. Aliasing discipline: every
computed column is aliased identically in the Spark plan and the oracle SQL
(the driver sorts columns by name and hashes values).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_QUERY_MODULES = [
    "ab_inbev_big_data_case_spark.queries.medallion",
    "ab_inbev_big_data_case_spark.queries.scalar",
    "ab_inbev_big_data_case_spark.queries.aggregates",
    "ab_inbev_big_data_case_spark.queries.joins",
    "ab_inbev_big_data_case_spark.queries.windows",
    "ab_inbev_big_data_case_spark.queries.setops",
    "ab_inbev_big_data_case_spark.queries.streaming_twins",
    "ab_inbev_big_data_case_spark.queries.udfs",
    "ab_inbev_big_data_case_spark.queries.analytics",
    "ab_inbev_big_data_case_spark.queries.llm",
    "ab_inbev_big_data_case_spark.queries.sources",
    "ab_inbev_big_data_case_spark.queries.warehouse",
    "ab_inbev_big_data_case_spark.queries.mlstats",
    "ab_inbev_big_data_case_spark.queries.llm_curation",
    "ab_inbev_big_data_case_spark.queries.timeseries",
    "ab_inbev_big_data_case_spark.queries.retail",
    "ab_inbev_big_data_case_spark.queries.distmetrics",
    "ab_inbev_big_data_case_spark.queries.privacy",
    "ab_inbev_big_data_case_spark.queries.rankcorr",
    "ab_inbev_big_data_case_spark.queries.allocation",
    "ab_inbev_big_data_case_spark.queries.linkpred",
]

# The driver's correctness harness verifies the FIRST 50 registered queries
# per round, so registration order decides what gets independent
# verification. Union r1-r6: 262 of 358 registered names driver-checked,
# all green on latest evidence; 96 had never been in a driver window.
#
# The round-7 window holds 50 of those 96 never-checked names (VERDICT r6
# item 2): the 18 post-close-sweep additions FIRST (they include the two
# round-7 plan-shape rewrites, woe_iv_binning and bh_fdr_chi2_panel, so the
# fixes get driver evidence immediately), then the first 32 of the 78-name
# round-5/6 backlog. _STAGED_NEXT holds the remaining 46 never-checked
# names for round 8, followed by the 19 r1-only stale greens (displaced in
# r5: the outer-join and window-frame families) so the round-9 rotation is
# pre-staged. All 96 were pre-cleared locally at sf0.01 and sf0.1 before
# this rotation landed.
_CHECK_FIRST = [
    "max_drawdown_daily",
    "spc_control_chart",
    "effective_source_count",
    "logrank_test",
    "qini_curve_deciles",
    "matrix_profile_daily",
    "deltalite_merge_time_travel",
    "multimodal_pixel_decode",
    "t_closeness_audit",
    "deltalite_change_data_feed",
    "sprt_sequential_test",
    "ridge_regression_sweep",
    "spatial_grid_radius_join",
    "sssp_bounded_hops",
    "quantile_normalize_lengths",
    "bh_fdr_chi2_panel",
    "seat_apportionment",
    "woe_iv_binning",
    "heaps_law_fit",
    "importance_weight_ess",
    "feature_hash_collision_audit",
    "winnowing_fingerprints",
    "entropy_rate_bigram",
    "time_weighted_avg",
    "ts_decomposition",
    "seasonal_residual_anomaly",
    "error_rate_changepoint",
    "mann_kendall_theil_sen",
    "ccf_lead_lag",
    "abc_pareto_class",
    "item_item_cosine",
    "label_propagation_communities",
    "community_modularity",
    "graph_assortativity",
    "recsys_coverage_eval",
    "leaderboard_rank_shift",
    "kcore_peeling",
    "basket_lift_rules",
    "price_elasticity",
    "gini_concentration",
    "ks_two_sample",
    "auc_mann_whitney",
    "js_divergence_sources",
    "burstiness_fano",
    "reliability_calibration_bins",
    "mcnemar_dedup_paths",
    "permutation_test_ab",
    "lorenz_curve_points",
    "markov_next_event_accuracy",
    "k_anonymity_audit",
]

# Round-8 window candidates: the remaining 46 never-checked names, then the
# 19 r1-only stale greens (5-round-old evidence, queued for re-check).
_STAGED_NEXT = [
    "l_diversity_audit",
    "spearman_corr_lengths",
    "kendall_tau_nations",
    "interval_allocation_daily",
    "resource_allocation_links",
    "readability_scores",
    "matryoshka_truncation_eval",
    "did_estimator",
    "rolling_active_users",
    "newsvendor_quantile_stock",
    "fellegi_sunter_scores",
    "hll_set_intersection",
    "caliper_matching",
    "sax_motifs",
    "covariate_balance_smd",
    "edge_triangle_support",
    "laspeyres_price_index",
    "map_at_k_eval",
    "lateral_topk_per_group",
    "hierarchical_share_rollup",
    "holiday_lift",
    "oov_rate_heldout",
    "phrase_search_positional",
    "interarrival_burstiness",
    "cross_table_consistency_audit",
    "negbin_overdispersion_fit",
    "market_basket_triples",
    "price_jump_events",
    "gains_chart_deciles",
    "ivf_nprobe_sweep",
    "wilcoxon_signed_rank",
    "position_based_attribution",
    "embedding_dim_robust_stats",
    "levene_test",
    "runs_test_randomness",
    "pacf_lags",
    "simpson_slope_reversal",
    "matched_att_estimate",
    "dedup_transitivity_audit",
    "forecast_method_bakeoff",
    "embedding_isotropy_audit",
    "duplicate_payment_audit",
    "last_digit_uniformity",
    "lsh_index_delta_pairs",
    "media_metadata_extract",
    "ahash_image_dedup",
    # --- round-7 additions (never driver-checked; each locally green at
    # sf0.001/0.01/0.1 at registration time) — queue for the r8/r9 windows
    # alongside the 46 above ---
    "ips_offpolicy_eval",
    "mutual_nearest_neighbors",
    "kmv_distinct_estimate",
    "multimodal_audio_features",
    "xml_scan",
    "deltalite_optimize_compaction",
    "bitemporal_as_of",
    "kruskal_wallis_test",
    "isotonic_calibration_pava",
    "quantile_regression_grid",
    "chow_test",
    "nelson_aalen_hazard",
    "mood_median_test",
    "friedman_test",
    "jonckheere_terpstra",
    "direct_standardization",
    "mh_pooled_odds_ratio",
    "survey_raking_ipf",
    "abtest_srm_check",
    "split_conformal_coverage",
    "loo_source_influence",
    "kfold_cv_mae",
    "token_budget_pack",
    "granger_f_lite",
    "dtw_weekly_profiles",
    "cmh_test",
    "energy_distance_two_sample",
    "wasserstein1_distance",
    "qq_plot_deciles",
    "cvm_two_sample",
    "hurst_rs_lite",
    "ngram_coverage_curve",
    # --- r1-only stale greens (re-check after the never-checked drain) ---
    "window_lag_lead",
    "window_running",
    "window_rank",
    "window_ntile",
    "window_range_frame",
    "window_first_last",
    "join_left_outer",
    "join_full_outer",
    "join_cross",
    "join_multikey",
    "pivot_agg",
    "histogram_bucket",
    "topk_global",
    "salted_agg",
    "dedup_latest",
    "argmax_agg",
    "join_semi",
    "join_anti",
    "window_topk_group",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the harness, optionally with its oracle SQL.

    Queries without oracle SQL (streaming/pandas-UDF ops not expressible in
    DuckDB) get the driver's weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The harness may hand us a session without engine defaults;
            # timestamp semantics (tz-naive fixtures vs session TZ) and AQE
            # are runtime-settable, so pin them here defensively.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent) so registration side-effects
    run, then reorder the registry so ``_CHECK_FIRST`` names occupy the
    driver-verified leading slots."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)

    missing = [n for n in _CHECK_FIRST + _STAGED_NEXT if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_CHECK_FIRST names not registered: {missing}")
    if len(_CHECK_FIRST) > 50:
        raise RuntimeError(
            f"_CHECK_FIRST has {len(_CHECK_FIRST)} entries; the driver only "
            "verifies the first 50"
        )
    head = _CHECK_FIRST + _STAGED_NEXT
    ordered = head + [n for n in QUERIES if n not in head]
    for reg in (QUERIES, ORACLE):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})
