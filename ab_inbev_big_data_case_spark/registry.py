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
# verification. Union r1-r7: 312 of 390 registered names driver-checked,
# all green on latest evidence (CORRECTNESS_r07.json: 50/50); 78 had never
# been in a driver window.
#
# The round-8 window (VERDICT r7 item 1) holds the first 50 of those 78:
# the 46-name round-5/6 backlog plus the first 4 round-7 additions. All 50
# were pre-cleared locally at sf0.01 (tools/check_oracle.py) before this
# rotation landed, and 12 of them were independently re-verified green by
# the round-7 judge (resource_allocation_links, lateral_topk_per_group,
# ivf_nprobe_sweep, pacf_lags, wilcoxon_signed_rank, media_metadata_extract,
# lsh_index_delta_pairs, hierarchical_share_rollup, phrase_search_positional,
# caliper_matching, fellegi_sunter_scores, rolling_active_users).
_CHECK_FIRST = [
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
    "ips_offpolicy_eval",
    "mutual_nearest_neighbors",
    "kmv_distinct_estimate",
    "multimodal_audio_features",
]

# Round-9 window, pre-staged (VERDICT r7 item 3). Arithmetic: 78 never-
# checked at r7 close − 50 promoted into the round-8 _CHECK_FIRST above =
# 28 never-checked round-7 additions (xml_scan … ngram_coverage_curve),
# then the 21 round-8 additions (periodogram_peaks … stratified_ate, each
# locally green at 3 SFs), then the 19 r1-only stale greens (outer-join and
# window-frame families, displaced in r5 — 6-round-old evidence by r9) = 68
# names: the round-9 window takes the first 50 (28 r7 + 21 r8 + 1 stale),
# leaving 18 stale greens for round 10.
_STAGED_NEXT = [
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
    # --- round-8 additions (never driver-checked; each verified locally at
    # sf0.001/0.01/0.1 at registration time) — behind the 28 r7 names so the
    # round-9 window takes the OLDEST backlog first; the tail spills into
    # round 10 with the stale greens below ---
    "periodogram_peaks",
    "bollinger_bands",
    "anderson_darling_two_sample",
    "hodges_lehmann_shift",
    "hits_hub_authority",
    "bullwhip_ratio",
    "nb_classifier_eval",
    "bradley_terry_strengths",
    "lsh_band_sweep",
    "markov_attribution_removal",
    "paasche_fisher_price_index",
    "herfindahl_index",
    "newey_west_variance",
    "esd_outlier_stats",
    "event_study_coefficients",
    "rdd_local_linear",
    "theil_atkinson_inequality",
    "betweenness_centrality",
    "burrows_delta_stylometry",
    "seasonal_strength",
    "stratified_ate",
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
