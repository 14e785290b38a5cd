"""Behavioral tests for the round-7 operator batch: statistical tests
(Kruskal-Wallis, CMH), calibration (isotonic PAVA, split conformal),
off-policy evaluation (IPS/SNIPS), data valuation (LOO source influence),
quantile regression, and reciprocal-NN pairing. Each query's VALUE
correctness is covered by its DuckDB oracle (tools/check_oracle.py); these
pin the semantic invariants an oracle hash can't express (monotonicity,
coverage guarantees, symmetry, argmin uniqueness)."""

from __future__ import annotations

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

load_all()


def test_isotonic_fit_is_monotone_and_mean_preserving(spark, sf_dir):
    rows = sorted(
        QUERIES["isotonic_calibration_pava"](spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["rate_iso_r"] for r in rows]
    assert iso == sorted(iso)  # PAVA output is nondecreasing
    assert all(0.0 <= x <= 1.0 for x in iso)
    # PAVA preserves the weighted mean of the response (up to rounding)
    n = sum(r["n"] for r in rows)
    assert abs(
        sum(r["n"] * r["rate_iso_r"] for r in rows) / n
        - sum(r["pos"] for r in rows) / n
    ) < 1e-4


def test_conformal_coverage_meets_marginal_guarantee(spark, sf_dir):
    r = QUERIES["split_conformal_coverage"](spark, sf_dir).collect()[0]
    # finite-sample guarantee is on the calibration quantile: k/(n_cal+1) >= 0.9;
    # empirical test coverage concentrates near it (exchangeable folds)
    assert r["k"] >= 0.9 * (r["n_cal"] + 1)
    assert r["coverage_r"] >= 0.85
    assert r["n_cal"] + r["n_test"] > 0 and r["qhat"] >= 0


def test_mutual_nearest_neighbors_reciprocal_and_unique(spark, sf_dir):
    rows = QUERIES["mutual_nearest_neighbors"](spark, sf_dir).collect()
    pairs = [(r["u"], r["v"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(u < v for u, v in pairs)
    # each vector participates in at most one reciprocal pair
    flat = [x for p in pairs for x in p]
    assert len(flat) == len(set(flat))


def test_kruskal_wallis_statistic_sane(spark, sf_dir):
    r = QUERIES["kruskal_wallis_test"](spark, sf_dir).collect()[0]
    assert r["k"] == 5 and r["n"] > 0
    assert r["h_r"] >= 0.0
    assert 0.0 < r["c_tie_r"] <= 1.0
    # the tie correction can only grow the statistic
    assert r["h_adj_r"] >= r["h_r"]


def test_cmh_components_consistent(spark, sf_dir):
    r = QUERIES["cmh_test"](spark, sf_dir).collect()[0]
    assert r["n_strata"] == 25
    assert r["sum_v_r"] > 0 and r["cmh_r"] >= 0.0
    # the statistic reproduces from its reported components
    assert abs((r["sum_a"] - r["sum_e_r"]) ** 2 / r["sum_v_r"] - r["cmh_r"]) < 1e-3


def test_quantile_regression_grid_argmin_per_tau(spark, sf_dir):
    rows = QUERIES["quantile_regression_grid"](spark, sf_dir).collect()
    assert len(rows) == 42
    for tau in (5, 9):
        tr = [r for r in rows if r["tau10"] == tau]
        mins = [r for r in tr if r["is_min"] == 1]
        assert len(mins) >= 1
        assert min(r["loss10_d"] for r in tr) == mins[0]["loss10_d"]
    # the tau=0.9 optimum slope is >= the median's (pinball asymmetry)
    b = {t: max(r["b_c"] for r in rows if r["tau10"] == t and r["is_min"] == 1)
         for t in (5, 9)}
    assert b[9] >= b[5]


def test_loo_influence_sums_consistent(spark, sf_dir):
    rows = QUERIES["loo_source_influence"](spark, sf_dir).collect()
    assert len(rows) == 20
    mean_all = rows[0]["mean_all_r"]
    for r in rows:
        assert r["mean_all_r"] == mean_all
        assert abs((r["mean_excl_r"] - mean_all) - r["influence_r"]) < 2e-6
    # influences must straddle zero unless all sources are identical
    infl = [r["influence_r"] for r in rows]
    assert min(infl) <= 0.0 <= max(infl)


def test_ips_snips_relationship(spark, sf_dir):
    r = QUERIES["ips_offpolicy_eval"](spark, sf_dir).collect()[0]
    assert 0 < r["n_matched"] <= r["n"]
    # IPS = SNIPS * (realized weight mass / n); with w=2 exactly:
    assert abs(r["ips_r"] - r["snips_r"] * 2 * r["n_matched"] / r["n"]) < 1e-4


def test_chow_f_nonnegative_and_pooled_dominates(spark, sf_dir):
    r = QUERIES["chow_test"](spark, sf_dir).collect()[0]
    assert r["n1"] > 0 and r["n2"] > 0
    # pooled SSR >= split SSR always (extra parameters can't fit worse)
    assert r["ln_ssr_pooled_r"] >= r["ln_ssr_split_r"]
    assert r["chow_f_r"] >= 0.0


def test_kfold_partitions_and_baseline_mae(spark, sf_dir):
    rows = QUERIES["kfold_cv_mae"](spark, sf_dir).collect()
    assert len(rows) == 5
    n = sum(r["n_test"] for r in rows)
    for r in rows:
        assert r["n_train"] == n - r["n_test"]  # folds partition the corpus
        assert r["mae_r"] > 0.0


def test_nelson_aalen_monotone_and_bounds_km(spark, sf_dir):
    import math

    na = {r["t_day"]: r for r in QUERIES["nelson_aalen_hazard"](spark, sf_dir).collect()}
    h = [na[t]["na_cumhaz_r"] for t in sorted(na)]
    assert h == sorted(h) and all(x > 0 for x in h)  # cumhaz nondecreasing
    km = {
        r["t_day"]: r["surv_r"]
        for r in QUERIES["kaplan_meier_survival"](spark, sf_dir).collect()
    }
    # exp(-H(t)) >= S_KM(t) pointwise (classic NA/KM inequality)
    for t, row in na.items():
        assert math.exp(-row["na_cumhaz_r"]) >= km[t] - 1e-9


def test_mood_median_splits_balance(spark, sf_dir):
    rows = QUERIES["mood_median_test"](spark, sf_dir).collect()
    assert len(rows) == 5
    ta = sum(r["n_above"] for r in rows)
    tb = sum(r["n_below"] for r in rows)
    # the exact median definition puts at least half at-or-below
    assert tb >= ta and all(r["chi2_term_r"] >= 0 for r in rows)


def test_energy_distance_nonnegative_and_self_zero(spark, sf_dir):
    r = QUERIES["energy_distance_two_sample"](spark, sf_dir).collect()[0]
    assert r["nx"] > 0 and r["ny"] > 0
    assert r["energy_d_r"] >= 0.0  # energy distance is a metric
    assert r["mean_xy_r"] > 0.0


def test_wasserstein_vs_mean_difference_bound(spark, sf_dir):
    from ab_inbev_big_data_case_spark.sources.readers import table
    from pyspark.sql import functions as F

    r = QUERIES["wasserstein1_distance"](spark, sf_dir).collect()[0]
    assert r["w1_dollars_r"] >= 0.0
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus").isin("F", "O"))
    m = (
        o.groupBy("o_orderstatus")
        .agg(F.avg("o_totalprice").alias("mu"))
        .collect()
    )
    gap = abs(m[0]["mu"] - m[1]["mu"])
    # |E X - E Y| <= W1 (Kantorovich duality with 1-Lipschitz f(x)=x)
    assert r["w1_dollars_r"] >= gap - 1e-3


def test_friedman_statistic_sane(spark, sf_dir):
    r = QUERIES["friedman_test"](spark, sf_dir).collect()[0]
    assert r["k"] == 5 and r["b"] > 0
    assert r["q_r"] >= 0.0 and 0.0 < r["c_tie_r"] <= 1.0


def test_jonckheere_pair_panel_consistent(spark, sf_dir):
    rows = QUERIES["jonckheere_terpstra"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        # doubled U is bounded by 2 * n_g * n_h; probability in [0,1]
        assert 0 <= r["u2_d"] <= 2.0 * r["n_g"] * r["n_h"]
        assert 0.0 <= r["p_gt_r"] <= 1.0


def test_qq_deciles_monotone_and_w1_consistent(spark, sf_dir):
    rows = sorted(
        QUERIES["qq_plot_deciles"](spark, sf_dir).collect(), key=lambda r: r["q"]
    )
    assert [r["q"] for r in rows] == list(range(1, 10))
    xs = [r["x_decile_c"] for r in rows]
    ys = [r["y_decile_c"] for r in rows]
    assert xs == sorted(xs) and ys == sorted(ys)  # quantiles nondecreasing
    for r in rows:
        assert r["gap_c"] == r["x_decile_c"] - r["y_decile_c"]


def test_direct_standardization_weights_average_out(spark, sf_dir):
    rows = QUERIES["direct_standardization"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["rate_std_r"] <= 1.0
        # standardization reweights WITHIN the observed rate range wiggle
        assert abs(r["rate_std_r"] - r["rate_raw_r"]) < 0.5


def test_mh_or_components(spark, sf_dir):
    import math

    r = QUERIES["mh_pooled_odds_ratio"](spark, sf_dir).collect()[0]
    assert r["n_strata"] == 25
    assert r["num_r"] > 0 and r["den_r"] > 0
    assert abs(r["or_mh_r"] - r["num_r"] / r["den_r"]) < 1e-4
    assert abs(r["ln_or_mh_r"] - math.log(r["or_mh_r"])) < 1e-4


def test_raking_matches_population_margins(spark, sf_dir):
    from collections import defaultdict

    from ab_inbev_big_data_case_spark.sources.readers import table
    from pyspark.sql import functions as F

    rows = QUERIES["survey_raking_ipf"](spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders")
    pop_g = {
        r["grp"]: r["n"]
        for r in o.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_pop = sum(pop_g.values())
    # rescaled weights times pop/sample fraction recover population margins
    wg = defaultdict(float)
    for r in rows:
        wg[r["grp"]] += r["w_scaled_r"]
    n_samp = sum(r["n_sample"] for r in rows)
    for g, target in pop_g.items():
        # w_scaled sums to the raked weight x sampling fraction: the row
        # margin of the UNSCALED weights equals the population margin, so
        # scaled margins equal target * (n_samp/n_pop)
        assert abs(wg[g] - target * n_samp / n_pop) / target < 0.01


def test_srm_check_terms(spark, sf_dir):
    rows = QUERIES["abtest_srm_check"](spark, sf_dir).collect()
    assert len(rows) == 2
    assert len({r["srm_flag"] for r in rows}) == 1  # flag is global
    for r in rows:
        assert r["chi2_term_r"] >= 0.0 and r["n"] > 0


def test_granger_unrestricted_fits_no_worse(spark, sf_dir):
    r = QUERIES["granger_f_lite"](spark, sf_dir).collect()[0]
    assert r["n"] > 10
    # adding a regressor can only reduce SSR
    assert r["ln_ssr_r"] >= r["ln_ssr_u"]
    assert r["granger_f_r"] >= 0.0


def test_bitemporal_late_knowledge_sees_corrections(spark, sf_dir):
    rows = QUERIES["bitemporal_as_of"](spark, sf_dir).collect()
    early = {r["grp"]: r for r in rows if r["label"] == "early"}
    late = {r["grp"]: r for r in rows if r["label"] == "late"}
    assert early.keys() == late.keys()
    # identical validity instant: same ROW COUNTS, but the late knowledge
    # point sees the retroactive +10% corrections -> strictly more cents
    assert all(early[g]["n"] == late[g]["n"] for g in early)
    assert sum(late[g]["cents"] for g in late) > sum(
        early[g]["cents"] for g in early
    )


def test_dtw_bounded_by_lockstep(spark, sf_dir):
    r = QUERIES["dtw_weekly_profiles"](spark, sf_dir).collect()[0]
    assert 0 <= r["dtw_c"] <= r["lockstep_c"]  # warping can only help
    assert 0.0 <= r["ratio_r"] <= 1.0


def test_token_budget_pack_respects_budget(spark, sf_dir):
    rows = QUERIES["token_budget_pack"](spark, sf_dir).collect()
    assert len(rows) == 20
    tok_total = sum(r["tok_total"] for r in rows)
    tok_sel = sum(r["tok_sel"] for r in rows)
    assert 0 < tok_sel <= tok_total // 10  # never exceeds the budget
    assert any(r["n_sel"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_sel"] <= r["n_docs"]


def test_cvm_nonnegative_and_ks_bound(spark, sf_dir):
    cvm = QUERIES["cvm_two_sample"](spark, sf_dir).collect()[0]
    assert cvm["cvm_t_r"] >= 0.0
    # T = nm/N^2 * sum c*(Fx-Fy)^2 <= nm/N^2 * N * sup^2 <= nm/N * 1
    assert cvm["cvm_t_r"] <= cvm["nx"] * cvm["ny"] / (cvm["nx"] + cvm["ny"])


def test_hurst_in_valid_range_and_slope_consistent(spark, sf_dir):
    rows = QUERIES["hurst_rs_lite"](spark, sf_dir).collect()
    assert len(rows) == 4
    h = rows[0]["hurst_r"]
    assert all(r["hurst_r"] == h for r in rows)  # slope is global
    assert 0.0 < h < 1.5  # R/S estimates live near (0,1); small-sample slack
    # mean ln(R/S) must increase with scale (ranges grow with block size)
    by_s = sorted(rows, key=lambda r: r["s"])
    vals = [r["mean_ln_rs_r"] for r in by_s]
    assert vals == sorted(vals)


def test_ngram_coverage_monotone_in_k(spark, sf_dir):
    rows = sorted(
        QUERIES["ngram_coverage_curve"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [100, 1000, 10000]
    cov = [r["coverage_r"] for r in rows]
    assert cov == sorted(cov) and all(0.0 <= c <= 1.0 for c in cov)
    # once K >= the type count, coverage is exactly 1
    for r in rows:
        if r["k"] >= r["n_types"]:
            assert r["coverage_r"] == 1.0
