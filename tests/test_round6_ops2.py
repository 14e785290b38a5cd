"""Behavioral invariants for the second half of the round-6 session-2
operators — conservation laws, metric bounds, and cross-operator
consistency the per-query oracle equality cannot express."""

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def test_attribution_conserves_first_purchase_value(spark, sf_dir):
    """Total credited cents across channels equals the summed
    first-purchase values of users who had >=1 click before it."""
    out = QUERIES["position_based_attribution"](spark, sf_dir)
    credited = out.agg(F.sum("credit_c")).first()[0]
    e = table(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
    )
    had_click = (
        e.filter(F.col("event_type") == "click")
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("fts"))
        .select("user_id")
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firstv = (
        e.filter(F.col("event_type") == "purchase")
        .join(fp, "user_id")
        .filter(F.col("ts") == F.col("fts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(had_click, "user_id")
        .agg(
            F.sum(
                (F.round(F.col("value").cast("decimal(18,6)"), 2) * 100).cast(
                    "long"
                )
            )
        )
        .first()[0]
    )
    assert credited == firstv


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    pacf = QUERIES["pacf_lags"](spark, sf_dir).first()
    acf = {
        r["lag_k"]: r["acf_r"] for r in QUERIES["acf_lags"](spark, sf_dir).collect()
    }
    assert abs(pacf["pacf1_r"] - acf[1]) < 1e-9


def test_wilcoxon_w_plus_bounded(spark, sf_dir):
    r = QUERIES["wilcoxon_signed_rank"](spark, sf_dir).first()
    assert 0 <= r["w_plus"] <= r["n"] * (r["n"] + 1) / 2


def test_runs_test_counts_consistent(spark, sf_dir):
    r = QUERIES["runs_test_randomness"](spark, sf_dir).first()
    assert r["n_plus"] + r["n_minus"] == r["n"]
    assert 1 <= r["runs"] <= r["n"]


def test_simpson_pooled_sign_constant(spark, sf_dir):
    rows = QUERIES["simpson_slope_reversal"](spark, sf_dir).collect()
    assert rows
    assert len({r["sign_pooled"] for r in rows}) == 1
    for r in rows:
        assert r["sign_nation"] in (-1, 0, 1)
        assert r["reversed"] == int(r["sign_nation"] * r["sign_pooled"] < 0)


def test_gains_chart_monotone_and_complete(spark, sf_dir):
    rows = sorted(
        QUERIES["gains_chart_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    gains = [r["gain_r"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 1e-9


def test_map_at_k_bounds(spark, sf_dir):
    rows = QUERIES["map_at_k_eval"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert 0.0 <= r["ap_r"] <= 1.0


def test_price_jumps_exceed_threshold(spark, sf_dir):
    rows = QUERIES["price_jump_events"](spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert abs(r["pct_change_r"]) > 20 - 1e-6


def test_levene_nonnegative(spark, sf_dir):
    r = QUERIES["levene_test"](spark, sf_dir).first()
    assert r["levene_w_r"] >= 0


def test_transitivity_closed_bounded_by_wedges(spark, sf_dir):
    r = QUERIES["dedup_transitivity_audit"](spark, sf_dir).first()
    assert 0 <= r["n_closed"] <= r["n_wedges"]


def test_laspeyres_base_month_is_unity(spark, sf_dir):
    rows = QUERIES["laspeyres_price_index"](spark, sf_dir).collect()
    base = min(r["mth"] for r in rows)
    ix = {r["mth"]: r["laspeyres_r"] for r in rows}
    assert abs(ix[base] - 1.0) < 1e-9


def test_ivf_nprobe_recall_monotone(spark, sf_dir):
    rows = {
        r["n_probe"]: r["mean_recall_r"]
        for r in QUERIES["ivf_nprobe_sweep"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1] <= rows[2] + 1e-9 <= rows[4] + 2e-9


def test_matrix_profile_invariants(spark, sf_dir):
    rows = QUERIES["matrix_profile_daily"](spark, sf_dir).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert set(by_kind) == {"discord", "motif"}
    for kind, rs in by_kind.items():
        assert sorted(r["rk"] for r in rs) == [1, 2, 3, 4, 5]
        for r in rs:
            # trivial-match exclusion: nearest neighbour non-overlapping
            assert abs(r["i"] - r["nn_j"]) >= 7
            assert r["nn_dist2"] >= 0
    disc = sorted(by_kind["discord"], key=lambda r: r["rk"])
    mot = sorted(by_kind["motif"], key=lambda r: r["rk"])
    # ranks ordered by profile value, discords desc / motifs asc
    assert all(a["nn_dist2"] >= b["nn_dist2"] for a, b in zip(disc, disc[1:]))
    assert all(a["nn_dist2"] <= b["nn_dist2"] for a, b in zip(mot, mot[1:]))
    # the worst motif is no worse than the best discord
    assert mot[-1]["nn_dist2"] <= disc[0]["nn_dist2"]


def test_t_closeness_invariants(spark, sf_dir):
    from ab_inbev_big_data_case_spark.sources.readers import table

    rows = QUERIES["t_closeness_audit"](spark, sf_dir).collect()
    n_cust = table(spark, sf_dir, "customer").count()
    assert sum(r["k"] for r in rows) == n_cust  # classes partition the table
    for r in rows:
        assert 0.0 <= r["t_r"] <= 1.0  # TVD is a [0,1] metric
        assert r["exceeds_t35"] == int(r["t_r"] > 0.35) or abs(r["t_r"] - 0.35) < 1e-5
        assert r["t_num"] >= 0


def test_sprt_llr_walk_consistency(spark, sf_dir):
    import math

    rows = sorted(
        QUERIES["sprt_sequential_test"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    l1, l0 = math.log(0.22 / 0.18), math.log(0.78 / 0.82)
    for r in rows:
        assert 0 <= r["c_cum"] <= r["n_cum"]
        expect = r["c_cum"] * l1 + (r["n_cum"] - r["c_cum"]) * l0
        assert abs(r["llr_r"] - expect) < 1e-5
        assert r["look_state"] in ("accept_h1", "accept_h0", "continue")
    # cumulative counts are monotone
    assert all(a["n_cum"] <= b["n_cum"] for a, b in zip(rows, rows[1:]))
    # at most one decision day, and it is the FIRST crossing
    decisions = [r for r in rows if r["is_decision_day"] == 1]
    assert len(decisions) <= 1
    crossers = [r for r in rows if r["look_state"] != "continue"]
    if crossers:
        assert decisions and decisions[0]["day"] == crossers[0]["day"]


def test_ridge_norm_shrinks_monotonically(spark, sf_dir):
    rows = {
        r["ratio"]: (r["b_qty_r"], r["b_disc_r"])
        for r in QUERIES["ridge_regression_sweep"](spark, sf_dir).collect()
    }
    assert set(rows) == {0.0, 0.1, 10.0}
    norms = [rows[r][0] ** 2 + rows[r][1] ** 2 for r in (0.0, 0.1, 10.0)]
    assert norms[0] >= norms[1] >= norms[2]  # ridge shrinkage is monotone
    # price rises with quantity: the dominant coefficient is positive OLS
    assert rows[0.0][0] > 0


def test_spatial_grid_join_is_equi_join_and_lossless(spark, sf_dir):
    from pyspark.sql import functions as F

    from ab_inbev_big_data_case_spark.sources.readers import table

    df = QUERIES["spatial_grid_radius_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the candidate generator must be a hash equi-join on cell ids,
    # never a nested-loop over all pairs
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    # cross-check against the naive quadratic join computed locally
    R = 5_000_000
    c = [
        (r[0], (r[0] * 2654435761) % 360000000 - 180000000,
         (r[0] * 2654435761) % 180000000 - 90000000)
        for r in table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    s = table(spark, sf_dir, "supplier").select("s_suppkey").collect()
    sp = [
        ((k[0] * 2246822519) % 360000000 - 180000000,
         (k[0] * 2654435761) % 180000000 - 90000000)
        for k in s
    ]
    cp = [
        ((k[0] * 2246822519) % 360000000 - 180000000,
         (k[0] * 2654435761) % 180000000 - 90000000)
        for k in table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    naive = sum(
        1
        for (cx, cy) in cp
        for (sx, sy) in sp
        if (cx - sx) ** 2 + (cy - sy) ** 2 <= R * R
    )
    assert sum(r["n_pairs"] for r in rows) == naive


def test_sssp_distances_valid(spark, sf_dir):
    rows = sorted(
        QUERIES["sssp_bounded_hops"](spark, sf_dir).collect(), key=lambda r: r["d"]
    )
    assert rows and rows[0]["d"] == 0  # the seed itself, distance 0
    assert len(rows) <= 20
    assert all(r["d"] >= 0 for r in rows)
    # within a 4-hop horizon with max edge weight 100, d <= 400
    assert all(r["d"] <= 400 for r in rows)
    assert len({r["v"] for r in rows}) == len(rows)  # distinct vertices


def test_quantile_normalization_equalizes_sources(spark, sf_dir):
    from ab_inbev_big_data_case_spark.sources.readers import table

    rows = QUERIES["quantile_normalize_lengths"](spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    assert sum(r["n"] for r in rows) == docs.count()
    # after normalization every source's MEAN length is pulled toward the
    # pooled mean: the spread of per-source means must not increase
    before = [r["sum_len_before"] / r["n"] for r in rows]
    after = [r["sum_len_after"] / r["n"] for r in rows]
    assert max(after) - min(after) <= max(before) - min(before) + 1e-9


def test_bh_rejections_are_rank_prefix(spark, sf_dir):
    rows = sorted(
        QUERIES["bh_fdr_chi2_panel"](spark, sf_dir).collect(), key=lambda r: r["k"]
    )
    assert len(rows) == 25
    assert [r["k"] for r in rows] == list(range(1, 26))
    chis = [r["chi2_r"] for r in rows]
    assert all(a >= b for a, b in zip(chis, chis[1:]))  # ranked descending
    flags = [r["rejected"] for r in rows]
    # BH step-up: the rejection set is exactly ranks 1..k*
    if 1 in flags:
        last = max(i for i, f in enumerate(flags) if f == 1)
        assert all(f == 1 for f in flags[: last + 1])
        assert all(f == 0 for f in flags[last + 1 :])


def test_apportionment_seats_sum_to_1000(spark, sf_dir):
    rows = QUERIES["seat_apportionment"](spark, sf_dir).collect()
    assert sum(r["seats_hamilton"] for r in rows) == 1000
    assert sum(r["seats_dhondt"] for r in rows) == 1000
    tot = sum(r["n_orders"] for r in rows)
    for r in rows:
        # Hamilton stays within quota (floor(q) <= seats <= ceil(q))
        q = r["n_orders"] * 1000 / tot
        assert q - 1 < r["seats_hamilton"] < q + 1
        assert r["seats_dhondt"] >= 0


def test_woe_bins_partition_and_iv_nonneg(spark, sf_dir):
    rows = sorted(
        QUERIES["woe_iv_binning"](spark, sf_dir).collect(), key=lambda r: r["bin"]
    )
    assert [r["bin"] for r in rows] == list(range(10))
    n_total = sum(r["n"] for r in rows)
    for r in rows:
        # equal-frequency: each bin within (0.5x, 1.5x) of N/10 despite ties
        assert 0.5 * n_total / 10 < r["n"] < 1.5 * n_total / 10
        # each IV contribution is nonnegative by construction (g-b)*ln(g/b)
        assert r["iv_term_r"] >= -1e-9
