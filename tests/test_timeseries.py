"""Semantic invariants for the time-series family (queries/timeseries.py)
beyond DuckDB oracle equivalence: numpy parity for the ACF and CUSUM math,
and conservation/normalization identities for the backtest and seasonal
profile."""

import numpy as np
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def _daily_series(spark, sf_dir):
    """The shared spine, collected day-ordered (tiny: O(elapsed days))."""
    rows = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("rev")
        )
        .orderBy("day")
        .collect()
    )
    return [r.day for r in rows], np.array([r.rev for r in rows])


def test_acf_matches_numpy(spark, sf_dir):
    _, x = _daily_series(spark, sf_dir)
    mu = x.mean()
    ss = ((x - mu) ** 2).sum()
    got = {r.lag_k: r.acf_r for r in QUERIES["acf_lags"](spark, sf_dir).collect()}
    assert sorted(got) == list(range(1, 8))
    for k in range(1, 8):
        expect = ((x[k:] - mu) * (x[:-k] - mu)).sum() / ss
        assert abs(got[k] - round(expect, 6)) < 1e-9, k
    # ACF is a correlation: bounded by 1 in magnitude.
    assert all(abs(v) <= 1.0 for v in got.values())


def test_cusum_matches_numpy_argmax(spark, sf_dir):
    days, x = _daily_series(spark, sf_dir)
    s = np.cumsum(x - x.mean())
    r = QUERIES["cusum_changepoint"](spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_days == len(x)
    peak = np.abs(s).round(2)
    best = peak.max()
    assert row.max_abs_cusum_r == best
    # the reported day is the EARLIEST day achieving the rounded peak
    assert row.cp_day == days[int(np.argmax(peak == best))]


def test_seasonal_naive_errors_are_lag7_residuals(spark, sf_dir):
    out = {r.prio: r for r in QUERIES["seasonal_naive_mape"](spark, sf_dir).collect()}
    d = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("rev")
        )
        .collect()
    )
    series = {}
    for r in sorted(d, key=lambda r: (r.prio, r.day)):
        series.setdefault(r.prio, []).append(r.rev)
    for prio, xs in series.items():
        xs = np.array(xs)
        err = np.abs(xs[7:] - xs[:-7])
        assert out[prio].n_eval == len(xs) - 7
        assert abs(out[prio].mae_r - round(float(err.mean()), 2)) < 1e-9
        assert abs(
            out[prio].rmse_r - round(float(np.sqrt((err**2).mean())), 2)
        ) < 1e-9


def test_dow_profile_partitions_the_spine(spark, sf_dir):
    days, x = _daily_series(spark, sf_dir)
    rows = QUERIES["dow_seasonal_profile"](spark, sf_dir).collect()
    assert sorted(r.dow for r in rows) == list(range(1, 8))
    assert sum(r.n_days for r in rows) == len(x)
    # seasonal indices average to ~1 when weighted by day counts
    wmean = sum(r.seasonal_idx_r * r.n_days for r in rows) / len(x)
    assert abs(wmean - 1.0) < 1e-3


def test_revenue_streaks_brute_force(spark, sf_dir):
    """rn-difference islands must equal the sequential scan per series."""
    rows = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("rev")
        )
        .collect()
    )
    series = {}
    for r in sorted(rows, key=lambda r: (r.prio, r.day)):
        series.setdefault(r.prio, []).append((r.day, r.rev))
    got = {r.prio: r for r in QUERIES["revenue_streaks"](spark, sf_dir).collect()}
    for prio, s in series.items():
        mu = sum(v for _, v in s) / len(s)
        best_len, best_start, n_hot = 0, None, 0
        cur_len, cur_start = 0, None
        for day, v in s + [(None, float("-inf"))]:  # sentinel flushes tail
            if v > mu:
                n_hot += 1
                if cur_len == 0:
                    cur_start = day
                cur_len += 1
            else:
                if cur_len > best_len:
                    best_len, best_start = cur_len, cur_start
                cur_len = 0
        g = got[prio]
        assert (g.max_streak, g.streak_start, g.n_hot_days) == (
            best_len, best_start, n_hot
        ), prio


def test_rolling_median_matches_numpy_trailing_window(spark, sf_dir):
    out = QUERIES["rolling_median"](spark, sf_dir).collect()
    series = {}
    for r in sorted(out, key=lambda r: (r.prio, r.day)):
        series.setdefault(r.prio, []).append(r)
    for prio, rows in series.items():
        revs = [r.rev for r in rows]
        for i, r in enumerate(rows):
            win = sorted(revs[max(0, i - 6) : i + 1])
            n = len(win)
            # linear-interpolated median (quantile_cont semantics)
            if n % 2:
                med = win[n // 2]
            else:
                med = (win[n // 2 - 1] + win[n // 2]) / 2
            # med7_r quantizes at 3 decimals (the 0.005 interpolation grid
            # is exactly representable there); compare unrounded within
            # half that quantum
            assert abs(r.med7_r - med) <= 0.00051, (prio, r.day)


def test_time_weighted_avg_brute_force(spark, sf_dir):
    from ab_inbev_big_data_case_spark.sources.readers import table as _t

    rows = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "value", F.unix_micros("ts").alias("t"))
        .collect()
    )
    series = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.t, r.event_id)):
        series.setdefault(r.user_id, []).append((r.t, r.value))
    got = {r.user_id: r for r in QUERIES["time_weighted_avg"](spark, sf_dir).collect()}
    for u, pts in series.items():
        if len(pts) < 2:
            assert u not in got
            continue
        dts = [pts[i + 1][0] - pts[i][0] for i in range(len(pts) - 1)]
        num = sum(v * dt for (_, v), dt in zip(pts[:-1], dts))
        den = sum(dts)
        g = got[u]
        assert g.n_intervals == len(dts) and g.total_us == den
        assert abs(g.twap_r - num / den) <= 0.00051, u


def test_decomposition_reassembles(spark, sf_dir):
    """rev = trend + seasonal + resid wherever trend is defined (exact on
    the cents grid), edges NULL, and seasonal means sum ~0 across the
    week (they're means of detrended values, so their weighted sum
    vanishes)."""
    rows = QUERIES["ts_decomposition"](spark, sf_dir).collect()
    n_trend = 0
    for r in rows:
        if r.trend_r is None:
            assert r.resid_r is None
        else:
            n_trend += 1
            assert abs(r.rev - (r.trend_r + r.seasonal_r + r.resid_r)) < 1e-6
    assert n_trend == len(rows) - 6  # exactly the 3+3 edge days lack trend


def test_linear_interp_between_observations(spark, sf_dir):
    """Interpolated values lie between their surrounding observations;
    observed rows pass through unchanged (modulo the 1e-4 quantizer)."""
    rows = QUERIES["gapfill_linear_interp"](spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.bucket)
        obs = [(i, r.sum_value) for i, r in enumerate(rs) if r.sum_value is not None]
        assert obs, "every event_type has at least one observed hour"
        for i, r in enumerate(rs):
            if r.sum_value is not None:
                assert abs(r.interp_r - r.sum_value) <= 1e-4
            else:
                prev = [v for j, v in obs if j < i]
                nxt = [v for j, v in obs if j > i]
                if prev and nxt:
                    lo, hi = sorted((prev[-1], nxt[0]))
                    assert lo - 1e-4 <= r.interp_r <= hi + 1e-4
                elif prev:
                    assert abs(r.interp_r - prev[-1]) <= 1e-4
                else:
                    assert abs(r.interp_r - nxt[0]) <= 1e-4


def test_seasonal_anomalies_are_extreme_residuals(spark, sf_dir):
    """Every flagged day's |z| > 3, and z recomputes from the decomposition
    residuals' median/MAD."""
    import numpy as np

    flagged = {
        r.day: r for r in QUERIES["seasonal_residual_anomaly"](spark, sf_dir).collect()
    }
    dec = [
        r
        for r in QUERIES["ts_decomposition"](spark, sf_dir).collect()
        if r.trend_r is not None
    ]
    resid = np.array([r.resid_r for r in dec])
    med = np.quantile(resid, 0.5)
    mad = np.quantile(np.abs(resid - med), 0.5)
    for r in dec:
        z = (r.resid_r - med) / (1.4826 * mad)
        if abs(z) > 3:
            assert r.day in flagged, r.day
            assert abs(flagged[r.day].robust_z_r - round(z, 4)) < 1e-6
        else:
            assert r.day not in flagged


def test_rate_changepoint_is_argmax(spark, sf_dir):
    """The reported day maximizes the rounded two-sample z, recomputed
    from raw daily counts."""
    import math

    from pyspark.sql import functions as SF

    r = QUERIES["error_rate_changepoint"](spark, sf_dir).collect()[0]
    d = sorted(
        table(spark, sf_dir, "events")
        .groupBy(SF.date_trunc("day", "ts").alias("day"))
        .agg(
            SF.count("*").alias("n"),
            SF.sum(SF.when(SF.col("event_type") == "error", 1).otherwise(0)).alias("e"),
        )
        .collect(),
        key=lambda x: x.day,
    )
    tn = sum(x.n for x in d)
    te = sum(x.e for x in d)
    pp = te / tn
    best = None
    cn = ce = 0
    for x in d:
        cn += x.n
        ce += x.e
        if cn >= tn:
            break
        z = abs(ce / cn - (te - ce) / (tn - cn)) / math.sqrt(
            pp * (1 - pp) * (1 / cn + 1 / (tn - cn))
        )
        cand = (round(z, 4), x.day)
        if best is None or cand[0] > best[0]:
            best = cand
    assert r.z_r == best[0] and r.day == best[1]


def test_mann_kendall_sign_count(spark, sf_dir):
    """S recomputes from the raw daily series; z and Theil-Sen bounds."""
    days, x = _daily_series(spark, sf_dir)
    r = QUERIES["mann_kendall_theil_sen"](spark, sf_dir).collect()[0]
    n = len(x)
    assert r.n_pairs == n * (n - 1) // 2
    s = sum(
        (1 if x[j] > x[i] else -1 if x[j] < x[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert r.mk_s == s
    assert abs(r.mk_z_r) < 50  # sanity: a z-statistic, not garbage


def test_ccf_lag0_and_pair_counts(spark, sf_dir):
    """Lag 0 must equal the plain Pearson correlation of the two daily
    series; every |k| drops exactly |k| pairs off the spine."""
    import numpy as np

    rows = {r.lag_k: r for r in QUERIES["ccf_lead_lag"](spark, sf_dir).collect()}
    assert set(rows) == set(range(-7, 8))
    d = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("rev"),
            F.count("*").cast("double").alias("n_ord"),
        )
        .orderBy("day")
        .collect()
    )
    rev = np.array([r.rev for r in d])
    n_ord = np.array([r.n_ord for r in d])
    n_days = len(d)
    assert rows[0].n_pairs == n_days
    assert abs(rows[0].ccf_r - np.corrcoef(rev, n_ord)[0, 1]) < 1e-5
    for k in (-7, -3, 3, 7):
        assert rows[k].n_pairs == n_days - abs(k)
    # spot-check an off-zero lag against the numpy shifted correlation
    k = 3
    expect = np.corrcoef(rev[:-k], n_ord[k:])[0, 1]
    assert abs(rows[k].ccf_r - expect) < 1e-5
    expect_m = np.corrcoef(rev[k:], n_ord[:-k])[0, 1]
    assert abs(rows[-k].ccf_r - expect_m) < 1e-5
