"""Behavioral invariants for the round-12 additions — properties the
DuckDB oracle equality cannot see (brute-force recomputation of the vote
tally, scoring-rule identities, agreement-statistic bounds), per the
operator-invariant discipline of test_round10_ops.py / test_round11_ops.py."""

import math

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


# ------------------------------------------------------- RANSAC line fit


def _daily_points(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count("*").alias("x"),
            F.sum(
                (
                    F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2)
                    * 100
                ).cast("long")
            ).alias("y_c"),
        )
        .collect()
    )


def test_ransac_best_model_is_brute_force_argmax(spark, sf_dir):
    """Recompute the whole vote independently: hash-rank the daily points
    in Python, rebuild the 8 candidate lines, tally inliers per line, and
    assert the engine's winner IS the argmax (ties to lowest model_id)."""
    import hashlib

    out = QUERIES["ransac_line_fit"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]

    pts = _daily_points(spark, sf_dir)
    margin = 0.20 * (sum(p["y_c"] for p in pts) / len(pts))

    def h(d):
        return int(hashlib.sha256(f"ransac-{d}".encode()).hexdigest()[:15], 16)

    seeds = sorted(pts, key=lambda p: (h(p["d"].isoformat()), p["d"]))[:16]
    votes = {}
    lines = {}
    for mid in range(8):
        p1, p2 = seeds[2 * mid], seeds[2 * mid + 1]
        if p1["x"] == p2["x"]:
            continue
        a = (p2["y_c"] - p1["y_c"]) / (p2["x"] - p1["x"])
        b = p1["y_c"] - a * p1["x"]
        lines[mid] = (a, b)
        votes[mid] = sum(
            1 for p in pts if abs(p["y_c"] - (a * p["x"] + b)) <= margin
        )
    assert votes, "every candidate degenerate — fixture spine too flat"
    best = max(votes, key=lambda m: (votes[m], -m))
    assert row["best_model"] == best
    assert row["n_inliers"] == votes[best]
    assert abs(row["cand_slope_r"] - lines[best][0] / 100) < 1e-3


def test_ransac_refit_runs_through_inliers_only(spark, sf_dir):
    """The refit line must fit the inlier subset at least as well (SSE)
    as the raw 2-point candidate line does — OLS on the same subset is
    the least-squares minimizer by construction."""
    row = QUERIES["ransac_line_fit"](spark, sf_dir).collect()[0]
    pts = _daily_points(spark, sf_dir)
    margin = 0.20 * (sum(p["y_c"] for p in pts) / len(pts))
    a_c, b_c = row["cand_slope_r"] * 100, row["cand_intercept_r"] * 100
    inl = [p for p in pts if abs(p["y_c"] - (a_c * p["x"] + b_c)) <= margin]
    # rounding of cand params can flip boundary points; tolerate 1%
    assert abs(len(inl) - row["n_inliers"]) <= max(2, len(pts) // 100)
    a_r, b_r = row["refit_slope_r"] * 100, row["refit_intercept_r"] * 100
    sse_refit = sum((p["y_c"] - (a_r * p["x"] + b_r)) ** 2 for p in inl)
    sse_cand = sum((p["y_c"] - (a_c * p["x"] + b_c)) ** 2 for p in inl)
    assert sse_refit <= sse_cand * (1 + 1e-6)
    assert 0.0 < row["inlier_frac_r"] <= 1.0


# ---------------------------------------------------------- Fleiss' kappa


def test_fleiss_kappa_matches_per_category_tally(spark, sf_dir):
    """Recompute kappa from the raw per-document vote counts using the
    textbook per-category formula (n_i1, n_i0 tallies) and assert the
    engine's integer-moment shortcut lands on the same value."""
    row = QUERIES["fleiss_kappa_raters"](spark, sf_dir).collect()[0]
    d = table(spark, sf_dir, "documents").select("text", "lang").collect()
    ks = []
    for r in d:
        toks = r["text"].split(" ")
        k = (
            int(r["lang"] in ("en", "es"))
            + int(len(toks) >= 20)
            + int(len(set(toks)) * 10 >= len(toks) * 3)
            + int("dup" not in toks)
        )
        ks.append(k)
    n, m = len(ks), 4
    p1 = sum(ks) / (n * m)
    p_bar = sum(k * k + (m - k) * (m - k) - m for k in ks) / (n * m * (m - 1))
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert row["n_docs"] == n
    assert abs(row["fleiss_kappa_r"] - kappa) < 1e-5
    assert -1.0 <= row["fleiss_kappa_r"] <= 1.0
    # binned P_i are bounded below by the 2-category floor (k=2: P_i=1/3)
    assert row["p_bar_r"] >= 1 / 3 - 1e-9


# --------------------------------------------------- Brier decomposition


def test_brier_decomposition_identity_and_binning_gain(spark, sf_dir):
    """Two scoring-rule laws: (1) Murphy identity — the Brier score of the
    BINNED forecaster (each forecast replaced by its bin's mean) equals
    REL − RES + UNC exactly; (2) conditional-mean binning can only lower
    the Brier score (convexity), so binned ≤ raw."""
    row = QUERIES["brier_decomposition"](spark, sf_dir).collect()[0]
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("value", "event_type")
        .collect()
    )
    scale, bins = 490.02, 10
    cells = {}
    for r in e:
        b = min(int(math.floor(r["value"] / scale * bins)), bins - 1)
        conf = math.floor(r["value"] / scale * 1e6 + 0.5) / 1e6
        pos = int(r["event_type"] == "purchase")
        cells.setdefault(b, []).append((conf, pos))
    n_all = sum(len(v) for v in cells.values())
    binned_brier = 0.0
    for v in cells.values():
        cbar = sum(c for c, _ in v) / len(v)
        binned_brier += sum((cbar - p) ** 2 for _, p in v)
    binned_brier /= n_all
    rel_res_unc = (
        row["reliability_r"] - row["resolution_r"] + row["uncertainty_r"]
    )
    assert abs(binned_brier - rel_res_unc) < 1e-5
    assert abs(row["brier_binned_r"] - rel_res_unc) < 2e-6
    assert row["brier_binned_r"] <= row["brier_raw_r"] + 1e-9
    assert 0.0 <= row["uncertainty_r"] <= 0.25 + 1e-9


# ------------------------------------------- power iteration / CKA


def _embedding_matrix(spark, sf_dir):
    import numpy as np

    rows = table(spark, sf_dir, "embeddings").select("embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return np.floor(x * 1000 + 0.5).astype(np.int64)


def test_power_iteration_rayleigh_vs_dense_eigensolver(spark, sf_dir):
    """The Rayleigh quotient is a certified lower bound on lambda_1; on the
    near-isotropic fixture spectrum 12 iterations must still capture >=85%
    of the true top eigenvalue (dense numpy eigensolver as referee), and
    the reported loading vector must be unit-norm."""
    import numpy as np

    out = QUERIES["power_iteration_top_eigen"](spark, sf_dir).collect()
    assert len(out) == 64
    q = _embedding_matrix(spark, sf_dir)
    g = (q.T @ q).astype(np.float64)
    lam1 = float(np.linalg.eigvalsh(g)[-1])
    lam_engine = out[0]["lambda_r"] * 1e6
    assert lam_engine <= lam1 * (1 + 1e-6)
    assert lam_engine >= 0.85 * lam1
    v = np.array([r["loading_r"] for r in sorted(out, key=lambda r: r["i"])])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    # evr consistency: lambda / trace
    evr = lam_engine / float(np.trace(g))
    assert abs(out[0]["evr_r"] - evr) < 1e-4


def test_cka_matches_float_reference_and_bounds(spark, sf_dir):
    """Linear CKA recomputed in float numpy on the raw (unquantized)
    embeddings must agree with the engine's fixed-point value to ~1e-3
    (the quantization grid), and CKA of a block with itself is exactly 1."""
    import numpy as np

    row = QUERIES["cka_embedding_similarity"](spark, sf_dir).collect()[0]
    rows = table(spark, sf_dir, "embeddings").select("embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xc = x - x.mean(axis=0)
    a, b = xc[:, :32], xc[:, 32:]
    fxy = np.linalg.norm(b.T @ a, "fro") ** 2
    fxx = np.linalg.norm(a.T @ a, "fro") ** 2
    fyy = np.linalg.norm(b.T @ b, "fro") ** 2
    cka = fxy / math.sqrt(fxx * fyy)
    assert 0.0 <= row["cka_r"] <= 1.0 + 1e-9
    assert abs(row["cka_r"] - cka) < 1e-3
    assert row["n_rows"] == len(rows)


# ------------------------------------------- ADF / permutation entropy


def _daily_cents(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .alias("rev")
        )
        .orderBy("day")
        .collect()
    )
    return [int(r["rev"] * 100) for r in rows]


def test_adf_matches_numpy_lstsq(spark, sf_dir):
    """Rebuild the ADF design matrix in Python and fit with numpy lstsq —
    coefficients and the tau statistic must match the engine's exact-moment
    closed form."""
    import numpy as np

    row = QUERIES["adf_stationarity_lite"](spark, sf_dir).collect()[0]
    y = np.array(_daily_cents(spark, sf_dir), dtype=np.float64)
    dy = np.diff(y)
    z = dy[1:]                      # delta y_t
    u = y[1:-1]                     # y_{t-1}
    v = dy[:-1]                     # delta y_{t-1}
    X = np.column_stack([np.ones_like(u), u, v])
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    resid = z - X @ beta
    n = len(z)
    s2 = float(resid @ resid) / (n - 3)
    xtx_inv = np.linalg.inv(X.T @ X)
    t_rho = beta[1] / math.sqrt(s2 * xtx_inv[1, 1])
    assert row["n"] == n
    assert abs(row["rho_r"] - beta[1]) < 1e-5
    assert abs(row["phi_r"] - beta[2]) < 1e-5
    assert abs(row["t_adf_r"] - t_rho) < 1e-3
    assert row["stationary_5pct"] == int(t_rho < -2.86)
    # differencing a (near-)stationary aggregate: rho must be negative
    assert row["rho_r"] < 0


def test_permutation_entropy_brute_force(spark, sf_dir):
    """Histogram the 6 ordinal patterns in Python (same tie rule: earlier
    index wins) and recompute the normalized entropy."""
    out = QUERIES["permutation_entropy_daily"](spark, sf_dir).collect()
    y = _daily_cents(spark, sf_dir)
    counts = {}
    for a, b, c in zip(y, y[1:], y[2:]):
        ra = (b < a) + (c < a)
        rb = (a <= b) + (c < b)
        rc = (a <= c) + (b <= c)
        counts[ra * 100 + rb * 10 + rc] = counts.get(
            ra * 100 + rb * 10 + rc, 0
        ) + 1
    assert {r["pattern"]: r["n"] for r in out} == counts
    n_all = sum(counts.values())
    assert n_all == len(y) - 2
    h = -sum(
        (n / n_all) * math.log(n / n_all) for n in counts.values()
    ) / math.log(6)
    assert abs(out[0]["pe_norm_r"] - h) < 1e-5
    assert 0.0 <= out[0]["pe_norm_r"] <= 1.0
    # every reported pattern is one of the 6 valid permutations of 0,1,2
    valid = {12, 21, 102, 120, 201, 210}
    assert {r["pattern"] for r in out} <= valid


# ------------------------------------------------------- DBSCAN


def test_dbscan_matches_brute_force_and_conserves_points(spark, sf_dir):
    """Referee DBSCAN in numpy (all-pairs distances, true connected
    components via BFS — no grid, no unrolled rounds) must agree on the
    cluster histogram, border assignment, and noise count; roles must
    partition the point set; the convergence certificate must hold."""
    import numpy as np

    out = QUERIES["dbscan_grid_clusters"](spark, sf_dir).collect()
    assert out
    assert all(r["converged"] == 1 for r in out)

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    x = np.array(
        [[r["embedding"][0], r["embedding"][1]] for r in rows],
        dtype=np.float64,
    )
    q = np.floor(x * 1000 + 0.5).astype(np.int64)
    eps, minpts = 20, 5
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    nb = d2 <= eps * eps
    core = nb.sum(1) >= minpts
    # BFS true components over core-core edges
    lab = {}
    for i in np.where(core)[0]:
        if i in lab:
            continue
        comp, stack = [], [i]
        seen = {i}
        while stack:
            v = stack.pop()
            comp.append(v)
            for j in np.where(nb[v] & core)[0]:
                if j not in seen:
                    seen.add(j)
                    stack.append(j)
        root = min(ids[v] for v in comp)
        for v in comp:
            lab[v] = root
    border = {}
    for i in np.where(~core)[0]:
        cand = [lab[j] for j in np.where(nb[i] & core)[0]]
        if cand:
            border[i] = min(cand)
    n_noise = int((~core).sum()) - len(border)
    ref = {}
    for v, c in lab.items():
        ref.setdefault(c, [0, 0])[0] += 1
    for v, c in border.items():
        ref.setdefault(c, [0, 0])[1] += 1
    got = {r["cluster_id"]: [r["n_core"], r["n_border"]] for r in out}
    assert got == ref
    assert out[0]["n_noise"] == n_noise
    total = sum(r["n_core"] + r["n_border"] for r in out) + out[0]["n_noise"]
    assert total == len(ids)
