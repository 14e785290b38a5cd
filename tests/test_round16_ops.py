"""Round-16 optimization invariants (additive — earlier rounds' files stay
in place): the operator rewrites of the second optimization round must be
checked against independent reimplementations, not just the fixture oracle.

- ktruss_edges now enumerates triangles ONCE and maintains the list
  incrementally (anti-join of dead edges) instead of re-running the wedge
  join per peel round; a multi-round CASCADE fixture checks the
  maintenance where edges die in consecutive rounds because of earlier
  removals (the case the fixture graph converges too fast to exercise).
- matrix_profile_daily keeps dist2 a LONG on the long-safe path and only
  falls back to decimal(38,0) when the runtime range bound cannot prove
  7·(max−min)² < 2⁶³; both paths are checked against a pure-Python exact
  matrix profile on synthetic series, including one that FORCES the
  decimal path (daily spreads > $11.5M), which no shipped fixture does.
"""

import datetime
import shutil
import tempfile

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

load_all()


# ------------------------------------------- k-truss incremental peeling


def _write_basket_fixture(spark, baskets) -> str:
    """lineitem.parquet fixture where each basket is one order's part set
    (written twice under two orderkeys so every in-basket pair clears the
    repeat-co-occurrence floor ns >= 2)."""
    rows = []
    ok = 0
    for parts in baskets:
        for _ in range(2):  # ns >= 2 for every pair of the basket
            for i, p in enumerate(parts):
                rows.append((ok, p, 1, i + 1))
            ok += 1
    tmp = tempfile.mkdtemp(prefix="ktruss_cascade_")
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int"
    ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    return tmp


def test_ktruss_multi_round_cascade(spark):
    """Triangle strip T1={a,b,c}, T2={b,c,d}, T3={c,d,e} plus a K4:
    round 1 peels the strip's support-1 outer edges, which destroys ALL
    its triangles, so round 2 must peel the two inner edges (bc, cd) that
    round 1's support counts still certified — exactly the cascade the
    incremental triangle-list maintenance has to track across rounds.
    The K4 (every edge in 2 triangles among survivors) must survive
    untouched. Expected fixed point: the 6 K4 edges on 4 nodes,
    converged."""
    a, b, c, d, e = 201, 202, 203, 204, 205
    k4 = [101, 102, 103, 104]
    tmp = _write_basket_fixture(
        spark, [k4, [a, b, c], [b, c, d], [c, d, e]]
    )
    try:
        r = QUERIES["ktruss_edges"](spark, tmp).first()
        assert r["n_edges_initial"] == 6 + 7  # K4 + strip edge union
        assert r["n_edges_truss"] == 6
        assert r["n_nodes_truss"] == 4
        assert r["n_unconverged"] == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------- matrix profile long vs decimal paths


def _write_orders_fixture(spark, cents_by_day) -> str:
    """orders.parquet with one order per day whose total makes the daily
    revenue exactly cents_by_day[i] cents."""
    d0 = datetime.datetime(2031, 3, 1)
    rows = [
        (i + 1, d0 + datetime.timedelta(days=i), cents / 100.0)
        for i, cents in enumerate(cents_by_day)
    ]
    tmp = tempfile.mkdtemp(prefix="mp_series_")
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    return tmp


def _python_matrix_profile(cents, m=7, top=5):
    """Exact reference: integer window vectors, integer sq-distances,
    (dist, j) argmin ties, (±dist, i) rank ties — mirrors the declared
    semantics independently of Spark AND of the DuckDB oracle SQL."""
    n = len(cents) - m + 1
    win = [cents[i : i + m] for i in range(n)]
    prof = []
    for i in range(n):
        best = None
        for j in range(n):
            if abs(i - j) < m:
                continue
            d2 = sum((win[i][k] - win[j][k]) ** 2 for k in range(m))
            if best is None or (d2, j + 1) < best:
                best = (d2, j + 1)
        prof.append((i + 1, best[1], best[0]))  # (i, nn_j, nn_dist2)
    disc = sorted(prof, key=lambda t: (-t[2], t[0]))[:top]
    mot = sorted(prof, key=lambda t: (t[2], t[0]))[:top]
    out = set()
    for rk, (i, j, d2) in enumerate(disc, 1):
        out.add(("discord", rk, i, j, d2))
    for rk, (i, j, d2) in enumerate(mot, 1):
        out.add(("motif", rk, i, j, d2))
    return out


def _run_mp(spark, cents):
    tmp = _write_orders_fixture(spark, cents)
    try:
        rows = QUERIES["matrix_profile_daily"](spark, tmp).collect()
        got = {(r["kind"], r["rk"], r["i"], r["nn_j"], r["nn_dist2"]) for r in rows}
        assert got == _python_matrix_profile(cents)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_matrix_profile_long_path_matches_python(spark):
    # spreads far below the 7·rng² < 2⁶³ bound → long-safe dist2 path
    cents = [(i * 7919) % 1000 * 100 + 250_000 for i in range(20)]
    _run_mp(spark, cents)


def test_matrix_profile_decimal_path_matches_python(spark):
    """One $12M-outlier day pushes rng to 1.2e9 cents, so 7·rng² ≈ 1.0e19
    ≥ 2⁶³ and the runtime probe must select the decimal(38,0) path; every
    VALID pair (|i−j| ≥ 7) still has at most one outlier-bearing window,
    so every profile distance stays ≤ ~1.5e18 and the declared BIGINT
    output column holds it. Asserted against the same Python reference
    (arbitrary-precision ints), proving the fallback still computes the
    exact integers after the r16 long-path split."""
    cents = [(i * 7919) % 1000 * 100 + 250_000 for i in range(20)]
    cents[10] += 1_200_000_000
    rng = max(cents) - min(cents)
    assert 7 * rng * rng >= (1 << 63)  # the fixture really forces decimal
    _run_mp(spark, cents)
