"""Behavioral invariants for the round-10 additions — properties the
DuckDB oracle equality cannot see (mechanism bounds, determinism,
cross-predictor consistency), per the operator-invariant discipline of
test_round6_ops.py."""

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


# ------------------------------------------------- differential privacy


def test_dp_laplace_is_deterministic_and_noised(spark, sf_dir):
    a = QUERIES["dp_laplace_counts"](spark, sf_dir).collect()
    b = QUERIES["dp_laplace_counts"](spark, sf_dir).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # keyed hash, no RNG state
    # the release carries real noise: noisy_n_r is rounded to 4 decimals,
    # so a keyed draw with |noise| < 5e-5 legitimately rounds back to the
    # exact count — require the bulk of cells to differ, not every cell
    # (an all-cells assert would hard-fail on the first such draw at a
    # new fixture or scale factor)
    n_diff = sum(r["noisy_n_r"] != r["exact_n"] for r in a)
    assert n_diff >= 0.9 * len(a)


def test_dp_laplace_bound_flag_and_eps_scaling(spark, sf_dir):
    rows = QUERIES["dp_laplace_counts"](spark, sf_dir).collect()
    by_eps = {}
    for r in rows:
        by_eps.setdefault(r["eps_label"], []).append(
            abs(r["noisy_n_r"] - r["exact_n"])
        )
    # the 99.9% tail bound holds for the vast majority of deterministic
    # draws (flag computed pre-rounding; recompute approximately here)
    frac_within = sum(r["within_999_bound"] for r in rows) / len(rows)
    assert frac_within >= 0.95
    # Laplace scale is 1/eps: mean |noise| at eps=0.1 must dominate eps=1.0
    assert (
        sum(by_eps["eps_0.1"]) / len(by_eps["eps_0.1"])
        > 2 * sum(by_eps["eps_1.0"]) / len(by_eps["eps_1.0"])
    )


def test_dp_gaussian_noise_within_six_sigma(spark, sf_dir):
    rows = QUERIES["dp_gaussian_sum"](spark, sf_dir).collect()
    assert len(rows) == 5  # priority domain
    for r in rows:
        noise = abs(float(r["noisy_sum_r"]) - float(r["exact_clipped_sum"]))
        assert 0 < noise < 6 * float(r["sigma_r"])


def test_dp_gaussian_clipped_sum_bounded_by_raw_sum(spark, sf_dir):
    out = QUERIES["dp_gaussian_sum"](spark, sf_dir)
    clipped = float(
        out.agg(F.sum("exact_clipped_sum")).first()[0]
    )
    raw = float(
        table(spark, sf_dir, "orders")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .first()[0]
    )
    assert clipped <= raw


# ------------------------------------------------------- link prediction


def test_adamic_adar_scores_within_weight_envelope(spark, sf_dir):
    # every shared order contributes a weight in [w(16), w(2)]; the exact
    # integer score must sit inside that envelope
    rows = QUERIES["adamic_adar_links"](spark, sf_dir).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["n_shared"] >= 1
        assert 360674 * r["n_shared"] <= r["score_q"] <= 1442695 * r["n_shared"]
    scores = [r["score_q"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_jaccard_links_exact_fixed_point(spark, sf_dir):
    rows = QUERIES["jaccard_neighbor_links"](spark, sf_dir).collect()
    assert len(rows) == 100
    for r in rows:
        union = r["deg1"] + r["deg2"] - r["n_shared"]
        assert 0 < r["n_shared"] <= min(r["deg1"], r["deg2"])
        assert r["jacc_q"] == r["n_shared"] * 1000000000 // union
        assert 0.0 < r["jacc_r"] <= 1.0
    ranks = [r["jacc_q"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


# --------------------------------------------------- connected components


def test_cc_converged_and_conserves_docs(spark, sf_dir):
    rows = QUERIES["duplicate_cluster_components"](spark, sf_dir).collect()
    # the convergence certificate must be 0: labels are per-component mins
    assert all(r["n_unconverged"] == 0 for r in rows)
    # clusters partition the corpus: sizes weighted by counts = |documents|
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["cluster_size"] * r["n_clusters"] for r in rows) == n_docs
    # the fixture corpus has near-dups: at least one multi-doc cluster
    assert any(r["cluster_size"] >= 2 for r in rows)


def test_cc_labels_match_transitive_closure_of_pairs(spark, sf_dir):
    """Cross-check the histogram against a driver-side union-find over the
    SAME candidate pairs (fixture-sized; the distributed loop must agree
    with the textbook algorithm exactly)."""
    from ab_inbev_big_data_case_spark.llm.dedup import (
        lsh_band_buckets_wide,
        lsh_candidate_pairs,
        minhash_signatures_wide,
        shingle_set,
    )

    d = table(spark, sf_dir, "documents")
    sig = minhash_signatures_wide(shingle_set(d, "doc_id", "text", 3), "doc_id", 8)
    pairs = lsh_candidate_pairs(
        lsh_band_buckets_wide(sig, "doc_id", 8, 2), "doc_id"
    ).collect()
    ids = [r["doc_id"] for r in d.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["id1"]), find(r["id2"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    from collections import Counter

    sizes = Counter(Counter(find(i) for i in ids).values())
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in QUERIES["duplicate_cluster_components"](spark, sf_dir).collect()
    }
    assert got == dict(sizes)


# --------------------------------------------------- Shapley attribution


def test_shapley_efficiency_property(spark, sf_dir):
    """Σφ_i = v(N) − v(∅): total credit equals conversions reachable with
    all channels minus no-touch conversions — recomputed independently."""
    rows = QUERIES["shapley_attribution"](spark, sf_dir).collect()
    assert len(rows) == 4
    total_phi24 = sum(r["phi24_q"] for r in rows)

    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("fts"), F.col("event_id").alias("fid"))
    )
    v_full = fp.count()  # every converted user's mask ⊆ N
    touched = (
        ev.join(fp, "user_id")
        .filter(
            (F.col("event_type") != "purchase")
            & (
                (F.col("ts") < F.col("fts"))
                | ((F.col("ts") == F.col("fts")) & (F.col("event_id") <= F.col("fid")))
            )
        )
        .select("user_id")
        .distinct()
        .count()
    )
    v_empty = v_full - touched  # converted users with zero pre-purchase touches
    assert total_phi24 == 24 * (v_full - v_empty)
    # shares are a true partition of unity
    assert abs(sum(r["attribution_r"] for r in rows) - 1.0) < 1e-4


def test_shapley_values_nonnegative_for_monotone_game(spark, sf_dir):
    # v(S) = conversions with mask ⊆ S is monotone, so every marginal
    # contribution (and hence every Shapley value) is >= 0
    rows = QUERIES["shapley_attribution"](spark, sf_dir).collect()
    assert all(r["phi24_q"] >= 0 for r in rows)


# ------------------------------------------------ local-DP randomized response


def test_rr_estimates_sum_to_population(spark, sf_dir):
    """Σ n̂_v = n identically: Σ(7·obs_v − n)/2 = (7n − 5n)/2 = n — the
    debias is unbiased in aggregate by construction."""
    rows = QUERIES["randomized_response_frequency"](spark, sf_dir).collect()
    assert len(rows) == 5
    n = table(spark, sf_dir, "customer").count()
    assert sum(r["n_true"] for r in rows) == n
    assert abs(sum(r["n_hat_r"] for r in rows) - n) < 1e-9


def test_rr_estimate_tracks_truth(spark, sf_dir):
    """The debiased estimate should be far closer to the truth than the
    raw noisy counts are (the whole point of the correction); RR noise
    std is ~sqrt(n), so allow a generous 6-sigma band."""
    rows = QUERIES["randomized_response_frequency"](spark, sf_dir).collect()
    n = sum(r["n_true"] for r in rows)
    band = 6 * (n ** 0.5) * 3.5  # (p-q)^{-1} = 3.5 inflation
    for r in rows:
        assert abs(r["n_hat_r"] - r["n_true"]) <= band


# --------------------------------------------- gamma / Somers' D


def test_gamma_somers_identities(spark, sf_dir):
    """Pair-count identities: C + D + ties = n(n-1)/2 (checked via the
    statistic denominators), |gamma| >= |D_yx| and |D_xy| (gamma's
    denominator is the smallest), all three in [-1, 1]."""
    r = QUERIES["gamma_somers_d"](spark, sf_dir).first()
    n = table(spark, sf_dir, "orders").count()
    assert r["n_rows"] == n
    assert r["conc_pairs"] >= 0 and r["disc_pairs"] >= 0
    assert r["conc_pairs"] + r["disc_pairs"] <= n * (n - 1) // 2
    for col in ("gamma_r", "somers_d_yx_r", "somers_d_xy_r"):
        assert -1.0 <= r[col] <= 1.0
    assert abs(r["gamma_r"]) >= abs(r["somers_d_yx_r"]) - 1e-9
    assert abs(r["gamma_r"]) >= abs(r["somers_d_xy_r"]) - 1e-9


def test_gamma_somers_match_bruteforce_pairs(spark, sf_dir):
    """Brute-force O(n²) pair count over the fixture (sf0.001: 1.5k
    orders) must reproduce the contingency-decomposition counts exactly."""
    import itertools

    rows = (
        table(spark, sf_dir, "orders")
        .select(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("x"),
            F.least(
                F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)
            ).alias("y"),
        )
        .collect()
    )
    if len(rows) > 3000:  # keep the quadratic check fixture-sized
        import pytest

        pytest.skip(
            f"fixture too large for the O(n²) brute-force cross-check "
            f"({len(rows)} rows > 3000) — the oracle equality still covers "
            f"this query at every SF"
        )
    c = d = 0
    for (x1, y1), (x2, y2) in itertools.combinations([(r.x, r.y) for r in rows], 2):
        p = (x1 - x2) * (y1 - y2)
        c += p > 0
        d += p < 0
    r = QUERIES["gamma_somers_d"](spark, sf_dir).first()
    assert (r["conc_pairs"], r["disc_pairs"]) == (c, d)


# --------------------------------------------- canonical keep-list


def test_keep_list_one_canonical_per_cluster(spark, sf_dir):
    rows = QUERIES["dedup_canonical_keep_list"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # one decision per document
    from collections import defaultdict

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        keeps = [r for r in members if r["keep"] == 1]
        assert len(keeps) == 1  # exactly one canonical per cluster
        assert keeps[0]["doc_id"] == members[0]["canonical_id"]
        assert all(r["canonical_id"] == keeps[0]["doc_id"] for r in members)
        assert all(r["cluster_size"] == len(members) for r in members)


def test_keep_list_canonical_is_longest_then_min_id(spark, sf_dir):
    d = {
        r["doc_id"]: r["n_chars"]
        for r in table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    rows = QUERIES["dedup_canonical_keep_list"](spark, sf_dir).collect()
    from collections import defaultdict

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r["doc_id"])
    for cid, members in by_cluster.items():
        want = min(members, key=lambda i: (-d[i], i))
        got = next(
            r["canonical_id"] for r in rows if r["cluster_id"] == cid
        )
        assert got == want


# --------------------------------------------------- triangle counting


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Brute-force triangle enumeration over the fixture edge set must
    match the degree-ordered-orientation count exactly."""
    from itertools import combinations

    r = QUERIES["triangle_count_copurchase"](spark, sf_dir).first()
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    ok = (
        li.groupBy("o").agg(F.count("*").alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= 16)).select("o")
    )
    ec = li.join(ok, "o").collect()
    from collections import defaultdict

    basket = defaultdict(set)
    for row in ec:
        basket[row["o"]].add(row["p"])
    pair_count = defaultdict(int)
    for parts in basket.values():
        for a, b in combinations(sorted(parts), 2):
            pair_count[(a, b)] += 1
    edges = {e for e, c in pair_count.items() if c >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b])
    tri //= 3  # each triangle seen from its 3 edges
    assert r["n_triangles"] == tri
    assert r["n_edges"] == len(edges)
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
    assert r["n_nodes"] == len(nodes)
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in adj)
    assert r["n_wedges"] == wedges
    if wedges:
        assert abs(r["clustering_coef_r"] - round(3 * tri / wedges, 6)) < 1e-9


# --------------------------------------------------- A/B power / MDE


def test_power_mde_matches_closed_form(spark, sf_dir):
    """Recompute the two-sample MDE from independently-collected per-user
    totals with Python floats — the engine's exact-moment path must agree
    to float tolerance, and the sizing must be consistent with the MDE."""
    rows = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
                ).otherwise(0)
            ).alias("cents")
        )
        .collect()
    )
    import statistics

    a = [r["cents"] / 100 for r in rows if r["user_id"] % 2 == 0]
    b = [r["cents"] / 100 for r in rows if r["user_id"] % 2 == 1]
    var_p = (
        sum((x - statistics.fmean(a)) ** 2 for x in a)
        + sum((x - statistics.fmean(b)) ** 2 for x in b)
    ) / (len(a) + len(b) - 2)
    zsum = 1.959963984540054 + 0.8416212335729143
    want_mde = zsum * var_p ** 0.5 * (1 / len(a) + 1 / len(b)) ** 0.5
    r = QUERIES["abtest_power_mde"](spark, sf_dir).first()
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert abs(r["mde_abs_r"] - want_mde) < 1e-3
    # sizing consistency: at the returned n/arm, the achievable MDE is at
    # most the 1% relative target (ceil only over-provisions)
    mean_p = statistics.fmean(a + b)
    achievable = zsum * var_p ** 0.5 * (2 / r["n_per_arm_1pct"]) ** 0.5
    assert achievable <= 0.01 * mean_p * (1 + 1e-9)
