"""Semantic invariants for the distribution-comparison family
(queries/distmetrics.py) beyond the DuckDB oracle equivalence: each
distributed decomposition (two-level Gini rank, spine-walk KS/AUC,
closed-form disjoint-mass JSD, zero-day-free Fano) is recomputed
brute-force on the collected fixture and must agree exactly (to the
published rounding)."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def test_gini_matches_flat_rank(spark, sf_dir):
    """The 16-bucket two-level rank decomposition must equal the textbook
    flat-sorted rank formula."""
    got = QUERIES["gini_concentration"](spark, sf_dir).collect()[0]
    rows = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            (F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2) * 100)
            .cast("long")
            .alias("rev_c")
        )
        .collect()
    )
    xs = sorted((r.rev_c, r.o_custkey) for r in rows)
    n = len(xs)
    s = sum(x for x, _ in xs)
    s1 = sum(i * x for i, (x, _) in enumerate(xs, start=1))
    expect = 2.0 * s1 / (n * s) - (n + 1.0) / n
    assert got.n_customers == n
    assert got.total_rev_c == s
    assert abs(got.gini_r - expect) < 1e-6
    assert 0.0 <= got.gini_r < 1.0


def test_ks_matches_brute_ecdf(spark, sf_dir):
    got = QUERIES["ks_two_sample"](spark, sf_dir).collect()[0]
    docs = table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    a = sorted(r.n_chars for r in docs if len(r.source) <= 4)
    b = sorted(r.n_chars for r in docs if len(r.source) > 4)
    na, nb = len(a), len(b)
    grid = sorted(set(a) | set(b))
    ca = cb = 0
    ia = ib = 0
    best, best_at = -1, None
    for v in grid:
        while ia < na and a[ia] <= v:
            ia += 1
        while ib < nb and b[ib] <= v:
            ib += 1
        d = abs(ia * nb - ib * na)
        if d > best:
            best, best_at = d, v
    assert got.n_a == na and got.n_b == nb
    assert abs(got.ks_d_r - best / (na * nb)) < 1e-6
    assert got.at_chars == best_at


def test_auc_matches_midrank_brute(spark, sf_dir):
    """Grouped-walk U must equal the pairwise definition
    AUC = P(s_pos > s_neg) + ½·P(tie) on the quantized scores."""
    got = QUERIES["auc_mann_whitney"](spark, sf_dir).collect()[0]
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(F.round("value", 2).alias("s"), "event_type")
        .collect()
    )
    pos = Counter(r.s for r in ev if r.event_type == "purchase")
    neg = Counter(r.s for r in ev if r.event_type == "click")
    np_, nn = sum(pos.values()), sum(neg.values())
    wins = ties = 0
    neg_sorted = sorted(neg.items())
    for sp, cp in pos.items():
        for sn, cn in neg_sorted:
            if sp > sn:
                wins += cp * cn
            elif sp == sn:
                ties += cp * cn
    expect = (wins + 0.5 * ties) / (np_ * nn)
    assert got.n_pos == np_ and got.n_neg == nn
    assert abs(got.auc_r - expect) < 1e-6
    assert abs(got.gini_rank_r - (2 * expect - 1)) < 1e-5


def test_jsd_matches_brute_distribution(spark, sf_dir):
    """The shared-term + closed-form disjoint-mass assembly must equal a
    full-vocabulary JSD; bounds 0 ≤ JSD ≤ 1 bit hold for every pair."""
    rows = QUERIES["js_divergence_sources"](spark, sf_dir).collect()
    assert rows and all(0.0 <= r.jsd_bits_r <= 1.0 for r in rows)
    top = rows[0]
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(top.src1, top.src2))
        .select("source", "text")
        .collect()
    )
    dist = defaultdict(Counter)
    for r in docs:
        dist[r.source].update(r.text.split(" "))
    p, q = dist[top.src1], dist[top.src2]
    tp, tq = sum(p.values()), sum(q.values())
    jsd = 0.0
    for w in set(p) | set(q):
        pi, qi = p[w] / tp, q[w] / tq
        m = (pi + qi) / 2
        if pi:
            jsd += 0.5 * pi * math.log(pi / m)
        if qi:
            jsd += 0.5 * qi * math.log(qi / m)
    assert abs(top.jsd_bits_r - jsd / math.log(2)) < 1e-4


def test_fano_counts_zero_days(spark, sf_dir):
    """The moment identity must equal the variance of the explicit
    zero-padded daily series — zero-event days lower the mean and are
    part of the variance even though the plan never materializes them."""
    rows = {r.event_type: r for r in QUERIES["burstiness_fano"](spark, sf_dir).collect()}
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .collect()
    )
    all_days = {r.day for r in ev}
    lo, hi = min(all_days), max(all_days)
    n_days = (hi - lo).days + 1
    per = defaultdict(Counter)
    for r in ev:
        per[r.event_type][r.day] += 1
    for et, daily in per.items():
        xs = list(daily.values()) + [0] * (n_days - len(daily))
        mean = sum(xs) / n_days
        var = sum((x - mean) ** 2 for x in xs) / (n_days - 1)
        got = rows[et]
        assert got.n_days == n_days
        assert abs(got.mean_daily_r - mean) < 1e-5
        assert abs(got.fano_r - var / mean) < 1e-4
        sd = math.sqrt(var)
        assert abs(got.burstiness_r - (sd - mean) / (sd + mean)) < 1e-4


def test_calibration_ece_identity(spark, sf_dir):
    """Per-bin stats must reproduce from the raw rows and the repeated
    ece_r column must equal the weighted gap sum of the bins shown."""
    rows = QUERIES["reliability_calibration_bins"](spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r.bin)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("value", "event_type")
        .collect()
    )
    scale = 490.02
    n_all = len(ev)
    bins = defaultdict(lambda: [0, 0, 0])  # n, n_pos, conf_u sum
    for r in ev:
        b = min(int(r.value / scale * 10), 9)
        cell = bins[b]
        cell[0] += 1
        cell[1] += r.event_type == "purchase"
        cell[2] += math.floor(r.value / scale * 1_000_000 + 0.5)
    assert {r.bin for r in rows} == set(bins)
    ece = 0.0
    for b, (n, n_pos, conf_u) in bins.items():
        ece += abs(conf_u / n / 1_000_000 - n_pos / n) * n / n_all
    for r in rows:
        n, n_pos, conf_u = bins[r.bin]
        assert r.n == n and r.n_pos == n_pos
        assert abs(r.mean_conf_r - conf_u / n / 1_000_000) < 1e-6
        assert abs(r.frac_pos_r - n_pos / n) < 1e-6
        assert abs(r.ece_r - ece) < 1e-5


def test_mcnemar_cells_partition_docs(spark, sf_dir):
    """The four paired cells must partition the corpus, the discordant
    cells must reproduce the statistic, and the flag marginals must
    agree with the pair-set audit's doc unions."""
    got = QUERIES["mcnemar_dedup_paths"](spark, sf_dir).collect()[0]
    n_docs = table(spark, sf_dir, "documents").count()
    assert (
        got.n_both + got.n_minhash_only + got.n_simhash_only + got.n_neither
        == n_docs
    )
    b, c = got.n_minhash_only, got.n_simhash_only
    expect = (abs(b - c) - 1) ** 2 / (b + c) if b + c else 0.0
    assert abs(got.mcnemar_chi2_r - expect) < 1e-4


def test_entropy_rate_information_inequalities(spark, sf_dir):
    """Conditioning never increases entropy: 0 ≤ H(W₂|W₁) ≤ H(W₂);
    brute-force recomputation from the collected bigram counts agrees."""
    got = QUERIES["entropy_rate_bigram"](spark, sf_dir).collect()[0]
    assert 0.0 <= got.h_rate_bits_r <= got.h_marginal_bits_r
    assert 0.0 <= got.redundancy_r <= 1.0
    docs = table(spark, sf_dir, "documents").select("text").collect()
    bg = Counter()
    for r in docs:
        t = r.text.split(" ")
        for i in range(len(t) - 1):
            bg[(t[i], t[i + 1])] += 1
    n = sum(bg.values())
    m1 = Counter()
    m2 = Counter()
    for (w1, w2), k in bg.items():
        m1[w1] += k
        m2[w2] += k
    h_cond = -sum(k / n * math.log(k / m1[w1]) for (w1, _), k in bg.items())
    h_marg = -sum(k / n * math.log(k / n) for k in m2.values())
    assert got.n_bigrams == n
    assert got.n_contexts == len(m1)
    assert abs(got.h_rate_bits_r - h_cond / math.log(2)) < 1e-4
    assert abs(got.h_marginal_bits_r - h_marg / math.log(2)) < 1e-4


def test_permutation_test_reproduces_from_hash(spark, sf_dir):
    """The replicate diffs must reproduce from the same portable hash in
    Python, and the p-value identity must hold."""
    import hashlib

    got = QUERIES["permutation_test_ab"](spark, sf_dir).collect()[0]
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_id", "value", "event_type")
        .collect()
    )
    vals = [
        (r.event_id, math.floor(r.value * 1_000_000 + 0.5), r.event_type)
        for r in ev
    ]

    def diff(arms):
        s = [0, 0]
        n = [0, 0]
        for (_, v, _), a in zip(vals, arms):
            s[a] += v
            n[a] += 1
        return abs(s[1] / n[1] - s[0] / n[0]) / 1_000_000

    obs = diff([1 if t == "purchase" else 0 for _, _, t in vals])
    assert abs(got.obs_diff_r - obs) < 1e-6
    n_ext = 0
    for r in range(1, 21):
        arms = [
            int(hashlib.sha256(f"{eid}:{r}".encode()).hexdigest()[:15], 16) % 2
            for eid, _, _ in vals
        ]
        n_ext += diff(arms) >= obs
    assert got.n_extreme == n_ext
    assert abs(got.p_value_r - (1 + n_ext) / 21) < 1e-4


def test_lorenz_curve_identities(spark, sf_dir):
    """Deciles cover all customers, shares sum to 1, the cumulative walk
    is convex (shares non-decreasing by decile under the ascending
    rank), and the last cum share is exactly 1."""
    rows = QUERIES["lorenz_curve_points"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(10))
    n = (
        table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n
    assert abs(sum(r.decile_share_r for r in rows) - 1.0) < 1e-4
    shares = [r.decile_share_r for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(rows[-1].cum_share_r - 1.0) < 1e-6
    # the curve's area deficit must be consistent with the Gini summary
    gini = QUERIES["gini_concentration"](spark, sf_dir).collect()[0].gini_r
    # trapezoid on 10 deciles approximates the exact Gini within decile
    # resolution
    cum = [0.0] + [r.cum_share_r for r in rows]
    area = sum((a + b) / 2 for a, b in zip(cum, cum[1:])) / 10
    assert abs((1 - 2 * area) - gini) < 0.02


def test_markov_accuracy_brute(spark, sf_dir):
    """Accuracy must reproduce from a sequential walk of each user's
    event stream with the same (count desc, type asc) argmax."""
    from collections import Counter, defaultdict

    got = QUERIES["markov_next_event_accuracy"](spark, sf_dir).collect()[0]
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    pairs = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    pred = {}
    for (a, b), n in sorted(pairs.items(), key=lambda kv: (kv[0][0], -kv[1], kv[0][1])):
        pred.setdefault(a, b)
    n_tr = sum(pairs.values())
    hits = sum(n for (a, b), n in pairs.items() if pred[a] == b)
    nxt_totals = Counter()
    for (_, b), n in pairs.items():
        nxt_totals[b] += n
    mode = max(nxt_totals.values())
    assert got.n_transitions == n_tr
    assert abs(got.top1_accuracy_r - hits / n_tr) < 1e-6
    assert abs(got.majority_baseline_r - mode / n_tr) < 1e-6
    assert abs(
        got.kappa_vs_majority_r - (hits - mode) / (n_tr - mode)
    ) < 1e-5
