"""Semantic invariants for the retail/graph family (queries/retail.py) and
the round-5 session-3 retrieval additions (queries/llm.py tail) beyond
DuckDB oracle equivalence: two-level-vs-flat prefix-sum equality for ABC,
cosine bounds, LPA label sanity, banding losslessness for the SimHash pair
search, and a hand recomputation of the Dirichlet QL score."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.llm.dedup import simhash
from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def test_abc_two_level_equals_flat_prefix(spark, sf_dir):
    """The bucketed two-level cumsum must reproduce the flat partitionless
    prefix sum bit-for-bit (exact integer cents ⇒ associativity is real,
    not approximate)."""
    got = {
        r.abc_class: (r.n_parts, r.rev_share_r)
        for r in QUERIES["abc_pareto_class"](spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    prev = li.groupBy("l_partkey").agg(
        (
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)")
                ),
                2,
            )
            * 100
        )
        .cast("long")
        .alias("rev_c")
    )
    w = Window.orderBy(F.col("rev_c").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flat = (
        prev.withColumn("cum_c", F.sum("rev_c").over(w))
        .withColumn("total_c", F.sum("rev_c").over(Window.orderBy(F.lit(1))))
        .withColumn(
            "abc_class",
            F.when(
                F.col("cum_c").cast("decimal(38,0)") * 100
                <= F.col("total_c").cast("decimal(38,0)") * 80,
                "A",
            )
            .when(
                F.col("cum_c").cast("decimal(38,0)") * 100
                <= F.col("total_c").cast("decimal(38,0)") * 95,
                "B",
            )
            .otherwise("C"),
        )
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("rev_c") / F.first("total_c"), 6).alias(
                "rev_share_r"
            ),
        )
        .collect()
    )
    assert {r.abc_class: (r.n_parts, r.rev_share_r) for r in flat} == got
    # Pareto boundaries: A alone holds ≤ 80% of revenue, A+B ≤ 95%.
    assert got["A"][1] <= 0.80 and got["A"][1] + got["B"][1] <= 0.95
    assert abs(sum(s for _, s in got.values()) - 1.0) < 1e-5


def test_item_item_cosine_bounds(spark, sf_dir):
    rows = QUERIES["item_item_cosine"](spark, sf_dir).collect()
    assert rows, "support-≥2 graph should be non-empty at every fixture SF"
    per_item = {}
    for r in rows:
        assert 0.0 < r.cosine_r <= 1.0  # c_ij ≤ min(c_i, c_j) ⇒ cos ≤ 1
        assert r.n_co >= 2
        per_item.setdefault(r.item, []).append(r.cosine_r)
    for item, cs in per_item.items():
        assert len(cs) <= 3, item
        assert cs == sorted(cs, reverse=True), item  # rank order surfaced


def test_lpa_communities_label_sanity(spark, sf_dir):
    out = QUERIES["label_propagation_communities"](spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    sizes = [r.size for r in out]
    assert sizes == sorted(sizes, reverse=True)
    # labels are node ids (parts), and top-20 membership can't exceed the
    # graph's vertex count
    li = table(spark, sf_dir, "lineitem")
    parts = {r.l_partkey for r in li.select("l_partkey").distinct().collect()}
    assert all(r.community in parts for r in out)
    assert sum(sizes) <= len(parts)


def test_simhash_banding_is_lossless(spark, sf_dir):
    """Every Hamming-≤3 pair must be proposed by the 4-band bucketing
    (pigeonhole) — compare the query against brute-force popcount over
    all signature pairs."""
    got = {
        (r.id1, r.id2): r.hamming_d
        for r in QUERIES["simhash_hamming_pairs"](spark, sf_dir).collect()
    }
    d = table(spark, sf_dir, "documents")
    sigs = {
        r.doc_id: r.simhash
        for r in simhash(d, "doc_id", "text", 60, shingle_n=3).collect()
    }
    ids = sorted(sigs)
    brute = {
        (a, b): (sigs[a] ^ sigs[b]).bit_count()
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (sigs[a] ^ sigs[b]).bit_count() <= 3
    }
    assert got == brute


def test_query_likelihood_matches_hand_score(spark, sf_dir):
    out = QUERIES["query_likelihood_topk"](spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    scores = [r.ql_r for r in out]
    assert scores == sorted(scores, reverse=True)
    # hand-recompute the top doc's score from raw token counts
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    coll = {r.term: r.cf for r in toks.groupBy("term").agg(F.count("*").alias("cf")).collect()}
    n = sum(coll.values())
    q = [
        r.term
        for r in toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .offset(9)
        .limit(3)
        .collect()
    ]
    top = out[0].doc_id
    doc_tf = {
        r.term: r.f
        for r in toks.filter(F.col("doc_id") == top)
        .groupBy("term")
        .agg(F.count("*").alias("f"))
        .collect()
    }
    dl = sum(doc_tf.values())
    mu = 2000.0
    expect = sum(
        math.log(
            (doc_tf.get(t, 0) + mu * coll[t] / n) / (dl + mu)
        )
        for t in q
    )
    assert abs(out[0].ql_r - round(expect, 4)) < 1e-9


def test_benford_is_a_proper_distribution(spark, sf_dir):
    rows = QUERIES["benford_law_check"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_p_r for r in rows) - 1.0) < 1e-4
    # expected Benford frequencies, independently recomputed
    for r in rows:
        assert abs(r.exp_p_r - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
        assert r.chi2_part_r >= 0.0


def test_session_paths_are_valid_prefixes(spark, sf_dir):
    rows = QUERIES["session_path_mining"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    types = {"view", "click", "purchase", "signup", "error"}
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= 3
        assert set(steps) <= types
    # conservation: total mined sessions can't exceed distinct user-days
    e = table(spark, sf_dir, "events")
    n_sessions = (
        e.select("user_id", F.to_date("ts").alias("day")).distinct().count()
    )
    assert sum(counts) <= n_sessions


def test_conversion_latency_quantiles_ordered(spark, sf_dir):
    r = QUERIES["conversion_latency_quantiles"](spark, sf_dir).collect()[0]
    assert r.n_conversions > 0
    qs = [r.p25_us_r, r.p50_us_r, r.p75_us_r, r.p90_us_r]
    assert qs == sorted(qs)  # quantiles are monotone
    assert 0 < qs[0] and qs[-1] <= 3_600_000_000  # within the 1h window


def test_modularity_contributions_are_consistent(spark, sf_dir):
    """Q_i ∈ [-1, 1]; within-edges can't exceed m; the LPA partition's
    node counts here must match label_propagation_communities' sizes."""
    rows = QUERIES["community_modularity"](spark, sf_dir).collect()
    assert rows
    lpa = {
        r.community: r.size
        for r in QUERIES["label_propagation_communities"](
            spark, sf_dir
        ).collect()
    }
    for r in rows:
        assert -1.0 <= r.q_contrib_r <= 1.0
        assert 0 <= r.n_within
        assert r.deg_sum >= 2 * r.n_within  # within-edges use community degree
        if r.community in lpa:
            assert lpa[r.community] == r.n_nodes


def test_assortativity_is_a_correlation(spark, sf_dir):
    r = QUERIES["graph_assortativity"](spark, sf_dir).collect()[0]
    assert r.n_edge_ends > 0 and r.n_edge_ends % 2 == 0  # both orientations
    assert -1.0 <= r.assortativity_r <= 1.0


def test_pmi_respects_min_count_and_bound(spark, sf_dir):
    """PMI ≤ ln(N / max(c_x, c_y)) ≤ ln(N/c_xy's support floor); with
    min-count 5 every pair must satisfy n_xy >= 5, and PMI(x,y) can
    never exceed -ln p(x) (perfect association bound)."""
    rows = QUERIES["collocations_pmi"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.pmi_r for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.n_xy >= 5


def test_recsys_eval_consistent_with_topk(spark, sf_dir):
    r = QUERIES["recsys_coverage_eval"](spark, sf_dir).collect()[0]
    tk = QUERIES["item_item_cosine"](spark, sf_dir).collect()
    assert r.n_covered == len({x.item for x in tk})
    assert 0.0 < r.coverage_r <= 1.0
    assert 1.0 <= r.avg_neighbors_r <= 3.0
    assert 0.0 <= r.reciprocity_r <= 1.0


def test_postings_heads_are_doc_ordered(spark, sf_dir):
    rows = QUERIES["postings_lists"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        entries = r.postings_head.split(",")
        assert len(entries) == min(r.df, 50)
        docs = [int(e.split(":")[0][1:]) for e in entries]
        assert docs == sorted(docs)  # postings are doc-ordered
        tfs = [int(e.split(":")[1]) for e in entries]
        assert all(t >= 1 for t in tfs)
        if r.df <= 50:  # full postings present → tf conservation
            assert sum(tfs) == r.total_tf


def test_leaderboard_shift_identity(spark, sf_dir):
    rows = QUERIES["leaderboard_rank_shift"](spark, sf_dir).collect()
    by_month = {}
    for r in rows:
        by_month.setdefault(r.month, []).append(r)
        if r.prev_rnk is not None:
            assert r.shift == r.prev_rnk - r.rnk
            assert 1 <= r.prev_rnk <= 10
        else:
            assert r.shift is None  # board entrant
    for month, rs in by_month.items():
        ranks = sorted(x.rnk for x in rs)
        assert ranks == list(range(1, len(rs) + 1))  # dense 1..k board
        assert len(rs) <= 10


def test_kcore_peeling_contracts_to_fixpoint(spark, sf_dir):
    rows = {r.round: r for r in QUERIES["kcore_peeling"](spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2, 3}
    vs = [rows[i].n_vertices for i in range(4)]
    es = [rows[i].n_edges for i in range(4)]
    assert vs == sorted(vs, reverse=True)  # peeling only shrinks
    assert es == sorted(es, reverse=True)
    assert vs[2] == vs[3] and es[2] == es[3]  # fixpoint reached by round 3


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    """The balanced Morton layout must let a 1/8-domain stripe predicate
    prune a meaningful fraction of files on BOTH dims — the whole point
    vs a single-column sort (which prunes ~0 on the non-sort dim)."""
    rows = {r.dim: r for r in QUERIES["zorder_pruning_audit"](spark, sf_dir).collect()}
    assert set(rows) == {"x", "y"}
    for r in rows.values():
        assert r.n_tiles == 32
        assert 0 <= r.n_pruned < 32  # some tiles must intersect the stripe
    assert rows["x"].pruned_frac_r >= 0.25
    assert rows["y"].pruned_frac_r >= 0.25


def test_tier_migration_conserves_customers(spark, sf_dir):
    from pyspark.sql import functions as SF

    rows = QUERIES["tier_migration_matrix"](spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders")
    n95 = (
        o.filter(SF.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
        .count()
    )
    n96 = (
        o.filter(SF.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
        .count()
    )
    # row marginals: every 1995 customer appears exactly once on the left
    left = sum(r.n_customers for r in rows if r.tier_1995 != "none")
    right = sum(r.n_customers for r in rows if r.tier_1996 != "none")
    assert left == n95 and right == n96
    tiers = {"gold", "silver", "bronze", "none"}
    assert all(r.tier_1995 in tiers and r.tier_1996 in tiers for r in rows)


def test_ltv_curves_are_monotone(spark, sf_dir):
    rows = QUERIES["cohort_ltv_curve"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age)
        ltvs = [r.ltv_per_cust_r for r in rs]
        assert ltvs == sorted(ltvs), cohort  # cumulative ⇒ non-decreasing
        assert all(x > 0 for x in ltvs)
        assert rs[0].age >= 0 and rs[-1].age <= 11


def test_basket_lift_rules_identities(spark, sf_dir):
    """Rule scores must reproduce from raw basket counts: confidence =
    n_co/n_antecedent, lift symmetric in the pair, support ≤ confidence."""
    from collections import defaultdict

    rows = QUERIES["basket_lift_rules"](spark, sf_dir).collect()
    assert rows
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    n_all = len(baskets)
    per_item = defaultdict(int)
    co = defaultdict(int)
    for items in baskets.values():
        for p in items:
            per_item[p] += 1
        items_s = sorted(items)
        for i, p1 in enumerate(items_s):
            for p2 in items_s[i + 1 :]:
                co[(p1, p2)] += 1
    lifts = {}
    for r in rows:
        key = tuple(sorted((r.antecedent, r.consequent)))
        n_co = co[key]
        assert r.n_co == n_co >= 2
        assert abs(r.support_r - n_co / n_all) < 1e-6
        assert abs(r.confidence_r - n_co / per_item[r.antecedent]) < 1e-6
        expect_lift = n_co * n_all / (
            per_item[r.antecedent] * per_item[r.consequent]
        )
        assert abs(r.lift_r - expect_lift) < 1e-5
        lifts.setdefault(key, set()).add(r.lift_r)
    # lift is direction-independent: both orientations agree when present
    assert all(len(v) == 1 for v in lifts.values())


def test_price_elasticity_matches_numpy(spark, sf_dir):
    """The regr_* moment slope must equal a numpy least-squares fit of
    ln(qty) on ln(price) for a spot-checked brand."""
    import numpy as np

    rows = {r.p_brand: r for r in QUERIES["price_elasticity"](spark, sf_dir).collect()}
    brand = sorted(rows)[0]
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    sample = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select("l_quantity", "l_extendedprice")
        .collect()
    )
    x = np.log([r.l_extendedprice for r in sample])
    y = np.log([r.l_quantity for r in sample])
    slope = np.polyfit(x, y, 1)[0]
    got = rows[brand]
    assert got.n == len(sample)
    assert abs(got.elasticity_r - slope) < 1e-3
