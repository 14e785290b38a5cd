"""Behavioral invariants for the round-6 session-2 operators — properties
the DuckDB oracle equality cannot see (conservation laws, metric bounds,
plan shapes), per the operator-invariant test discipline of the other
family test files."""

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- privacy


def test_k_anonymity_rows_conserve_customer_count(spark, sf_dir):
    out = QUERIES["k_anonymity_audit"](spark, sf_dir)
    total = out.agg(F.sum("n_rows")).first()[0]
    n_cust = table(spark, sf_dir, "customer").count()
    assert total == n_cust
    pcts = [r["pct_rows_r"] for r in out.collect()]
    assert abs(sum(pcts) - 100.0) < 0.01


def test_l_diversity_l_bounded_by_sensitive_cardinality(spark, sf_dir):
    out = QUERIES["l_diversity_audit"](spark, sf_dir).collect()
    n_seg = (
        table(spark, sf_dir, "customer").select("c_mktsegment").distinct().count()
    )
    assert all(1 <= r["l"] <= n_seg for r in out)


# ------------------------------------------------------- rank correlation


def test_spearman_and_kendall_in_range(spark, sf_dir):
    rho = QUERIES["spearman_corr_lengths"](spark, sf_dir).first()["spearman_r"]
    tau = QUERIES["kendall_tau_nations"](spark, sf_dir).first()["tau_b_r"]
    assert -1.0 <= rho <= 1.0
    assert -1.0 <= tau <= 1.0
    # doc char length and word count must correlate strongly positively
    assert rho > 0.5


def test_kendall_pair_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = _plan(QUERIES["kendall_tau_nations"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------- interval allocation


def test_interval_allocation_conserves_total_cents(spark, sf_dir):
    """The div/mod split must re-sum to the original order totals exactly
    — the no-pennies-lost conservation law."""
    alloc = (
        QUERIES["interval_allocation_daily"](spark, sf_dir)
        .agg(F.sum("alloc_rev_c"))
        .first()[0]
    )
    orig = (
        table(spark, sf_dir, "orders")
        .agg(
            F.sum(
                (
                    F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2) * 100
                ).cast("long")
            )
        )
        .first()[0]
    )
    assert alloc == orig


# ------------------------------------------------------- link prediction


def test_resource_allocation_scores_bounded(spark, sf_dir):
    """Each shared order contributes at most 1/2 (smallest basket with a
    pair has 2 items), so score <= n_shared / 2."""
    rows = QUERIES["resource_allocation_links"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["score_q"] <= r["n_shared"] * 720720 // 2


# ------------------------------------------------------------ readability


def test_readability_counts_exact_on_known_text(spark, sf_dir):
    out = QUERIES["readability_scores"](spark, sf_dir)
    row = out.first()
    assert row["n_words"] >= 1 and row["n_sentences"] >= 1
    # collapse-minus-remove identity on a hand-checked string
    df = spark.createDataFrame([("hello world. how are you?",)], ["text"])
    runs = df.select(
        (
            F.length(F.regexp_replace("text", "[aeiouAEIOU]+", "V"))
            - F.length(F.regexp_replace("text", "[aeiouAEIOU]+", ""))
        ).alias("r")
    ).first()["r"]
    # he-llo wo-rld | ho-w a-re you -> vowel runs: e,o,o,o,a,e,ou = 7
    assert runs == 7


# -------------------------------------------------------------- matryoshka


def test_matryoshka_overlap_between_zero_and_k(spark, sf_dir):
    rows = QUERIES["matryoshka_truncation_eval"](spark, sf_dir).collect()
    assert len(rows) == 10  # fixed panel: always exactly 10 queries
    assert all(0 <= r["n_overlap"] <= 5 for r in rows)


def test_vector_query_panel_is_fixed_size(spark):
    """The panel bound is THE quadratic guard for the brute-force exact
    baselines: 10 queries at sf0.001 and sf0.1 alike."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        n = (
            QUERIES["cosine_topk"](spark, sf)
            .select("query_id")
            .distinct()
            .count()
        )
        assert n == 10


# ------------------------------------------------------------------ causal


def test_did_equals_cell_mean_combination(spark, sf_dir):
    r = QUERIES["did_estimator"](spark, sf_dir).first()
    recomputed = round((r["m11_r"] - r["m10_r"]) - (r["m01_r"] - r["m00_r"]), 3)
    assert abs(recomputed - r["did_r"]) < 0.002  # rounding slack only
    assert r["n00"] + r["n01"] + r["n10"] + r["n11"] > 0


def test_caliper_matching_within_caliper_and_unique(spark, sf_dir):
    out = QUERIES["caliper_matching"](spark, "/root/testdata/sf0.01")
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["absdiff_c"] <= 2000
        assert r["treated_id"] % 2 == 1 and r["control_id"] % 2 == 0
    # one best match per treated
    assert len({r["treated_id"] for r in rows}) == len(rows)


def test_smd_zero_for_identical_arms(spark):
    """SMD must be ~0 when both arms are the same distribution."""
    df = spark.range(100).select(
        (F.col("id") % 2 == 0).cast("int").alias("treat"),
        # id div 2 pairs each treated row with an identical control value
        (F.expr("id div 2") % 10).cast("double").alias("v"),
    )
    s = df.groupBy().agg(
        F.avg(F.when(F.col("treat") == 1, F.col("v"))).alias("mt"),
        F.avg(F.when(F.col("treat") == 0, F.col("v"))).alias("mc"),
    ).first()
    assert abs(s["mt"] - s["mc"]) < 1e-9


# ------------------------------------------------------------ WAU rollups


def test_wau_at_least_daily_active(spark, sf_dir):
    wau = {
        r["day"]: r["wau"]
        for r in QUERIES["rolling_active_users"](spark, sf_dir).collect()
    }
    e = table(spark, sf_dir, "events")
    dau = {
        r["day"]: r["dau"]
        for r in e.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("dau"))
        .collect()
    }
    for day, n in dau.items():
        assert wau[day] >= n


# -------------------------------------------------------------- newsvendor


def test_newsvendor_is_discrete_075_quantile(spark, sf_dir):
    out = QUERIES["newsvendor_quantile_stock"](spark, sf_dir)
    r = out.first()
    # the stock level is an attained weekly demand, never interpolated
    li = table(spark, sf_dir, "lineitem")
    weekly = (
        li.filter(F.col("l_partkey") == r["part"])
        .groupBy(F.date_trunc("week", "l_shipdate"))
        .agg(F.sum("l_quantity").cast("long").alias("demand"))
    )
    demands = sorted(x["demand"] for x in weekly.collect())
    assert r["q75_stock"] in demands
    import math

    assert r["q75_stock"] == demands[math.ceil(0.75 * len(demands)) - 1]


# ---------------------------------------------------------------- FS / ER


def test_fellegi_sunter_class_thresholds(spark, sf_dir):
    rows = QUERIES["fellegi_sunter_scores"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["score_milli"] >= 6000:
            assert r["fs_class"] == "match"
        elif r["score_milli"] >= 0:
            assert r["fs_class"] == "possible"
        else:
            assert r["fs_class"] == "non-match"


# -------------------------------------------------------------- HLL algebra


def test_hll_intersection_inclusion_exclusion_and_sanity(spark, sf_dir):
    r = QUERIES["hll_set_intersection"](spark, sf_dir).first()
    assert (
        abs(
            (r["est_a_r"] + r["est_b_r"] - r["est_union_r"]) - r["est_inter_r"]
        )
        < 1e-3
    )
    # union estimate at least the larger single-set estimate (max-merge)
    assert r["est_union_r"] >= max(r["est_a_r"], r["est_b_r"]) - 1e-9


# ------------------------------------------------------------------- SAX


def test_sax_letters_partition_the_series(spark, sf_dir):
    out = QUERIES["sax_motifs"](spark, sf_dir).collect()
    assert out
    alphabet = set("abcd")
    for r in out:
        assert set(r["motif"]) <= alphabet and len(r["motif"]) == 3
