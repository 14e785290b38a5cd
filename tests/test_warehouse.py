"""Unit tests: warehouse-maintenance operators (profile, SCD2, PageRank)
on tiny literal DataFrames — exact expected outputs plus the structural
invariants each operator promises (SURVEY.md §5.2)."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.operators.graph import pagerank
from ab_inbev_big_data_case_spark.operators.relational import build_scd2, profile
from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def test_profile_counts_and_typed_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", None), (2, None, 8.0)],
        "k long, s string, v double",
    )
    rows = {r["col_name"]: r for r in profile(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r["n_rows"] == 3 for r in rows.values())
    assert rows["k"]["n_nulls"] == 0 and rows["k"]["n_distinct"] == 2
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_nulls"] == 1
    # numeric min/max land in the num slots, strings in the str slots
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["k"]["min_str"] is None
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["s"]["min_num"] is None


def test_profile_is_single_aggregate_plan(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate chain over one scan — the melt is in-row, not a union
    assert plan.count("LogicalRDD") == 1


def _feed(spark):
    # key 1: A,A,B,A → intervals A[1,3) B[3,4) A[4,∞); key 2: C → C[1,∞)
    return spark.createDataFrame(
        [(1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "A"), (2, 1, "C")],
        "k long, t long, attr string",
    )


def test_scd2_collapses_runs_and_closes_intervals(spark):
    out = build_scd2(_feed(spark), "k", "t", "attr").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    k1 = sorted(by_key[1], key=lambda r: r["eff_from"])
    assert [(r["attr"], r["eff_from"], r["eff_to"]) for r in k1] == [
        ("A", 1, 3),
        ("B", 3, 4),
        ("A", 4, None),
    ]
    assert [r["is_current"] for r in k1] == [False, False, True]
    assert by_key[2][0]["attr"] == "C" and by_key[2][0]["is_current"]


def test_scd2_intervals_partition_the_timeline(spark):
    # each interval's eff_to equals the next interval's eff_from (no gaps,
    # no overlaps) — the defining SCD2 invariant
    out = build_scd2(_feed(spark), "k", "t", "attr")
    w = F.lead("eff_from").over(Window.partitionBy("k").orderBy("eff_from"))
    bad = out.withColumn("next_from", w).filter(
        F.col("eff_to").isNotNull() & (F.col("eff_to") != F.col("next_from"))
    )
    assert bad.count() == 0


def test_pagerank_star_graph_ranks_hub_highest(spark):
    # 3 spokes all pointing at a hub: hub rank must dominate, spokes equal
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=5).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[2] == ranks[3]  # symmetric spokes
    # total mass stays ≤ 1 (sinks leak, never gain)
    assert sum(ranks.values()) <= 1.0 + 1e-6


def test_pagerank_uniform_cycle_is_uniform(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    ranks = [r["rank"] for r in pagerank(edges, n_iter=4).collect()]
    # per-round rounding to 8 decimals truncates 1/3 — allow that quantum
    assert all(math.isclose(r, 1 / 3, abs_tol=1e-7) for r in ranks)


def test_ivm_join_delta_terms_nonempty(spark, sf_dir):
    """The delta split must exercise every term of the join-IVM algebra:
    both delta relations are non-empty and contribute joined rows, so the
    oracle's full-recompute match is evidence for the merge, not for a
    degenerate empty-delta case."""
    from ab_inbev_big_data_case_spark.sources.readers import table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    l_d = li.filter(F.col("l_orderkey") % 7 == 0)
    o_d = o.filter(F.col("o_orderkey") % 5 == 0)
    assert l_d.count() > 0 and o_d.count() > 0
    assert l_d.join(o_d, l_d.l_orderkey == o_d.o_orderkey).count() > 0


# ------------------------------------------- round-5: compaction + CDC apply


def test_compaction_plan_matches_sequential_simulation(spark, sf_dir):
    """The windowed bin assignment must equal the sequential cumulative-fill
    simulation per partition, and conserve the file inventory."""
    li = table(spark, sf_dir, "lineitem")
    files = (
        li.groupBy(
            F.date_trunc("month", "l_shipdate").alias("month"),
            (F.col("l_orderkey") % 12).alias("sub"),
        )
        .agg((F.count("*") * 120).alias("bytes"))
        .collect()
    )
    sim = {}
    by_month = {}
    for r in files:
        by_month.setdefault(r.month, []).append((r.bytes, r.sub))
    for month, fs in by_month.items():
        fs.sort(key=lambda t: (-t[0], t[1]))
        bins = {}
        cum = 0
        for bytes_, _ in fs:
            bins.setdefault(cum // 32_000, []).append(bytes_)
            cum += bytes_
        sim[month] = {
            "n_files": len(fs),
            "total": sum(b for b, _ in fs),
            "n_bins": len(bins),
            "max_bin": max(sum(v) for v in bins.values()),
            "fill_bp": sum(b for b, _ in fs) * 10000 // (len(bins) * 32_000),
        }
    got = {r.month: r for r in QUERIES["compaction_plan"](spark, sf_dir).collect()}
    assert set(got) == set(sim)
    for month, s in sim.items():
        g = got[month]
        assert (g.n_files, g.total_bytes, g.n_bins, g.max_bin_bytes, g.fill_bp) == (
            s["n_files"], s["total"], s["n_bins"], s["max_bin"], s["fill_bp"]
        ), month


def test_cdc_apply_changeset_merge_semantics(spark, sf_dir):
    from ab_inbev_big_data_case_spark.registry import QUERIES

    out = QUERIES["cdc_apply_changeset"](spark, sf_dir)
    o = table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderdate") < "1997-01-01")
    n_base = base.count()
    n_del = base.filter(F.col("o_orderkey") % 7 == 0).count()
    n_upd = base.filter(
        (F.col("o_orderkey") % 5 == 1) & (F.col("o_orderkey") % 7 != 0)
    ).count()
    n_ins = o.filter(F.col("o_orderdate") >= "1997-01-01").count()

    rows = out.collect()
    assert len(rows) == n_base - n_del + n_ins
    by_src = {}
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0) + 1
    assert by_src == {
        "base": n_base - n_del - n_upd,
        "update": n_upd,
        "insert": n_ins,
    }
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys)), "MERGE must keep keys unique"
    # tombstones fully applied — no %7 key survives from the base snapshot
    assert all(
        r.o_orderkey % 7 != 0 for r in rows if r.src in ("base", "update")
    )
    # update path applied the price bump against the base row
    base_price = {
        r.o_orderkey: r.o_totalprice
        for r in base.filter(
            (F.col("o_orderkey") % 5 == 1) & (F.col("o_orderkey") % 7 != 0)
        ).collect()
    }
    for r in rows:
        if r.src == "update":
            assert r.o_orderstatus == "U"
            # engines use HALF_UP, python round() is half-even: compare to
            # the unrounded bump within half a cent instead
            assert abs(r.price_r - base_price[r.o_orderkey] * 1.1) <= 0.0051


def test_join_key_skew_report_exact_moments(spark, sf_dir):
    r = QUERIES["join_key_skew_report"](spark, sf_dir).collect()[0]
    counts = {}
    for row in table(spark, sf_dir, "lineitem").select("l_partkey").collect():
        counts[row.l_partkey] = counts.get(row.l_partkey, 0) + 1
    n = sum(counts.values())
    max_n = max(counts.values())
    top = min(k for k, v in counts.items() if v == max_n)
    assert (r.n_keys, r.n_rows, r.top_key, r.top_n) == (
        len(counts), n, top, max_n
    )
    assert r.top_share_r == round(max_n / n, 6)
    assert r.hhi_r == round(sum(v * v for v in counts.values()) / (n * n), 6)


def test_partition_checksum_brute_force_and_order_insensitive(spark, sf_dir):
    import hashlib
    from collections import defaultdict

    rows = (
        table(spark, sf_dir, "orders")
        .select(
            F.date_trunc("month", "o_orderdate").alias("month"),
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("p"),
        )
        .collect()
    )
    acc, cnt = defaultdict(int), defaultdict(int)
    for r in rows:
        s = f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|{r.p}"
        h = int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)
        acc[r.month] += h  # any accumulation order: sum is commutative
        cnt[r.month] += 1
    got = {r.month: r for r in QUERIES["partition_checksum"](spark, sf_dir).collect()}
    assert set(got) == set(acc)
    for m in acc:
        assert got[m].n_rows == cnt[m]
        assert got[m].checksum == acc[m] % 1_000_000_007, m


def test_snm_pairs_are_rank_adjacent(spark, sf_dir):
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["sorted_neighborhood_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rank_gap in (1, 2)
        assert 0 <= r.lev <= 2
        assert r.id1 != r.id2
    # fan-out bound: at most 2 emitted pairs per left record
    from collections import Counter

    per_left = Counter((r.block_key, r.id1) for r in rows)
    assert max(per_left.values()) <= 2


def test_cycle_quantiles_ordered(spark, sf_dir):
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["order_cycle_quantiles"](spark, sf_dir).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        assert 0 < r.p50_days_r <= r.p90_days_r <= r.p99_days_r
        assert r.n_lines > 0
