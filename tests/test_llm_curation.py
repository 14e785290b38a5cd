"""Semantic invariants for the round-4 curation operators
(queries/llm_curation.py) beyond DuckDB oracle equivalence."""

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
from ab_inbev_big_data_case_spark.sources.readers import table

load_all()


def test_dsir_upweights_target_sources(spark, sf_dir):
    """The whole point of DSIR: docs drawn from the target distribution
    must score higher on average than the rest of the corpus."""
    w = QUERIES["dsir_importance_weights"](spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    by_side = (
        w.join(d, "doc_id")
        .groupBy(F.col("source").isin("src1", "src2", "src3").alias("is_target"))
        .agg(F.avg("dsir_weight_r").alias("mean_w"))
        .collect()
    )
    means = {r.is_target: r.mean_w for r in by_side}
    assert means[True] > means[False]


def test_bigram_counts_are_tokens_minus_one(spark, sf_dir):
    bi = QUERIES["bigram_lm_score"](spark, sf_dir).select("doc_id", "n_bigrams")
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .filter(F.col("n_tokens") >= 2)
    )
    bad = bi.join(toks, "doc_id").filter(
        F.col("n_bigrams") != F.col("n_tokens") - 1
    )
    assert bad.count() == 0


def test_bpe_pairs_shape(spark, sf_dir):
    rows = QUERIES["bpe_pair_counts"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert all(len(r.pair) == 2 for r in rows)
    counts = [r.n_occ for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_containment_dominates_jaccard(spark, sf_dir):
    """For any pair, max(cont1, cont2) ≥ jaccard (containment divides by
    one set size, jaccard by the union), and both sit in (0, 1]."""
    rows = QUERIES["containment_pairs"](spark, sf_dir).collect()
    for r in rows:
        assert r.id1 < r.id2
        assert 0 < r.cont1 <= 1.0 and 0 < r.cont2 <= 1.0
        assert max(r.cont1, r.cont2) >= 0.5


def test_containment_df_cap_bounds_fanout(spark):
    """The doc-frequency cap must drop hot shingles BEFORE the self-join:
    on a fixture where one stop-shingle is shared by every doc (k² pair
    fan-out) and each legit pair shares rare shingles, a cap below k kills
    the stop-shingle pairs but keeps the rare-shingle pairs, and the
    containment denominators count only kept shingles."""
    from ab_inbev_big_data_case_spark.llm.dedup import containment_pairs

    k = 40
    # every doc holds the stop shingle; docs 2i/2i+1 share a rare shingle
    rows = []
    for i in range(k):
        rows.append((i, "the quick fox"))  # stop shingle, df = k
        rows.append((i, f"rare pair {i // 2}"))  # df = 2
        rows.append((i, f"unique only {i}"))  # df = 1
    sh = spark.createDataFrame(rows, ["doc_id", "shingle"])

    capped = containment_pairs(sh, "doc_id", 0.4, max_shingle_df=10).collect()
    # only consecutive-doc pairs survive: (0,1), (2,3), ... — k/2 pairs,
    # each with 1 shared of 2 kept shingles → cont = 0.5 both ways
    assert len(capped) == k // 2
    assert all(r.id2 == r.id1 + 1 and r.id1 % 2 == 0 for r in capped)
    assert all(r.cont1 == 0.5 and r.cont2 == 0.5 for r in capped)

    # uncapped: the stop shingle alone pairs every doc with every other —
    # quadratic fan-out the cap exists to prevent
    uncapped = containment_pairs(sh, "doc_id", 0.3).count()
    assert uncapped == k * (k - 1) // 2


def test_kmeans_partitions_corpus(spark, sf_dir):
    rows = QUERIES["kmeans_cells"](spark, sf_dir).collect()
    n_vecs = table(spark, sf_dir, "embeddings").count()
    n_seeds = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 61 == 0)
        .count()
    )
    assert sum(r.n_members for r in rows) == n_vecs
    assert len(rows) <= n_seeds
    assert all(r.centroid_norm_r > 0 for r in rows)


def test_bloom_prefilter_prunes_without_false_negatives(spark, sf_dir):
    """The bloom prefilter must (a) never drop a true-joining fact row and
    (b) actually prune: probing lineitem against the selective orders key
    set keeps every matching row and discards most of the rest."""
    from pyspark.sql import functions as F

    from ab_inbev_big_data_case_spark.llm.sketches import bloom_build, bloom_probe

    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    bloom = bloom_build(o.select(F.col("o_orderkey").cast("string").alias("k")), "k")
    probed = bloom_probe(
        li.withColumn("__k", F.col("l_orderkey").cast("string")), bloom, "__k"
    )
    n_fact = li.count()
    n_kept = probed.filter("bloom_hit").count()
    n_true = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()
    # no false negatives: every truly joining row survives the prefilter
    n_true_kept = (
        probed.filter("bloom_hit")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .count()
    )
    assert n_true_kept == n_true
    # pruning bites: kept fraction is close to the true-match fraction
    assert n_true <= n_kept < max(2 * n_true, int(0.2 * n_fact))


def test_backoff_actually_fires(spark, sf_dir):
    """Min-count pruning must leave some singleton bigrams, so backoff is a
    live path, and every score is a positive -log probability."""
    rows = QUERIES["backoff_lm_score"](spark, sf_dir).collect()
    assert sum(r.n_backoff for r in rows) > 0
    assert all(0 <= r.n_backoff <= r.n_bigrams for r in rows)
    assert all(r.avg_neg_logprob_sb > 0 for r in rows)


def test_random_projection_preserves_norms(spark, sf_dir):
    """The JL guarantee: ||proj(x)|| / ||x|| concentrates around 1 for a
    ±1/sqrt(k) Rademacher matrix."""
    import statistics

    ratios = [
        r.norm_ratio_r
        for r in QUERIES["random_projection_stats"](spark, sf_dir).collect()
    ]
    assert 0.85 < statistics.mean(ratios) < 1.15
    assert statistics.pstdev(ratios) < 0.35


def test_pq_seed_vectors_quantize_to_themselves(spark, sf_dir):
    """A codebook seed's nearest centroid in every subspace is itself, so
    its 4 codes are its own id and its quantization error is 0; all other
    vectors carry 4 codes drawn from the seed set."""
    rows = QUERIES["pq_codes"](spark, sf_dir).collect()
    seeds = {r.vec_id for r in rows if r.vec_id % 97 == 0}
    assert seeds
    for r in rows:
        if r.vec_id in seeds:
            assert (r.c0, r.c1, r.c2, r.c3) == (r.vec_id,) * 4
            assert r.err_r == 0.0
        assert {r.c0, r.c1, r.c2, r.c3} <= seeds
        assert r.err_r >= 0.0


def test_adc_topk_shape_and_monotonic(spark, sf_dir):
    """ADC search returns a full, monotonic top-5 per query, and scores are
    sums of per-subspace table entries (non-negative)."""
    import collections

    rows = QUERIES["pq_adc_search"](spark, sf_dir).collect()
    per_q = collections.defaultdict(list)
    for r in rows:
        per_q[r.qid].append(r)
    n_q = table(spark, sf_dir, "embeddings").filter("vec_id % 83 = 0").count()
    assert len(per_q) == n_q
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        assert all(r.adc_r >= 0 for r in rs)
        assert all(rs[i].adc_r <= rs[i + 1].adc_r for i in range(4))


def test_prefix_filter_skips_stop_token_candidates(spark):
    """The prefix must exclude the globally-frequent token: docs that share
    ONLY a stop token never become candidates (the raw token self-join
    would emit all k² of them), while genuinely similar docs survive."""
    from ab_inbev_big_data_case_spark.llm.dedup import prefix_filter_jaccard_pairs

    k = 30
    rows = [(i, f"the unique{i} word{i}") for i in range(k)]
    # one true near-dup pair: identical 3-token docs (jaccard 1.0)
    rows += [(100, "alpha beta gamma"), (101, "alpha beta gamma")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = prefix_filter_jaccard_pairs(df, "doc_id", "text", 0.5).collect()
    assert [(r.id1, r.id2, r.jaccard) for r in got] == [(100, 101, 1.0)]


# ---------------------------------------------- round-5: span coverage etc.


def test_dup_span_coverage_interval_union_brute_force(spark):
    """The windowed interval-union must equal per-token brute-force marking
    on a fixture with overlapping, adjacent, and within-doc repeated
    passages."""
    from ab_inbev_big_data_case_spark.llm.dedup import dup_span_stats

    common = " ".join(f"w{i}" for i in range(10))
    docs = [
        (1, common + " x1 x2"),              # shared passage at the head
        (2, "y1 y2 " + common),              # same passage at the tail
        (3, " ".join(f"u{i}" for i in range(12))),   # fully unique
        (4, common + " z " + common),        # passage repeated within doc
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in dup_span_stats(df, "doc_id", "text", 8).collect()}

    texts = {i: t.split(" ") for i, t in docs}
    spans = {
        (i, p): " ".join(toks[p : p + 8])
        for i, toks in texts.items()
        for p in range(len(toks) - 7)
    }
    from collections import defaultdict

    by_span = defaultdict(set)
    for (i, p), s in spans.items():
        by_span[s].add(i)
    for i, toks in texts.items():
        covered = set()
        n_dup = 0
        for p in range(len(toks) - 7):
            if len(by_span[" ".join(toks[p : p + 8])]) >= 2:
                covered.update(range(p, p + 8))
                n_dup += 1
        r = got[i]
        assert r.n_tokens == len(toks)
        assert r.n_dup_spans == n_dup, i
        assert r.covered_tokens == len(covered), i
        assert r.dup_token_ratio_r == round(len(covered) / len(toks), 4)
    # the fixture exercised every regime
    assert got[3].covered_tokens == 0 and got[1].covered_tokens == 10
    assert got[4].covered_tokens == 20


def test_shard_assignment_conserves_corpus(spark, sf_dir):
    rows = QUERIES["shard_assignment"](spark, sf_dir).collect()
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    n_toks = d.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_tokens for r in rows) == n_toks
    assert all(0 <= r.shard_id < 16 for r in rows)
    # hash balance: every shard within 3x of ideal on this corpus
    assert all(0.2 < r.load_ratio_r < 3.0 for r in rows)


def test_minhash_estimator_accuracy_exact_side_is_true_jaccard(spark, sf_dir):
    out = QUERIES["minhash_estimator_accuracy"](spark, sf_dir).collect()
    assert out, "LSH should produce candidates on the fixture corpus"
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").collect()
    }

    def sh3(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    for r in out:
        a, b = sh3(docs[r.id1]), sh3(docs[r.id2])
        expect = len(a & b) / len(a | b)
        assert r.exact_jaccard_r == round(expect, 4), (r.id1, r.id2)
        assert 0.0 <= r.est_jaccard_r <= 1.0
        assert abs(r.abs_err_r - round(abs(r.est_jaccard_r - expect), 4)) <= 1e-3


def test_dup_span_interval_union_hypothesis(spark):
    """Property: for ANY corpus where every span is duplicated (two copies
    of each doc), per-doc coverage equals the brute-force per-token
    marking — random lengths exercise run merging exhaustively."""
    from hypothesis import given, settings, strategies as st

    from ab_inbev_big_data_case_spark.llm.dedup import dup_span_stats

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=8, max_value=40), min_size=1, max_size=4)
    )
    def check(lengths):
        # doc i and its clone share every span -> df>=2 everywhere;
        # distinct vocab per doc keeps cross-doc collisions out
        docs = []
        for i, n in enumerate(lengths):
            text = " ".join(f"d{i}w{j}" for j in range(n))
            docs.append((2 * i, text))
            docs.append((2 * i + 1, text))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r.doc_id: r for r in dup_span_stats(df, "doc_id", "text", 8).collect()
        }
        for doc_id, text in docs:
            n = len(text.split(" "))
            r = got[doc_id]
            # every position is inside some duplicated span -> full coverage
            assert r.n_dup_spans == n - 7
            assert r.covered_tokens == n
            assert r.dup_token_ratio_r == 1.0

    check()


def test_bpe_apply_merges_python_reference(spark, sf_dir):
    """The unrolled merge lineage must equal a sequential python BPE on the
    same top-300 word table (greedy left-to-right splice semantics)."""
    from collections import Counter

    words = Counter()
    for r in table(spark, sf_dir, "documents").select("text").collect():
        words.update(r.text.split(" "))
    top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:300]
    seqs = {w: " ".join(w) for w, _ in top}

    got = sorted(
        QUERIES["bpe_apply_merges"](spark, sf_dir).collect(),
        key=lambda r: r.merge_round,
    )
    for rnd in range(3):
        pc = Counter()
        for w, c in top:
            t = seqs[w].split(" ")
            for a, b in zip(t, t[1:]):
                pc[f"{a} {b}"] += c
        best_pair, best_n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        r = got[rnd]
        assert (r.merged_pair, r.pair_weight) == (best_pair, best_n), rnd
        merged = best_pair.replace(" ", "")
        for w, _ in top:
            s = f" {seqs[w]} "
            s = s.replace(f" {best_pair} ", f" {merged} ")
            seqs[w] = s.strip()
        tok_sum = sum(len(seqs[w].split(" ")) * c for w, c in top)
        cnt_sum = sum(c for _, c in top)
        assert abs(r.avg_tokens_after_r - tok_sum / cnt_sum) <= 0.00051, rnd


def test_heaps_law_is_sublinear(spark, sf_dir):
    """Vocabulary growth must be sublinear (0 < beta < 1 — the premise of
    every word-table design note), the fit must be on all 20
    checkpoints, and totals must match direct counts."""
    from pyspark.sql import functions as F

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.sources.readers import table

    load_all()
    r = QUERIES["heaps_law_fit"](spark, sf_dir).collect()[0]
    assert r.n_checkpoints == 20
    assert 0.0 < r.beta_r < 1.0
    assert r.k_r > 0
    from ab_inbev_big_data_case_spark.functions.text import shingles, tokens

    d = table(spark, sf_dir, "documents")
    sh = d.select(F.explode(shingles(tokens(F.col("text")), 3)).alias("w"))
    assert r.total_tokens == sh.count()
    assert r.total_vocab == sh.select("w").distinct().count()


def test_strict_funnel_rates_are_nested(spark, sf_dir):
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

    load_all()
    r = QUERIES["strict_funnel_conversion"](spark, sf_dir).collect()[0]
    assert r.n_views >= r.n_clicked >= r.n_purchased >= 0
    assert 0 <= r.overall_rate_r <= r.step2_rate_r <= 1


def test_ess_bounds(spark, sf_dir):
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

    load_all()
    r = QUERIES["importance_weight_ess"](spark, sf_dir).collect()[0]
    assert 1.0 <= r.ess_r <= r.n_docs  # ESS in [1, n] by Cauchy-Schwarz
    assert abs(r.ess_frac_r - round(r.ess_r / r.n_docs, 4)) < 1e-3


def test_hash_collision_audit_consistent(spark, sf_dir):
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all

    load_all()
    r = QUERIES["feature_hash_collision_audit"](spark, sf_dir).collect()[0]
    assert r.n_occupied <= min(r.n_terms, 10_000)
    assert 0 <= r.n_colliding <= r.n_terms
    assert r.max_bucket >= 1
    # birthday bound sanity: with n terms in 10k buckets the colliding
    # fraction can't exceed 1 and must be 0 iff injective
    assert (r.n_colliding == 0) == (r.n_occupied == r.n_terms)


def test_winnowing_matches_sequential_reference(spark, sf_dir):
    """The packed-integer grouped-min selection must equal the textbook
    sequential winnowing walk (rightmost minimum per window) on every
    fixture document; density lands near the theoretical 2/(w+1)."""
    import hashlib
    from collections import Counter

    K, W = 4, 4
    got = QUERIES["winnowing_fingerprints"](spark, sf_dir).collect()[0]
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def winnow(toks):
        n = len(toks) - K + 1
        if n < W:
            return None, 0
        hs = [
            int(
                hashlib.sha256(" ".join(toks[i : i + K]).encode()).hexdigest()[
                    :10
                ],
                16,
            )
            for i in range(n)
        ]
        sel = set()
        for p in range(n - W + 1):
            win = hs[p : p + W]
            m = min(win)
            idx = max(i for i in range(W) if win[i] == m)
            sel.add((p + idx, hs[p + idx]))
        return sel, n

    n_docs = n_kgrams = n_sel = 0
    df = Counter()
    for r in docs:
        sel, nk = winnow(r.text.split(" "))
        if sel is None:
            continue
        n_docs += 1
        n_kgrams += nk
        n_sel += len(sel)
        for h in {h for _, h in sel}:
            df[h] += 1
    assert got.n_docs == n_docs
    assert got.n_kgrams == n_kgrams
    assert got.n_sel_positions == n_sel
    assert got.n_distinct_fp == len(df)
    assert got.n_shared_fp == sum(1 for v in df.values() if v >= 2)
    assert got.n_cand_pairs == sum(v * (v - 1) // 2 for v in df.values())
    # winnowing selects ~2/(w+1) of positions (Schleimer et al. §5)
    assert 0.25 <= got.density_r <= 0.55
