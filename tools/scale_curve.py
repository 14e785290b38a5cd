"""Candidate-pair growth curves for the bucketed dedup/ANN paths.

The scale claim behind MinHash-LSH and hyperplane-LSH is that candidate
pairs grow ~linearly with corpus size (pairs concentrate in buckets whose
occupancy tracks true duplicate density), NOT quadratically like the naive
all-pairs join. This tool measures that curve empirically across the
fixture scale factors and prints a markdown table for SCALE.md:

    python tools/scale_curve.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    from pyspark.sql import functions as F

    from ab_inbev_big_data_case_spark.llm.dedup import (
        lsh_band_buckets_wide,
        lsh_candidate_pairs,
        minhash_signatures_wide,
        pairs_within_groups,
        shingle_set,
    )
    from ab_inbev_big_data_case_spark.llm.similarity import hyperplane_buckets
    from ab_inbev_big_data_case_spark.session import get_spark
    from ab_inbev_big_data_case_spark.sources.readers import table

    spark = get_spark("scale_curve")
    rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        sig = minhash_signatures_wide(
            shingle_set(docs, "doc_id", "text", 3), "doc_id", 8
        )
        pairs = lsh_candidate_pairs(
            lsh_band_buckets_wide(sig, "doc_id", 8, 2), "doc_id"
        )
        n_pairs = pairs.count()

        emb = table(spark, sf_dir, "embeddings")
        n_vecs = emb.count()
        b = hyperplane_buckets(emb, "vec_id", "embedding", n_planes=4, n_tables=4, dim=64)
        n_ann = pairs_within_groups(b, "vec_id", ["tbl", "bucket"]).count()

        # Occupancy-targeted plane count: 2^planes buckets/table sized so a
        # bucket holds ~16 vectors regardless of N. THIS is the 100 TB
        # configuration — a fixed plane count is quadratic in N.
        import math

        planes_n = max(4, math.ceil(math.log2(max(n_vecs / 16, 2))))
        b2 = hyperplane_buckets(
            emb, "vec_id", "embedding", n_planes=planes_n, n_tables=4, dim=64
        )
        n_ann2 = pairs_within_groups(b2, "vec_id", ["tbl", "bucket"]).count()
        rows.append(
            (sf, n_docs, n_pairs, n_pairs / n_docs, n_vecs, n_ann, n_ann / n_vecs,
             planes_n, n_ann2, n_ann2 / n_vecs)
        )

    print(
        "| sf | docs N | LSH pairs | pairs/N | vecs N "
        "| ANN cand (4 planes) | cand/N | planes@occ16 | ANN cand | cand/N |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for sf, nd, np_, r1, nv, na, r2, pl, na2, r3 in rows:
        print(
            f"| {sf} | {nd} | {np_} | {r1:.3f} | {nv} | {na} | {r2:.1f} "
            f"| {pl} | {na2} | {r3:.1f} |"
        )

    # Sparse TF-IDF inverted-index: dot-pair rows (the join fan-out) with
    # and without the max_df posting cap — the cap is what bounds the
    # stop-term quadratic at scale.
    sparse_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        counts = []
        for cap in (None, 50):
            from ab_inbev_big_data_case_spark.llm.similarity import sparse_tfidf_topk

            pairs = sparse_tfidf_topk(
                docs, "doc_id", "text", lambda d: d % 50 == 0, n=4, k=10**9,
                max_df=cap,
            ).count()
            counts.append(pairs)
        sparse_rows.append((sf, n_docs, counts[0], counts[1]))
    print()
    print("| sf | docs N | sparse dot-pairs (uncapped) | dot-pairs (max_df=50) |")
    print("|---|---|---|---|")
    for sf, nd, unc, cap in sparse_rows:
        print(f"| {sf} | {nd} | {unc} | {cap} |")

    # Containment self-join: candidate pair groups (threshold=0 keeps every
    # pair that shares >=1 shingle) with and without the doc-frequency cap
    # — the cap is what bounds the stop-shingle quadratic (round 5).
    from ab_inbev_big_data_case_spark.llm.dedup import containment_pairs

    cont_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        sh = shingle_set(docs, "doc_id", "text", 3)
        unc = containment_pairs(sh, "doc_id", 0.0).count()
        cap = containment_pairs(sh, "doc_id", 0.0, max_shingle_df=100).count()
        cont_rows.append((sf, n_docs, unc, cap))
    print()
    print("| sf | docs N | containment cand pairs (uncapped) | cand pairs (max_df=100) |")
    print("|---|---|---|---|")
    for sf, nd, unc, cap in cont_rows:
        print(f"| {sf} | {nd} | {unc} | {cap} |")

    # Spherical k-means (2 unrolled rounds, seeds vec_id % 61): per-round
    # reduce state is K centroid rows; occupancy ~N/K stays flat when the
    # seed rule scales K with N.
    from ab_inbev_big_data_case_spark.llm.similarity import kmeans_rounds

    km_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        emb = table(spark, sf_dir, "embeddings")
        n_vecs = emb.count()
        assign, cents = kmeans_rounds(
            emb, "vec_id", "embedding", lambda vid: vid % 61 == 0, n_rounds=2
        )
        occ = (
            assign.groupBy("cell_id")
            .count()
            .agg(
                F.count("*").alias("k"),
                F.max("count").alias("mx"),
                F.avg("count").alias("av"),
            )
            .collect()[0]
        )
        km_rows.append((sf, n_vecs, occ["k"], occ["av"], occ["mx"]))
    print()
    print("| sf | vecs N | cells K | avg occupancy | max occupancy |")
    print("|---|---|---|---|---|")
    for sf, nv, k, av, mx in km_rows:
        print(f"| {sf} | {nv} | {k} | {av:.1f} | {mx} |")

    # Prefix filtering (round 5): candidate JOIN FAN-OUT of the raw token
    # self-join vs the prefix-token join, computed analytically as
    # sum(df·(df−1)/2) per token — the exact row count the equi-join
    # materializes, measurable even where actually running the raw join
    # would be the quadratic blow-up itself.
    from pyspark.sql import Window as W

    pf_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        toks = docs.select(
            F.col("doc_id").alias("__id"),
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )

        def fanout(tdf):
            return (
                tdf.groupBy("tok")
                .agg(F.count("*").alias("d"))
                .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("f"))
                .collect()[0]["f"]
            )

        raw = fanout(toks)
        dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
        t = 0.5
        wnd = W.partitionBy("__id").orderBy("__df", "tok")
        sizes = toks.groupBy("__id").agg(F.count("*").alias("__sz"))
        prefix = (
            toks.join(dfreq, "tok")
            .withColumn("__rn", F.row_number().over(wnd))
            .join(sizes, "__id")
            .filter(F.col("__rn") <= F.col("__sz") - F.ceil(t * F.col("__sz")) + 1)
            .select("__id", "tok")
        )
        pf_rows.append((sf, n_docs, int(raw), int(fanout(prefix))))
    print()
    print("| sf | docs N | raw token-join fan-out | prefix-join fan-out |")
    print("|---|---|---|---|")
    for sf, nd, raw, pf in pf_rows:
        print(f"| {sf} | {nd} | {raw} | {pf} |")

    # Duplicated-span coverage (round 5 session 2): the op never joins
    # pairs — its cost is the df>=2 JOIN-BACK (dup span instances). The
    # scale claim: dup instances track true duplication density (a ~flat
    # fraction of total spans), so the join-back stays proportional to
    # corpus size, never quadratic.
    from ab_inbev_big_data_case_spark.functions.text import (
        shingles,
        token_hash64,
        tokens,
    )

    ds_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        sph = docs.select(
            "doc_id",
            F.posexplode(shingles(tokens(F.col("text")), 8)).alias("pos", "sp"),
        ).select("doc_id", "pos", token_hash64(F.col("sp")).alias("h"))
        n_spans = sph.count()
        dfreq = (
            sph.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("d"))
            .filter(F.col("d") >= 2)
        )
        n_dup = sph.join(dfreq.select("h"), "h").count()
        ds_rows.append((sf, n_docs, n_spans, n_dup, n_dup / n_spans))
    print()
    print("| sf | docs N | spans | dup-marked spans (join-back rows) | dup frac |")
    print("|---|---|---|---|---|")
    for sf, nd, ns, ndp, fr in ds_rows:
        print(f"| {sf} | {nd} | {ns} | {ndp} | {fr:.4f} |")

    # SimHash band-width law (round 5 session 3): random band collisions
    # grow ~bands*N^2/2^w, so band width w is the scale knob. Reproduces
    # the SCALE.md sweep for the shipped 60/4x15 config plus the 32/4x8
    # config it replaced.
    from ab_inbev_big_data_case_spark.llm.dedup import simhash

    sh_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        n_docs = docs.count()
        per_cfg = []
        for bits, bands, w in ((32, 4, 8), (60, 4, 15)):
            sig = simhash(docs, "doc_id", "text", bits, shingle_n=3)
            sig = sig.withColumnRenamed("simhash", "s")
            bands_df = sig.select(
                "doc_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(bb).alias("b"),
                                F.shiftright(F.col("s"), w * bb)
                                .bitwiseAND(F.lit((1 << w) - 1))
                                .alias("bv"),
                            )
                            for bb in range(bands)
                        ]
                    )
                ).alias("x"),
            ).select("doc_id", "x.b", "x.bv")
            l = bands_df.select(F.col("doc_id").alias("id1"), "b", "bv")
            r = bands_df.select(F.col("doc_id").alias("id2"), "b", "bv")
            cand = (
                l.join(r, ["b", "bv"])
                .filter(F.col("id1") < F.col("id2"))
                .select("id1", "id2")
                .distinct()
            )
            per_cfg.append(cand.count())
        sh_rows.append((sf, n_docs, per_cfg[0], per_cfg[1]))
    print()
    print("| sf | docs N | simhash cand (32/4x8) | cand (60/4x15, shipped) |")
    print("|---|---|---|---|")
    for sf, nd, c8, c15 in sh_rows:
        print(f"| {sf} | {nd} | {c8} | {c15} |")

    # Co-purchase graph sparsifier (round 5 session 3): basket pairs are
    # exactly linear in baskets (<=21 per TPC-H order); the support>=2
    # threshold then collapses a 10x pair jump into a ~flat edge set.
    gp_rows = []
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        li = table(spark, sf_dir, "lineitem")
        items = li.select("l_orderkey", "l_partkey").distinct()
        n_baskets = items.select("l_orderkey").distinct().count()
        a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
        b3 = items.select("l_orderkey", F.col("l_partkey").alias("v"))
        bp = a.join(b3, "l_orderkey").filter(F.col("u") < F.col("v"))
        n_bp = bp.count()
        n_edges = (
            bp.groupBy("u", "v")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= 2)
            .count()
        )
        gp_rows.append((sf, n_baskets, n_bp, n_edges))
    print()
    print("| sf | baskets | basket pairs | support>=2 edges |")
    print("|---|---|---|---|")
    for sf, nb, nbp, ne in gp_rows:
        print(f"| {sf} | {nb} | {nbp} | {ne} |")


if __name__ == "__main__":
    main()
