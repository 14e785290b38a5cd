"""Iterative graph algorithms on DataFrames (fixed-round Pregel shape).

Spark has no native graph operator set; the idiomatic expression is the
join-aggregate round: messages = edges ⋈ current state, new state =
aggregate(messages). Each round is one shuffle-join plus one shuffled
aggregation — the same shape GraphX/Pregel lowers to. Rounds are FIXED
(plan-time unrolled): no driver-side data iteration, no collect; the whole
k-round computation is one lazy plan. Companion to the 3-round min-label
propagation in ``llm/dedup.py`` (connected components).

At 100 TB: pre-partition ``edges`` by ``src`` (bucketing) so the per-round
state join reuses the exchange; for high iteration counts, checkpoint the
rank every few rounds to truncate lineage (same seam ``dup_clusters``
documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 3,
    damping: float = 0.85,
    round_to: int = 8,
) -> DataFrame:
    """Weighted PageRank, ``n_iter`` unrolled join-agg rounds.

    ``rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v} rank_t(u) · w(u,v)/w_out(u)``.

    Node count N enters the plan as a broadcast 1-row aggregate crossJoin
    (the ``tfidf_stats`` idiom) — never a driver-side ``.count()``. Ranks
    are rounded to ``round_to`` decimals after every round so independent
    executions (and cross-engine oracles) agree bit-for-bit regardless of
    float summation order; the rounding error is orders of magnitude below
    PageRank's own iteration truncation.

    Nodes with no inbound edges settle at (1-d)/N; sink nodes (no outbound)
    leak mass — standard non-normalized treatment, fine for ranking use.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))

    # Per-edge transition fraction w/w_out — one window over src, computed once
    frac = e.withColumn(
        "frac", F.col("w") / F.sum("w").over(Window.partitionBy("src"))
    ).select("src", "dst", "frac")

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            frac.join(ranks, frac["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                    round_to,
                ).alias("rank"),
            )
        )
    return ranks
