"""Streaming-sketch operators: Count-Min Sketch over token streams.

A Count-Min Sketch (Cormode & Muthukrishnan 2005) summarizes an arbitrarily
large multiset in ``depth x width`` int64 counters: every occurrence
increments one counter per row (bucket chosen by an independent hash), and a
point estimate is the MIN over that item's ``depth`` counters — an
overestimate by at most eps*N with probability 1-delta (eps = e/width,
delta = e^-depth).

Why this is the right 100 TB shape: the sketch build is a plain
``groupBy(row, bucket).count()`` whose partial aggregation state is bounded
by depth*width PER TASK regardless of input size — the map side combines
billions of token occurrences into (at most) a few thousand counters before
any shuffle, and the final sketch is small enough to ``broadcast()`` to
every estimator. Exact per-token counts at the same scale would shuffle the
full distinct-token space; the sketch never does.

Hashing uses the engine's portable sha256-based ``token_hash64`` (see
``functions/text.py``) salted with the row index, so the ``depth`` hash
functions are independent and the DuckDB oracle can reproduce every bucket
choice bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.functions.text import token_hash64, tokens


def _bucket(row: F.Column, item: F.Column, width: int) -> F.Column:
    """Row-salted portable bucket: sha256("<row>:<item>") mod width."""
    return token_hash64(F.concat(row.cast("string"), F.lit(":"), item)) % F.lit(width)


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch counters from one row per item OCCURRENCE.

    Returns (row, bucket, cnt) with at most depth*width rows. The explode to
    ``depth`` rows per occurrence happens map-side and collapses immediately
    into the bounded partial-agg hashmap — no row ever carries the token
    string past the shuffle boundary.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(item_col).alias("__item"), rows)
        .select("row", _bucket(F.col("row"), F.col("__item"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame, sketch: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Point-estimate each DISTINCT item in ``items`` against ``sketch``.

    Returns (item_col, cms_est). The sketch side is broadcast (bounded at
    depth*width rows by construction), so estimation is a narrow map over
    the item set: explode to ``depth`` probes, broadcast-join the counters,
    min-reduce per item.
    """
    probes = items.select(F.col(item_col)).distinct().select(
        F.col(item_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    probes = probes.withColumn("bucket", _bucket(F.col("row"), F.col(item_col), width))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 512,
    k: int = 20,
) -> DataFrame:
    """Top-k frequent tokens by CMS estimate, with the exact count alongside.

    (tok, cms_est, exact_n) for the k tokens with the highest estimate
    (ties broken by token). ``cms_est >= exact_n`` always — the sketch only
    overestimates — and the pair quantifies the collision error at the
    chosen (depth, width). The exact counts here serve verification; a
    production heavy-hitter pass at 100 TB would keep only the sketch +
    a candidate set, never the full distinct-token aggregation.
    """
    occurrences = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    sketch = cms_build(occurrences, "tok", depth, width)
    exact = occurrences.groupBy("tok").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(occurrences, sketch, "tok", depth, width)
    return (
        est.join(exact, "tok")
        .orderBy(F.col("cms_est").desc(), F.col("tok"))
        .limit(k)
    )
