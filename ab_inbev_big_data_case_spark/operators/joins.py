"""Join operators (SURVEY.md §2.2 "Joins" — all EXT; the reference has no
joins, but its gold-layer semantics over a normalized star schema require
them).

Everything is expressed as DataFrame joins so Catalyst picks the physical
strategy (broadcast-hash for small sides under
``spark.sql.autoBroadcastJoinThreshold`` / AQE runtime conversion, else
sort-merge). Helpers here cover the two shapes Spark has no single primitive
for: **as-of join** and **range join**.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim(dim: DataFrame) -> DataFrame:
    """Hint a dimension table for broadcast-hash join (no shuffle of the
    fact side). At 100 TB the fact table never moves; only the dim ships."""
    return F.broadcast(dim)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest ``right_value`` whose
    ``right_ts`` <= ``left_ts`` within the same ``key`` (as-of semantics).

    Implementation: tag + union both sides, one window sorted by
    ``(ts, side)`` per key, carry the last non-null right value forward,
    keep left rows. Cost: ONE shuffle on ``key`` and a per-partition sort —
    no join explosion, no O(n·m) inequality join. This is the 100 TB-safe
    formulation; a join + groupBy-max would replicate every right row per
    matching left row.

    Ties: a right row at exactly ``left_ts`` is visible to that left row
    (<=, right sorts before left at equal ts).
    """
    out_col = out_col or f"asof_{right_value}"
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(dict(right.dtypes)[right_value]).alias("__rv"),
        F.struct(*lcols).alias("__row"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_value).alias("__rv"),
        F.lit(None).cast(l_tagged.schema["__row"].dataType).alias("__row"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(*[F.col(f"__row.{c}").alias(c) for c in lcols], out_col)
    )


def range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Join ``fact`` rows to the range bucket containing ``value_col``
    (half-open: lo <= v < hi).

    The small ``ranges`` side is broadcast, so this plans as a
    BroadcastNestedLoopJoin — each fact partition scans K ranges locally,
    no shuffle of the fact table. For non-broadcastable range sets,
    bucketize both sides to an equi-join key instead.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(ranges), cond, "inner")


def join_keys(
    left: DataFrame, right: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Plain keyed join wrapper (inner/left/right/full/left_semi/left_anti/cross)."""
    return left.join(right, on, how)
