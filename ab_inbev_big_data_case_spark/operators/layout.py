"""Multi-dimensional data-layout keys: Z-order (Morton) curve clustering.

Why a 100 TB engine needs this: parquet row-group skipping prunes on
min/max statistics, which only bite when the data is CLUSTERED on the
filter column. Sorting on one column gives perfect pruning on it and none
on any other; a Z-order key interleaves the bits of several columns so a
sort on the single key co-locates rows that are close in EVERY dimension —
a selective filter on any participating column then skips most row groups
(the layout trick behind Delta/Iceberg `ZORDER BY` compaction; here it is
a plain deterministic int64 expression usable with `sortWithinPartitions`
/ `repartitionByRange` before any parquet write).

The key is pure integer bit arithmetic (shift/and/or), whole-stage
codegen'd JVM-side in Spark and reproducible exactly in any engine with
64-bit integers — the DuckDB oracle states the same interleave as a
`list_sum(list_transform(range(...)))`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints bucketized to ``bits``
    bits each: result bit 2i is bit i of x, bit 2i+1 is bit i of y.

    Callers bucketize first (e.g. ``col % (1 << bits)`` or a range bucket);
    values outside [0, 2^bits) are masked rather than errored so a hot
    outlier can't corrupt the whole file's sort. 2*bits <= 62 keeps the
    key positive int64.
    """
    if 2 * bits > 62:
        raise ValueError("2*bits must fit a positive int64")
    xm = x.bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms).cast("long")


def scaled_bucket(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a value into [0, 2^bits) across its observed [cmin, cmax]
    domain with pure integer arithmetic: ((c - min) << bits) div (max -
    min + 1).

    Z-ordering REQUIRES this: interleaving raw values with unbalanced
    domains (say customer ids 0..150 against day offsets 0..2500) puts the
    wide dimension's high bits above all of the narrow one's, degenerating
    the curve into a single-column sort (observed on the fixtures — the
    narrow dim's per-file extent stayed at ~92% of full domain until both
    dims were bucketized to the same width).
    """
    # floor(a/b) on doubles is exact while a*2^bits < 2^53 — true for any
    # 32-bit-domain dimension at bits <= 20; wider domains should pre-shift.
    return F.floor(
        ((c - cmin) * F.lit(1 << bits)) / (cmax - cmin + F.lit(1))
    ).cast("long")


def zorder_oracle_expr(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` as a SQL expression string."""
    mask = (1 << bits) - 1
    return (
        f"list_sum(list_transform(range(0, {bits}), i -> "
        f"(((({x_sql}) & {mask}) >> i & 1) << (2*i)) + "
        f"(((({y_sql}) & {mask}) >> i & 1) << (2*i + 1))))::BIGINT"
    )


def file_extent_stats(
    df,
    sort_key: str,
    dims: list[str],
    n_files: int = 32,
):
    """Layout-quality diagnostic: range-split ``df`` into ``n_files`` equal
    chunks by ``sort_key`` rank and report each chunk's min/max extent per
    dimension — the exact statistics a parquet writer would put in the
    footer, i.e. what a reader's row-group pruning sees.

    A good multi-dim layout shows every file covering a SMALL extent in
    every dim; a single-column sort shows tiny extents in the sort column
    and full-domain extents everywhere else. ntile over the sort key is a
    global sort — this is a diagnostic over samples/fixtures, not a
    production path (production writes use repartitionByRange on the same
    key, which samples instead of sorting).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(sort_key), *[F.col(d) for d in dims])
    tiled = df.select(
        F.ntile(n_files).over(w).alias("file_id"), sort_key, *dims
    )
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return tiled.groupBy("file_id").agg(
        F.count("*").alias("n_rows"), *aggs
    )
