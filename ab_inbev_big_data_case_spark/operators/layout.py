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
    n_parts: int | None = None,
):
    """Layout-quality report: range-split ``df`` into ``n_files`` rank-equal
    chunks by ``sort_key`` and report each chunk's min/max extent per
    dimension — the exact statistics a parquet writer would put in the
    footer, i.e. what a reader's row-group pruning sees.

    A good multi-dim layout shows every file covering a SMALL extent in
    every dim; a single-column sort shows tiny extents in the sort column
    and full-domain extents everywhere else.

    Scale shape: NO partitionless Window. The global rank a tile split
    needs decomposes into ``repartitionByRange`` on the full ordering tuple
    (equal tuples land in one partition, so ties never straddle a
    boundary), a PARTITIONED local row_number, and a per-partition-count
    prefix-sum over an ``n_parts``-row spine (the documented tiny-spine
    pattern). ``file_id`` then comes from the closed form of ``ntile(n)``
    — the first ``N mod n`` tiles take ``ceil(N/n)`` rows — so the result
    is bit-identical to the single-node ntile the DuckDB oracle runs,
    while every full-data stage stays distributed. Offsets (n_parts rows)
    and the 1-row total are the only broadcasts.
    """
    from pyspark.sql import Window

    order_cols = [F.col(sort_key)] + [F.col(d) for d in dims]
    parts = df.repartitionByRange(n_parts or n_files, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "__lrn",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order_cols)),
    )
    # lazy checkpoint: three consumers (the tile join, the per-partition
    # counts, the total) would otherwise each re-derive `local` from the
    # source scan — 8 scans of the fact table in the physical plan. One
    # materialization shared by all consumers; at 100 TB this seam is a
    # layer write (same pattern as quality_bucket_mix's scored table).
    local = local.localCheckpoint(eager=False)
    counts = local.groupBy("__pid").agg(F.count("*").alias("__n"))
    # prefix sum over the n_parts-row spine WITHOUT any window (not even a
    # tiny-spine partitionless one, so the bench stays WARN-free): a
    # triangular self-join on the bounded spine — n_parts² rows at most
    prior = counts.select(
        F.col("__pid").alias("__pid_b"), F.col("__n").alias("__n_b")
    )
    offsets = (
        counts.join(
            F.broadcast(prior), F.col("__pid_b") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__n_b"), F.lit(0)).alias("__off"))
    )
    total = counts.agg(F.sum("__n").alias("__N"))

    i = F.col("__off") + F.col("__lrn")  # exact global rank, 1-based
    q = F.floor(F.col("__N") / n_files)  # base tile size
    r = F.col("__N") - q * n_files  # first r tiles take q+1 rows
    big = r * (q + 1)  # rows covered by the big tiles
    file_id = (
        F.when(i <= big, 1 + F.floor((i - 1) / (q + 1)))
        .otherwise(r + 1 + F.floor((i - big - 1) / q))
        .cast("int")
        .alias("file_id")
    )
    tiled = (
        local.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .select(file_id, sort_key, *dims)
    )
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return tiled.groupBy("file_id").agg(
        F.count("*").alias("n_rows"), *aggs
    )
