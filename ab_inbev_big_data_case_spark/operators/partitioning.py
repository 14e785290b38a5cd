"""Partitioning helpers: parallelism hygiene for compute-heavy operators.

Spark sizes scan partitions by input BYTES (``spark.sql.files.maxPartitionBytes``),
which is right when cost ∝ bytes. Expression-heavy operators (shingling,
per-vector lambdas, hashing) have cost ∝ rows × expression-work, so a small
file — one scan partition — serializes the whole computation on one core.
``spread`` redistributes rows round-robin before such operators.

At 100 TB inputs arrive as many files/row-groups and scans parallelize
naturally; ``spread`` then degenerates to a cheap (and skippable) no-op
decision — callers pass ``min_partitions`` as a floor, not a fixed width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster default
    parallelism) partitions before a compute-heavy narrow operator."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
