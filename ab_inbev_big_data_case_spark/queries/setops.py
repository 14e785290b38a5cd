"""Set operations + global sort (SURVEY.md §2.2 "Sort / limit / top-k / set ops")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import register
from ab_inbev_big_data_case_spark.sources.readers import table


def _month_slice(spark: SparkSession, sf_dir: str, y: int, m: int) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.year("o_orderdate") == y) & (F.month("o_orderdate") == m)
    )


@register(
    "union_ops",
    oracle="""
    SELECT o_custkey, 'all' AS op FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        UNION ALL
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    )
    UNION ALL
    SELECT o_custkey, 'distinct' AS op FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        UNION
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    )
    """,
)
def union_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (pure concatenation, zero shuffle) and UNION DISTINCT
    (union + one full-row dedup shuffle) in one tagged result.

    Consolidates the round-1 ``union_all`` / ``union_distinct`` micro-queries
    so the whole inventory fits the driver's checked window."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")
    both_all = jan.unionByName(feb).select("o_custkey", F.lit("all").alias("op"))
    both_distinct = (
        jan.unionByName(feb).distinct().select("o_custkey", F.lit("distinct").alias("op"))
    )
    return both_all.unionByName(both_distinct)


@register(
    "setops_suite",
    oracle="""
    SELECT o_custkey, 'intersect' AS op FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    )
    UNION ALL
    SELECT o_custkey, 'except' AS op FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    )
    UNION ALL
    SELECT o_custkey, 'intersect_all' AS op FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        INTERSECT ALL
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    )
    UNION ALL
    SELECT o_custkey, 'except_all' AS op FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        EXCEPT ALL
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    )
    """,
)
def setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT in both distinct and bag (ALL) semantics, one
    tagged result per op.

    Consolidates the round-1 ``intersect_op`` / ``except_op`` /
    ``intersect_all`` / ``except_all`` micro-queries into a single driver
    slot; each op is still its own Spark operator (intersect / subtract /
    intersectAll / exceptAll — distinct vs bag multiplicity semantics)."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select("o_custkey", F.lit(op).alias("op"))

    return (
        tag(jan.intersect(feb), "intersect")
        .unionByName(tag(jan.subtract(feb), "except"))
        .unionByName(tag(jan.intersectAll(feb), "intersect_all"))
        .unionByName(tag(jan.exceptAll(feb), "except_all"))
    )


@register(
    "global_sort",
    oracle="""
    SELECT n_name, n_regionkey,
           row_number() OVER (ORDER BY n_regionkey, n_name) AS sort_pos
    FROM nation
    """,
)
def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort with explicit positions.

    orderBy plans a range-partitioned sort (sampled split points) — scales to
    any size; the row_number here collapses to one partition and is only for
    making the order observable on a 25-row dim table.
    """
    n = table(spark, sf_dir, "nation")
    sorted_df = n.orderBy("n_regionkey", "n_name")
    w = W.orderBy("n_regionkey", "n_name")
    return sorted_df.select(
        "n_name", "n_regionkey", F.row_number().over(w).alias("sort_pos")
    )


