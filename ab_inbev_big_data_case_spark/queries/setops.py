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
    "union_all",
    oracle="""
    SELECT o_custkey, 'jan' AS src FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
    UNION ALL
    SELECT o_custkey, 'feb' AS src FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (no dedup — a pure concatenation, zero shuffle)."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey", F.lit("jan").alias("src"))
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey", F.lit("feb").alias("src"))
    return jan.unionByName(feb)


@register(
    "union_distinct",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
    UNION
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + one dedup shuffle on the full row."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")
    return jan.unionByName(feb).distinct()


@register(
    "intersect_op",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    """,
)
def intersect_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — customers ordering in both months."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")
    return jan.intersect(feb)


@register(
    "except_op",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    """,
)
def except_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — January-only customers."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")
    return jan.subtract(feb)


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


@register(
    "intersect_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
    INTERSECT ALL
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min multiplicity survives)."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")
    return jan.intersectAll(feb)


@register(
    "except_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: multiplicities subtract)."""
    jan = _month_slice(spark, sf_dir, 1995, 1).select("o_custkey")
    feb = _month_slice(spark, sf_dir, 1995, 2).select("o_custkey")
    return jan.exceptAll(feb)
