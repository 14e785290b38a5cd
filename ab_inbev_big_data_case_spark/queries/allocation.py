"""Temporal interval allocation (round-6 widening of the time-series
family): spread each order's revenue evenly over its 7-day fulfillment
window and report the resulting calendar-day revenue curve.

This is the standard "allocate an interval-valued measure onto a calendar
spine" warehouse operation (revenue recognition, subscription
amortization, capacity planning): the existing calendar queries either
place the full amount on one day (``mom_revenue_growth``) or fill gaps in
an already-daily series (``time_bucket_gapfill``); this one SPLITS each
fact across the days it spans.

Exactness: the split is pure integer arithmetic — each of the 7 days gets
``rev_c div 7`` cents and the first ``rev_c mod 7`` days get one extra
cent, so the allocation sums back to the original cents EXACTLY (no
pennies lost to float division) and both engines agree bit-for-bit.

Scale shape: a constant ×7 explode of the orders scan (sequence literal,
no shuffle), then one partial-aggregated groupBy keyed on the calendar
day — a DATE-DOMAIN-BOUNDED key (≤ ~2,600 distinct days at any SF). No
joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import register
from ab_inbev_big_data_case_spark.sources.readers import table

_ALLOC_SQL = """
    WITH o AS (
        SELECT CAST(o_orderdate AS DATE) AS d0,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) * 100
                    AS BIGINT) AS rev_c
        FROM orders
    ),
    x AS (
        SELECT d0 + t.i::INTEGER AS alloc_day,
               rev_c // 7
                 + CASE WHEN t.i < rev_c % 7 THEN 1 ELSE 0 END AS alloc_c
        FROM o CROSS JOIN range(7) t(i)
    )
    SELECT alloc_day,
           count(*) AS n_orders,
           sum(alloc_c)::BIGINT AS alloc_rev_c
    FROM x GROUP BY 1
"""


@register("interval_allocation_daily", oracle=_ALLOC_SQL)
def interval_allocation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue curve with each order's total spread exactly (integer
    div/mod cent split) over the 7 days starting at its order date.

    The ``sequence(0,6)`` explode is a narrow constant fan-out; the final
    groupBy key is the bounded calendar-day domain (see module docstring).
    """
    o = table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d0"),
        (F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2) * 100)
        .cast("long")
        .alias("rev_c"),
    )
    x = o.select(
        "d0",
        "rev_c",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
    ).select(
        F.date_add("d0", F.col("i")).alias("alloc_day"),
        (
            F.expr("rev_c div 7")
            + F.when(F.col("i") < F.col("rev_c") % 7, 1).otherwise(0)
        ).alias("alloc_c"),
    )
    return x.groupBy("alloc_day").agg(
        F.count("*").alias("n_orders"),
        F.sum("alloc_c").alias("alloc_rev_c"),
    )
