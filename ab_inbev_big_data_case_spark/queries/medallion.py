"""The reference pipeline as harness queries (flagship).

Mirrors ``/root/reference/glue/etl_api.py:29-45`` on the ``events`` fixture:
null-filter → dedup on ``event_id`` → CASE-WHEN status → group-by count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.operators.relational import incremental_window
from ab_inbev_big_data_case_spark.pipeline import gold_from_silver, silver_from_bronze
from ab_inbev_big_data_case_spark.registry import register
from ab_inbev_big_data_case_spark.sources.readers import table

#: Deterministic survivor order for event dedup (total order per event_id).
_EVENT_ORDER = ["ts", "user_id", "event_type", "value", "props"]

_SILVER_SQL = """
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_id
            ORDER BY ts NULLS FIRST, user_id NULLS FIRST, event_type NULLS FIRST,
                     value NULLS FIRST, props NULLS FIRST
        ) AS __rn
        FROM events WHERE value IS NOT NULL
    ) WHERE __rn = 1
"""


def _events_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    bronze = table(spark, sf_dir, "events")
    return silver_from_bronze(
        bronze,
        important_field="value",
        unique_key="event_id",
        order_by=_EVENT_ORDER,
        value_col="value",
    )


@register(
    "medallion_gold",
    oracle=f"""
    SELECT event_type,
           CASE WHEN value > 100 THEN 'High' ELSE 'Low' END AS status,
           count(*) AS n_rows
    FROM ({_SILVER_SQL})
    GROUP BY 1, 2
    """,
)
def medallion_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's full bronze→silver→gold program (R1+R4+R5+R6+R7)."""
    silver = _events_silver(spark, sf_dir)
    return gold_from_silver(silver, ["event_type", "status"])


@register(
    "medallion_silver",
    oracle=f"""
    SELECT event_id, event_type, user_id,
           CASE WHEN value > 100 THEN 'High' ELSE 'Low' END AS status,
           round(value, 2) AS value_r
    FROM ({_SILVER_SQL})
    """,
)
def medallion_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver layer row-level check: dedup survivor + enrichment per row."""
    silver = _events_silver(spark, sf_dir)
    return silver.select(
        "event_id",
        "event_type",
        "user_id",
        "status",
        F.round("value", 2).alias("value_r"),
    )


@register(
    "incremental_window",
    oracle="""
    SELECT event_id, event_type, round(value, 2) AS value_r
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
      AND ts <  TIMESTAMP '2024-01-03 00:00:00'
    """,
)
def incremental_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: the incremental [day, day+1) slice (airflow/dags/etl_api.py:74-76).

    On a date-partitioned layout this predicate becomes partition pruning;
    on plain parquet it is pushed into the scan (PushedFilters).
    """
    events = table(spark, sf_dir, "events")
    sliced = incremental_window(
        events, "ts", "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    )
    return sliced.select(
        "event_id", "event_type", F.round("value", 2).alias("value_r")
    )


@register(
    "snapshot_cdc_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % 7 != 0
    ),
    new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_totalprice != n.o_totalprice
                     OR o.o_orderstatus != n.o_orderstatus THEN 'update'
           END AS change_type
    FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
    WHERE coalesce(o.o_orderkey, n.o_orderkey) IS NOT NULL
      AND (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_totalprice != n.o_totalprice
           OR o.o_orderstatus != n.o_orderstatus)
    """,
)
def snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two (deterministically synthesized)
    snapshots of orders: keys only in the new snapshot are inserts, only in
    the old are deletes, value drift is an update. The engine classifies by
    comparing one xxhash64 of the non-key struct per side (internal only —
    never an output, so no cross-engine hash portability needed); the
    oracle classifies by direct column comparison — a value match proves
    the hash compare is semantically the column compare. One full outer
    join on the key; bucketed snapshots make it exchange-free at 100 TB.
    See ``operators.relational.snapshot_diff``."""
    from ab_inbev_big_data_case_spark.operators.relational import snapshot_diff

    o = table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(old, new, ["o_orderkey"])


@register(
    "dq_checks",
    oracle="""
    WITH fk AS (
        SELECT count(*)::BIGINT AS v FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
    ),
    pk AS (
        SELECT (count(*) - count(DISTINCT o_orderkey))::BIGINT AS v FROM orders
    ),
    nulls AS (
        SELECT sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n,
               count(*)::BIGINT AS t
        FROM events
    ),
    rng AS (
        SELECT sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS v
        FROM orders
    ),
    enum_chk AS (
        SELECT count(*)::BIGINT AS v FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P')
    )
    SELECT 'fk_orders_customer' AS check_name, v AS metric,
           (v = 0) AS passed FROM fk
    UNION ALL
    SELECT 'pk_orders_unique', v, v = 0 FROM pk
    UNION ALL
    SELECT 'events_value_null_pct_max5', (n * 100) // t,
           (n * 100) <= t * 5 FROM nulls
    UNION ALL
    SELECT 'orders_price_positive', v, v = 0 FROM rng
    UNION ALL
    SELECT 'orders_status_domain', v, v = 0 FROM enum_chk
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Deequ/Great-Expectations shape a
    production layer gate runs before publishing): referential integrity
    (orphan orders), primary-key uniqueness, null-ratio ceiling, value
    range, and enum domain — each one aggregate returning (check_name,
    metric, passed). All checks are independent single-pass aggregates over
    pushed-down scans; the FK probe is a left-anti join with the dim side
    broadcast. At 100 TB this is exactly the nightly gate before a layer
    swap (`runner.py` can chain it ahead of `write_layer`)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    fk = (
        o.join(F.broadcast(c.select("c_custkey")),
               o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").alias("metric"))
        .select(F.lit("fk_orders_customer").alias("check_name"), "metric",
                (F.col("metric") == 0).alias("passed"))
    )
    pk = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("metric")
    ).select(
        F.lit("pk_orders_unique").alias("check_name"), "metric",
        (F.col("metric") == 0).alias("passed"),
    )
    nulls = e.agg(
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n"),
        F.count("*").alias("t"),
    ).select(
        F.lit("events_value_null_pct_max5").alias("check_name"),
        ((F.col("n") * 100) / F.col("t")).cast("long").alias("metric"),
        (F.col("n") * 100 <= F.col("t") * 5).alias("passed"),
    )
    rng = o.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("metric")
    ).select(
        F.lit("orders_price_positive").alias("check_name"), "metric",
        (F.col("metric") == 0).alias("passed"),
    )
    enum_chk = o.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count("*").alias("metric")
    ).select(
        F.lit("orders_status_domain").alias("check_name"), "metric",
        (F.col("metric") == 0).alias("passed"),
    )
    return fk.unionByName(pk).unionByName(nulls).unionByName(rng).unionByName(enum_chk)
