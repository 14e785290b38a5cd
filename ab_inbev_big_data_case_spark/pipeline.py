"""Medallion (bronze → silver → gold) pipeline.

The reference's whole analytical program, re-expressed as one lazy Spark
plan (``/root/reference/glue/etl_api.py:17-49``, bugs fixed per SURVEY §2.3):

    bronze : raw ingestion (JSON/Parquet), schema-pinned
    silver : null-filter on an important field → dedup on the unique key
             → CASE-WHEN status enrichment  (glue/etl_api.py:29-38)
    gold   : group-by count on (type, city)-style keys (glue/etl_api.py:42-45)

The reference materializes each layer to S3 between steps; in-engine the
layers stay one pipelined Catalyst plan unless the caller asks for layer
writes (checkpointing is a deployment choice, not a semantics one). The
orchestration chain (clean_up >> init >> extract >> ingest >> trigger_glue >>
check_status, ``airflow/dags/etl_api.py:207``) collapses to this module's
``run_medallion`` — one process, no XCom, no polling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.operators.relational import (
    dedup_deterministic,
    filter_not_null,
    with_status,
)
from ab_inbev_big_data_case_spark.sources.writers import write_partitioned


def silver_from_bronze(
    bronze: DataFrame,
    important_field: str,
    unique_key: str,
    order_by: Sequence[Column | str],
    value_col: str | None = None,
    threshold: float = 100.0,
) -> DataFrame:
    """Bronze → silver: null-filter, deterministic dedup, optional enrich."""
    silver = filter_not_null(bronze, important_field)
    silver = dedup_deterministic(silver, [unique_key], order_by)
    if value_col is not None:
        silver = with_status(silver, value_col=value_col, threshold=threshold)
    return silver


def gold_from_silver(silver: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Silver → gold: the reference's group-by count (glue/etl_api.py:42-45).

    Catalyst plans partial (map-side) + final hash aggregation around a single
    shuffle on the group keys — the count is pre-combined before the exchange,
    so shuffle volume is #distinct-groups per partition, not #rows.
    """
    return silver.groupBy(*group_cols).agg(F.count("*").alias("n_rows"))


def run_medallion(
    bronze: DataFrame,
    important_field: str,
    unique_key: str,
    order_by: Sequence[Column | str],
    group_cols: Sequence[str],
    value_col: str | None = None,
    silver_path: str | None = None,
    silver_partition_cols: list[str] | None = None,
    gold_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline; optionally materialize layers like the reference does.

    Silver is written partitioned by a low-cardinality location-style column
    (the intent behind reference bug B4), gold as a plain overwrite.
    """
    silver = silver_from_bronze(
        bronze, important_field, unique_key, order_by, value_col=value_col
    )
    gold = gold_from_silver(silver, group_cols)
    if silver_path is not None:
        write_partitioned(silver, silver_path, silver_partition_cols or [])
    if gold_path is not None:
        gold.write.mode("overwrite").parquet(gold_path)
    return silver, gold
