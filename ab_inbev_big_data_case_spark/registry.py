"""Query registry: the bridge between engine operators and the driver's
correctness harness (``__spark_entry__.py``).

Each implemented operator registers a named callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL string the
DuckDB oracle runs on the same parquet files. Aliasing discipline: every
computed column is aliased identically in the Spark plan and the oracle SQL
(the driver sorts columns by name and hashes values).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_QUERY_MODULES = [
    "ab_inbev_big_data_case_spark.queries.medallion",
    "ab_inbev_big_data_case_spark.queries.scalar",
    "ab_inbev_big_data_case_spark.queries.aggregates",
    "ab_inbev_big_data_case_spark.queries.joins",
    "ab_inbev_big_data_case_spark.queries.windows",
    "ab_inbev_big_data_case_spark.queries.setops",
    "ab_inbev_big_data_case_spark.queries.streaming_twins",
    "ab_inbev_big_data_case_spark.queries.udfs",
    "ab_inbev_big_data_case_spark.queries.analytics",
    "ab_inbev_big_data_case_spark.queries.llm",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the harness, optionally with its oracle SQL.

    Queries without oracle SQL (streaming/pandas-UDF ops not expressible in
    DuckDB) get the driver's weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The harness may hand us a session without engine defaults;
            # timestamp semantics (tz-naive fixtures vs session TZ) and AQE
            # are runtime-settable, so pin them here defensively.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent) so registration side-effects run."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
