"""Driver-checkable queries for the non-parquet scan operators (R1).

The reference ingests bronze with ``spark.read.json`` (schema-inferred —
``/root/reference/glue/etl_api.py:24``); this engine pins schemas
(``sources/readers.py``). These queries give the json/csv scan paths
driver-green correctness rows: the oracle SQL is a static string over the
driver's pre-registered parquet views, so each query materializes the
fixture in the target format under ``/tmp`` first, reads it back through
the engine's pinned-schema reader, and aggregates — the oracle computes
the identical aggregate straight from parquet. A value match proves the
format round-trip (writer + reader + schema pin) is lossless.

Scale note: the tmp write is fixture-sized test scaffolding, not the
operator under test — the operator is the lazy, pushdown-capable scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import read_csv, read_json, table

_IO_ROOT = "/tmp/spark_graft_io"


def _materialize(df: DataFrame, fmt: str, tag: str, sf_dir: str, **opts) -> str:
    """Write ``df`` as ``fmt`` once per (tag, sf) and return the path."""
    path = os.path.join(_IO_ROOT, f"{tag}_{os.path.basename(sf_dir)}_{fmt}")
    # _SUCCESS marks a completed prior write of the same deterministic input
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.write.mode("overwrite").options(**opts).format(fmt).save(path)
    return path


_DOCS_JSON_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING"

_JSON_SCAN_SQL = """
    SELECT lang, source,
           count(*) AS n_docs,
           sum(length(text))::BIGINT AS total_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM documents
    GROUP BY lang, source
"""


@register("json_scan", oracle=_JSON_SCAN_SQL)
def json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scan with pinned schema: documents → JSON lines → read back →
    aggregate. Proves the JSON reader (schema pin, string escaping round-trip)
    against the parquet truth."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    path = _materialize(docs, "json", "documents", sf_dir)
    j = read_json(spark, path, schema=_DOCS_JSON_SCHEMA)
    return j.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_ORDERS_CSV_SCHEMA = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
)

_CSV_SCAN_SQL = """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total_price,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM orders
    GROUP BY o_orderstatus
"""


@register("csv_scan", oracle=_CSV_SCAN_SQL)
def csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with pinned schema + header: orders → CSV (quoted) → read
    back → aggregate. Doubles round-trip via Java shortest-repr; money sums
    accumulate in DECIMAL before rounding (engine-stable)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = _materialize(orders, "csv", "orders", sf_dir, header="true")
    c = read_csv(spark, path, schema=_ORDERS_CSV_SCHEMA, header=True)
    return c.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_ORC_SCAN_SQL = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_lines,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
"""


@register("orc_scan", oracle=_ORC_SCAN_SQL)
def orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan: lineitem → ORC → read back → aggregate. Spark's native
    vectorized ORC reader (predicate pushdown + column pruning, same as
    parquet); DuckDB can't read ORC, so the oracle computes the identical
    aggregate from the parquet truth — a value match proves the ORC
    round-trip lossless."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"
    )
    path = _materialize(li, "orc", "lineitem", sf_dir)
    o = spark.read.format("orc").load(path)
    return o.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "python_datasource_scan",
    oracle="""
    SELECT (i % 10)::INT AS bucket,
           count(*) AS n,
           sum((i * 2654435761) % 1000)::BIGINT AS sum_raw,
           min(i)::BIGINT AS min_id,
           max(i)::BIGINT AS max_id
    FROM (SELECT unnest(range(0, 10000)) AS i)
    GROUP BY 1
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-connector surface (Spark 4 Python DataSource API): scan the
    registered ``synthetic_events`` source — 8 executor-side partitions
    each generating its own id range deterministically — and aggregate.
    The DuckDB oracle regenerates identical rows from ``range(n)``, so the
    value hash proves the connector's partition planning loses and
    duplicates nothing (a partition-boundary bug would drop or double
    rows and flip every aggregate). See ``sources/pydatasource.py``."""
    from ab_inbev_big_data_case_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 10000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("raw").alias("sum_raw"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


_XML_SCAN_SQL = """
    SELECT n_nationkey, n_name, n_regionkey,
           count(*) AS n_suppliers,
           round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2)::DOUBLE
               AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2, 3
"""


@register("xml_scan", oracle=_XML_SCAN_SQL)
def xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scan (Spark 4's built-in spark-xml): supplier → XML → read
    back schema-PINNED → join nation → aggregate. Inference on XML is a
    full extra pass AND widens int to bigint, so the read pins the
    original schema (the read_json discipline). DuckDB can't read XML;
    the oracle computes the identical aggregate from the parquet truth —
    a value match proves the XML round-trip lossless, types included."""
    from ab_inbev_big_data_case_spark.sources.readers import read_xml, write_xml

    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = os.path.join(_IO_ROOT, f"supplier_{os.path.basename(sf_dir)}_xml")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_xml(sup, path)
    x = read_xml(spark, path, schema=sup.schema)
    n = table(spark, sf_dir, "nation")
    return (
        x.join(F.broadcast(n), x["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum(F.col("s_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )
