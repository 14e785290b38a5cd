"""Privacy / re-identification audits over the customer dimension
(round-6 widening): k-anonymity and l-diversity, the two standard
tabular-disclosure measures a training-data pipeline runs before a
dataset containing person-level rows is released or used for training
(Sweeney 2002; Machanavajjhala et al. 2007).

Both audits share one shape: group the table by a quasi-identifier (QI)
tuple, measure each equivalence class, then summarize the class-size /
diversity distribution into a handful of buckets. That is a single
map-side-combinable ``groupBy`` over the QI key followed by a re-group on
the bounded bucket domain — no joins, no windows, nothing that grows
faster than the input scan, and the second aggregation's key domain is
O(#buckets) regardless of SF.

Exactness: class sizes and distinct counts are integers; the only float
is the final percentage, computed once per bucket row from exact counts
and rounded — engine-independent by construction.

The reference pipeline (``glue/etl_api.py:42-45``) aggregates this same
customer/orders data into published gold tables with zero disclosure
checks; these are the audits that gate such a publication step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import register
from ab_inbev_big_data_case_spark.sources.readers import table

# Quasi-identifier used by both audits: nation × market segment × account
# balance rounded down to the nearest 1000 — the classic "coarse public
# attributes an adversary can link on". floor(x/1000) is exact for 2-decimal
# balances (an IEEE quotient can only land on an integer when the true
# quotient IS that integer), so the bucket is engine-independent.
def _qi_spark() -> list:
    # built lazily: Column construction needs an active SparkContext
    return [
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_kilo"),
    ]


_QI_SQL = "c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS INT)"


def _k_bucket_spark():
    return (
        F.when(F.col("k") == 1, "1 (unique)")
        .when(F.col("k") <= 4, "2-4")
        .when(F.col("k") <= 9, "5-9")
        .when(F.col("k") <= 49, "10-49")
        .otherwise("50+")
    )
_K_BUCKET_SQL = """CASE WHEN k = 1 THEN '1 (unique)'
                        WHEN k <= 4 THEN '2-4'
                        WHEN k <= 9 THEN '5-9'
                        WHEN k <= 49 THEN '10-49'
                        ELSE '50+' END"""

_KANON_SQL = f"""
    WITH cls AS (
        SELECT count(*) AS k
        FROM customer
        GROUP BY {_QI_SQL}
    ),
    tot AS (SELECT sum(k) AS n_rows_total FROM cls)
    SELECT {_K_BUCKET_SQL} AS k_bucket,
           count(*) AS n_classes,
           sum(k)::BIGINT AS n_rows,
           round(sum(k) * 100.0 / t.n_rows_total, 4) AS pct_rows_r
    FROM cls CROSS JOIN tot t
    GROUP BY 1, t.n_rows_total
"""


@register("k_anonymity_audit", oracle=_KANON_SQL)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: distribution of equivalence-class sizes under
    the (nation, segment, balance-kilobucket) quasi-identifier. A row in
    the ``1 (unique)`` bucket is re-identifiable by anyone who knows the
    QI; ``2-4`` is the below-k=5 risk band most release policies gate on.

    Scale shape: one partial-aggregated ``groupBy`` over the QI key
    (classes are bounded by the QI value domain: 25 nations × 5 segments ×
    ~11 balance buckets — a dimension-sized state even at 100 TB), then a
    5-bucket re-group. Zero joins beyond the broadcast 1-row total.
    """
    c = table(spark, sf_dir, "customer")
    cls = c.groupBy(*_qi_spark()).agg(F.count("*").alias("k"))
    tot = cls.agg(F.sum("k").alias("n_rows_total"))
    return (
        cls.withColumn("k_bucket", _k_bucket_spark())
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_classes"), F.sum("k").alias("n_rows"))
        .crossJoin(F.broadcast(tot))
        .select(
            "k_bucket",
            "n_classes",
            "n_rows",
            F.round(F.col("n_rows") * 100.0 / F.col("n_rows_total"), 4).alias(
                "pct_rows_r"
            ),
        )
    )


_LDIV_SQL = f"""
    WITH cls AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS INT) AS bal_kilo,
               count(*) AS k,
               count(DISTINCT c_mktsegment) AS l
        FROM customer
        GROUP BY 1, 2
    ),
    tot AS (SELECT sum(k) AS n_rows_total FROM cls)
    SELECT l,
           count(*) AS n_classes,
           sum(k)::BIGINT AS n_rows,
           round(sum(k) * 100.0 / t.n_rows_total, 4) AS pct_rows_r
    FROM cls CROSS JOIN tot t
    GROUP BY 1, t.n_rows_total
"""


@register("l_diversity_audit", oracle=_LDIV_SQL)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: with (nation, balance-kilobucket) as the QI and
    the market segment as the SENSITIVE attribute, report how many
    distinct sensitive values each equivalence class carries. Classes with
    l = 1 leak the sensitive attribute outright (homogeneity attack) even
    when k is large — the failure mode k-anonymity alone cannot see.

    Scale shape: identical to ``k_anonymity_audit`` — one QI-keyed
    ``groupBy`` (``count_distinct`` over a 5-value segment domain keeps
    per-group state bounded), then a re-group on l, whose domain is at
    most the sensitive cardinality (5).
    """
    c = table(spark, sf_dir, "customer")
    cls = c.groupBy(
        F.col("c_nationkey"),
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_kilo"),
    ).agg(
        F.count("*").alias("k"),
        F.count_distinct("c_mktsegment").alias("l"),
    )
    tot = cls.agg(F.sum("k").alias("n_rows_total"))
    return (
        cls.groupBy("l")
        .agg(F.count("*").alias("n_classes"), F.sum("k").alias("n_rows"))
        .crossJoin(F.broadcast(tot))
        .select(
            "l",
            "n_classes",
            "n_rows",
            F.round(F.col("n_rows") * 100.0 / F.col("n_rows_total"), 4).alias(
                "pct_rows_r"
            ),
        )
    )
