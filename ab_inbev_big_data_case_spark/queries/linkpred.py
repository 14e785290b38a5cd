"""Link prediction over the part co-purchase graph (round-6 widening of
the graph family): the Resource-Allocation index of Zhou, Lü & Zhang
(2009) on the bipartite part–order graph.

``market_basket_pairs`` counts raw co-occurrence; the RA index weights
each shared order by 1/|basket|, so two parts that co-occur in SMALL,
deliberate baskets score higher than two parts that merely both appear in
giant ones — the same degree-discounting idea as Adamic–Adar, chosen here
over AA's 1/log(deg) because 1/deg is exactly representable: with the
basket-size cap at 16, the per-order weight 720720/deg (720720 =
lcm(1..16)) is an exact INTEGER, so pair scores accumulate with zero
float noise and no transcendental (ln) whose last-ulp behaviour could
differ between engines.

Scale shape (the ``market_basket_pairs`` shape, candidate-bounded): pair
fan-out happens per BASKET — a basket of k parts emits k(k-1)/2 pairs and
baskets above 16 distinct parts are excluded up front (both engines), so
the explode is ≤120 pairs per order, linear in the fact table. Scores are
a partial+final aggregate on (p1, p2); the top-100 is
TakeOrderedAndProject with a full deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.registry import register
from ab_inbev_big_data_case_spark.sources.readers import table

_LCM16 = 720720  # lcm(1..16): 720720/deg is exact for every allowed basket size
_MAX_BASKET = 16

_RA_SQL = f"""
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    w AS (
        SELECT o, {_LCM16} // count(*) AS wq
        FROM e GROUP BY 1
        HAVING count(*) BETWEEN 2 AND {_MAX_BASKET}
    ),
    pr AS (
        SELECT a.p AS p1, b.p AS p2, w.wq
        FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
        JOIN w ON w.o = a.o
    ),
    s AS (
        SELECT p1, p2, count(*) AS n_shared, sum(wq)::BIGINT AS score_q
        FROM pr GROUP BY 1, 2
    )
    SELECT p1, p2, n_shared, score_q,
           round(score_q / {_LCM16}.0, 6) AS ra_score_r
    FROM s
    ORDER BY score_q DESC, p1, p2
    LIMIT 100
"""


@register("resource_allocation_links", oracle=_RA_SQL)
def resource_allocation_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 part pairs by Resource-Allocation link-prediction score:
    RA(p1,p2) = Σ over shared orders o of 1/|basket(o)|, accumulated as
    exact integers via the lcm(1..16) fixed-point weight.
    """
    e = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    w = (
        e.groupBy("o")
        .agg(F.count("*").alias("deg"))
        .filter((F.col("deg") >= 2) & (F.col("deg") <= _MAX_BASKET))
        .select("o", F.expr(f"{_LCM16} div deg").alias("wq"))
    )
    # attach the weight BEFORE pairing: over-cap baskets are dropped by this
    # join and never fan out into pairs (the cap is the quadratic guard)
    a = e.join(w, "o").select("o", F.col("p").alias("p1"), "wq")
    b = e.select("o", F.col("p").alias("p2"))
    pr = a.join(b, "o").filter(F.col("p1") < F.col("p2"))
    s = pr.groupBy("p1", "p2").agg(
        F.count("*").alias("n_shared"), F.sum("wq").alias("score_q")
    )
    return (
        s.select(
            "p1",
            "p2",
            "n_shared",
            "score_q",
            F.round(F.col("score_q") / float(_LCM16), 6).alias("ra_score_r"),
        )
        .orderBy(F.col("score_q").desc(), "p1", "p2")
        .limit(100)
    )
