"""Streaming verification: each streaming op must equal its batch twin on
the same input (SURVEY.md §5.2 — batch twins are the oracle-checked truth;
these tests close the loop by running the real streaming path)."""

import pytest
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.sources.readers import table
from ab_inbev_big_data_case_spark.streaming.jobs import (
    run_to_memory,
    running_count_per_key,
    stateful_dedup,
    stream_from_parquet,
    with_watermark,
)
from ab_inbev_big_data_case_spark.streaming.windows import session_agg, tumbling_agg


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    df = table(spark, sf_dir, "events")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def events_stream_path(spark, events_batch, tmp_path_factory):
    """Re-materialize events as µs-timestamp parquet so readStream can use a
    plain schema (streaming reader can't do the nanos conversion)."""
    p = str(tmp_path_factory.mktemp("stream") / "events")
    events_batch.write.mode("overwrite").parquet(p)
    return p


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events_batch, events_stream_path):
    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    agg = tumbling_agg(
        with_watermark(stream, "ts", "1 hour"),
        "ts", "1 day", ["event_type"], [F.count("*").alias("n_events")],
    )
    name = run_to_memory(agg, "tumbling_out", "complete")
    got = spark.sql(f"SELECT * FROM {name}")
    want = tumbling_agg(
        events_batch, "ts", "1 day", ["event_type"], [F.count("*").alias("n_events")]
    )
    cols = ["window_start", "window_end", "event_type", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_equals_batch(spark, events_batch, events_stream_path):
    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    agg = session_agg(
        with_watermark(stream, "ts", "1 hour"),
        "ts", "30 minutes", ["user_id"], [F.count("*").alias("n_events")],
    )
    name = run_to_memory(agg, "session_out", "complete")
    got = spark.sql(f"SELECT * FROM {name}")
    want = session_agg(
        events_batch, "ts", "30 minutes", ["user_id"], [F.count("*").alias("n_events")]
    )
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stateful_dedup_stream(spark, events_batch, events_stream_path):
    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    dedup = stateful_dedup(stream, ["event_id"], "ts", "1 hour")
    name = run_to_memory(dedup, "dedup_out", "append")
    got = spark.sql(f"SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM {name}").collect()[0]
    n_ids = events_batch.select("event_id").distinct().count()
    assert got["n"] == got["d"] == n_ids


def test_apply_in_pandas_with_state(spark, events_batch, events_stream_path):
    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    counted = running_count_per_key(stream, "user_id")
    name = run_to_memory(counted, "state_out", "update")
    got = {r["user_id"]: r["n_events"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_sliding_stream_equals_batch(spark, events_batch, events_stream_path):
    from ab_inbev_big_data_case_spark.streaming.windows import sliding_agg

    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    agg = sliding_agg(
        with_watermark(stream, "ts", "1 hour"),
        "ts", "1 hour", "30 minutes", [], [F.count("*").alias("n_events")],
    )
    name = run_to_memory(agg, "sliding_out", "complete")
    got = spark.sql(f"SELECT * FROM {name}")
    want = sliding_agg(
        events_batch, "ts", "1 hour", "30 minutes", [], [F.count("*").alias("n_events")]
    )
    cols = ["window_start", "window_end", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_multibatch_stateful_count(spark, events_batch, tmp_path_factory):
    """State must accumulate ACROSS micro-batches: 3 files → 3 batches via
    maxFilesPerTrigger=1; the last update-mode output per user equals the
    global count."""
    import os

    from pyspark.sql import functions as F2

    d = str(tmp_path_factory.mktemp("mb") / "events")
    os.makedirs(d, exist_ok=True)
    # 3 time-sliced files, written in order (file pickup is mtime-ordered)
    for i, (lo, hi) in enumerate(
        [("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-21"), ("2024-01-21", "2024-02-01")]
    ):
        sl = events_batch.filter((F2.col("ts") >= lo) & (F2.col("ts") < hi))
        sl.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
    import shutil

    for i in range(3):
        for f in os.listdir(f"{d}/b{i}"):
            if f.endswith(".parquet"):
                shutil.move(f"{d}/b{i}/{f}", f"{d}/part{i}.parquet")
        shutil.rmtree(f"{d}/b{i}")

    stream = (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    counted = running_count_per_key(stream, "user_id")
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("mb_state")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends each update; the MAX per user is the
    # final accumulated count
    got = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n FROM mb_state GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    # and state really was incremental: more output rows than distinct users
    n_updates = spark.sql("SELECT count(*) AS c FROM mb_state").collect()[0]["c"]
    assert n_updates > len(want)


def test_rate_source_smoke(spark):
    """Built-in rate source: the always-available streaming source for
    load/smoke tests (SURVEY §2.2 'streaming file/rate source')."""
    import time as _t

    df = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_out")
        .start()
    )
    deadline = _t.time() + 10
    n = 0
    while _t.time() < deadline:
        n = spark.sql("SELECT count(*) AS c FROM rate_out").collect()[0]["c"]
        if n > 0:
            break
        _t.sleep(0.3)
    q.stop()
    assert n > 0
    assert set(df.columns) == {"timestamp", "value"}


def test_checkpointed_parquet_sink(spark, events_batch, events_stream_path, tmp_path_factory):
    """foreachBatch + checkpoint: all rows land exactly once; a restart from
    the same checkpoint reprocesses nothing."""
    from ab_inbev_big_data_case_spark.streaming.jobs import (
        stream_to_parquet_checkpointed,
    )

    base = tmp_path_factory.mktemp("ckpt_sink")
    out, ckpt = str(base / "out"), str(base / "ckpt")

    def start():
        stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
        return stream_to_parquet_checkpointed(stream, out, ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()
    first = spark.read.parquet(out)
    assert first.drop("batch_id").count() == events_batch.count()

    # restart on the same checkpoint: no new data -> no duplicate rows
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    again = spark.read.parquet(out)
    assert again.count() == first.count()


def test_transform_with_state_seam(spark, events_batch, events_stream_path):
    """transformWithStateInPandas runs when its protobuf runtime exists and
    degrades to a clear ImportError here (container lacks google-protobuf);
    either way the seam is exercised, mirroring the delta writer probe."""
    from ab_inbev_big_data_case_spark.streaming.jobs import (
        running_count_per_key_tws,
        transform_with_state_available,
    )

    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    if transform_with_state_available():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        counted = running_count_per_key_tws(stream, "user_id")
        name = run_to_memory(counted, "tws_out", "update")
        got = {r["user_id"]: r["n_events"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
        want = {
            r["user_id"]: r["n"]
            for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        assert got == want
    else:
        with pytest.raises(ImportError, match="protobuf"):
            running_count_per_key_tws(stream, "user_id")


def test_stream_stream_join_equals_batch(spark, events_batch, events_stream_path):
    """Watermarked time-bounded stream-stream self-join == the same join in
    batch (pairs of same-user events within 1 hour of each other)."""
    from ab_inbev_big_data_case_spark.streaming.jobs import stream_stream_join

    s1 = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    s2 = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    joined = stream_stream_join(s1, s2, "user_id", "ts", "2 hours").select(
        "event_id", "r_event_id"
    )
    name = run_to_memory(joined, "ssj_out", "append")
    got = _rows(spark.sql(f"SELECT * FROM {name}"), ["event_id", "r_event_id"])

    b = events_batch
    r = events_batch.select([F.col(c).alias(f"r_{c}") for c in events_batch.columns])
    want_df = b.join(
        r,
        F.expr(
            "user_id = r_user_id AND r_ts >= ts - INTERVAL 1 hour "
            "AND r_ts <= ts + INTERVAL 1 hour"
        ),
    ).select("event_id", "r_event_id")
    want = _rows(want_df, ["event_id", "r_event_id"])
    assert got == want


def test_stream_upsert_sink_keeps_latest(spark, tmp_path):
    """foreachBatch upsert sink: across micro-batches the table holds one
    row per key with the highest version; restarting the stream over the
    same source (fresh checkpoint = full replay) changes nothing."""
    import pyspark.sql.types as T

    from ab_inbev_big_data_case_spark.streaming.jobs import (
        stream_from_parquet,
        stream_upsert_sink,
    )

    src = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema).coalesce(1).write.parquet(
        src + "/f1"
    )
    spark.createDataFrame([(2, "b2", 2), (3, "c", 2)], schema).coalesce(1).write.parquet(
        src + "/f2"
    )
    out = str(tmp_path / "table")
    q = stream_upsert_sink(
        stream_from_parquet(spark, src + "/*", schema),
        out, ["id"], "ver", str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    want = {1: ("a", 1), 2: ("b2", 2), 3: ("c", 2)}
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert got == want

    # full replay with a fresh checkpoint: idempotent merge absorbs it
    q2 = stream_upsert_sink(
        stream_from_parquet(spark, src + "/*", schema),
        out, ["id"], "ver", str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert got == want


def test_stream_static_join_equals_batch(spark, events_batch, events_stream_path):
    """Stream-static dim enrichment: per-batch batch⋈dim must equal the
    whole-batch join+agg twin; the static side is broadcast (no join state)."""
    from ab_inbev_big_data_case_spark.streaming.jobs import stream_static_join

    dim = (
        events_batch.select("user_id")
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
    )
    dim.cache().count()

    stream = stream_from_parquet(spark, events_stream_path, events_batch.schema)
    enriched = stream_static_join(stream, dim, ["user_id"])
    agg = enriched.groupBy("segment").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    name = run_to_memory(agg, "ss_join_out", "complete")
    got = spark.sql(f"SELECT * FROM {name}")

    want = (
        events_batch.join(dim, ["user_id"])
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    cols = ["segment", "n", "total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_upsert_deltalite_txn_idempotent(spark, tmp_path):
    """foreachBatch -> delta-lite MERGE with the protocol's txn action:
    micro-batches upsert into an ACID table; re-running the stream with a
    FRESH checkpoint (full source replay) leaves the table version and
    contents unchanged because the log's (appId, batch) watermark turns
    every replayed merge into a committed no-op."""
    import pyspark.sql.types as T

    from ab_inbev_big_data_case_spark.sources.txlog import DeltaLiteTable
    from ab_inbev_big_data_case_spark.streaming.jobs import (
        stream_from_parquet,
        stream_upsert_deltalite,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema).coalesce(1).write.parquet(
        src + "/f1"
    )
    spark.createDataFrame([(2, "b2", 2), (3, "c", 2)], schema).coalesce(1).write.parquet(
        src + "/f2"
    )
    table = str(tmp_path / "table")
    DeltaLiteTable.create(
        spark, spark.createDataFrame([], schema), table, keys=["id"]
    )
    # app_id names the LOGICAL job: stable across checkpoint resets (the
    # recovery guarantee below), unique per query (ADVICE r7)
    q = stream_upsert_deltalite(
        stream_from_parquet(spark, src + "/*", schema),
        table,
        str(tmp_path / "ckpt"),
        order_col="ver",
        app_id="events-upsert",
    )
    q.awaitTermination(120)
    t = DeltaLiteTable(spark, table)
    want = {1: "a", 2: "b2", 3: "c"}
    # NOTE: both files may land in ONE micro-batch (keep-latest by ver)
    assert {r["id"]: r["v"] for r in t.snapshot().collect()} == want
    v_after = t.version()

    q2 = stream_upsert_deltalite(
        stream_from_parquet(spark, src + "/*", schema),
        table,
        str(tmp_path / "ckpt2"),  # fresh checkpoint = full replay
        order_col="ver",
        app_id="events-upsert",
    )
    q2.awaitTermination(120)
    assert t.version() == v_after  # replayed batches were no-ops
    assert {r["id"]: r["v"] for r in t.snapshot().collect()} == want


def test_stream_page_hinkley_matches_batch_query(spark, sf_dir, tmp_path_factory):
    """The live foreachBatch Page–Hinkley monitor, fed the day spine in 4
    ordered micro-batches with only O(1) carried state, must reproduce the
    batch query's outputs EXACTLY: the fold mirrors the batch DECIMAL(38,8)
    half-up recurrence with ``decimal.Decimal``, so alarm counts, first
    alarm day, and the 6-place-rounded max-PH are identities, not
    tolerances."""
    from ab_inbev_big_data_case_spark.queries.timeseries import (
        _PH_DELTA,
        _PH_LAMBDA,
        _daily_revenue,
    )
    from ab_inbev_big_data_case_spark.registry import QUERIES
    from ab_inbev_big_data_case_spark.streaming.jobs import stream_page_hinkley

    d = (
        _daily_revenue(spark, sf_dir)
        .select(
            "day",
            (F.col("rev").cast("decimal(18,2)") * 100)
            .cast("double")
            .alias("cents"),
        )
        .orderBy("day")
    )
    rows = d.collect()
    gm = sum(r["cents"] for r in rows) / len(rows)

    # write the spine as 4 day-ordered chunk files; maxFilesPerTrigger=1
    # delivers them as 4 in-order micro-batches
    base = tmp_path_factory.mktemp("ph_stream")
    n = len(rows)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        chunk = rows[cuts[i] : cuts[i + 1]]
        spark.createDataFrame(chunk, d.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(base / f"chunk{i}"))
    import shutil, glob, os

    feed = base / "feed"
    os.makedirs(feed)
    import time as _time

    t0 = _time.time() - 1000
    for i in range(4):
        src = glob.glob(str(base / f"chunk{i}" / "part-*.parquet"))[0]
        dst = str(feed / f"{i:02d}.parquet")
        shutil.copy(src, dst)
        # the file source orders micro-batches by modification time —
        # pin strictly increasing mtimes so the 4 chunks arrive in day
        # order (same-second copies otherwise tie and can scramble)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    state: dict = {}
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = stream_page_hinkley(stream, gm, _PH_DELTA, _PH_LAMBDA, state)
    q.processAllAvailable()
    q.stop()

    batch = QUERIES["page_hinkley_drift"](spark, sf_dir).first()
    assert state["i"] == batch["n_days"]
    # state["max_ph"] is an exact Decimal; mirror the batch query's
    # round(max(pht)::double, 6) — BigDecimal.valueOf(d).setScale(6,
    # HALF_UP) — and require identity, not tolerance
    from decimal import ROUND_HALF_UP, Decimal

    got_max = float(
        Decimal(repr(float(state["max_ph"]))).quantize(
            Decimal("1E-6"), rounding=ROUND_HALF_UP
        )
    )
    assert got_max == batch["max_ph_r"]
    assert state["n_alarm_days"] == batch["n_alarm_days"]
    got_first = state["first_alarm_day"]
    want_first = batch["first_alarm_day"]
    assert (got_first is None) == (want_first is None)
    if want_first is not None:
        assert got_first == want_first


def test_stream_stream_interval_join_matches_batch_query(
    spark, sf_dir, tmp_path_factory
):
    """The live watermarked stream-stream interval join, fed purchases and
    clicks as two file-source streams in 2 time-ordered micro-batches each,
    must reproduce the batch twin (`interval_join_purchase_click`)
    row-for-row — including a pair whose two sides arrive in DIFFERENT
    micro-batches (the buffered-state path the watermark bounds), made
    deterministic by cutting both feeds at the midpoint of a chosen
    matched pair: the earlier side lands in batch 0, the later in batch 1,
    and the time-ordered split keeps every row ahead of the watermark so
    nothing is late-dropped."""
    import glob
    import os
    import shutil
    import time as _time

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.streaming.jobs import stream_stream_join

    load_all()
    e = table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value")
        .orderBy("ts")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("event_id", "ts", "user_id")
        .orderBy("ts")
    )

    # pick the matched pair with the widest (nonzero) time separation; the
    # cut at its midpoint forces that pair across the micro-batch boundary
    batch_rows = QUERIES["interval_join_purchase_click"](spark, sf_dir).collect()
    split_pair = max(
        (r for r in batch_rows if r["purchase_ts"] != r["click_ts"]),
        key=lambda r: abs(r["purchase_ts"] - r["click_ts"]),
    )
    t_mid = (
        min(split_pair["purchase_ts"], split_pair["click_ts"])
        + (split_pair["purchase_ts"] - split_pair["click_ts"]).__abs__() / 2
    )

    base = tmp_path_factory.mktemp("ssj_stream")
    t0 = _time.time() - 1000
    feeds, chunk_of = {}, {}
    for side, df in (("p", purchases), ("c", clicks)):
        rows = df.collect()
        chunks = [
            [r for r in rows if r["ts"] <= t_mid],
            [r for r in rows if r["ts"] > t_mid],
        ]
        feed = base / f"feed_{side}"
        os.makedirs(feed)
        for i, chunk in enumerate(chunks):
            for r in chunk:
                chunk_of[(side, r["event_id"])] = i
            spark.createDataFrame(chunk, df.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(base / f"{side}{i}"))
            src = glob.glob(str(base / f"{side}{i}" / "part-*.parquet"))[0]
            dst = str(feed / f"{i:02d}.parquet")
            shutil.copy(src, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))
        feeds[side] = feed

    sp = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feeds["p"]))
    )
    sc = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feeds["c"]))
    )
    joined = stream_stream_join(
        sp, sc, "user_id", "ts", delay="1 hour", max_gap="6 hours"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_live")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    live = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT event_id, r_event_id FROM ssj_live").collect()
    }
    batch = {
        (r["purchase_id"], r["click_id"])
        for r in QUERIES["interval_join_purchase_click"](spark, sf_dir).collect()
    }
    assert live == batch and len(live) > 0
    # the buffered-state path really ran: some pair's two sides arrived in
    # different micro-batches (time-thirds of two independent streams)
    cross = [
        (p, c)
        for p, c in live
        if chunk_of[("p", p)] != chunk_of[("c", c)]
    ]
    assert cross, "no cross-micro-batch pair — state path untested"


def test_stream_stream_left_outer_join_emits_unmatched(
    spark, sf_dir, tmp_path_factory
):
    """The LEFT OUTER stream-stream interval join must emit (purchase,
    nulls) for unmatched purchases — but only after the watermark passes
    each purchase's whole match window, so the feed ends with a trailing
    far-future non-matching click that pushes the watermark past every
    real row. The emitted null-right set must equal the registered
    anti-join twin (`interval_join_unmatched_purchases`)."""
    import glob
    import os
    import shutil
    import time as _time
    from datetime import timedelta

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.streaming.jobs import stream_stream_join

    load_all()
    e = table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value")
        .orderBy("ts")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("event_id", "ts", "user_id")
        .orderBy("ts")
    )

    base = tmp_path_factory.mktemp("ssj_outer")
    t0 = _time.time() - 1000
    max_ts = e.agg(F.max("ts")).first()[0]

    feeds = {}
    for side, df in (("p", purchases), ("c", clicks)):
        rows = df.collect()
        # watermark pusher on BOTH sides (the join's global watermark is the
        # MIN of the inputs' watermarks): 30 days past the data, user -1/-2
        # matches nothing; the sentinel purchase itself stays buffered (its
        # own window never closes) and is excluded from the comparison
        if side == "c":
            sentinel = [(int(-1), max_ts + timedelta(days=30), int(-1))]
        else:
            sentinel = [(int(-1), max_ts + timedelta(days=30), int(-2), 0.0)]
        chunks = [rows, [spark.createDataFrame(sentinel, df.schema).first()]]
        feed = base / f"feed_{side}"
        os.makedirs(feed)
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(chunk, df.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(base / f"{side}{i}"))
            src = glob.glob(str(base / f"{side}{i}" / "part-*.parquet"))[0]
            dst = str(feed / f"{i:02d}.parquet")
            shutil.copy(src, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))
        feeds[side] = feed

    sp = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feeds["p"]))
    )
    sc = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feeds["c"]))
    )
    joined = stream_stream_join(
        sp, sc, "user_id", "ts", delay="1 hour", max_gap="6 hours",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer_live")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    live_unmatched = {
        r["event_id"]
        for r in spark.sql(
            "SELECT event_id FROM ssj_outer_live "
            "WHERE r_event_id IS NULL AND event_id >= 0"
        ).collect()
    }
    want = {
        r["purchase_id"]
        for r in QUERIES["interval_join_unmatched_purchases"](
            spark, sf_dir
        ).collect()
    }
    assert live_unmatched == want and len(want) > 0
    # the matched rows must also agree with the inner twin (outer ⊇ inner)
    live_matched = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql(
            "SELECT event_id, r_event_id FROM ssj_outer_live "
            "WHERE r_event_id IS NOT NULL"
        ).collect()
    }
    inner = {
        (r["purchase_id"], r["click_id"])
        for r in QUERIES["interval_join_purchase_click"](spark, sf_dir).collect()
    }
    assert live_matched == inner


def test_chained_window_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Two chained stateful window aggregations (hourly sums -> daily peak
    via window_time) in ONE append-mode streaming query must reproduce the
    batch twin; a trailing far-future sentinel event closes every real
    window (append mode only finalizes a window once the watermark passes
    its end)."""
    import glob
    import os
    import shutil
    import time as _time
    from datetime import timedelta

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.streaming.windows import (
        chained_tumbling_peak,
    )

    load_all()
    e = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    rows = e.orderBy("ts").collect()
    max_ts = rows[-1]["ts"]
    sentinel = [(max_ts + timedelta(days=30), "__sentinel", 0.0)]

    base = tmp_path_factory.mktemp("chained_win")
    feed = base / "feed"
    os.makedirs(feed)
    t0 = _time.time() - 1000
    n = len(rows)
    chunks = [rows[: n // 2], rows[n // 2 :],
              [spark.createDataFrame(sentinel, e.schema).first()]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, e.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(base / f"b{i}"))
        src = glob.glob(str(base / f"b{i}" / "part-*.parquet"))[0]
        dst = str(feed / f"{i:02d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    cents = F.sum(
        (F.round(F.col("value").cast("decimal(18,6)"), 2) * 100).cast("long")
    ).cast("long")
    agg = chained_tumbling_peak(
        stream.withWatermark("ts", "1 hour"), "ts", ["event_type"], cents
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("chained_win_live")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    cols = ["day_start", "day_end", "event_type", "peak_window_cents", "n_active_windows"]
    live = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql(
            "SELECT * FROM chained_win_live WHERE event_type != '__sentinel'"
        ).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in QUERIES["chained_window_daily_peak"](spark, sf_dir).collect()
    )
    assert live == want and len(want) > 0


def test_checkpoint_recovery_windowed_agg(spark, sf_dir, tmp_path_factory):
    """Checkpoint recovery — the first production failure a real user hits
    (VERDICT r11 item 6): a watermarked append-mode windowed aggregation is
    STOPPED mid-feed (after ≥2 micro-batches, with unconsumed data still
    arriving), then restarted from the same checkpoint directory. The
    recovered run must pick up source offsets, window partials, and the
    watermark from the checkpoint so the union of everything the sink ever
    received equals the batch twin exactly — no duplicated windows, no lost
    ones, including windows whose rows straddle the stop/restart boundary."""
    import glob
    import os
    import shutil
    import time as _time
    from datetime import timedelta

    from ab_inbev_big_data_case_spark.streaming.jobs import (
        stream_to_parquet_checkpointed,
    )

    e = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    rows = e.orderBy("ts").collect()
    max_ts = rows[-1]["ts"]
    sentinel = [(max_ts + timedelta(days=30), "__sentinel", 0.0)]

    base = tmp_path_factory.mktemp("ckpt_recovery")
    feed, out, ckpt = str(base / "feed"), str(base / "out"), str(base / "ckpt")
    os.makedirs(feed)
    t0 = _time.time() - 1000

    # 3 time-ordered thirds + a far-future sentinel that closes every real
    # window (append mode emits a window only once the watermark passes it)
    n = len(rows)
    chunks = [
        rows[: n // 3],
        rows[n // 3 : 2 * n // 3],
        rows[2 * n // 3 :],
        [spark.createDataFrame(sentinel, e.schema).first()],
    ]

    def land(i: int) -> None:
        spark.createDataFrame(chunks[i], e.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(base / f"b{i}"))
        src = glob.glob(str(base / f"b{i}" / "part-*.parquet"))[0]
        dst = os.path.join(feed, f"{i:02d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    def start_query():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        cents = (
            F.round(F.col("value").cast("decimal(18,6)"), 2) * 100
        ).cast("long")
        agg = tumbling_agg(
            stream.withWatermark("ts", "1 hour"),
            "ts",
            "1 day",
            ["event_type"],
            [
                F.count("*").alias("n_events"),
                F.sum(cents).cast("long").alias("cents"),
            ],
        )
        return stream_to_parquet_checkpointed(agg, out, ckpt)

    # ---- run 1: two micro-batches land, then the query is stopped while
    # the rest of the feed is still outstanding
    land(0)
    land(1)
    q1 = start_query()
    q1.processAllAvailable()
    assert q1.lastProgress["batchId"] >= 1, "need >=2 micro-batches pre-kill"
    q1.stop()
    q1.awaitTermination(60)

    # ---- data keeps arriving while the query is down
    land(2)
    land(3)

    # ---- run 2: same checkpoint dir — must resume offsets + window state
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(60)

    got = (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel")
        .select("window_start", "window_end", "event_type", "n_events", "cents")
        .collect()
    )
    # no duplicate window emission across the stop/restart boundary
    keys = [(r["window_start"], r["event_type"]) for r in got]
    assert len(keys) == len(set(keys)), "duplicate windows after recovery"

    cents_b = (
        F.round(F.col("value").cast("decimal(18,6)"), 2) * 100
    ).cast("long")
    want = tumbling_agg(
        e,
        "ts",
        "1 day",
        ["event_type"],
        [
            F.count("*").alias("n_events"),
            F.sum(cents_b).cast("long").alias("cents"),
        ],
    ).collect()
    cols = ["window_start", "window_end", "event_type", "n_events", "cents"]
    assert sorted(tuple(r[c] for c in cols) for r in got) == sorted(
        tuple(r[c] for c in cols) for r in want
    )
    assert len(got) > 0


def test_checkpoint_recovery_interval_join(spark, sf_dir, tmp_path_factory):
    """Checkpoint recovery for the STATEFUL JOIN path (round-12 extension
    of test_checkpoint_recovery_windowed_agg, which covers aggregation
    state): the watermarked stream-stream interval join is stopped after
    >=2 micro-batches with both feeds still incomplete, then restarted on
    the same checkpoint dir. The restart must restore source offsets AND
    the buffered join state (earlier-side rows whose partners had not
    arrived at kill time), so the union of everything the sink received
    equals the batch twin's pair set — no duplicated pairs from re-reading
    committed files, no lost pairs whose sides straddle the kill."""
    import glob
    import os
    import shutil
    import time as _time

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.streaming.jobs import (
        stream_stream_join,
        stream_to_parquet_checkpointed,
    )

    load_all()
    e = table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value")
        .orderBy("ts")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("event_id", "ts", "user_id")
        .orderBy("ts")
    )

    base = tmp_path_factory.mktemp("ssj_recovery")
    t0 = _time.time() - 1000
    feeds = {}
    for side, df in (("p", purchases), ("c", clicks)):
        rows = df.collect()
        n = len(rows)
        # 3 time-ordered thirds per side: the kill lands between the 2nd
        # and 3rd, so pairs spanning that cut exercise restored join state
        chunks = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
        feed = base / f"feed_{side}"
        os.makedirs(feed)
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(chunk, df.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(base / f"{side}{i}"))
            src = glob.glob(str(base / f"{side}{i}" / "part-*.parquet"))[0]
            dst = str(feed / f"{i:02d}.parquet")
            shutil.copy(src, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))
        feeds[side] = str(feed)

    out, ckpt = str(base / "out"), str(base / "ckpt")

    def start_query():
        sp = (
            spark.readStream.schema(purchases.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feeds["p"])
        )
        sc = (
            spark.readStream.schema(clicks.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feeds["c"])
        )
        joined = stream_stream_join(
            sp, sc, "user_id", "ts", delay="1 hour", max_gap="6 hours"
        )
        return stream_to_parquet_checkpointed(
            joined.select("event_id", "r_event_id"), out, ckpt
        )

    # ---- run 1: only the first two thirds of each feed exist yet. The
    # held file must leave the feed DIRECTORY entirely — Spark's file
    # source lists every file regardless of extension, so an in-place
    # rename to ".hold" would still be ingested (and its later rename back
    # would re-ingest it as a NEW file, duplicating every joined pair).
    for side in ("p", "c"):
        os.rename(
            os.path.join(feeds[side], "02.parquet"),
            str(base / f"hold_{side}.parquet"),
        )
    q1 = start_query()
    q1.processAllAvailable()
    assert q1.lastProgress["batchId"] >= 1, "need >=2 micro-batches pre-kill"
    q1.stop()
    q1.awaitTermination(60)

    # ---- the final thirds land while the query is down
    for side in ("p", "c"):
        dst = os.path.join(feeds[side], "02.parquet")
        os.rename(str(base / f"hold_{side}.parquet"), dst)
        os.utime(dst, (t0 + 30, t0 + 30))

    # ---- run 2: same checkpoint — offsets + buffered join state resume
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(60)

    got = [
        (r["event_id"], r["r_event_id"])
        for r in spark.read.parquet(out)
        .select("event_id", "r_event_id")
        .collect()
    ]
    assert len(got) == len(set(got)), "duplicate pairs after recovery"
    want = {
        (r["purchase_id"], r["click_id"])
        for r in QUERIES["interval_join_purchase_click"](spark, sf_dir)
        .select(
            F.col("purchase_id").alias("purchase_id"),
            F.col("click_id").alias("click_id"),
        )
        .collect()
    }
    assert set(got) == want
    assert len(got) > 0


def _upsert_crash_fixture(spark, tmp_path):
    """One landed file + a second-landing closure (the availableNow file
    source batches ALL currently-available files together, so the crash
    tests land f2 only after f1's clean bootstrap run — guaranteeing the
    crashing batch runs the table-exists swap path)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], schema
    ).coalesce(1).write.parquet(src + "/f1")

    def land_f2():
        spark.createDataFrame(
            [(2, "b2", 2), (3, "c", 2)], schema
        ).coalesce(1).write.parquet(src + "/f2")

    want = {1: ("a", 1), 2: ("b2", 2), 3: ("c", 2)}
    return schema, src, land_f2, want


def _run_upsert(spark, schema, src, out, ckpt):
    from ab_inbev_big_data_case_spark.streaming.jobs import (
        stream_from_parquet,
        stream_upsert_sink,
    )

    q = stream_upsert_sink(
        stream_from_parquet(spark, src + "/*", schema),
        out,
        ["id"],
        "ver",
        ckpt,
    )
    q.awaitTermination(120)


def test_stream_upsert_sink_crash_between_swap_renames(spark, tmp_path, monkeypatch):
    """Exactly-once under the WORST crash point (VERDICT r12 item 6): the
    sink dies after `path` was renamed away but before staging was renamed
    in — the window where the pre-r13 rmtree+rename protocol left NO table
    and a replay bootstrap-overwrote, silently dropping every key not in
    the replayed batch. With the two-rename protocol + entry recovery, a
    restart on the same checkpoint must converge to the batch twin."""
    import os

    from pyspark.sql.streaming import StreamingQueryException

    schema, src, land_f2, want = _upsert_crash_fixture(spark, tmp_path)
    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    _run_upsert(spark, schema, src, out, ckpt)  # clean bootstrap on f1
    land_f2()

    real_rename = os.rename
    fired = {"n": 0}

    def crash_after_first_rename(a, b, *args, **kw):
        # first swap attempt: let `path -> __old__` through, die before
        # `staging -> path`
        if str(a).endswith(".__staging__") and fired["n"] == 0:
            fired["n"] += 1
            raise OSError("injected crash between swap renames")
        return real_rename(a, b, *args, **kw)

    monkeypatch.setattr(os, "rename", crash_after_first_rename)
    try:
        _run_upsert(spark, schema, src, out, ckpt)
        raised = False
    except StreamingQueryException:
        raised = True
    monkeypatch.setattr(os, "rename", real_rename)
    assert raised and fired["n"] == 1, "injection did not fire"
    # the crash left the mid-swap state the old protocol could not survive
    assert not os.path.exists(out) and os.path.exists(out + ".__old__")

    # restart on the SAME checkpoint: recovery restores the old table, the
    # replayed micro-batch re-merges idempotently
    _run_upsert(spark, schema, src, out, ckpt)
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert got == want
    assert not os.path.exists(out + ".__old__")
    assert not os.path.exists(out + ".__staging__")


def test_stream_upsert_sink_crash_after_staging_write(spark, tmp_path, monkeypatch):
    """Milder crash point: staging fully written, table untouched (die on
    the FIRST rename). The orphaned staging dir must not confuse the
    restart — recovery drops it and the replay recomputes the merge."""
    import os

    from pyspark.sql.streaming import StreamingQueryException

    schema, src, land_f2, want = _upsert_crash_fixture(spark, tmp_path)
    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    _run_upsert(spark, schema, src, out, ckpt)  # clean bootstrap on f1
    land_f2()

    real_rename = os.rename
    fired = {"n": 0}

    def crash_before_any_rename(a, b, *args, **kw):
        if str(b).endswith(".__old__") and fired["n"] == 0:
            fired["n"] += 1
            raise OSError("injected crash before the swap")
        return real_rename(a, b, *args, **kw)

    monkeypatch.setattr(os, "rename", crash_before_any_rename)
    try:
        _run_upsert(spark, schema, src, out, ckpt)
        raised = False
    except StreamingQueryException:
        raised = True
    monkeypatch.setattr(os, "rename", real_rename)
    assert raised and fired["n"] == 1, "injection did not fire"
    # table intact (pre-batch), staging orphaned
    assert os.path.exists(out) and os.path.exists(out + ".__staging__")

    _run_upsert(spark, schema, src, out, ckpt)
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert got == want
    assert not os.path.exists(out + ".__staging__")
