"""Source/sink coverage: schema-pinned JSON/CSV scans, write roundtrips,
and the runner's orchestration semantics."""

import json

import pytest
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.runner import Stage, run_stages
from ab_inbev_big_data_case_spark.sources.readers import read_csv, read_json, read_parquet

SCHEMA = "id string, name string, value double"
ROWS = [
    {"id": "a", "name": "x", "value": 1.5},
    {"id": "b", "name": None, "value": 2.5},
]


def test_json_scan_schema_pinned(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    df = read_json(spark, str(p), SCHEMA)
    assert df.schema.simpleString() == "struct<id:string,name:string,value:double>"
    assert df.count() == 2
    # pinned schema: unknown fields in data are dropped, missing become null
    p2 = tmp_path / "drift.json"
    p2.write_text(json.dumps({"id": "c", "extra": 1}))
    drifted = read_json(spark, str(p2), SCHEMA)
    row = drifted.collect()[0]
    assert row["id"] == "c" and row["value"] is None
    assert "extra" not in drifted.columns


def test_csv_scan(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,value\na,x,1.5\nb,,2.5\n")
    df = read_csv(spark, str(p), SCHEMA)
    assert df.count() == 2
    assert dict(df.dtypes)["value"] == "double"


def test_json_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1.0)], "id string, v double")
    out = str(tmp_path / "out_json")
    df.write.mode("overwrite").json(out)
    back = read_json(spark, out, "id string, v double")
    assert [tuple(r) for r in back.collect()] == [("a", 1.0)]


def test_parquet_roundtrip_preserves_types(spark, tmp_path, sf_dir):
    src = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "li")
    src.limit(100).write.mode("overwrite").parquet(out)
    back = read_parquet(spark, out)
    assert back.schema == src.schema
    assert back.count() == 100


def test_runner_chain_and_retry():
    calls = {"flaky": 0}

    def extract(ctx):
        return {**ctx, "raw": [1, 2, 3]}

    def flaky_transform(ctx):
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("transient")
        return {**ctx, "clean": [x * 2 for x in ctx["raw"]]}

    stages = [
        Stage("extract", extract),
        Stage("transform", flaky_transform, retries=1, retry_delay_s=0),
    ]
    ctx, report = run_stages(stages)
    assert ctx["clean"] == [2, 4, 6]
    assert report.attempts == {"extract": 1, "transform": 2}


def test_runner_failure_hook_fires():
    hook_calls = []

    def boom(ctx):
        raise ValueError("permanent")

    with pytest.raises(ValueError):
        run_stages(
            [Stage("boom", boom, retries=0)],
            on_failure=lambda name, exc: hook_calls.append((name, str(exc))),
        )
    assert hook_calls == [("boom", "permanent")]


def test_compact_parquet(spark, tmp_path):
    from ab_inbev_big_data_case_spark.sources.writers import compact_parquet

    out = str(tmp_path / "frag")
    # fragment: 20 files for a tiny table
    spark.range(10_000).repartition(20).write.parquet(out)
    import os

    n_before = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_before == 20
    n_target = compact_parquet(spark, out, target_file_bytes=10**9)
    n_after = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_target == n_after == 1
    assert spark.read.parquet(out).count() == 10_000


def test_write_layer_falls_back_without_delta(spark, tmp_path):
    from ab_inbev_big_data_case_spark.sources.writers import delta_available, write_layer

    df = spark.createDataFrame([(1, "x")], "id long, v string")
    out = str(tmp_path / "layer")
    fmt = write_layer(df, out, spark)
    # this container has no delta-spark → parquet fallback, data readable
    assert fmt == ("delta" if delta_available(spark) else "parquet") == "parquet"
    assert spark.read.parquet(out).count() == 1


def test_merge_schema_reads_evolved_layout(spark, tmp_path):
    from ab_inbev_big_data_case_spark.sources.readers import read_parquet

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1,)], "id long").write.parquet(f"{out}/f1")
    spark.createDataFrame([(2, "new")], "id long, extra string").write.parquet(f"{out}/f2")
    merged = read_parquet(spark, f"{out}/*", merge_schema=True)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows == {1: None, 2: "new"}


def test_orc_roundtrip(spark, tmp_path, sf_dir):
    """ORC: the other columnar format Spark supports natively — same
    pushdown/pruning machinery as parquet."""
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(200)
    out = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == 200
    assert back.schema == src.schema


def test_binary_file_source(spark, tmp_path):
    """binaryFile source lands opaque media as (path, length, content) rows
    and pathGlobFilter prunes non-matching extensions at the source."""
    from ab_inbev_big_data_case_spark.sources.readers import read_binary_files

    (tmp_path / "a.img").write_bytes(b"\x89fake-image-bytes")
    (tmp_path / "b.img").write_bytes(b"\x00\x01\x02")
    (tmp_path / "skip.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert rows["a.img"]["content"] == b"\x89fake-image-bytes"
    assert rows["a.img"]["length"] == 17
    assert dict(df.dtypes)["content"] == "binary"


def test_write_interchange_avro_seam(spark, tmp_path):
    """Avro when the spark-avro connector exists; JSON fallback otherwise —
    same probe-and-fallback contract as the delta writer seam."""
    from ab_inbev_big_data_case_spark.sources.writers import (
        avro_available,
        write_interchange,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "interchange")
    fmt = write_interchange(df, out, spark)
    assert fmt == ("avro" if avro_available(spark) else "json")
    back = spark.read.format(fmt).load(out)
    assert back.count() == 2


def test_upsert_by_key_merge_semantics(spark, tmp_path):
    """Update rows replace matching keys, new keys append, untouched rows
    survive; with order_col, stale updates lose and replays are no-ops."""
    from ab_inbev_big_data_case_spark.sources.writers import upsert_by_key

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id long, v string, ver long"
    )
    upsert_by_key(spark, base, path, ["id"])
    upd = spark.createDataFrame(
        [(2, "b2", 20), (4, "d", 20)], "id long, v string, ver long"
    )
    upsert_by_key(spark, upd, path, ["id"], order_col="ver")
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}

    # stale redelivery (ver 10 for id 2) must NOT regress the row
    stale = spark.createDataFrame([(2, "bOLD", 10)], "id long, v string, ver long")
    upsert_by_key(spark, stale, path, ["id"], order_col="ver")
    # replaying the same batch must be a no-op (idempotent under retry)
    upsert_by_key(spark, upd, path, ["id"], order_col="ver")
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}
    assert spark.read.parquet(path).count() == 4


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A dataset whose later files add a column reads whole with
    mergeSchema: old rows surface NULL for the new column — the
    append-only layer evolution every long-lived pipeline hits."""
    p = str(tmp_path / "evo")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p + "/d=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p + "/d=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r["id"]: r for r in df.collect()}
    assert set(df.columns) >= {"id", "v", "score"}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_json_scan_tolerates_corrupt_records(spark, tmp_path):
    """PERMISSIVE mode (the default) lands malformed lines as nulls under
    _corrupt_record instead of failing the scan — at 100 TB a single bad
    line must never kill the job."""
    import pyspark.sql.types as T

    from ab_inbev_big_data_case_spark.sources.readers import read_json

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": "also ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_json(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 1


def test_partitioned_upsert_touches_only_updated_partitions(spark, tmp_path):
    """Dynamic-partition upsert: partitions absent from the update batch
    keep their files byte-identical; touched partitions merge keep-latest;
    new partition values append."""
    import os

    from ab_inbev_big_data_case_spark.sources.writers import (
        upsert_by_key_partitioned,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1, "p1"), (2, "b", 1, "p1"), (3, "c", 1, "p2")],
        "id long, v string, ver long, part string",
    )
    upsert_by_key_partitioned(spark, base, path, ["id"], "part", order_col="ver")

    def files_state(part):
        d = os.path.join(path, f"part={part}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    p2_before = files_state("p2")
    upd = spark.createDataFrame(
        [(2, "b2", 2, "p1"), (9, "z", 2, "p3")],
        "id long, v string, ver long, part string",
    )
    upsert_by_key_partitioned(spark, upd, path, ["id"], "part", order_col="ver")

    assert files_state("p2") == p2_before, "untouched partition was rewritten"
    got = {r["id"]: (r["v"], r["ver"], r["part"])
           for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 1, "p1"), 2: ("b2", 2, "p1"), 3: ("c", 1, "p2"), 9: ("z", 2, "p3")
    }


def test_write_with_observation_metrics(spark, sf_dir, tmp_path):
    """Observed metrics must equal directly-computed aggregates AND cost no
    extra scan (they piggyback on the write job)."""
    from pyspark.sql import functions as F

    from ab_inbev_big_data_case_spark.sources.readers import table
    from ab_inbev_big_data_case_spark.sources.writers import write_with_observation

    e = table(spark, sf_dir, "events")
    out = str(tmp_path / "observed")
    got = write_with_observation(
        e,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_props": F.sum(
                F.when(F.col("props").isNull(), 1).otherwise(0)
            ),
            "max_value": F.max("value"),
        },
    )
    assert got["n_rows"] == e.count()
    assert got["n_null_props"] == e.filter(F.col("props").isNull()).count()
    assert abs(got["max_value"] - e.agg(F.max("value")).collect()[0][0]) < 1e-9
    assert spark.read.parquet(out).count() == got["n_rows"]


def test_python_streaming_datasource_reads_deterministic_batches(spark):
    """Spark 4 SimpleDataSourceStreamReader surface: the synthetic format
    streams its id space in micro-batches; content equals the batch scan."""
    from ab_inbev_big_data_case_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 300)
        .option("batch_rows", 120)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pyds_stream_out")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table("pyds_stream_out").count() >= 300:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("pyds_stream_out")
    assert got.count() == 300
    from pyspark.sql import functions as F

    s = got.agg(
        F.sum("id").alias("sid"), F.sum("raw").alias("sraw")
    ).first()
    assert s["sid"] == sum(range(300))
    assert s["sraw"] == sum((rid * 2654435761) % 1000 for rid in range(300))


def test_xml_roundtrip_schema_pinned(spark, tmp_path, sf_dir):
    """XML (Spark 4 built-in spark-xml): write/read round-trips rows, and a
    schema-PINNED read preserves the original types where inference would
    widen int -> bigint."""
    from ab_inbev_big_data_case_spark.sources.readers import read_xml, write_xml

    src = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    out = str(tmp_path / "nation_xml")
    write_xml(src, out)
    back = read_xml(spark, out, schema=src.schema)
    assert back.schema == src.schema  # pinned read keeps exact types
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )
    inferred = read_xml(spark, out)  # inference widens integers
    assert dict(inferred.dtypes)["n_nationkey"] == "bigint"
