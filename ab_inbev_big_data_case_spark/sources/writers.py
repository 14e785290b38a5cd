"""Sinks: overwrite/append Parquet writes and partitioned layouts.

Reference semantics (with bugs fixed — SURVEY.md §2.3):

- overwrite-mode layer writes: ``glue/etl_api.py:25,49``
  (``.write.format("delta").mode("overwrite").save(path)``)
- partitioned silver write: ``glue/etl_api.py:37-38`` wrote
  ``.save(...).partitionBy(col("id"))`` — broken as written (``save`` returns
  ``None``; ``partitionBy`` takes names and must precede ``save``; partitioning
  by the unique key makes one file per row). The intent per the adjacent
  comment is partitioning "by the brewery location" — i.e. a low-cardinality
  location column. :func:`write_partitioned` implements that intent and guards
  against the pathological high-cardinality case.

Delta Lake isn't on this classpath; plain partitioned Parquet is the portable
equivalent (columnar + Hive-style partition pruning). The writer accepts a
``fmt`` so a delta-enabled deployment can switch back. For the reference's
ACID/time-travel semantics themselves (not just the layout), see
``sources/txlog.py`` — a self-contained delta-protocol-style transaction log
over these same parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", fmt: str = "parquet"
) -> None:
    """Full-layer write, idempotent under re-runs (reference's overwrite mode)."""
    df.write.format(fmt).mode(mode).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
    files_per_partition: int = 1,
) -> None:
    """Hive-style partitioned write (fixes reference bug B4).

    Scale note: without the repartition, every task writes a file into every
    partition directory — at 1000 executors × K partitions that is the classic
    small-files explosion. Repartitioning by the partition columns first means
    each partition value is written by (at most ``files_per_partition``) tasks.
    Skewed partition values can be salted by passing a salt column in
    ``partition_cols``' repartition expression; AQE handles mild skew.
    """
    n = max(files_per_partition, 1)
    df = df.repartition(n * 32, *partition_cols) if n > 1 else df.repartition(*partition_cols)
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed table: later joins/aggregations on
    ``bucket_cols`` between tables bucketed the same way need NO shuffle —
    the co-location is recorded in the catalog and Catalyst drops the
    Exchange. This is the at-rest answer to repeated 100 TB fact-fact joins
    on the same key (shuffle once at write time, never again).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def compact_parquet(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. The maintenance op every long-lived
    ingestion layout needs — streaming/incremental writes accumulate small
    files, and scan/task overhead at 100 TB is dominated by file count.
    Returns the resulting file count. (Not atomic: stages to a sibling dir
    then swaps, so a concurrent reader sees old or new, never half.)
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    staged = path.rstrip("/") + ".__compact__"
    df.coalesce(n_files).write.mode("overwrite").parquet(staged)
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    return n_files


def delta_available(spark) -> bool:
    """True when the delta-spark connector is on the classpath. The
    reference writes Delta (glue/etl_api.py:25,38,49); this deployment seam
    lets the same writer calls target Delta when present and plain
    partitioned parquet otherwise (same columnar layout + partition pruning,
    minus the txn log)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def write_layer(df: DataFrame, path: str, spark=None, mode: str = "overwrite") -> str:
    """Reference-style layer write (R2): Delta when available, parquet
    fallback. Returns the format used."""
    spark = spark or df.sparkSession
    fmt = "delta" if delta_available(spark) else "parquet"
    df.write.format(fmt).mode(mode).save(path)
    return fmt


def avro_available(spark) -> bool:
    """True when the spark-avro connector is on the classpath. Spark ships
    avro-core jars but the ``avro`` DataSource lives in the external
    ``spark-avro`` module (absent here); row-format interchange falls back
    to JSON, columnar storage stays parquet/orc."""
    try:
        # DataSource registry lookup, not Class.forName: Spark bundles avro
        # reader classes for from_avro()/to_avro() yet still treats the
        # `avro` format as an external module, so only the registry answers
        # "can .format('avro') actually resolve".
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception:
        return False


def write_interchange(df: DataFrame, path: str, spark=None, mode: str = "overwrite") -> str:
    """Row-format interchange write (the Kafka/event-bus-facing layer):
    Avro when the connector is present, JSON fallback otherwise (schema
    travels in the engine's pinned-schema discipline either way — see
    sources.readers). Returns the format used."""
    spark = spark or df.sparkSession
    fmt = "avro" if avro_available(spark) else "json"
    df.write.format(fmt).mode(mode).save(path)
    return fmt


def upsert_by_key(
    spark,
    updates: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Copy-on-write keyed upsert (MERGE-lite) into a parquet dataset:
    rows in ``updates`` replace current rows with the same key; unmatched
    keys append. This is the portable equivalent of the Delta ``MERGE`` the
    reference's storage story implies (`glue/etl_api.py:25,38,49` writes
    delta layers; delta isn't on this classpath — see module docstring):
    read current -> anti-join out the updated keys -> union -> rewrite.

    ``order_col`` makes the upsert idempotent under replays: when given,
    an update only wins if its ``order_col`` is >= the current row's
    (keep-latest semantics via one window), so re-delivering an old batch
    can't regress the table — the property a foreachBatch streaming sink
    needs, since Structured Streaming replays the last uncommitted batch
    on recovery.

    Crash consistency (r13): the swap is two atomic renames —
    ``path -> path.__old__`` then ``staging -> path`` — with recovery at
    entry, replacing the original ``rmtree(path); rename(staging, path)``
    whose crash window left NO table at ``path``: a replay arriving in
    that state took the bootstrap branch and silently dropped every
    pre-existing key. Now every crash point leaves either the old or the
    new table recoverable by rename, and the entry recovery plus the
    replayed batch reconverge to the exact batch-twin table.

    Scale notes: copy-on-write rewrites the whole dataset — correct and
    simple, and exactly what Delta/Iceberg avoid with file-level pruning;
    at 100 TB the same pattern is applied per PARTITION (pair this with
    ``write_partitioned`` and restrict the rewrite to partitions present
    in ``updates`` — dynamic partition overwrite). The write stages
    through a temp dir because Spark can't overwrite a path it is reading.
    """
    import os
    import shutil

    _recover_upsert_swap(path)
    if order_col is not None:
        # a single batch may carry several versions of one key (e.g. a
        # multi-file micro-batch) — collapse to latest-per-key first, or the
        # bootstrap write below lands duplicates
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        wb = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        updates = (
            updates.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    current = None
    if os.path.exists(path):
        current = spark.read.format(fmt).load(path)
    if current is None:
        write_parquet(updates, path, fmt=fmt)
        return
    if order_col is None:
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        # keep-latest across current+updates; ties prefer the update so a
        # same-version redelivery is a no-op rather than a flip-flop
        tagged = current.withColumn("__src", F.lit(0)).unionByName(
            updates.withColumn("__src", F.lit(1))
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), F.col("__src").desc()
        )
        merged = (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
    tmp = path.rstrip("/") + ".__staging__"
    old = path.rstrip("/") + ".__old__"
    merged.write.format(fmt).mode("overwrite").save(tmp)
    # two atomic renames, never a window with no table at `path` whose
    # replay would bootstrap-overwrite (see docstring):
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def _recover_upsert_swap(path: str) -> None:
    """Roll an interrupted :func:`upsert_by_key` swap back to a consistent
    table before touching ``path``. States a crash can leave:

    - staging exists, ``path`` exists  → staging may be INCOMPLETE (crash
      mid-write): drop staging; the replayed batch recomputes it.
    - ``path`` missing, ``__old__`` exists → crash between the renames;
      ``__old__`` is the complete pre-batch table: restore it (the
      replayed batch re-applies the merge idempotently). Staging is
      complete in this state too, but restoring the OLD table needs no
      trust in staging's contents.
    - ``path`` exists, ``__old__`` exists → crash after the swap, before
      cleanup: the new table already won; drop ``__old__``.
    - ``path`` missing, ``__old__`` missing, staging exists → the LEGACY
      pre-fix protocol's crash window (rmtree(path) then rename(tmp)):
      staging is the fully merged table and the ONLY surviving copy —
      promote it (ADVICE r13: deleting it here re-created the exact data
      loss the two-rename protocol fixed, for tables broken before the
      fix deployed). The new protocol never reaches this state (``path``
      or ``__old__`` always exists), so the promotion cannot misfire.
    """
    import os
    import shutil

    tmp = path.rstrip("/") + ".__staging__"
    old = path.rstrip("/") + ".__old__"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    if not os.path.exists(path) and os.path.exists(tmp):
        os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def upsert_by_key_partitioned(
    spark,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
    order_col: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Partition-scoped keyed upsert — the 100 TB form of
    :func:`upsert_by_key`: only partitions PRESENT in ``updates`` are read,
    merged, and rewritten; everything else on disk is untouched.

    Mechanics: collect the (bounded — one row per touched partition, the
    same order of driver-side state as AQE statistics) partition values,
    read current rows pruned to those partitions, keep-latest merge, and
    write with ``partitionOverwriteMode=dynamic`` so the overwrite replaces
    exactly the partitions in the output. Untouched partitions keep their
    files byte-identical (pytest pins this), which is what bounds the
    nightly-merge cost by the delta's partition span, not the table size.
    """
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if order_col is not None:
        wb = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        updates = (
            updates.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if not os.path.exists(path):
        write_partitioned(updates, path, [partition_col], fmt=fmt)
        return
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    current = (
        spark.read.format(fmt).load(path).filter(F.col(partition_col).isin(touched))
    )
    if order_col is None:
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates.select(*current.columns))
    else:
        tagged = current.withColumn("__src", F.lit(0)).unionByName(
            updates.select(*current.columns).withColumn("__src", F.lit(1))
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), F.col("__src").desc()
        )
        merged = (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(F.col(partition_col))
            .write.format(fmt)
            .mode("overwrite")
            .partitionBy(partition_col)
            .save(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_with_observation(df, path: str, metrics: dict):
    """Parquet write with in-flight observed metrics (``df.observe`` +
    ``Observation``): the metrics ride the SAME job that writes — zero
    extra scans — which at 100 TB is the difference between free
    write-audit counters (row counts, null rates, domain violations
    observed during the sink pass) and a second full read to compute them.
    Returns the observed metric dict after the write action completes.

    The modern engine form of the reference's post-hoc Glue job polling
    (``airflow/dags/etl_api.py:189-196``): instead of asking "did the job
    succeed", the write itself reports what it saw."""
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
    observed.write.mode("overwrite").parquet(path)
    return obs.get
