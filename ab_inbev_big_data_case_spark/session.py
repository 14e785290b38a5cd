"""SparkSession factory.

The reference creates its session through the AWS Glue runtime
(``/root/reference/glue/etl_api.py:11-13``); the engine equivalent is a plain
``SparkSession.builder`` with scale-minded defaults:

- **AQE on** (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — the single biggest lever for 100 TB plans.
- **UTC session timezone** — fixtures are tz-naive; keeps Spark and the
  DuckDB oracle byte-identical on timestamps.
- **Arrow enabled** — vectorized pandas-UDF / toPandas path.
- **shuffle.partitions sized to the local machine** for tests; a real
  cluster deployment overrides this (AQE coalescing makes the initial
  number much less critical).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
}


def _default_heap_gb() -> int:
    """min(16, physical_ram // 2) GiB, floor 1 — probed via sysconf; hosts
    without the sysconf keys (or non-POSIX) keep the 16g ceiling."""
    try:
        ram = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        return max(1, min(16, int(ram / (2 * 1024**3))))
    except (ValueError, OSError, AttributeError):
        return 16


def get_spark(
    app_name: str = "ab_inbev_big_data_case_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env var, default 32)
    so the bench harness and tests share one sizing knob.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    # Local mode runs every executor thread inside the DRIVER JVM, whose
    # default heap is 1 GiB — 32 threads' shuffle buffers + broadcast
    # builds in 1 GiB is the silent spill/GC tax (and an outright
    # broadcast-OOM at sf1). Size it to the machine: min(16g, ~half of
    # physical RAM), so a small host keeps a heap the OS can actually back
    # (a 16g cap over 8 GiB RAM trades managed spill for the OOM killer).
    # Cluster deployments override per executor; this only applies before
    # the first JVM start.
    conf.setdefault(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{_default_heap_gb()}g"),
    )
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
