"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): the
extension point for connectors Spark does not ship — the modern engine
equivalent of the reference's hand-rolled REST ingestion
(``/root/reference/airflow/dags/etl_api.py:112-132``), but running INSIDE
the executors with real partition parallelism instead of a driver-side
download loop.

``SyntheticEventsDataSource`` is the deterministic proof-of-surface: each
input partition independently generates its id range with a fixed integer
mixing formula, so the scan is reproducible in any engine (the DuckDB
oracle regenerates the same rows from ``range(n)``) and the partition
count is a real parallelism dial. A production connector swaps the
generator body for a paginated HTTP fetch or queue read — partition
planning, option plumbing, schema declaration, and executor-side batching
are exactly what this class exercises.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth's multiplicative-hash constant: cheap deterministic mixing that
#: both engines reproduce with plain int64 arithmetic.
_MIX = 2654435761


class _SyntheticReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        lo = i * self.n_rows // self.n_parts
        hi = (i + 1) * self.n_rows // self.n_parts
        for rid in range(lo, hi):
            yield (rid, rid % 10, (rid * _MIX) % 1000)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, raw BIGINT"

    def reader(self, schema) -> _SyntheticReader:
        return _SyntheticReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest registration wins in the per-session registry)."""
    spark.dataSource.register(SyntheticEventsDataSource)
