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


# ------------------------------------------------- streaming variant

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic id space: each
    ``read`` advances the offset by ``batch_rows`` ids until the ``rows``
    cap, then reports no new data. Offsets are plain dicts — exactly what
    Spark checkpoints — so a restarted query resumes mid-stream and
    ``readBetweenOffsets`` replays any committed range bit-for-bit (the
    replayability contract a production queue/CDC source must meet)."""

    def __init__(self, options: dict) -> None:
        self.batch = int(options.get("batch_rows", 100))
        self.cap = int(options.get("rows", 500))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        return iter(
            [(rid, rid % 10, (rid * _MIX) % 1000) for rid in range(lo, hi)]
        )

    def read(self, start: dict):
        pos = start["pos"]
        if pos >= self.cap:
            return (iter([]), start)
        end = min(pos + self.batch, self.cap)
        return (self._rows(pos, end), {"pos": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])


def _simple_stream_reader(self, schema) -> _SyntheticStreamReader:
    return _SyntheticStreamReader(self.options)


# attach to the batch DataSource class: one registration serves both
# spark.read and spark.readStream for the "synthetic_events" format
SyntheticEventsDataSource.simpleStreamReader = _simple_stream_reader
