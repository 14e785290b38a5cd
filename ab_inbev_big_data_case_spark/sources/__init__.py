"""Sources & sinks: schema-pinned file readers, REST ingestion, writers."""

from ab_inbev_big_data_case_spark.sources.readers import (
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    table,
)
from ab_inbev_big_data_case_spark.sources.writers import (
    write_parquet,
    write_partitioned,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "table",
    "write_parquet",
    "write_partitioned",
]
