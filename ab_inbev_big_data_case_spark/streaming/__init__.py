"""Structured Streaming surface (SURVEY.md §2.2 "Streaming").

Generalizes the reference's incremental daily-window intent
(``airflow/dags/etl_api.py:74-76``: each run processes the last day's slice)
into a real event-time streaming layer: tumbling/sliding/session windows,
watermarks, stateful dedup, and arbitrary state.

Design rule: every streaming aggregation has a batch twin built from the SAME
window expression (``groupBy(F.window(...))`` works identically on static
DataFrames), so correctness is oracle-checked in batch and the streaming
path is verified by identity with its twin (tests/test_streaming.py).
"""

from ab_inbev_big_data_case_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = ["session_agg", "sliding_agg", "tumbling_agg"]
