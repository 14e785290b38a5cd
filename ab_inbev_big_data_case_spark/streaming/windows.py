"""Event-time windowed aggregation — shared by batch twins and streams.

These build on ``F.window`` / ``F.session_window``, which behave identically
over static and streaming DataFrames; a streaming caller adds
``withWatermark`` first (see :mod:`ab_inbev_big_data_case_spark.streaming.jobs`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten(out: DataFrame, window_col: str, start: str, end: str) -> DataFrame:
    rest = [c for c in out.columns if c != window_col]
    return out.select(
        F.col(f"{window_col}.start").alias(start),
        F.col(f"{window_col}.end").alias(end),
        *rest,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Non-overlapping fixed windows (e.g. '1 day'). Output:
    window_start, window_end, *keys, *aggs."""
    out = df.groupBy(F.window(ts_col, duration), *keys).agg(*aggs)
    return _flatten(out, "window", "window_start", "window_end")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    out = df.groupBy(F.window(ts_col, duration, slide), *keys).agg(*aggs)
    return _flatten(out, "window", "window_start", "window_end")


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Gap-based session windows per key: events closer than ``gap`` merge
    into one session; session_end = last event + gap."""
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    return _flatten(out, "session_window", "session_start", "session_end")
