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


def chained_tumbling_peak(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    cents_col: Column,
    inner: str = "1 hour",
    outer: str = "1 day",
) -> DataFrame:
    """CHAINED event-time windows — fine window, then a coarser rollup of
    the fine aggregates: per-key ``inner``-window sums, then the per-key
    ``outer``-window MAX of those sums (the 'peak hour per day' shape).

    The chaining key is ``F.window_time(window)`` (= window.end − 1 tick),
    an event-time column Spark accepts as the time input of the SECOND
    window — the Spark 3.4+ multiple-stateful-operator path. On static
    input this is just two grouped aggregations; on a watermarked stream
    both stages run stateful in ONE query (append mode), each window
    finalizing when the watermark passes its end.

    Output: day_start, day_end, *key_cols, peak_window_cents (exact
    integer cents — the inner sum is exact, max of exact ints is exact),
    n_active_windows."""
    fine = df.groupBy(F.window(ts_col, inner), *key_cols).agg(
        cents_col.alias("__cents")
    )
    coarse = fine.groupBy(
        F.window(F.window_time("window"), outer), *key_cols
    ).agg(
        F.max("__cents").alias("peak_window_cents"),
        F.count("*").alias("n_active_windows"),
    )
    return _flatten(coarse, "window", "day_start", "day_end")
