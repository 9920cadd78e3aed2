"""Event-time window aggregation builders (SURVEY.md §2.9).

Each builder works on BOTH a batch DataFrame and a streaming DataFrame —
the Spark API is deliberately symmetric, so the same logical aggregation
is testable in batch (with a DuckDB oracle) and replayable as a stream
(``runner.run_available_now``).

Scale notes: event-time windows group-shuffle on (window, keys); with
watermarks, streaming state is bounded by the watermark horizon. Session
windows merge in the state store — the gap bounds state lifetime per key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Fixed-size non-overlapping event-time windows (epoch-aligned)."""
    out = df.groupBy(F.window(ts_col, duration), *keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    out = df.groupBy(F.window(ts_col, duration, slide), *keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Session windows: events within ``gap`` of the previous event merge;
    a new session starts when the inter-event gap is >= ``gap``.
    Session end = last event + gap (Spark semantics)."""
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )
