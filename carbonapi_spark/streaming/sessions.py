"""Gap-based sessionization with the built-in ``session_window``.

A training-data pipeline over event streams (user interactions, crawl
fetches, log lines) needs sessions — maximal runs of events per key with
no gap longer than a timeout — for both analytics (session length/depth)
and data prep (conversation/episode assembly before packing). Spark has
this as a first-class operator: ``F.session_window`` is a *dynamic-gap*
window the engine merges in the state store, so the idiomatic
implementation is a declarative groupBy — NOT an
``applyInPandasWithState`` kernel (that escape hatch is for semantics
the built-ins can't express; see ``streaming/stateful.py``).

The same expression works on a batch DataFrame (tests, backfills) and a
watermarked stream (production) — Structured Streaming's unified API.
Scale shape: state is partitioned by (key, merged window); the watermark
bounds state for abandoned sessions and late events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(events: DataFrame, key_col: str = "user_id",
               time_col: str = "ts", gap: str = "30 minutes",
               watermark: str | None = None) -> DataFrame:
    """Per-key gap sessions: one row per (key, session) with start/end
    epoch seconds, event count, and summed value.

    ``events`` needs (key_col, time_col TIMESTAMP, value DOUBLE). Pass
    ``watermark`` (e.g. ``'1 hour'``) on streaming input — it is what
    lets the engine emit a session once no on-time event can extend it,
    and what evicts state for dead sessions."""
    src = events.withWatermark(time_col, watermark) if watermark else events
    win = F.session_window(F.col(time_col), gap)
    return (src.groupBy(F.col(key_col), win)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(key_col,
                    F.unix_timestamp(F.col("session_window.start"))
                    .alias("session_start"),
                    F.unix_timestamp(F.col("session_window.end"))
                    .alias("session_end"),
                    "n_events", "sum_value"))
