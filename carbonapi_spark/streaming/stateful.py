"""Custom stateful streaming operators via ``applyInPandasWithState``.

These are the operators Structured Streaming's built-in windowed
aggregations can't express: they need arbitrary per-key state carried
across micro-batches. Keyed state lives in the state store (checkpointed,
partitioned by key — scales horizontally with executors); the Python
kernel sees one Arrow batch per key per trigger.

The reference has no streaming machinery at all (its carbon daemons are
separate ingestion processes), so these extend the engine the way a
training-data pipeline needs: dedup on an unbounded document stream, and
counter->rate conversion that remembers the previous sample per series.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT = "h LONG, doc_id LONG"
DEDUP_STATE = "seen BYTE"

RATE_OUT = "name STRING, ts LONG, value DOUBLE"
RATE_STATE = "last_ts LONG, last_v DOUBLE"


def stream_dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       state_ttl_ms: int | None = None) -> DataFrame:
    """Exact dedup over an unbounded document stream: the first document
    per content hash is emitted, every later duplicate (same or any later
    micro-batch) is dropped.

    State per key is one byte; ``state_ttl_ms`` sets a processing-time
    timeout so keys idle longer than the TTL are evicted — the knob that
    bounds total state on an unbounded stream (re-admitting a duplicate
    only after the TTL, the standard streaming-dedup trade)."""

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        for pdf in pdfs:
            if len(pdf) and not seen:
                seen = True
                yield pd.DataFrame({"h": pdf["__h"].iloc[:1],
                                    "doc_id": pdf[id_col].iloc[:1]})
        if not state.exists:
            state.update((1,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    hashed = docs.withColumn("__h", F.xxhash64(F.col(text_col)))
    return (hashed.groupBy("__h")
            .applyInPandasWithState(fn, DEDUP_OUT, DEDUP_STATE,
                                    "append", timeout))


def stream_per_second(series: DataFrame) -> DataFrame:
    """Streaming ``perSecond()``: counter -> rate, remembering the previous
    (ts, value) sample per series across micro-batches. Negative deltas
    (counter reset) emit NaN-free nulls like the batch operator
    (reference perSecond/function.go:50: wraps are skipped).

    Input: streaming (name STRING, ts LONG, value DOUBLE)."""

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        last_ts, last_v = state.get if state.exists else (None, None)
        for pdf in pdfs:
            # NULL samples arrive in the DOUBLE column as NaN — notna()
            # drops both, so a gap never overwrites the last good sample
            # (batch perSecond skips nulls the same way).
            valid = pdf[pdf["value"].notna()].sort_values("ts")
            if not len(valid):
                continue
            ts = valid["ts"].to_numpy()
            v = valid["value"].astype("float64").to_numpy()
            if last_ts is not None:
                ts = np.concatenate(([last_ts], ts))
                v = np.concatenate(([last_v], v))
            dts = np.diff(ts)
            dv = np.diff(v)
            # wraps (counter reset) and non-advancing timestamps skip
            # emission but still advance the last-sample seam
            mask = (dts > 0) & (dv >= 0)
            if mask.any():
                yield pd.DataFrame({"name": key[0], "ts": ts[1:][mask],
                                    "value": dv[mask] / dts[mask]})
            last_ts, last_v = int(ts[-1]), float(v[-1])
        if last_ts is not None:
            state.update((int(last_ts), float(last_v)))

    return (series.groupBy("name")
            .applyInPandasWithState(fn, RATE_OUT, RATE_STATE,
                                    "append", GroupStateTimeout.NoTimeout))
