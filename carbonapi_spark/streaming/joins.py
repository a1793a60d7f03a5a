"""Stream-stream joins: watermarked interval (range) joins between two
live streams — the Structured Streaming surface the stateful-kernel
replays don't cover.

Spark's stream-stream inner join buffers BOTH sides in the state store
and needs two things to bound that state at 100 TB/day rates: a
watermark on each side (how late events may arrive) and a time-range
join condition (how far apart matched events may be).  Given both,
each side's state is evicted once the other side's watermark passes
the range — state is O(rate x (watermark + range)), independent of
stream lifetime.  Without the range condition an INNER join still
runs but its state store grows forever (Spark only warns), and OUTER
joins are rejected outright; both behaviors are pinned in
tests/test_stream_join.py — always pass the range.

Reference parity note: the reference engine (go-graphite/carbonapi)
has no streaming joins; this belongs to the training-data/event
pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame,
                         by: str, left_ts: str, right_ts: str,
                         lookback_s: int,
                         watermark_s: int = 3600) -> DataFrame:
    """Inner-join two streams on ``by`` where the right event falls in
    ``[left_ts - lookback_s, left_ts]`` (e.g. "views in the 24 h before
    each purchase").  Both inputs must carry a TimestampType event-time
    column (``left_ts`` / ``right_ts``); all other column names must be
    disjoint between the two sides.

    The equality key rides in the join condition, so the shuffle is
    hash-partitioned on ``by`` and each state-store instance holds only
    its key range — the standard scalable stream-join layout.  Results
    emit eagerly per micro-batch (inner join), while eviction follows
    the combined watermark + range bound.
    """
    lw = left.withWatermark(left_ts, f"{watermark_s} seconds")
    rw = right.withWatermark(right_ts, f"{watermark_s} seconds")
    cond = ((lw[by] == rw[by])
            & (rw[right_ts] >= lw[left_ts]
               - F.expr(f"INTERVAL {int(lookback_s)} SECONDS"))
            & (rw[right_ts] <= lw[left_ts]))
    return lw.join(rw, cond, "inner").drop(rw[by])
