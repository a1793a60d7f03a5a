"""Request-scoped scratch caching.

Operators sometimes persist a small intermediate that the rest of their
plan references more than once (e.g. the candidate-pair table in
``datapipe.dedup.jaccard_verify``). A bare ``DataFrame.persist()`` never
leaves Spark's ``CacheManager``: in a long-lived service each request
leaks one cached-plan entry, storage memory fills with orphaned blocks,
and — worse — *every* subsequent query pays for it at planning time,
because ``CacheManager.useCachedData`` scans all registered entries for
subtree matches on every plan. Measured in this repo's bench: after ~200
query executions the per-query latency of unrelated plans had drifted
2-3x.

The fix is the same shape the reference uses for its per-request
fetch/response caches (``cache/cache.go``: caches are owned by the
request path and expire): a persisted scratch DataFrame is *tracked*,
and the request boundary (HTTP handler, bench harness, test fixture)
calls :func:`release` when the response has been materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the request boundary."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release() -> int:
    """Unpersist every tracked scratch DataFrame; returns how many."""
    n = len(_TRACKED)
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
    return n
