"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication, similarity search, text analysis,
multimodal plumbing. All DataFrame-native; Python only in clearly-marked
kernels."""

import logging

from pyspark.sql import DataFrame, functions as F

_log = logging.getLogger(__name__)
# Diagnostic counter: how often the Catalyst size-estimate probe failed and
# a gate fell through to its conservative side.  A Spark upgrade that breaks
# the private _jdf/queryExecution route would flip every gated call site to
# the lake-scale path silently — the counter (and a one-time warning) makes
# that observable instead.
_stats_probe_failures = 0
_warned_probe_failure = False


_SIZE_SUFFIXES = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
                  "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30,
                  "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
                  "p": 1 << 50, "pb": 1 << 50}


def _parse_byte_size(value: str, default: int = 134217728) -> int:
    """Spark byte-size conf parser ('134217728', '128m', '512K',
    '1gb'…), matching JavaUtils.byteStringAsBytes's suffix table.  Any
    unparsable value falls back to ``default`` (the conservative path —
    a crash here would take every ``spread()`` caller down with it)."""
    try:
        s = str(value).strip().lower()
        i = len(s)
        while i > 0 and not s[i - 1].isdigit():
            i -= 1
        return int(s[:i]) * _SIZE_SUFFIXES[s[i:].strip()]
    except (ValueError, KeyError, IndexError):
        return default


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate, or None if unavailable.

    Reaches into the private ``_jdf.queryExecution`` API (no public stats
    route exists as of Spark 4.1); every failure is counted and the first
    one logged so a behavior flip after an upgrade is visible."""
    global _stats_probe_failures, _warned_probe_failure
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
    except Exception as e:
        _stats_probe_failures += 1
        if not _warned_probe_failure:
            _warned_probe_failure = True
            _log.warning(
                "Catalyst size-estimate probe failed (%s); size-gated "
                "spread/persist/broadcast heuristics will take their "
                "conservative lake-scale side for this session", e)
        return None


def spread(df: DataFrame, min_bytes: int = 8 << 20) -> DataFrame:
    """Ensure at least one partition per core before a CPU-heavy
    per-row expression (shingling, hashing, vector math).

    Small-file scans (one parquet file -> one task) serialize the whole
    expression on a single core; at lake scale the scan already has more
    partitions than cores and this is a no-op, so the repartition shuffle
    is only ever paid on inputs small enough for it to be cheap.

    Gated on the Catalyst size estimate: below ``min_bytes`` the
    serialized expression work is cheaper than the exchange it would
    take to parallelize it, so tiny inputs pass through untouched.
    ``min_bytes`` is tuned PER CALL SITE by the per-row cost of the
    expression the exchange parallelizes (A/B'd at sf0.1, min-of-3,
    same session): heavy interpreted n-gram HOF pipelines
    (shingling/minhash/repetition/contamination) win from spreading even
    ~600 KB inputs (e.g. rep_filters 1.88 -> 0.99 s), so they pass
    256 KB; cheap split/posexplode pipelines (line_dedup 0.42 vs
    0.91 s, ppl_buckets, substr spans) keep the 8 MB default. The
    500k-doc smoke sits far above every gate. Unknown estimates
    (non-scan roots without stats) fall through to the repartition
    check, the conservative side."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    est = _plan_size_bytes(df)
    if est is not None:
        if est < min_bytes:
            return df
        # Above the gate with a known size: estimate the scan's partition
        # count arithmetically (est / maxPartitionBytes) instead of
        # forcing physical-plan translation via ``df.rdd`` — at lake
        # scale the scan already yields >= target partitions and the
        # repartition must NOT fire (it would add a full-corpus shuffle).
        mpb = _parse_byte_size(df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"))
        if est >= target * mpb:
            return df
        return df.repartition(target)
    # stats unavailable (e.g. Connect) — fall back to the physical count
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def track_if_large(df: DataFrame, gate_df: DataFrame,
                   min_bytes: int = 64 << 20) -> DataFrame:
    """Persist ``df`` through the request-scoped scratch registry ONLY
    when ``gate_df`` (the corpus input feeding the pipeline that
    produces ``df``) is big enough for recomputation to cost more than
    the persist round-trip.

    The dual of ``spread``'s gate: a doubly-referenced derived table is
    cheaper to RECOMPUTE than to cache at bench scale (A/B at sf0.1,
    same session, min-of-4: ppl_buckets 0.76 s recomputed vs 1.17 s
    persisted — the materialization barrier serializes what lazy
    evaluation overlaps), but at lake scale the pipeline below it is a
    full corpus pass and recomputing doubles the dominant cost.  Unknown
    size estimates persist — the conservative side at scale."""
    est = _plan_size_bytes(gate_df)
    if est is not None and est < min_bytes:
        return df
    from carbonapi_spark import scratch
    return scratch.track(df)


def bcast_if_small(df: DataFrame, gate_df: DataFrame,
                   min_bytes: int = 1 << 30) -> DataFrame:
    """Apply an explicit ``F.broadcast`` hint ONLY while the corpus
    feeding ``df`` is small enough that the derived table (a count /
    vocab / statistics table, sublinear in the corpus) is safely
    driver-sized.

    An unconditional hint overrides ``spark.sql.autoBroadcastJoinThreshold``
    and, past the point the table outgrows the driver, degrades to an OOM
    rather than a shuffle join.  Gating on the CORPUS size (the same
    philosophy as ``track_if_large``) keeps the hint — and the measured
    bench plan — at test scale, and lets Catalyst/AQE decide from actual
    runtime sizes at lake scale, where AQE's broadcast promotion picks the
    hint back up whenever the built table really is small."""
    est = _plan_size_bytes(gate_df)
    if est is None or est >= min_bytes:
        return df
    return F.broadcast(df)
