"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication, similarity search, text analysis,
multimodal plumbing. All DataFrame-native; Python only in clearly-marked
kernels."""

from pyspark.sql import DataFrame


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
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats()
                  .sizeInBytes())
        if est < min_bytes:
            return df
    except Exception:
        pass  # stats unavailable (e.g. Connect) — assume big
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
    try:
        est = int(gate_df._jdf.queryExecution().optimizedPlan().stats()
                  .sizeInBytes())
        if est < min_bytes:
            return df
    except Exception:
        pass  # stats unavailable — assume big, persist
    from carbonapi_spark import scratch
    return scratch.track(df)
