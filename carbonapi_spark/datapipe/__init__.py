"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication, similarity search, text analysis,
multimodal plumbing. All DataFrame-native; Python only in clearly-marked
kernels."""

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure at least one partition per core before a CPU-heavy
    per-row expression (shingling, hashing, vector math).

    Small-file scans (one parquet file -> one task) serialize the whole
    expression on a single core; at lake scale the scan already has more
    partitions than cores and this is a no-op, so the repartition shuffle
    is only ever paid on inputs small enough for it to be cheap."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
