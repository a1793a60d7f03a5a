"""Deterministic sampling for training-data mixing.

Data-mixture recipes ("use 20% of CommonCrawl, all of Wikipedia, ...")
need sampling that is (a) exactly reproducible across runs and engines,
(b) stable under repartitioning, and (c) a pure map over the scan — no
shuffle, no RNG state. The standard trick is a hash gate: keep a row iff
``hash(id) mod D`` falls below the stratum's threshold. Spark's
``xxhash64`` (XXH64, seed 42) is the gate hash; the DuckDB oracle replays
the identical hash from first principles (``oracle_xxh64.py``), which is
what makes the sample value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stratified_sample"]


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      group_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.5,
                      denom: int = 1000) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps group value -> keep fraction in [0, 1]. The gate key
    is the STRING form of the id (so external oracles can hash the same
    bytes). Per-mille resolution by default.
    """
    thresholds = F.lit(int(round(default_rate * denom)))
    for value, rate in sorted(rates.items()):
        thresholds = F.when(F.col(group_col) == value,
                            F.lit(int(round(rate * denom)))
                            ).otherwise(thresholds)
    gate = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(denom))
    return df.where(gate < thresholds)


def shard_assignment(df: DataFrame, n_shards: int = 32,
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard + within-shard position for training output
    layout: shard by hash gate, order within shard by (hash, id) — a
    reproducible pseudo-random global shuffle without a global sort.
    Each shard's window is independent, so the only shuffle is the
    hash-partition by shard and the per-shard sort parallelizes across
    executors at any corpus size."""
    from pyspark.sql.window import Window
    h = F.xxhash64(F.col(id_col).cast("string"))
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__h"), F.col(id_col)))
    return (df.select(F.col(id_col),
                      F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
                      h.alias("__h"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__h"))


def pack_sequences(df: DataFrame, budget: int, n_shards: int = 32,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Concat-then-split sequence packing (the GPT-style pretraining
    layout): within each shard, documents are laid out contiguously in
    deterministic pseudo-random order and the token stream is split into
    fixed-``budget`` sequences; a document may straddle a boundary.

    Returns (doc_id, shard, seq_in_shard, offset): the sequence index a
    doc STARTS in and its token offset within that sequence. All window
    math partitioned by shard — embarrassingly parallel, one shuffle."""
    from pyspark.sql.window import Window
    from carbonapi_spark.datapipe.text import token_count
    h = F.xxhash64(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
        h.alias("__h"),
        token_count(F.col(text_col)).cast("long").alias("__nt"))
    w = (Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("__nt").over(w) - F.col("__nt")).alias("__start")
    return (base.withColumn("__start", start)
            .select(id_col, "shard",
                    F.floor(F.col("__start") / budget).cast("long")
                    .alias("seq_in_shard"),
                    F.pmod(F.col("__start"), F.lit(budget)).cast("long")
                    .alias("offset")))


def chunk_documents(df: DataFrame, max_tokens: int = 128,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split every document into consecutive chunks of at most
    ``max_tokens`` whitespace tokens, preserving order — the
    context-window prep stage before embedding or training (each chunk
    becomes a unit for the similarity / packing ops downstream).

    Pure per-row array work (tokenize once, ``slice`` per chunk via one
    ``posexplode`` over the chunk count): a stateless projection with no
    shuffle at any corpus size, unlike ``pack_sequences`` which
    re-concatenates ACROSS documents and therefore must shuffle.
    Returns (doc_id, chunk_idx, n_tokens, text); empty docs yield no
    rows."""
    from carbonapi_spark.datapipe.text import tokens
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(max_tokens)).cast("int")
    # sequence(1, 0) DESCENDS in Spark, so 0-chunk (empty) docs need the
    # explicit empty array — posexplode then drops them entirely
    chunk_seq = F.when(n_chunks > 0, F.sequence(F.lit(1), n_chunks)) \
        .otherwise(F.array().cast("array<int>"))
    return (df.select(F.col(id_col), toks.alias("__t"), n.alias("__n"),
                      F.posexplode(chunk_seq)
                      .alias("chunk_idx", "__dummy"))
            .select(id_col,
                    F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.least(F.col("__n") - F.col("chunk_idx") * max_tokens,
                            F.lit(max_tokens)).cast("long")
                    .alias("n_tokens"),
                    F.array_join(
                        F.slice(F.col("__t"),
                                F.col("chunk_idx") * max_tokens + 1,
                                max_tokens), " ").alias(text_col)))
