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

__all__ = ["stratified_sample", "temperature_mix", "shard_assignment",
           "pack_sequences", "chunk_documents", "dsir_log_ratio_table",
           "dsir_weights", "dsir_sample", "write_training_shards"]


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


def _shard_layout(df: DataFrame, n_shards: int, id_col: str):
    """(df + shard column, per-shard order window): the ONE definition
    of the deterministic shard hash and within-shard order shared by
    shard_assignment, pack_sequences, and write_training_shards — a
    drift in any copy would silently desynchronize the written shard
    files from the order readers recover via shard_assignment."""
    from pyspark.sql.window import Window
    h = F.xxhash64(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    out = (df.withColumn("shard",
                         F.pmod(h, F.lit(n_shards)).cast("long"))
           .withColumn("__h", h))
    return out, w


def shard_assignment(df: DataFrame, n_shards: int = 32,
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard + within-shard position for training output
    layout: shard by hash gate, order within shard by (hash, id) — a
    reproducible pseudo-random global shuffle without a global sort.
    Each shard's window is independent, so the only shuffle is the
    hash-partition by shard and the per-shard sort parallelizes across
    executors at any corpus size."""
    base, w = _shard_layout(df.select(id_col), n_shards, id_col)
    return (base.withColumn("pos", F.row_number().over(w).cast("long"))
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
    base, w0 = _shard_layout(
        df.select(F.col(id_col),
                  token_count(F.col(text_col)).cast("long").alias("__nt")),
        n_shards, id_col)
    w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = (F.sum("__nt").over(w) - F.col("__nt")).alias("__start")
    return (base.withColumn("__start", start)
            .select(id_col, "shard",
                    F.floor(F.col("__start") / budget).cast("long")
                    .alias("seq_in_shard"),
                    F.pmod(F.col("__start"), F.lit(budget)).cast("long")
                    .alias("offset")))


def temperature_mix(df: DataFrame, group_col: str = "lang",
                    alpha: float = 0.5, id_col: str = "doc_id",
                    denom: int = 1_000_000) -> DataFrame:
    """Temperature-scaled domain mixing: subsample each group so kept
    counts are proportional to n_d^alpha — the multilingual-LM sampling
    recipe (mT5 / XLM-R style exponential smoothing: alpha=1 keeps the
    natural distribution, alpha->0 flattens toward uniform). Unlike
    ``stratified_sample`` the rates are DATA-DERIVED: keep rate
    r_d = (n_d / n_min)^(alpha-1), so the smallest group keeps
    everything and larger groups are damped.

    Scale shape: one group-count aggregation (group-cardinality-sized,
    broadcast back with its 1-row min), then the same deterministic
    xxhash64-mod gate as ``stratified_sample`` — a pure map over the
    scan, reproducible across runs, engines, and repartitioning.
    Returns the kept rows of ``df``."""
    from pyspark.sql.window import Window
    # NULL group values are a real group (unclassified docs): an inner
    # equi-join on the raw column would silently drop the whole NULL
    # slice — even at alpha=1 where the contract keeps everything. The
    # count and the join key on (coalesced value, is-null flag), which
    # is collision-free (a sentinel string could collide with a real
    # group value and merge two strata)
    gkey = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    gnull = F.col(group_col).isNull()
    counts = (df.groupBy(gkey.alias("__gk"), gnull.alias("__gnull"))
              .agg(F.count(F.lit(1)).alias("__n")))
    # n_min via a global window OVER THE COUNTS TABLE (group-cardinality
    # rows, so the single-partition move is trivial) — a separate
    # counts.agg() would re-execute the groupBy and scan the corpus a
    # second time
    nmin = F.min("__n").over(Window.partitionBy())
    rates = counts.select("__gk", "__gnull",
                          F.round(F.pow(F.col("__n") / nmin,
                                        F.lit(alpha - 1.0)) * denom)
                          .cast("long").alias("__thresh"))
    gate = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(denom))
    return (df.withColumn("__gk", gkey).withColumn("__gnull", gnull)
            .join(F.broadcast(rates), ["__gk", "__gnull"])
            .where(gate < F.col("__thresh"))
            .drop("__thresh", "__gk", "__gnull"))


def _hashed_buckets(df: DataFrame, text_col: str, id_col: str,
                    n_buckets: int) -> DataFrame:
    """(id, bucket) rows: every word unigram AND bigram of the lowercased
    token stream hashed into ``n_buckets`` (DSIR's hashed n-gram
    features, occurrences kept — counts matter)."""
    from carbonapi_spark.datapipe import spread
    from carbonapi_spark.datapipe.text import tokens, word_ngrams
    df = spread(df, min_bytes=256 << 10)  # n-gram HOF: heavy per row
    grams = F.concat(tokens(F.lower(F.col(text_col))),
                     word_ngrams(F.col(text_col), 2))
    return (df.select(F.col(id_col), F.explode(grams).alias("__g"))
            .select(id_col,
                    F.pmod(F.xxhash64("__g"), F.lit(n_buckets))
                    .alias("bucket")))


def dsir_log_ratio_table(target: DataFrame, raw: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n_buckets: int = 10_000, alpha: float = 0.5,
                         raw_buckets: DataFrame | None = None
                         ) -> DataFrame:
    """(bucket, logr): smoothed per-bucket log(p_target / p_raw) over
    hashed n-gram features — the importance-weight table of DSIR (Xie et
    al., "Data Selection for Language Models via Importance Resampling",
    NeurIPS 2023). Both feature distributions are bag-of-hashed-ngrams
    (the paper's sec. 3 estimator); smoothing is add-``alpha`` over the
    ``n_buckets`` feature space.

    Scale shape: two exploded hash aggregations, each bounded at
    ``n_buckets`` rows regardless of corpus size (map-side combined);
    totals ride along as broadcast 1-row aggregates. The result is
    feature-space-sized — broadcast it against the corpus to score
    (``dsir_weights``), the same economy as ``unigram_logprob_table``.
    Buckets unseen in the raw side cannot occur in raw docs, so the
    table is keyed by the raw side's buckets (left-join target counts).

    Pass a precomputed ``raw_buckets`` (the ``_hashed_buckets`` output
    for ``raw``) to share the feature explode with a downstream scoring
    stage — ``dsir_sample`` does, saving one full corpus pass."""
    from carbonapi_spark import scratch
    t = scratch.track(
        _hashed_buckets(target, text_col, id_col, n_buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("__tn")))
    if raw_buckets is None:
        raw_buckets = _hashed_buckets(raw, text_col, id_col, n_buckets)
    r = scratch.track(
        raw_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("__rn")))
    tt = t.agg(F.sum("__tn").alias("__tt"))
    rt = r.agg(F.sum("__rn").alias("__rt"))
    return (r.join(t, "bucket", "left")
            .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(rt))
            .select("bucket",
                    (F.log((F.coalesce("__tn", F.lit(0)) + F.lit(alpha))
                           / (F.col("__tt") + alpha * n_buckets))
                     - F.log((F.col("__rn") + F.lit(alpha))
                             / (F.col("__rt") + alpha * n_buckets)))
                    .alias("logr")))


def dsir_weights(raw: DataFrame, table: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n_buckets: int = 10_000,
                 raw_buckets: DataFrame | None = None) -> DataFrame:
    """(id, log_weight) for every raw doc: sum of the broadcast
    log-ratio table over the doc's hashed n-gram occurrences (DSIR's
    log importance weight). Docs with no features weigh 0. One broadcast
    join + one per-doc aggregation — the corpus never shuffles except on
    its own doc key."""
    if raw_buckets is None:
        raw_buckets = _hashed_buckets(raw, text_col, id_col, n_buckets)
    scored = (raw_buckets
              .join(F.broadcast(table), "bucket")
              .groupBy(id_col)
              .agg(F.sum("logr").alias("__lw")))
    return (raw.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.round(F.coalesce("__lw", F.lit(0.0)), 6)
                    .alias("log_weight")))


def dsir_sample(raw: DataFrame, target: DataFrame, n: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 10_000, alpha: float = 0.5,
                gumbel_denom: int = 1_000_000) -> DataFrame:
    """Select ``n`` raw docs by Gumbel-top-k importance resampling —
    DSIR end to end: score every raw doc against the target distribution
    (``dsir_weights``), perturb with deterministic Gumbel noise, keep
    the global top ``n``. Sampling WITHOUT replacement with probability
    proportional to the importance weight is exactly Gumbel-top-k on
    log-weights (the paper's sampling step, derandomized).

    The noise is a hash gate, not an RNG: u = (xxhash64(id) mod D + 0.5)
    / D, g = -ln(-ln(u)) — reproducible across runs, engines, and
    repartitioning, like ``stratified_sample``'s gate. The selection is
    a global top-n (TakeOrdered: per-partition partial top-n, no global
    sort shuffle). Returns (id, log_weight, key) for the selected docs,
    highest key first replayable as ORDER BY key DESC, id LIMIT n."""
    from carbonapi_spark.datapipe import track_if_large
    # the raw feature explode is the dominant corpus pass and feeds
    # BOTH the ratio table and the per-doc scoring — compute it once
    bk = track_if_large(
        _hashed_buckets(raw, text_col, id_col, n_buckets), raw)
    table = dsir_log_ratio_table(target, raw, text_col, id_col,
                                 n_buckets, alpha, raw_buckets=bk)
    wts = dsir_weights(raw, table, text_col, id_col, n_buckets,
                       raw_buckets=bk)
    u = ((F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                 F.lit(gumbel_denom)) + F.lit(0.5)) / F.lit(gumbel_denom))
    gumbel = -F.log(-F.log(u))
    return (wts.select(id_col, "log_weight",
                       F.round(F.col("log_weight") + gumbel, 6)
                       .alias("key"))
            .orderBy(F.desc("key"), F.col(id_col))
            .limit(n))


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


def write_training_shards(df: DataFrame, path: str, n_shards: int = 32,
                          id_col: str = "doc_id",
                          fmt: str = "parquet",
                          manifest: bool = False,
                          text_col: str = "text") -> None:
    """Materialize a training-ready shard layout: rows get their
    deterministic ``shard_assignment`` shard + position, then land in
    one directory per shard (``shard=N/``) ordered by position — the
    output contract of a pretraining data loader (fixed shard count,
    reproducible order, no global sort).

    ONE hash-partition shuffle by shard: shard and position are computed
    inline on the full rows (same hash/order math as
    ``shard_assignment`` — the round-trip test pins the equality), so
    the corpus is never join-shuffled by id first. The per-shard
    row_number window reuses the repartition's partitioning, and
    ``sortWithinPartitions`` keeps the write order without a global
    exchange. Readers recover the exact order with
    ``spark.read...orderBy(shard, pos)``."""
    base, w = _shard_layout(df, n_shards, id_col)
    out = (base.repartition(n_shards, F.col("shard"))
           .withColumn("pos", F.row_number().over(w).cast("long"))
           .drop("__h")
           .sortWithinPartitions("shard", "pos"))
    (out.write.mode("overwrite").partitionBy("shard").format(fmt)
     .save(path))
    if manifest:
        # Per-shard audit record written NEXT TO the shards: row/token
        # counts plus an order-insensitive content checksum (bit_xor of
        # id-salted xxhash64 — deterministic, mergeable, overflow-free
        # under ANSI mode where a sum of hashes throws), so
        # a reader can verify a shard set without re-reading the corpus
        # of origin.  Derived from the WRITTEN files, not the input
        # lineage: the manifest certifies what actually landed on disk.
        from carbonapi_spark.datapipe.text import token_count
        written = df.sparkSession.read.format(fmt).load(path)
        man = (written.groupBy("shard")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum(token_count(F.col(text_col)).cast("long"))
                    .alias("n_tokens"),
                    F.bit_xor(F.xxhash64(F.concat(
                        F.lit("ck:"), F.col(id_col).cast("string"))))
                    .alias("checksum")))
        (man.coalesce(1).write.mode("overwrite")
         .parquet(f"{path}_manifest"))


def verify_training_shards(spark, path: str, id_col: str = "doc_id",
                           text_col: str = "text",
                           fmt: str = "parquet") -> DataFrame:
    """Recompute each shard's manifest record from the files and diff it
    against the stored manifest: returns rows that DISAGREE (empty =
    shard set intact).  The cheap integrity gate run before a training
    job burns cluster-hours on a silently truncated shard."""
    from carbonapi_spark.datapipe.text import token_count
    written = spark.read.format(fmt).load(path)
    actual = (written.groupBy("shard")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum(token_count(F.col(text_col)).cast("long"))
                   .alias("n_tokens"),
                   F.bit_xor(F.xxhash64(F.concat(
                       F.lit("ck:"), F.col(id_col).cast("string"))))
                   .alias("checksum")))
    stored = spark.read.parquet(f"{path}_manifest")
    return (actual.alias("a")
            .join(stored.alias("s"), "shard", "full")
            .where((F.col("a.n_rows").eqNullSafe(F.col("s.n_rows"))
                    & F.col("a.n_tokens").eqNullSafe(F.col("s.n_tokens"))
                    & F.col("a.checksum").eqNullSafe(F.col("s.checksum")))
                   == F.lit(False))
            .select("shard"))


def train_val_test_split(df: DataFrame, val: float = 0.01,
                         test: float = 0.01, id_col: str = "doc_id",
                         seed: str = "split") -> DataFrame:
    """Deterministic hash split: every row gets a ``split`` label
    ('train' | 'val' | 'test') from an xxhash64 bucket of its id — the
    reproducible corpus split (same id -> same split on any cluster, any
    partitioning, any day; growing the corpus never reassigns old rows,
    unlike randomSplit whose assignment depends on partition layout).

    A pure stateless projection over the scan — no shuffle, no RNG; the
    salt string isolates this split from the other hash gates."""
    if val < 0 or test < 0 or val + test >= 1:
        raise ValueError("need val, test >= 0 with val + test < 1")
    return df.withColumn("split",
                         split_label(F.col(id_col), val, test, seed))


def split_label(id_col, val: float = 0.01, test: float = 0.01,
                seed: str = "split"):
    """The split gate as a pure COLUMN EXPRESSION — the stateless hash
    bucket behind :func:`train_val_test_split`, factored out so audits
    (e.g. ``split_leakage``) can derive a pair's two splits without
    joining a corpus-sized assignment table."""
    from pyspark.sql import functions as F
    bucket = F.pmod(F.xxhash64(F.concat(F.lit(seed + ":"),
                                        id_col.cast("string"))),
                    F.lit(1_000_000))
    v_cut = int(val * 1_000_000)
    t_cut = v_cut + int(test * 1_000_000)
    return (F.when(bucket < v_cut, F.lit("val"))
            .when(bucket < t_cut, F.lit("test"))
            .otherwise(F.lit("train")))


def pack_best_fit(df: DataFrame, budget: int, n_shards: int = 32,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Best-fit-decreasing sequence packing (the SFT/finetuning layout:
    documents may NOT straddle sequence boundaries, so the packer solves
    a bin-packing instance per shard — Krell et al. 2021, "Efficient
    Sequence Packing without Cross-contamination", describe the recipe).

    Docs longer than ``budget`` are truncated to one full bin (flagged
    ``truncated``).  Within a shard, docs are processed longest-first
    (ties by id) and each goes to the fullest bin it still fits in —
    classic BFD, within 11/9 OPT + 1 bins of optimal.

    Physical shape: the per-shard packing is inherently sequential, so
    it runs as ONE ``applyInPandas`` kernel per shard over (id, n_tokens)
    pairs — metadata-sized rows (the text itself never enters the
    kernel), embarrassingly parallel across shards, one shuffle.  Not
    SQL-replayable (the bin state is a loop) — correctness is pinned by
    the pure-Python reference replay and invariant tests in pytest."""
    import pandas as pd

    from carbonapi_spark.datapipe.text import token_count

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__nt", id_col],
                              ascending=[False, True], ignore_index=True)
        bins: list[int] = []   # remaining capacity per bin
        out_bin, out_off, out_trunc = [], [], []
        for nt in pdf["__nt"]:
            n = int(min(nt, budget))
            best, best_rem = -1, budget + 1
            for b, rem in enumerate(bins):
                if n <= rem < best_rem:
                    best, best_rem = b, rem
            if best < 0:
                bins.append(budget)
                best = len(bins) - 1
            out_bin.append(best)
            out_off.append(budget - bins[best])
            out_trunc.append(bool(nt > budget))
            bins[best] -= n
        return pd.DataFrame({
            id_col: pdf[id_col], "shard": pdf["shard"],
            "seq_in_shard": out_bin, "offset": out_off,
            "n_tokens": pdf["__nt"].clip(upper=budget),
            "truncated": out_trunc})

    base, _ = _shard_layout(
        df.select(F.col(id_col),
                  token_count(F.col(text_col)).cast("long").alias("__nt")),
        n_shards, id_col)
    schema = (f"{id_col} long, shard long, seq_in_shard long, "
              f"offset long, n_tokens long, truncated boolean")
    return (base.select(id_col, "shard", "__nt")
            .groupBy("shard").applyInPandas(pack, schema))


def unimax_allocation(df: DataFrame, group_col: str = "lang",
                      budget: int = 1000,
                      max_epochs: int = 2) -> DataFrame:
    """Closed-form UniMax budget allocation (Chung et al., "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", ICLR 2023): distribute ``budget`` docs
    across groups as uniformly as possible, but no group contributes
    more than ``max_epochs`` passes over its own data.

    The paper's greedy loop (ascending corpus size, each language takes
    min(cap, remaining/remaining_langs)) has a water-filling closed
    form: with caps c_l = max_epochs * n_l sorted ascending, the capped
    languages form a prefix — exactly those with
    c_j * (k - j + 1) <= budget - prefix_sum(c_1..c_{j-1}) — and every
    uncapped language gets the water level
    t = (budget - prefix_sum(capped)) / n_uncapped.  That turns the loop
    into two window functions over the GROUP-COUNT table (one bounded
    aggregation over the corpus, then group-cardinality rows — the same
    economy as ``temperature_mix``), and the capped test is pure integer
    arithmetic so the allocation replays exactly in any engine.

    Returns (group, n_docs, alloc, epochs): ``alloc`` the (possibly
    fractional) docs-equivalent allocation with sum(alloc) =
    min(budget, sum(caps)), ``epochs = alloc / n_docs <= max_epochs``.
    NULL groups are a real group, same contract as ``temperature_mix``."""
    from pyspark.sql.window import Window
    gkey = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    gnull = F.col(group_col).isNull()
    counts = (df.groupBy(gkey.alias("__gk"), gnull.alias("__gnull"))
              .agg(F.count(F.lit(1)).alias("n_docs")))
    cap = (F.col("n_docs") * max_epochs).alias("__cap")
    # deterministic total order: cap, then group key (ties can't flip
    # the capped prefix, but a stable order keeps prefix sums exact)
    w = Window.partitionBy().orderBy("__cap", "__gk")
    rn = F.row_number().over(w)
    pre = (F.sum("__cap").over(w.rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow))
           - F.col("__cap"))
    k = F.count(F.lit(1)).over(Window.partitionBy())
    annotated = (counts.select("__gk", "__gnull", "n_docs", cap)
                 .select("__gk", "__gnull", "n_docs", "__cap",
                         rn.alias("__rn"), pre.alias("__pre"),
                         k.alias("__k"))
                 .withColumn("__capped",
                             F.col("__cap") * (F.col("__k")
                                               - F.col("__rn") + 1)
                             <= F.lit(budget) - F.col("__pre")))
    wall = Window.partitionBy()
    jstar = F.sum(F.when(F.col("__capped"), 1).otherwise(0)).over(wall)
    capped_sum = F.sum(F.when(F.col("__capped"), F.col("__cap"))
                       .otherwise(F.lit(0))).over(wall)
    level = ((F.lit(budget) - capped_sum).cast("double")
             / (F.col("__k") - jstar).cast("double"))
    alloc = F.when(F.col("__capped"), F.col("__cap").cast("double")) \
             .otherwise(level)
    out_group = F.when(F.col("__gnull"), F.lit(None).cast("string")) \
                 .otherwise(F.col("__gk"))
    return (annotated
            .select(out_group.alias(group_col), "n_docs",
                    F.round(alloc, 6).alias("alloc"),
                    F.round(alloc / F.col("n_docs"), 6).alias("epochs")))


def unimax_sample(df: DataFrame, group_col: str = "lang",
                  budget: int = 1000, max_epochs: int = 2,
                  id_col: str = "doc_id",
                  denom: int = 1_000_000) -> DataFrame:
    """Doc-level realization of ``unimax_allocation``: every doc of
    ``df`` gains an integer ``copies`` count (how many times it enters
    the mixed corpus) with E[copies] = its group's ``epochs`` and
    sum(copies) ~ budget; docs with copies = 0 are dropped.

    copies = floor(epochs) + [gate < frac(epochs)] with the same
    derandomized xxhash64-mod gate as ``stratified_sample`` — no RNG,
    reproducible across engines and repartitioning, and the broadcast
    allocation table keeps this a pure map over the corpus scan."""
    allocation = unimax_allocation(df, group_col, budget, max_epochs)
    gkey = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    gnull = F.col(group_col).isNull()
    akey = F.coalesce(F.col(f"__a_{group_col}").cast("string"), F.lit(""))
    anull = F.col(f"__a_{group_col}").isNull()
    alloc = allocation.select(
        F.col(group_col).alias(f"__a_{group_col}"), "epochs")
    base = F.floor("epochs").cast("long")
    frac = F.col("epochs") - F.floor("epochs")
    gate = F.pmod(F.xxhash64(F.concat(F.lit("unimax:"),
                                      F.col(id_col).cast("string"))),
                  F.lit(denom))
    copies = base + (gate < F.round(frac * denom).cast("long")).cast("long")
    return (df.join(F.broadcast(alloc),
                    (gkey == akey) & (gnull == anull))
            .withColumn("copies", copies)
            .where(F.col("copies") > 0)
            .drop(f"__a_{group_col}", "epochs"))


def weighted_sample(df: DataFrame, weight_col: str, n: int,
                    id_col: str = "doc_id",
                    denom: int = 1_000_000) -> DataFrame:
    """Weighted sampling without replacement, derandomized: select ``n``
    rows with inclusion probability proportional to ``weight_col`` via
    the Efraimidis-Spirakis key (Efraimidis & Spirakis 2006, "Weighted
    random sampling with a reservoir") — key = ln(u) / w, keep the n
    largest.  The length-weighted variant (w = n_chars) makes a doc
    sample token-budget-unbiased instead of doc-count-unbiased.

    u is the same hash gate as ``dsir_sample``'s Gumbel noise
    (u = (xxhash64('wrs:' || id) mod D + 0.5) / D), so the sample is
    reproducible across runs, engines, and repartitioning, and the
    selection is a TakeOrdered top-n (per-partition partial top-n, no
    global sort shuffle).  Rows with non-positive weight are excluded
    (they cannot carry probability mass).  Returns (id, weight, key),
    highest key first — replayable as ORDER BY key DESC, id LIMIT n."""
    w = F.col(weight_col).cast("double")
    u = ((F.pmod(F.xxhash64(F.concat(F.lit("wrs:"),
                                     F.col(id_col).cast("string"))),
                 F.lit(denom)) + F.lit(0.5)) / F.lit(denom))
    return (df.where(w > 0)
            .select(F.col(id_col), F.col(weight_col).alias("weight"),
                    F.round(F.log(u) / w, 6).alias("key"))
            .orderBy(F.desc("key"), F.col(id_col))
            .limit(n))


def budget_select(df: DataFrame, score_col: str, budget: int,
                  tokens_col: str, id_col: str = "doc_id",
                  n_buckets: int = 64) -> DataFrame:
    """Token-budget greedy data selection: rank documents by
    (``score_col`` DESC, ``id_col`` ASC) and keep the maximal prefix
    whose cumulative ``tokens_col`` stays within ``budget`` — the
    standard "fill the training budget with the best-scoring data
    first" curation step (the selection rule behind quality-classifier
    top-p corpus cuts, phrased in tokens because training cost is).

    Both inputs must be exact integers (the catalog feeds the
    ``quality_logit_micro`` BIGINT score and a whitespace token count),
    so every cumulative sum — and therefore the selection boundary —
    is summation-order-independent and replays bit-for-bit in SQL.

    The cumulative sum is TWO-LEVEL, never a single-partition window
    (the ``roc_auc`` rank pattern): ``percentile_approx`` cutoffs range
    scores into ``n_buckets`` sketch-balanced buckets (the boundaries
    only choose the partitioning — bucket offsets restore the exact
    global prefix sum), the running window partitions BY bucket, and
    per-bucket offsets come from an ``n_buckets``-row broadcast.  At
    lake scale the sort is n_buckets parallel bucket-local sorts
    instead of one corpus-sized task.  Returns the selected rows as
    (id, score, n_tokens, cum_tokens), cum_tokens inclusive.
    """
    from pyspark.sql.window import Window

    from carbonapi_spark import scratch

    base = scratch.track(
        df.select(F.col(id_col), F.col(score_col).alias("__s"),
                  F.col(tokens_col).cast("long").alias("n_tokens")))
    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts = base.agg(F.percentile_approx(F.col("__s").cast("double"), qs,
                                        F.lit(10000)).alias("__cuts"))
    # bucket = #cutoffs strictly ABOVE the score: bucket 0 holds the
    # best scores, ties share a bucket, and bucket order == rank order
    bkt = F.size(F.filter(F.col("__cuts"),
                          lambda t: t > F.col("__s").cast("double")))
    gb = base.crossJoin(F.broadcast(cuts)).select(
        id_col, "__s", "n_tokens", bkt.alias("__bkt"))
    offs = (gb.groupBy("__bkt").agg(F.sum("n_tokens").alias("__bn"))
            .select("__bkt",
                    (F.sum("__bn").over(
                        Window.partitionBy().orderBy("__bkt")
                        .rowsBetween(Window.unboundedPreceding,
                                     Window.currentRow))
                     - F.col("__bn")).alias("__off")))
    w = Window.partitionBy("__bkt") \
        .orderBy(F.desc("__s"), F.asc(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (F.col("__off") + F.sum("n_tokens").over(w)).alias("cum_tokens")
    return (gb.join(F.broadcast(offs), "__bkt")
            .select(id_col, F.col("__s").alias(score_col), "n_tokens", cum)
            .where(F.col("cum_tokens") <= budget))


def curriculum_order(df: DataFrame, score_col: str, n_buckets: int = 4,
                     id_col: str = "doc_id",
                     exact: bool = True) -> DataFrame:
    """Curriculum training order (Bengio et al., "Curriculum Learning",
    ICML 2009): bucket documents by an easiness score (ascending —
    bucket 1 is easiest) and emit a deterministic epoch order that
    walks the buckets round-robin, one document at a time, shuffled
    within each bucket by the ``xxhash64(id)`` gate.  The interleave
    exposes the model to mostly-easy data first while keeping every
    batch mixed — the practical curriculum shape, as opposed to a hard
    easy-then-hard sort.

    NO GLOBAL SORT: bucket boundaries come from the one-pass quantile
    cutoffs (``quantile_thresholds``; exact percentile == DuckDB
    quantile_cont, or the sketch at 100 TB scale), bucketing is a
    broadcast map, the rank window partitions BY bucket, and the final
    key is arithmetic — rank*K + bucket is unique (it determines
    bucket mod K and rank) and needs no cross-bucket pass.  Returns
    (id, score, bucket, curriculum_rank); train in ascending
    curriculum_rank order."""
    from pyspark.sql.window import Window

    from carbonapi_spark.datapipe.text import (bucket_by_thresholds,
                                               quantile_thresholds)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    base = df.select(F.col(id_col), F.col(score_col))
    thr = quantile_thresholds(base, score_col, qs, exact=exact)
    bucketed = bucket_by_thresholds(base, score_col, thr)
    h = F.xxhash64(F.col(id_col).cast("string"))
    w = Window.partitionBy("bucket").orderBy(h.asc(), F.col(id_col).asc())
    rk = F.row_number().over(w)
    return (bucketed
            .select(id_col, score_col, "bucket",
                    ((rk - F.lit(1)) * F.lit(n_buckets)
                     + F.col("bucket")).cast("long")
                    .alias("curriculum_rank")))
