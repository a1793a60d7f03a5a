"""Sketch-accelerated corpus statistics.

Count-min sketch (Cormode & Muthukrishnan 2005) as a SHUFFLE PRUNER for
heavy-hitter term counting: the classic two-pass distributed heavy-hitters
recipe where pass 1 builds a fixed-size (d x w) counter table and pass 2
exact-counts only the terms the sketch cannot rule out.  Because CMS only
ever OVER-estimates (every counter a term hashes to includes all of its own
occurrences), filtering the token stream on ``min_over_depths(counter) >=
threshold`` has NO false negatives — so the final exact count + HAVING
filter returns EXACTLY the true heavy-hitter set, and the DuckDB oracle is
plain exact SQL with no sketch replay needed.

Why this matters at 100 TB: a naive ``groupBy(term)`` shuffles the entire
token stream (every occurrence of every term).  Here pass 1 reduces to
d*w counters via map-side combine (the shuffle is at most d*w rows per
partition, regardless of corpus size), and pass 2's shuffle carries only
occurrences of candidate heavy terms — for skewed natural-language
distributions that is a tiny fraction of the stream.  The sketch itself is
broadcast (d tables of w rows), so the candidate filter runs map-side
inside codegen.

No counterpart in the reference engine (go-graphite/carbonapi is a metrics
engine); this is corpus-pipeline surface, same family as ``text.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carbonapi_spark.datapipe.text import tokens


def _token_stream(df: DataFrame, text_col: str,
                  ngram: int = 1) -> DataFrame:
    """One lowercased token (or word n-gram, duplicates kept) per row;
    empty docs contribute nothing."""
    if ngram > 1:
        from carbonapi_spark.datapipe.text import word_ngrams
        unit = word_ngrams(F.col(text_col), ngram)
    else:
        unit = tokens(F.lower(F.col(text_col)))
    return df.select(F.explode(unit).alias("term"))


def _bucket(term: Column, depth: int, w: int) -> Column:
    """Depth-salted xxhash64 bucket in [0, w)."""
    return F.pmod(F.xxhash64(F.concat(F.lit(f"__cms{depth}:"), term)),
                  F.lit(w)).cast("int")


def cms_counters(df: DataFrame, text_col: str = "text",
                 w: int = 2048, d: int = 4, ngram: int = 1) -> DataFrame:
    """The (depth, bucket, cnt) count-min table over the token stream.

    One pass: each token row emits d (depth, bucket) pairs via
    ``posexplode`` of a d-long bucket array, then ONE hash aggregation
    with map-side combine — per-partition state is bounded by d*w
    counters, so the shuffle is sketch-sized at any corpus size."""
    tok = _token_stream(df, text_col, ngram)
    return (tok.select(F.posexplode(F.array(
                *[_bucket(F.col("term"), i, w) for i in range(d)]))
                .alias("depth", "bucket"))
            .groupBy("depth", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def heavy_hitters(df: DataFrame, threshold: int, text_col: str = "text",
                  w: int = 2048, d: int = 4, ngram: int = 1) -> DataFrame:
    """EXACT heavy-hitter terms (total count >= ``threshold``), found with
    a CMS-pruned shuffle.  Returns (term, cnt), exact counts.

    Pass 1 builds the sketch (``cms_counters``) and materializes it to
    the driver — the ONLY collect, bounded at d*w rows by construction,
    the textbook two-pass sketch lifecycle.  Pass 2 re-reads the token
    stream, broadcast-joins each depth's w-row counter slice (a
    LocalTableScan — the sketch-build pipeline runs exactly once, not
    once per depth), and drops every occurrence whose CMS estimate
    ``least(c_0..c_{d-1})`` is below threshold BEFORE the groupBy — the
    only occurrences that shuffle are candidate heavy terms.  CMS
    over-estimation means zero false negatives, so after the exact
    HAVING the result is identical to the full exact aggregation (which
    is the oracle).

    ``ngram > 1`` counts word n-grams instead of tokens — the
    boilerplate-mining use (which exact phrases saturate the corpus:
    shared footers, templates, licenses), where the n-gram TYPE space is
    far too large to aggregate exactly but the sketch stays d*w.

    DETERMINISM REQUIREMENT: pass 2 re-evaluates ``df``, so the
    zero-false-negative guarantee holds only for deterministic inputs.
    A non-deterministic ``df`` (``df.sample``, a ``rand()`` filter, a
    table mutated between the two passes) can surface terms in pass 2
    the pass-1 sketch never counted — persist such inputs first
    (``scratch.track(df)``) so both passes read the same rows.

    Pass 2 is ONE codegen projection: the d counter tables come back as
    dense w-length literal arrays (the sketch is already driver-resident
    from pass 1), and each occurrence probes them with ``element_at`` —
    no joins at all, so even on degenerate near-uniform corpora (where
    CMS pruning keeps almost everything) the pre-filter costs d hashes +
    d array reads per token inside whole-stage codegen."""
    cms_rows = cms_counters(df, text_col, w, d, ngram).collect()
    dense: list[list[int]] = [[0] * w for _ in range(d)]
    for r in cms_rows:
        dense[r["depth"]][r["bucket"]] = r["cnt"]
    tok = _token_stream(df, text_col, ngram)
    # One SQL literal per depth (w longs each): parsed once, constant-
    # folded into the projection.  element_at is 1-based.
    est_cols = []
    for i in range(d):
        arr_sql = "array(" + ",".join(f"{c}L" for c in dense[i]) + ")"
        bucket = _bucket(F.col("term"), i, w)
        est_cols.append(F.element_at(F.expr(arr_sql), bucket + 1))
    cand = tok.where(F.least(*est_cols) >= F.lit(threshold))
    return (cand.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= F.lit(threshold))
            .select("term", "cnt"))


def oov_rate(df: DataFrame, vocab_size: int = 1000,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` terms — the tokenizer-coverage diagnostic run
    before committing a vocab (docs full of OOV tokens blow up the
    fertility of any subword tokenizer trained on the head).

    The vocab is the top-V terms by total count with a deterministic
    (count DESC, term ASC) tie-break — a TakeOrdered top-V, no global
    sort shuffle — then broadcast as a left-join flag over the token
    stream; the per-doc rate is one keyed aggregation.  Docs with no
    tokens yield no row (nothing to rate).  Returns
    (doc_id, n_tokens, oov_rate) with the rate rounded to 6 places."""
    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.lower(F.col(text_col))))
                    .alias("term"))
    vocab = (tok.groupBy("term").agg(F.count(F.lit(1)).alias("__cnt"))
             .orderBy(F.desc("__cnt"), F.asc("term")).limit(vocab_size)
             .select("term", F.lit(1).alias("__in_vocab")))
    flagged = tok.join(F.broadcast(vocab), "term", "left")
    return (flagged.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.when(F.col("__in_vocab").isNull(), 1.0)
                               .otherwise(0.0)), 6).alias("oov_rate")))


def _hll_alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, value_col: str,
                  group_cols: tuple[str, ...] = (),
                  b: int = 12) -> DataFrame:
    """The mergeable HyperLogLog register table (Flajolet, Fuster,
    Gandouet & Meunier 2007) over the values of ``value_col``:
    (group..., reg, mrho) with one row per NON-ZERO register, ``reg`` in
    [0, 2^b) and ``mrho`` the max leading-zero rank observed.

    Deterministic by construction — the "randomness" is ``xxhash64``
    (seed 42) of the value, the register split is pure integer
    arithmetic (low ``b`` bits -> register, the next ``62-b`` bits ->
    rank via ``length(bin(w))``, both engine-portable), so the sketch
    and therefore the estimate replay bit-for-bit in any engine with a
    conforming XXH64.  Spark's own ``approx_count_distinct`` is also
    HLL++ but its hash/encoding is engine-internal — unusable as a
    cross-checked building block, which is why this exists.

    Scale shape: the groupBy is map-side combined down to at most
    ``groups * 2^b`` rows (4096 per group at the default) no matter how
    many value rows stream through — the distinct-cardinality answer at
    100 TB without shuffling the value stream, and register tables from
    disjoint shards/rounds union-max-merge losslessly
    (``groupBy(group, reg).agg(max(mrho))``)."""
    return (hll_reg_rho(df, value_col, group_cols, b)
            .groupBy(*group_cols, "reg")
            .agg(F.max("__rho").alias("mrho")))


def hll_reg_rho(df: DataFrame, value_col: str,
                group_cols: tuple[str, ...] = (),
                b: int = 12) -> DataFrame:
    """The per-VALUE register observations (group..., reg, __rho) —
    the pre-aggregation form of ``hll_registers``, exposed so streaming
    kernels can max-merge them statefully (the projection is pure
    column arithmetic, legal on a streaming DataFrame)."""
    m = 1 << b
    wbits = 62 - b
    h = F.xxhash64(F.col(value_col).cast("string"))
    u = F.pmod(h, F.lit(1 << 62))
    keys = [F.col(c) for c in group_cols]
    base = (df.select(*keys, u.alias("__u"))
            .select(*keys, F.pmod(F.col("__u"), F.lit(m)).alias("reg"),
                    F.expr(f"__u div {m}L").alias("__w")))
    rho = (F.when(F.col("__w") > 0,
                  F.lit(wbits) - F.length(F.bin(F.col("__w"))) + 1)
           .otherwise(F.lit(wbits + 1)).cast("int"))
    return base.select(*keys, "reg", rho.alias("__rho"))


def hll_estimate(regs: DataFrame,
                 group_cols: tuple[str, ...] = (),
                 b: int = 12) -> DataFrame:
    """The estimate finisher over a (group..., reg, mrho) register
    table — the second half of ``hll_distinct``, exposed so merged /
    streamed register tables produce the identical estimate."""
    m = 1 << b
    rho_max = 62 - b + 1
    alpha = _hll_alpha(m)
    num_const = float(alpha) * m * m * float(1 << rho_max)
    agg = (regs.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("registers_used"),
                F.sum(F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {rho_max} - mrho)"))
                .alias("__s")))
    zeros = F.lit(m) - F.col("registers_used")
    s_scaled = (F.col("__s")
                + zeros.cast("long") * F.lit(1 << rho_max).cast("long"))
    e_raw = F.lit(num_const) / s_scaled.cast("double")
    est = F.when((e_raw <= 2.5 * m) & (zeros > 0),
                 m * F.log(F.lit(float(m)) / zeros.cast("double"))) \
           .otherwise(e_raw)
    return agg.select(*group_cols, "registers_used",
                      F.round(est, 3).alias("est_distinct"))


def hll_merge(regs: DataFrame,
              group_cols: tuple[str, ...] = ()) -> DataFrame:
    """LOSSLESS union-max merge of HLL register tables down to
    ``group_cols`` (drop finer keys — days into months, shards into a
    corpus, rounds into a lifetime): ``max`` is idempotent, commutative
    and associative, so merging per-day sketches gives BIT-IDENTICAL
    registers (and therefore the identical estimate) to one pass over
    the raw union — the mergeable-aggregate property that lets 100 TB
    distinct-counts be maintained incrementally instead of rescanned.
    Pinned by the hll_merge_rollup oracle and a merge==direct pytest."""
    return (regs.groupBy(*group_cols, "reg")
            .agg(F.max("mrho").alias("mrho")))


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: tuple[str, ...] = (),
                 b: int = 12) -> DataFrame:
    """HyperLogLog distinct-cardinality estimate per group:
    (group..., registers_used, est_distinct).

    The register harmonic sum is computed as an EXACT INTEGER —
    ``sum(2^(rho_max - mrho))`` scaled by ``2^rho_max`` (rho <= 51 at
    b=12, so the sum fits a BIGINT) — so no float-accumulation order can
    perturb the estimate across engines; the only floating point is one
    final division (plus ``ln`` in the small-range linear-counting
    branch), both single deterministic operations.  Standard small-range
    correction applies (E <= 2.5m with empty registers -> linear
    counting m*ln(m/V0)); the 64-bit hash needs no large-range branch.
    Estimates are rounded to 3 places."""
    return hll_estimate(hll_registers(df, value_col, group_cols, b),
                        group_cols, b)


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — broadcastable set-membership pre-filter
# ---------------------------------------------------------------------------

_BLOOM_P = (1 << 31) - 1  # Mersenne prime: h*a + b stays under 2^62


def _bloom_params(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for pos_i(h) = ((a*h + b) mod p) mod m."""
    import random
    rng = random.Random(seed)
    return [(rng.randrange(1, _BLOOM_P), rng.randrange(0, _BLOOM_P))
            for _ in range(k)]


def _bloom_h(key: Column) -> Column:
    """xxhash64 of the salted key string folded into [0, p)."""
    h = F.xxhash64(F.concat(F.lit("__bf:"), key.cast("string")))
    return ((h % _BLOOM_P) + _BLOOM_P) % _BLOOM_P


def bloom_build(df: DataFrame, key_col: str = "key",
                m_bits: int = 1 << 20, k: int = 5,
                seed: int = 7) -> DataFrame:
    """Packed Bloom bitmap over ``df[key_col]`` — (word_idx INT,
    word BIGINT) with at most ``m_bits / 64`` rows, built in ONE pass:
    each key projects k bit positions (no pre-distinct — ``bit_or`` is
    idempotent), then one map-side-combined aggregation whose shuffle
    is bounded by the BITMAP size, never the key count.  The result is
    broadcastable by construction (m_bits = 2^20 -> at most 16 K rows /
    128 KB), which is the whole point: membership probes against a
    multi-billion-key set become map-side bit tests."""
    params = _bloom_params(k, seed)
    h = _bloom_h(F.col(key_col)).alias("__h")
    pos = (df.select(h)
           .select(F.explode(F.array(
               *[((F.col("__h") * a + b) % _BLOOM_P) % m_bits
                 for (a, b) in params])).alias("pos")))
    return (pos.groupBy(F.expr("cast(pos div 64 as int)").alias("word_idx"))
            .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))")
                 .alias("word")))


def bloom_probe(df: DataFrame, bloom: DataFrame, key_col: str = "key",
                m_bits: int = 1 << 20, k: int = 5, seed: int = 7,
                flag_col: str = "maybe_member") -> DataFrame:
    """Append ``flag_col``: True iff every one of the key's k bits is
    set in ``bloom`` (definite non-members are always False — one-sided
    error, the property that makes a Bloom filter a safe pre-filter for
    dedup/decontamination anti-joins at 100 TB: the expensive exact
    check runs only on maybe-members).

    Plan shape: k BROADCAST left joins on word index + in-codegen bit
    tests — the probe side is never shuffled and never exploded; cost
    per row is k hash-map lookups.  The bitmap is materialized ONCE via
    ``localCheckpoint`` (it is sketch-sized by construction) so the
    build pipeline does not re-run per broadcast.  ``m_bits``/``k``/
    ``seed`` must match ``bloom_build`` (positions are derived, not
    stored)."""
    params = _bloom_params(k, seed)
    bloom = bloom.localCheckpoint()
    out = df.withColumn("__h", _bloom_h(F.col(key_col)))
    hit = F.lit(True)
    for i, (a, b) in enumerate(params):
        out = out.withColumn(
            f"__p{i}", ((F.col("__h") * a + b) % _BLOOM_P) % m_bits)
        side = F.broadcast(bloom.select(
            F.col("word_idx").alias(f"__wi{i}"),
            F.col("word").alias(f"__w{i}")))
        out = out.join(
            side, F.expr(f"cast(__p{i} div 64 as int)") == F.col(f"__wi{i}"),
            "left")
        hit = hit & F.coalesce(
            F.expr(f"((__w{i} >> cast(__p{i} % 64 as int)) & 1) = 1"),
            F.lit(False))
    out = out.withColumn(flag_col, hit)
    return out.drop("__h", *[c for i in range(k)
                             for c in (f"__p{i}", f"__wi{i}", f"__w{i}")])


# --------------------------------------------------------------- HDR quantiles
# HdrHistogram-style quantile sketch (Tene, hdrhistogram.org; same
# log-bucketed family as DDSketch, Masson et al. VLDB'19) — the mergeable
# quantile companion to the CMS/HLL/Bloom sketches above.  Values are fixed
# at ``scale_pow2`` binary fractional digits (multiplying a double by 2**k
# only shifts the exponent, so the fix is EXACT), then bucketed to
# ``precision_bits`` significant bits: bucket lower bound =
# (v >> s) << s with s = max(bit_length(v) - p, 0).  Everything after the
# one fixed-point multiply is integer arithmetic — bit_length is
# length(bin(v)) in both Spark and DuckDB — so the sketch replays
# bit-for-bit across engines (no log/pow libm calls, the lesson of
# lsh_quality's expanded-multiplication theory curve).
#
# Guarantees: bucket_lo <= true value < bucket_lo * (1 + 2^(1-p)), so any
# quantile read from the sketch lower-bounds the true quantile with
# relative error < 2^(1-p) (~1.6% at p=7).  Buckets with equal (group,
# bucket_lo) merge by ADDING counts — the bucketing is pointwise, so
# sketches built per-shard/per-partition/per-day and merged are IDENTICAL
# to the sketch built in one pass (hdr_merge == hdr_buckets on the union).
#
# Scale: the per-row work is one map-side-combined hash aggregation; the
# bucket table is bounded by the VALUE RANGE, not the row count — at most
# (64 - p + 1) * 2^(p-1) + 2^p rows per group (~7.4k at p=7) for any input,
# so the quantile-extraction window runs on a sketch-sized table no matter
# how many trillion rows were folded in.  No counterpart in the reference
# (metrics engine); corpus/telemetry-pipeline surface.


def hdr_buckets(df: DataFrame, value_col: str = "value",
                by: tuple = (), precision_bits: int = 7,
                scale_pow2: int = 20) -> DataFrame:
    """Build the bucket table: one row per (by..., bucket_lo) with its
    count.  Null and negative values are dropped (the sketch covers
    non-negative reals; track signs in a separate sketch if needed).

    Supported value range: [0, 2**(63 - scale_pow2)) — ~8.8e12 at the
    default scale_pow2=20.  Values at or above that bound would
    overflow the int64 fixed-point representation (Spark's non-ANSI
    double->long cast clamps silently, mis-bucketing them), so they
    are dropped here, mirrored by the same WHERE bound in the SQL
    oracles.  Lower scale_pow2 to widen the range at coarser absolute
    resolution."""
    scale = float(1 << scale_pow2)
    bound = float(1 << (63 - scale_pow2))
    d = (df.where(F.col(value_col).isNotNull()
                  & (F.col(value_col) >= 0)
                  & (F.col(value_col) < F.lit(bound)))
         .select(*by, F.floor(F.col(value_col) * F.lit(scale))
                 .cast("long").alias("__v")))
    sh = F.greatest(F.length(F.bin(F.col("__v")))
                    - F.lit(precision_bits), F.lit(0))
    d = d.withColumn("__sh", sh)
    lb = F.expr("shiftleft(shiftright(__v, __sh), __sh)")
    return (d.select(*by, lb.alias("bucket_lo"))
            .groupBy(*by, "bucket_lo")
            .agg(F.count(F.lit(1)).alias("cnt")))


def hdr_merge(buckets: DataFrame, by: tuple = ()) -> DataFrame:
    """Merge sketches by summing counts per (by..., bucket_lo): drop any
    finer grouping columns and re-aggregate.  Exactly equals the sketch
    built in one pass over the union (pointwise bucketing)."""
    return (buckets.groupBy(*by, "bucket_lo")
            .agg(F.sum("cnt").alias("cnt")))


def hdr_quantiles(buckets: DataFrame, qs=(0.5, 0.9, 0.99),
                  by: tuple = (), scale_pow2: int = 20) -> DataFrame:
    """Read quantiles from a bucket table: for each q, the smallest
    bucket lower bound whose cumulative count reaches ceil(q * n) —
    the standard lower-bound quantile convention.  Returns
    (by..., q, est, n); est = bucket_lo / 2**scale_pow2 (an exact
    power-of-two division).  The cumulative window runs on the
    sketch-sized bucket table (bounded by value range, never row
    count), so a per-group single-reducer sort is safe at any scale."""
    from pyspark.sql.window import Window
    w_cum = (Window.partitionBy(*by).orderBy("bucket_lo")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*by)
    c = (buckets
         .withColumn("__cum", F.sum("cnt").over(w_cum))
         .withColumn("__n", F.sum("cnt").over(w_all)))
    e = c.select(*by, "bucket_lo", "__cum", "__n",
                 F.explode(F.array(*[F.lit(float(q)) for q in qs]))
                 .alias("q"))
    hit = e.where(F.col("__cum") >= F.ceil(F.col("q") * F.col("__n")))
    return (hit.groupBy(*by, "q")
            .agg(F.min("bucket_lo").alias("__lb"),
                 F.min("__n").alias("n"))
            .select(*by, "q",
                    (F.col("__lb") / F.lit(float(1 << scale_pow2)))
                    .alias("est"), "n"))
