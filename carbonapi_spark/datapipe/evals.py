"""Label/preference evaluation harnesses for training-data pipelines.

Three ops a data-curation pipeline needs once humans or LLM judges
enter the loop:

- ``cohen_kappa``: chance-corrected agreement between two raters
  (Cohen 1960) — the standard QC gate on annotation/LLM-judge labels.
- ``bleu_report``: clipped n-gram precision report (Papineni 2002)
  between candidate/reference text pairs — generation eval.
- ``bradley_terry``: pairwise-preference strength fitting (Bradley &
  Terry 1952) via Hunter's MM updates — the model behind preference
  datasets and arena-style leaderboards.

Cross-engine replay discipline (the ``bpe_merges``/``quality_auc``
lesson): every statistic here is either an exact integer aggregate or
a SINGLE IEEE operation on exact integers (one division, or a
product/sqrt chain — +, *, /, sqrt are correctly rounded by IEEE-754,
so they replay bit-for-bit; ``exp``/``ln``/``pow`` are libm-dependent
and are deliberately NOT used).  Iterative fits round to 6 dp per
iteration so both engines walk the identical trajectory (the pagerank
recipe).

No counterpart in the reference engine (go-graphite/carbonapi is a
metrics engine); corpus-pipeline surface, same family as ``text.py``'s
quality scoring and ``retrieval.py``'s ranking metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bleu_report", "bradley_terry", "cohen_kappa"]


def cohen_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two categorical rating columns.

    kappa = (p_o - p_e) / (1 - p_e) with observed agreement p_o and
    chance agreement p_e = sum_label P_a(label) * P_b(label).  One
    label-keyed aggregation over the pair table (the label space is
    tiny by definition) plus a 1-row finish; the corpus shuffles once,
    keyed by label.  All counts are exact int64; the three divisions
    happen once at the end, rounded to 6 dp.  Returns one row
    (n, p_o, p_e, kappa)."""
    lab = (df.groupBy(F.col(col_a).alias("__l"))
           .agg(F.count(F.lit(1)).alias("__na"))
           .join(df.groupBy(F.col(col_b).alias("__l"))
                 .agg(F.count(F.lit(1)).alias("__nb")), "__l", "full")
           .na.fill({"__na": 0, "__nb": 0})
           .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__ee")))
    tot = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col(col_a) == F.col(col_b)).cast("long")).alias("__agree"))
    out = tot.crossJoin(F.broadcast(lab))
    # guards (ANSI mode makes x/0 an error, not NULL): empty input ->
    # all-null row; pe = 1 (both raters constant and equal) -> kappa
    # undefined by definition -> NULL
    po = F.when(F.col("n") > 0, F.col("__agree") / F.col("n"))
    pe = F.when(F.col("n") > 0,
                F.col("__ee") / (F.col("n") * F.col("n")))
    return out.select(
        "n",
        F.round(po, 6).alias("p_o"),
        F.round(pe, 6).alias("p_e"),
        F.round(F.when(pe < 1, (po - pe) / (1 - pe)), 6).alias("kappa"))


def bleu_report(pairs: DataFrame, cand_col: str = "cand",
                ref_col: str = "ref", max_n: int = 4,
                arrow: bool = True) -> DataFrame:
    """Corpus-level clipped n-gram precision report between candidate
    and reference token arrays (BLEU's ingredients, Papineni 2002).

    Per order n: clipped matches = sum over pairs of
    sum_gram min(count_cand(g), count_ref(g)); precision p_n =
    matches_n / total_n, emitted as the RAW double of one exact-int64
    division (bit-identical cross-engine — never rounded).  Also emits
    candidate/reference length totals (the brevity-penalty inputs); the
    libm-dependent exp(1 - r/c) brevity factor is intentionally left to
    the consumer.

    Clipping is PER-PAIR LOCAL — no gram ever crosses pairs — so the
    default Arrow kernel needs ZERO wide shuffles: per partition, two
    Counters per (pair, order) and a running (matches, total) partial;
    only max_n + 1 partial rows per partition reach the final 5-row
    aggregation (r10: 4.7 -> ~1.6 s at sf0.1).  Every quantity is an
    exact integer count, so the kernel is bit-identical to the
    declarative path by construction (parity-pinned).

    ``arrow=False`` keeps the pure-JVM shape — both sides' (n, gram)
    structs explode SIDE-TAGGED into one union, the clipped min falls
    out of ONE (pair, n, gram)-keyed aggregation's conditional counts
    (no gram equi-join), and the per-order totals come from a 1-row
    scan (total_n = sum of max(len - n + 1, 0)).  Output is max_n + 1
    rows regardless of corpus size."""
    if arrow:
        return _bleu_partials_arrow(pairs, cand_col, ref_col, max_n)
    pid = F.monotonically_increasing_id().alias("__pid")
    base = pairs.select(pid, F.col(cand_col).alias("__c"),
                        F.col(ref_col).alias("__r")).localCheckpoint()

    def grams(col, n):
        # guard short arrays: Spark's sequence(0, negative) DESCENDS,
        # it does not return empty
        g = F.transform(
            F.sequence(F.lit(0), F.size(col) - n),
            lambda i: F.struct(F.lit(n).alias("n"),
                               F.concat_ws(" ", F.slice(col, i + 1, n))
                               .alias("g")))
        return F.when(F.size(col) >= n, g) \
            .otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    def tagged(col, side):
        all_orders = F.flatten(F.array(
            *[grams(col, n) for n in range(1, max_n + 1)]))
        return (base.select("__pid", F.lit(side).alias("__sd"),
                            F.explode(all_orders).alias("__ng"))
                .select("__pid", "__sd", F.col("__ng.n").alias("__n"),
                        F.col("__ng.g").alias("__g")))

    # clipped matches WITHOUT a join: both sides' grams union-tagged
    # through ONE keyed aggregation; min(count_cand, count_ref) falls
    # out of the conditional counts (a gram missing on either side
    # contributes least(x, 0) = 0)
    both = tagged(F.col("__c"), "c").unionByName(tagged(F.col("__r"),
                                                        "r"))
    counts = (both.groupBy("__pid", "__n", "__g")
              .agg(F.sum((F.col("__sd") == "c").cast("long"))
                   .alias("__cc"),
                   F.sum((F.col("__sd") == "r").cast("long"))
                   .alias("__rc")))
    matches = (counts.groupBy("__n")
               .agg(F.sum(F.least(F.col("__cc"), F.col("__rc")))
                    .alias("matches")))
    # totals + brevity lengths in ONE 1-row scan of base: the number of
    # candidate n-grams is max(len - n + 1, 0) — no second pass over
    # the exploded gram table
    tot_cols = [F.coalesce(
        F.sum(F.greatest(F.size("__c") - (n - 1), F.lit(0))),
        F.lit(0)).alias(f"__t{n}") for n in range(1, max_n + 1)]
    one = base.agg(
        F.coalesce(F.sum(F.size("__c")), F.lit(0)).alias("__t0"),
        F.coalesce(F.sum(F.size("__r")), F.lit(0)).alias("__r0"),
        *tot_cols)
    totals = one.select(F.explode(F.array(*[
        F.struct(F.lit(n).alias("__n"),
                 F.col(f"__t{n}").cast("long").alias("total"))
        for n in range(1, max_n + 1)])).alias("__s")).select("__s.*")
    per_n = (totals.join(matches, "__n", "left")
             .select(F.col("__n").alias("n"),
                     F.coalesce("matches", F.lit(0)).alias("matches"),
                     "total"))
    lens = one.select(F.lit(0).alias("n"),
                      F.col("__t0").alias("matches"),
                      F.col("__r0").alias("total"))
    per_n = lens.unionByName(per_n)
    return per_n.select("n", "matches", "total",
                        _bleu_precision().alias("precision"))


def _bleu_precision():
    """precision = matches / total as ONE raw int64 division — shared
    by both physical paths so the emitted doubles are bit-identical."""
    return F.when(F.col("total") > 0,
                  F.col("matches").cast("double") / F.col("total")) \
        .otherwise(F.lit(0.0))


def _bleu_partials_arrow(pairs: DataFrame, cand_col: str, ref_col: str,
                         max_n: int) -> DataFrame:
    """Arrow fast path of :func:`bleu_report`: per-partition Counter
    clipping (grams never cross pairs), max_n + 1 integer partial rows
    per partition, one tiny keyed aggregation to finish."""

    def gen(batches):
        from collections import Counter

        import pandas as pd
        m = [0] * (max_n + 1)
        t = [0] * (max_n + 1)
        lc = lr = 0
        seen = False
        for pdf in batches:
            for c, r in zip(pdf[cand_col], pdf[ref_col]):
                seen = True
                c = list(c) if c is not None else []
                r = list(r) if r is not None else []
                lc += len(c)
                lr += len(r)
                for n in range(1, max_n + 1):
                    if len(c) >= n:
                        t[n] += len(c) - n + 1
                    cc = Counter(tuple(c[i:i + n])
                                 for i in range(len(c) - n + 1))
                    rc = Counter(tuple(r[i:i + n])
                                 for i in range(len(r) - n + 1))
                    m[n] += sum(min(v, rc.get(g, 0))
                                for g, v in cc.items())
        if seen:
            yield pd.DataFrame({"n": list(range(max_n + 1)),
                                "matches": [lc] + m[1:],
                                "total": [lr] + t[1:]})

    part = pairs.select(cand_col, ref_col).mapInPandas(
        gen, "n INT, matches LONG, total LONG")
    agg = (part.groupBy("n")
           .agg(F.sum("matches").alias("matches"),
                F.sum("total").alias("total")))
    # empty corpus: keep the max_n + 1-row shape with zero counts
    shell = pairs.sparkSession.range(0, max_n + 1) \
        .select(F.col("id").cast("int").alias("n"))
    return (shell.join(agg, "n", "left")
            .select("n",
                    F.coalesce("matches", F.lit(0)).alias("matches"),
                    F.coalesce("total", F.lit(0)).alias("total"))
            .select("n", "matches", "total",
                    _bleu_precision().alias("precision")))


def bradley_terry(matches: DataFrame, winner_col: str = "winner",
                  loser_col: str = "loser",
                  n_iter: int = 8) -> DataFrame:
    """Bradley-Terry strengths from a (winner, loser) match table via
    Hunter's MM algorithm: p_i <- W_i / sum_{j!=i} n_ij / (p_i + p_j),
    normalized to mean 1 and rounded to 6 dp each iteration so the fit
    replays as unrolled SQL iterations (the pagerank recipe).

    Scale shape: matches collapse ONCE to the (i, j, n_ij, w_ij)
    pair-aggregate table (item-pair-sized, not match-sized) and are
    checkpointed; each iteration is one join of the item-sized strength
    table against the pair table + one item-keyed aggregation, lineage
    cut every other round.  Returns (item, wins, strength)."""
    sym = (matches.groupBy(F.col(winner_col).alias("i"),
                           F.col(loser_col).alias("j"))
           .agg(F.count(F.lit(1)).alias("w")))
    und = (sym.select("i", "j", F.col("w").alias("wij"))
           .unionByName(sym.select(F.col("j").alias("i"),
                                   F.col("i").alias("j"),
                                   F.lit(0).alias("wij")))
           .groupBy("i", "j").agg(F.sum("wij").alias("wij"))
           .localCheckpoint())
    # nij = total matches between i and j = wij + wji
    tot = (und.select("i", "j", "wij")
           .unionByName(und.select(F.col("j").alias("i"),
                                   F.col("i").alias("j"), "wij"))
           .groupBy("i", "j").agg(F.sum("wij").alias("nij")))
    # pairs/wins derive from und's stored blocks with pair-sized work,
    # so the count gate and the single post-gate checkpoint replace the
    # old checkpoint-count-recheckpoint sequence (r14: two eager jobs
    # fewer; values unchanged — only recompute shape)
    pairs = (und.join(tot, ["i", "j"])
             .select("i", "j", "wij", "nij"))
    wins = pairs.groupBy("i").agg(F.sum("wij").alias("wins"))
    n_items = wins.count()
    small = n_items < 100_000
    if small:
        pairs = pairs.coalesce(1)
    pairs = pairs.localCheckpoint()
    wins = pairs.groupBy("i").agg(F.sum("wij").alias("wins"))
    p = wins.select(F.col("i").alias("item"),
                    F.lit(1.0).alias("p")).localCheckpoint(eager=False)
    from pyspark.sql.window import Window
    for it in range(n_iter):
        # small fits: broadcast the item-sized strength table so each
        # round is BHJ + complete-mode aggs over the ONE-partition pair
        # table (SinglePartition satisfies the aggs' distribution — the
        # pagerank r14 recipe, zero exchanges per round), and take the
        # normalization mean with a global window over that single
        # partition instead of a crossJoin(broadcast(mean)) — the old
        # shape built one driver-blocking broadcast per round for a
        # 1-row table.  Summation order inside the single partition is
        # unchanged (same sequential fold), so the rounded trajectory
        # is bit-identical (oracle-verified).
        pb = F.broadcast(p) if small else p
        pi = pb.select(F.col("item").alias("i"), F.col("p").alias("__pi"))
        pj = pb.select(F.col("item").alias("j"), F.col("p").alias("__pj"))
        den = (pairs.join(pi, "i").join(pj, "j")
               .groupBy("i")
               .agg(F.sum(F.col("nij") / (F.col("__pi") + F.col("__pj")))
                    .alias("__d")))
        raw = (wins.join(F.broadcast(den) if small else den, "i")
               .select(F.col("i").alias("item"),
                       (F.col("wins") / F.col("__d")).alias("__raw")))
        if small:
            m = F.round(F.avg("__raw").over(Window.partitionBy()),
                        6)
            p = raw.select(
                "item",
                F.round(F.col("__raw") / m, 6).alias("p"))
        else:
            mean = raw.agg(F.round(F.avg("__raw"), 6).alias("__m"))
            p = (raw.crossJoin(F.broadcast(mean))
                 .select("item",
                         F.round(F.col("__raw") / F.col("__m"), 6)
                         .alias("p")))
        # lazy cut every SECOND round: plan depth stays bounded at two
        # iterations with zero eager jobs (A/B at r14: every-2 beat
        # every-1 by ~0.8 s — fewer checkpoint analyses — and beat
        # no-checkpoint by 5x: broadcasting an 8-round-deep plan
        # re-plans the whole chain per round)
        if it % 2 == 1 or it == n_iter - 1:
            p = p.localCheckpoint(eager=False)
    return (wins.select(F.col("i").alias("item"), "wins")
            .join(p, "item")
            .select("item", "wins", F.col("p").alias("strength")))
