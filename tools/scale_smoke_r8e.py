"""Scale smoke for the unigram-LM tokenizer (datapipe/unigram.py) at
500k docs / ~20M tokens.

Cases:
- unigram_count_train: 2 E/M rounds.  Cost profile = ONE corpus
  word-count pass + vocabulary-sized DP rounds (the BPE shape).
- unigram_encode: Viterbi-fold segmentation of every corpus token
  (~20M) under the trained vocab — the 100 TB encode path; a stateless
  whole-stage-codegen projection, so throughput should track the
  explode+projection cost, not the vocab size.
- unigram_train_em distributed: one float-EM iteration shape at scale
  (type table stays distributed; vocab hops to the driver).

Usage: python tools/scale_smoke_r8e.py [n_docs]
Prints one JSON line per case: {"case": ..., "sec": ..., "rows": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = "/root/repo/.scratch/scale_docs"
VECS = "/root/repo/.scratch/scale_vecs"

WORDS = ("the quick brown fox jumps over lazy dog pack my box with five "
         "dozen liquor jugs how vexingly daft zebras jump bright vixens "
         "quiz sphinx of black quartz judge my vow").split()


def ensure_docs(spark, n_docs: int) -> None:
    """Same synthesis as scale_smoke_datapipe (rotating-vocab 40-word
    docs, every 50th an exact repeat) so all r8 smokes share a corpus."""
    from pyspark.sql import functions as F
    if os.path.exists(DOCS):
        return
    words = F.array(*[F.lit(w) for w in WORDS])
    base = (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 50 == 0, F.col("id") + 1)
                    .otherwise(F.col("id")).alias("seed")))
    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(39)),
                    lambda i: F.element_at(
                        words, (F.abs(F.xxhash64(F.col("seed") * 40 + i))
                                % len(WORDS)).cast("int") + 1)), " ")
    base.select("doc_id", text.alias("text")) \
        .repartition(64).write.mode("overwrite").parquet(DOCS)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ensure_docs(spark, n_docs)
    if not os.path.exists(VECS):
        # same clustered synthesis as scale_smoke_datapipe
        dim, n_vecs = 32, 200_000
        cluster = F.col("id") - F.col("id") % 12
        u = lambda key: (F.pmod(F.xxhash64(key), F.lit(2001)) / 1000.0 - 1.0)
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (u(cluster * 131 + i)
                       + u(F.col("id") * 977 + i) * 0.1).cast("float"))
        (spark.range(n_vecs).select(F.col("id").alias("vec_id"),
                                    vec.alias("embedding"))
         .repartition(64).write.mode("overwrite").parquet(VECS))
    docs = spark.read.parquet(DOCS)
    docs.count()  # warm page cache

    def case(name, fn):
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"case": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}), flush=True)

    from carbonapi_spark.datapipe.unigram import (
        unigram_count_train, unigram_encode, unigram_train_em)

    trained: dict[str, int] = {}

    def run_train():
        rows = unigram_count_train(docs, iters=2).collect()
        trained.update({r["piece"]: r["usage"] for r in rows})
        return len(rows)

    def run_encode():
        vocab = dict(trained)
        for c in "abcdefghijklmnopqrstuvwxyz":
            vocab.setdefault(c, 1)
        enc = unigram_encode(docs, vocab)
        # consume the segmentation (sum of piece counts), not just count()
        return int(enc.select(F.sum("np")).collect()[0][0] or 0)

    def run_encode_types():
        vocab = dict(trained)
        for c in "abcdefghijklmnopqrstuvwxyz":
            vocab.setdefault(c, 1)
        enc = unigram_encode(docs, vocab, via_types=True)
        return int(enc.select(F.sum("np")).collect()[0][0] or 0)

    def run_em():
        logp, hist = unigram_train_em(docs, vocab_size=40, iters=2,
                                      local=False)
        return len(logp)

    def run_project():
        from carbonapi_spark.datapipe.linalg import random_projection
        vecs = spark.read.parquet(VECS)
        out = random_projection(vecs, out_dim=16)
        return int(out.select(F.sum(F.abs("value"))).collect()[0][0]
                   and out.count())

    def run_cov():
        from carbonapi_spark.datapipe.linalg import covariance_matrix
        vecs = spark.read.parquet(VECS)
        return covariance_matrix(vecs, vec_col="embedding").count()

    case("unigram_count_train_500k", run_train)
    case("unigram_encode_500k", run_encode)
    case("unigram_encode_types_500k", run_encode_types)
    case("unigram_em_dist_2it", run_em)
    if os.path.exists(VECS):
        case("jl_project_200k", run_project)
        case("covariance_200k_d32", run_cov)
    spark.stop()


if __name__ == "__main__":
    main()
