"""Scale smoke for the training-data pipeline: generate a synthetic corpus
~100x the sf0.1 documents table and time dedup / similarity / text ops.

The point is shape, not absolute speed: all of these are explode->agg or
bucket-join pipelines whose shuffle volume is linear in corpus size with
bounded per-key state, so time should scale ~linearly with rows on a fixed
core count.

Usage: python tools/scale_smoke_datapipe.py [n_docs] [n_vecs]
Writes under .scratch/ (gitignored); prints one JSON line.
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


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dim = 32

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    if not os.path.exists(DOCS):
        # ~40-word docs assembled from a rotating vocab window; every 50th
        # doc repeats an earlier one verbatim (exact+near dup planted)
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
    if not os.path.exists(VECS):
        # clustered corpus — the shape embedding near-dup dedup targets:
        # 12-member clusters around hash-uniform centers in [-1,1]^dim plus
        # 10% per-member noise (within-cluster cosine ~0.985), so each
        # vector has 11 genuine near neighbors and recall@10 is meaningful
        cluster = F.col("id") - F.col("id") % 12
        u = lambda key: (F.pmod(F.xxhash64(key), F.lit(2001)) / 1000.0 - 1.0)
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (u(cluster * 131 + i)
                       + u(F.col("id") * 977 + i) * 0.1).cast("float"))
        (spark.range(n_vecs).select(F.col("id").alias("vec_id"),
                                    vec.alias("embedding"))
         .repartition(64).write.mode("overwrite").parquet(VECS))
    gen_s = round(time.perf_counter() - t0, 2)

    docs = spark.read.parquet(DOCS)
    vecs = spark.read.parquet(VECS)

    from carbonapi_spark.datapipe.dedup import (
        exact_dedup, jaccard_verify, minhash_lsh_candidates, simhash)
    from carbonapi_spark.datapipe.similarity import (
        brute_force_topk, ivf_topk, lsh_topk)
    from carbonapi_spark.datapipe.text import lang_scores, quality_features

    times = {}

    def case(name, fn):
        from carbonapi_spark import scratch
        t0 = time.perf_counter()
        n = fn()
        times[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
        scratch.release()  # request boundary: free per-case persists

    case("exact_dedup", lambda: exact_dedup(docs).count())
    case("minhash_lsh_verify", lambda: jaccard_verify(
        docs, minhash_lsh_candidates(docs, num_hashes=16, bands=4, ngram=3),
        ngram=3, threshold=0.8).count())
    case("simhash", lambda: docs.select(
        simhash(F.col("text"), bits=32).alias("h")).count())
    case("quality_features", lambda: quality_features(docs).count())
    case("lang_scores", lambda: lang_scores(docs).count())
    from carbonapi_spark.datapipe.sampling import chunk_documents
    from carbonapi_spark.datapipe.text import (line_dedup,
                                               perplexity_buckets,
                                               redact_pii)
    case("redact_pii", lambda: docs.select(
        redact_pii(F.col("text")).alias("t")).count())
    case("chunk_documents", lambda: chunk_documents(
        docs, max_tokens=16).count())
    case("ppl_buckets", lambda: perplexity_buckets(docs).count())
    case("line_dedup", lambda: line_dedup(
        docs.select("doc_id",
                    F.concat_ws("\n", F.col("text"),
                                F.lit("shared boilerplate footer"))
                    .alias("text"))).count())
    from carbonapi_spark.datapipe.dedup import remove_duplicate_spans
    case("substr_dedup_k8", lambda: remove_duplicate_spans(
        docs, k=8).count())
    # round-6 ops at corpus scale
    from carbonapi_spark.datapipe.text import (c4_rules, corpus_stats,
                                               gopher_rules,
                                               hashed_doc_vectors)
    case("gopher_rules", lambda: gopher_rules(docs, min_words=10).count())
    case("c4_rules", lambda: c4_rules(docs, min_sentences=1).count())
    case("hashed_doc_vectors_d64", lambda: hashed_doc_vectors(
        docs, dim=64).count())
    from carbonapi_spark.datapipe.sampling import (dsir_sample,
                                                   temperature_mix)
    case("temperature_mix", lambda: temperature_mix(
        docs.withColumn("lang", (F.col("doc_id") % 7).cast("string")),
        alpha=0.3).count())
    case("dsir_sample_10k", lambda: dsir_sample(
        docs, docs.where(F.col("doc_id") % 11 == 0), n=10_000).count())
    from carbonapi_spark.datapipe.similarity import semantic_dedup
    case("semantic_dedup_256cells", lambda: semantic_dedup(
        vecs, dim=dim, n_centroids=256, tau=0.95).count())
    from carbonapi_spark.datapipe.dedup import normalized_dedup
    from carbonapi_spark.datapipe.sketch import heavy_hitters, oov_rate
    case("norm_dedup", lambda: normalized_dedup(docs).count())
    # threshold at ~2x the expected per-term count so the sketch actually
    # prunes part of the vocab
    case("heavy_hitters", lambda: heavy_hitters(
        docs, threshold=(n_docs * 40 * 2) // len(WORDS)).count())
    case("oov_rate_v16", lambda: oov_rate(docs, vocab_size=16).count())
    from carbonapi_spark.datapipe.text import (bigram_perplexity_buckets,
                                               source_kl_divergence)
    # thresholds mode (map-side bucketing, no global ntile sort) — the
    # lake-scale path; the 500k input also opens the track_if_large gate
    case("bigram_ppl_thresholds", lambda: bigram_perplexity_buckets(
        docs, thresholds=[3.0, 3.3]).count())
    case("source_kl_7src", lambda: source_kl_divergence(
        docs.withColumn("source", (F.col("doc_id") % 7).cast("string")))
        .count())
    q = vecs.limit(16)
    case("lsh_ann_topk", lambda: lsh_topk(vecs, q, k=10, dim=dim).count())

    # recall@10 of lsh_topk vs exact brute force, per probe depth — the
    # number that justifies multi-probe (query-side-only bucket expansion)
    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = topk_sets(brute_force_topk(vecs, q, k=10))

    def measure(fn):
        t0 = time.perf_counter()
        approx = topk_sets(fn())
        hit = sum(len(truth[qid] & approx.get(qid, set())) for qid in truth)
        return {"recall_at_10": round(hit / (10 * len(truth)), 4),
                "sec": round(time.perf_counter() - t0, 2)}

    recall = {}
    for p in (0, 1, 2):
        recall[f"lsh_probe{p}"] = measure(
            lambda: lsh_topk(vecs, q, k=10, dim=dim, probe=p))
    for np_ in (1, 2, 4):
        recall[f"ivf_nprobe{np_}"] = measure(
            lambda: ivf_topk(vecs, q, k=10, dim=dim, n_centroids=16,
                             nprobe=np_))

    # PQ/ADC: compressed-domain ranking (32x smaller corpus scan), with
    # and without exact rerank, seeded vs trained codebooks — the numbers
    # behind "ADC is a candidate generator; refine with exact distances"
    from carbonapi_spark.datapipe.similarity import (
        pq_codebooks, pq_rerank_topk, pq_topk, pq_train)
    m, ksub = 8, 16
    seeded = pq_codebooks(dim=dim, m=m, ksub=ksub)
    sample = [r["embedding"] for r in vecs.limit(5000).collect()]
    trained = pq_train(sample, m=m, ksub=ksub)
    recall["pq_adc_seeded"] = measure(
        lambda: pq_topk(vecs, q, k=10, codebooks=seeded))
    recall["pq_adc_trained"] = measure(
        lambda: pq_topk(vecs, q, k=10, codebooks=trained))
    recall["pq_rerank100_seeded"] = measure(
        lambda: pq_rerank_topk(vecs, q, k=10, r=100, codebooks=seeded))
    recall["pq_rerank100_trained"] = measure(
        lambda: pq_rerank_topk(vecs, q, k=10, r=100, codebooks=trained))

    # IVFADC (IVFx,PQy): cell pruning x compressed-domain scan — the scan
    # touches ~n*nprobe/16 codes instead of all n; refine restores exact
    # final ordering over the ADC top-100
    from carbonapi_spark.datapipe.similarity import ivfpq_topk
    for np_ in (2, 4):
        recall[f"ivfpq_np{np_}_seeded"] = measure(
            lambda: ivfpq_topk(vecs, q, k=10, dim=dim, n_centroids=16,
                               nprobe=np_, codebooks=seeded))
    recall["ivfpq_np2_refine100_trained"] = measure(
        lambda: ivfpq_topk(vecs, q, k=10, dim=dim, n_centroids=16,
                           nprobe=2, codebooks=trained, refine=100))
    recall["ivfpq_np4_refine100_seeded"] = measure(
        lambda: ivfpq_topk(vecs, q, k=10, dim=dim, n_centroids=16,
                           nprobe=4, codebooks=seeded, refine=100))

    # connected components at graph scale, pure-distributed star rounds
    # (finish_threshold=0 disables the driver union-find finisher): a
    # union of many small near-dup clusters plus some 1000-node chains —
    # the chain is the adversarial case (diameter >> log n), where label
    # propagation would need 1000 rounds but star contraction stays O(log n).
    from carbonapi_spark.datapipe.cluster import connected_components
    n_edges = max(n_docs * 4, 1_000_000)
    e = (spark.range(n_edges)
         .select((F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n_docs)))
                 .alias("src"),
                 (F.pmod(F.xxhash64(F.col("id") * 2 + 2),
                         F.lit(n_docs // 8) * 8)).alias("dst")))
    chains = (spark.range(100_000)
              .select((F.col("id") + n_docs * 10).alias("src"),
                      (F.col("id") + n_docs * 10 + 1).alias("dst"))
              .where(F.col("src") % 1000 != 999))  # 100 chains of ~1000
    t0 = time.perf_counter()
    n_labeled = connected_components(
        e.unionByName(chains), finish_threshold=0).count()
    times["connected_components_distributed"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": n_labeled}

    print(json.dumps({"n_docs": n_docs, "n_vecs": n_vecs, "gen_sec": gen_s,
                      "cases": times, "ann_recall": recall}))
    spark.stop()


if __name__ == "__main__":
    main()
