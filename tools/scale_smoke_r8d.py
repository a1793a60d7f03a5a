"""Scale smoke for the last round-8 op batch over the persistent
scratch corpora (500k docs; 20M events; synthetic graphs).

Cases: script_profile + judge_agreement (stateless/agg passes),
bleu_report over 500k candidate/reference pairs (~130M grams per side
through the tagged single explode), bradley_terry from 500k synthesized
matches over 100 items, corpus_diff of two 500k snapshots, and
core_numbers on the 1.05M-edge hub graph.

Usage: python tools/scale_smoke_r8d.py
Prints one JSON line per case: {"case": ..., "sec": ..., "rows": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = "/root/repo/.scratch/scale_docs"


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DOCS)
    docs.count()  # warm page cache

    def case(name, fn):
        from carbonapi_spark import scratch
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"case": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}), flush=True)
        scratch.release()

    from carbonapi_spark.datapipe.cluster import core_numbers
    from carbonapi_spark.datapipe.evals import (
        bleu_report, bradley_terry, cohen_kappa)
    from carbonapi_spark.datapipe.text import script_profile, tokens
    from carbonapi_spark.sources.corpus import corpus_diff

    def run_script():
        return script_profile(docs).count()

    def run_kappa():
        toks = tokens(F.lower(F.col("text")))
        labeled = docs.select(
            (F.size(toks) >= 38).alias("a"),
            (F.size(F.array_distinct(toks)) >= 30).alias("b"))
        return cohen_kappa(labeled, "a", "b").count()

    def run_bleu():
        toks = tokens(F.lower(F.col("text")))
        pairs = docs.select(
            F.filter(toks, lambda x, i: (i + 1) % 7 != 0).alias("cand"),
            toks.alias("ref"))
        return bleu_report(pairs).count()

    def run_bt():
        m = (docs.select((F.pmod(F.xxhash64("doc_id"), F.lit(100)))
                         .alias("winner"),
                         (F.pmod(F.xxhash64(F.col("doc_id") + 1),
                                 F.lit(100))).alias("loser"))
             .where(F.col("winner") != F.col("loser")))
        return bradley_terry(m, n_iter=8).count()

    def run_diff():
        new = (docs.where(F.pmod(F.col("doc_id"), F.lit(7)) != 3)
               .withColumn("text",
                           F.when(F.pmod(F.col("doc_id"), F.lit(10)) == 0,
                                  F.concat(F.col("text"), F.lit(" v2")))
                           .otherwise(F.col("text"))))
        return corpus_diff(docs.select("doc_id", "text"),
                           new.select("doc_id", "text")).count()

    def run_core():
        base = (spark.range(1_000_000)
                .select(F.pmod(F.xxhash64(F.col("id")), F.lit(100_000))
                        .alias("src"),
                        F.pmod(F.xxhash64(F.col("id") + 1_000_000),
                               F.lit(100_000)).alias("dst")))
        hub = (spark.range(50_000)
               .select(F.lit(100_000).alias("src"),
                       F.col("id").alias("dst")))
        return core_numbers(base.unionByName(hub), n_iter=8).count()

    case("script_profile 500k docs", run_script)
    case("judge_agreement 500k docs", run_kappa)
    case("bleu_report 500k pairs (4 orders, one explode/side)", run_bleu)
    case("bradley_terry 500k matches / 100 items / 8 iters", run_bt)
    case("corpus_diff 500k vs mutated 500k", run_diff)
    case("core_numbers 1.05M edges + 50k hub, 8 rounds", run_core)


if __name__ == "__main__":
    main()
