"""Optimization-round helper: per-PHASE wall-clock breakdown of the
heavy durable-index maintenance probes (guide §1: isolate where the
time goes before changing anything).  Replicates each probe's exact
internal sequence with a timer around every step.

Usage: python tools/opt_phase_probe.py [band|text|ann_compact|ann_l0|
                                        ann_delete|ann_auto] ...
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def session():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("opt-phase-probe")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    return spark


class T:
    def __init__(self):
        self.phases = {}
        self._t0 = time.perf_counter()

    def mark(self, name):
        t = time.perf_counter()
        self.phases[name] = round(t - self._t0, 3)
        self._t0 = t


def count_files(root):
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def band_probe(spark, sf_dir):
    from carbonapi_spark.datapipe.dedup import (
        append_band_index, compact_band_index, probe_band_index,
        write_band_index)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 5 != 4)
    epoch = docs.where((F.col("doc_id") % 5 == 4)
                       & (F.col("doc_id") % 2 == 0))
    probe = docs.where((F.col("doc_id") % 5 == 4)
                       & (F.col("doc_id") % 2 == 1))
    t = T()
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/bands"
        write_band_index(corpus, p, num_hashes=16, bands=4, ngram=2)
        t.mark("write_band_index")
        t.phases["files_after_write"] = count_files(p)
        t.mark("_")
        append_band_index(epoch, p, l0=True)
        t.mark("append_1")
        append_band_index(epoch, p, l0=True)
        t.mark("append_2")
        t.phases["files_after_appends"] = count_files(p)
        t.mark("_")
        compact_band_index(spark, p)
        t.mark("compact")
        t.phases["files_after_compact"] = count_files(p)
        t.mark("_")
        out = probe_band_index(spark, p, probe)
        out.collect()
        t.mark("probe+collect")
    t.phases.pop("_", None)
    return t.phases


def text_probe(spark, sf_dir):
    from carbonapi_spark.datapipe.retrieval import (
        append_text_index, bm25_query_index, compact_text_index,
        write_text_index)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = T()
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/tix"
        write_text_index(docs.where(F.col("doc_id") % 2 == 0), p,
                         n_buckets=16)
        t.mark("write_text_index")
        t.phases["files_after_write"] = count_files(p)
        t.mark("_")
        delta = docs.where(F.col("doc_id") % 2 == 1)
        append_text_index(delta, p)
        t.mark("append_1")
        append_text_index(delta, p)
        t.mark("append_2")
        t.phases["files_after_appends"] = count_files(p)
        t.mark("_")
        compact_text_index(spark, p)
        t.mark("compact")
        out = bm25_query_index(spark, p, "hash join order", k=25)
        out.collect()
        t.mark("probe+collect")
    t.phases.pop("_", None)
    return t.phases


def ann_common(spark, sf_dir):
    from carbonapi_spark.datapipe.similarity import (ivf_centroids,
                                                     pq_codebooks)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(64, 8, 43)
    cbs = pq_codebooks(64, 8, 16, 44)
    return emb, cents, cbs


def ann_compact(spark, sf_dir):
    from carbonapi_spark.datapipe.similarity import (
        ann_index_topk, append_ann_index, compact_ann_index,
        write_ann_index)
    emb, cents, cbs = ann_common(spark, sf_dir)
    epoch = emb.where(F.col("vec_id") % 3 == 0)
    t = T()
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/ann"
        write_ann_index(emb.where(F.col("vec_id") % 3 != 0), p, cbs, cents)
        t.mark("write_ann_index")
        append_ann_index(epoch, p)
        t.mark("append_1")
        append_ann_index(epoch, p)
        t.mark("append_2")
        compact_ann_index(spark, p)
        t.mark("compact")
        out = ann_index_topk(spark, p, emb.where(F.col("vec_id") < 5),
                             k=10, nprobe=3)
        out.collect()
        t.mark("probe+collect")
    return t.phases


def ann_l0(spark, sf_dir):
    from carbonapi_spark.datapipe.similarity import (
        ann_index_topk, append_ann_index, compact_ann_index,
        write_ann_index)
    emb, cents, cbs = ann_common(spark, sf_dir)
    delta = emb.where(F.col("vec_id") % 3 == 0)
    t = T()
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/ann"
        write_ann_index(emb.where(F.col("vec_id") % 3 != 0), p, cbs, cents)
        t.mark("write_ann_index")
        append_ann_index(delta.where(F.col("vec_id") % 2 == 0), p, l0=True)
        t.mark("append_l0_1")
        append_ann_index(delta.where(F.col("vec_id") % 2 == 1), p, l0=True)
        t.mark("append_l0_2")
        out = ann_index_topk(spark, p, emb.where(F.col("vec_id") < 5),
                             k=10, nprobe=3)
        out.collect()
        t.mark("probe1+collect")
        compact_ann_index(spark, p, fragmented_only=True)
        t.mark("compact_frag")
        out = ann_index_topk(spark, p, emb.where(F.col("vec_id") < 5),
                             k=10, nprobe=3)
        out.collect()
        t.mark("probe2+collect")
    return t.phases


def ann_delete(spark, sf_dir):
    from carbonapi_spark.datapipe.similarity import (
        ann_index_topk, delete_from_ann_index, write_ann_index)
    emb, cents, cbs = ann_common(spark, sf_dir)
    t = T()
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/ann"
        write_ann_index(emb, p, cbs, cents)
        t.mark("write_ann_index")
        doomed = emb.where(F.col("vec_id") % 17 == 9).select("vec_id")
        delete_from_ann_index(spark, p, doomed)
        t.mark("delete")
        out = ann_index_topk(spark, p, emb.where(F.col("vec_id") < 5),
                             k=10, nprobe=3)
        out.collect()
        t.mark("probe+collect")
    return t.phases


def ann_auto(spark, sf_dir):
    from carbonapi_spark.datapipe.similarity import (ann_auto_topk,
                                                     write_ann_index)
    emb, cents, cbs = ann_common(spark, sf_dir)
    query = emb.where(F.col("vec_id") < 5)
    t = T()
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/ann"
        write_ann_index(emb, p, cbs, cents, store_vectors=True)
        t.mark("write_ann_index(store_vectors)")
        exact = ann_auto_topk(emb, query, k=10, index_path=p,
                              crossover=10 ** 9, exact_method="sql") \
            .withColumn("route", F.lit("exact"))
        exact.collect()
        t.mark("exact_route+collect")
        probe = ann_auto_topk(emb, query, k=10, index_path=p,
                              crossover=0, nprobe=3, refine=40, n=1) \
            .withColumn("route", F.lit("index"))
        probe.collect()
        t.mark("index_route+collect")
    return t.phases


PROBES = {"band": band_probe, "text": text_probe,
          "ann_compact": ann_compact, "ann_l0": ann_l0,
          "ann_delete": ann_delete, "ann_auto": ann_auto}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    names = sys.argv[1:] or list(PROBES)
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"phase:{name}")
        # warmup pass then measured pass, like the bench
        PROBES[name](spark, sf_dir)
        out[name] = PROBES[name](spark, sf_dir)
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
