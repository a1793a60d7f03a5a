"""Optimization-round helper: dump ``.explain("formatted")`` for a set
of catalog queries to ``plans/r14/<query>_<tag>.txt`` (tag = before /
after), so plan-shape claims in OPTIMIZATION_r14.md are checkable
without running Spark.

For the durable-index maintenance probes the returned DataFrame is a
collected local relation (the tempdir artifact dies with the call), so
their files capture the INTERNAL stage plans instead: the index write,
the compaction stage write, and the probe read — the plans the
optimization actually changed.

Usage: python tools/opt_capture_plans.py TAG query [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def probe_internal_plans(spark, sf_dir, name):
    """(section_title, plan_text) pairs for the maintenance probes'
    internal stages."""
    from pyspark.sql import functions as F
    out = []
    if name in ("band_compact_probe",):
        from carbonapi_spark.datapipe.dedup import (minhash_band_index,
                                                    probe_band_index,
                                                    write_band_index)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        corpus = docs.where(F.col("doc_id") % 5 != 4)
        probe = docs.where((F.col("doc_id") % 5 == 4)
                           & (F.col("doc_id") % 2 == 1))
        idx = minhash_band_index(corpus, num_hashes=16, bands=4, ngram=2)
        try:
            from carbonapi_spark.datapipe import combo_repartition
            w = combo_repartition(
                idx.withColumn("bucket",
                               F.pmod(F.xxhash64("key"), F.lit(64))
                               .cast("int")), ["band", "bucket"], 256)
        except ImportError:
            w = idx.withColumn("bucket",
                               F.pmod(F.xxhash64("key"), F.lit(64))
                               .cast("int"))
        out.append(("band index write input (pre partitionBy)", fmt(w)))
        with tempfile.TemporaryDirectory() as tmp:
            p = f"{tmp}/bands"
            write_band_index(corpus, p, num_hashes=16, bands=4, ngram=2)
            out.append(("probe_band_index output",
                        fmt(probe_band_index(spark, p, probe))))
    elif name in ("ann_compact_probe", "ann_delete_probe", "ann_l0_probe",
                  "ann_auto_route", "stream_ann_replay"):
        from carbonapi_spark.datapipe.similarity import (ann_index_topk,
                                                         ivf_centroids,
                                                         ivfpq_encode,
                                                         pq_codebooks,
                                                         write_ann_index)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = ivf_centroids(64, 8, 43)
        cbs = pq_codebooks(64, 8, 16, 44)
        out.append(("ivfpq_encode (index build input)",
                    fmt(ivfpq_encode(emb, cbs, cents))))
        with tempfile.TemporaryDirectory() as tmp:
            p = f"{tmp}/ann"
            write_ann_index(emb, p, cbs, cents)
            out.append(("ann_index_topk probe output",
                        fmt(ann_index_topk(spark, p,
                                           emb.where(F.col("vec_id") < 5),
                                           k=10, nprobe=3))))
    elif name == "text_compact_probe":
        from carbonapi_spark.datapipe.retrieval import (bm25_query_index,
                                                        write_text_index)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        with tempfile.TemporaryDirectory() as tmp:
            p = f"{tmp}/tix"
            write_text_index(docs.where(F.col("doc_id") % 2 == 0), p,
                             n_buckets=16)
            out.append(("bm25_query_index probe output",
                        fmt(bm25_query_index(spark, p, "hash join order",
                                             k=25))))
    return out


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from carbonapi_spark.entry_queries import QUERIES
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.environ.get("PLANS_DIR", os.path.join(here, "plans", "r14"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        sections = probe_internal_plans(spark, sf_dir, name)
        if not sections:
            sections = [("query output", fmt(QUERIES[name](spark, sf_dir)))]
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            for title, plan in sections:
                f.write(f"==== {title} ====\n{plan}\n")
        print("captured", name, tag, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
