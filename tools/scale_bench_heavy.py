"""VERDICT r14 #7: make parallel scaling falsifiable.  sf0.1 is
fixed-cost bound (8 cores beat 32 on the full suite), so shuffle/skew
claims need a CPU-bound measurement.  This tool

1. materializes a deterministic ~sf1 stand-in by inflating the sf0.1
   corpus tables 10x (ids shifted per copy; text gets a per-copy suffix
   so shingles/minhashes differ; embeddings get a tiny per-copy offset
   in dim 0 so ANN cells are not 10 identical clusters) — NO randomness,
   byte-stable across runs;
2. times the top-N heaviest catalog entries at that scale with the
   bench.py methodology (warmup + 2 timed passes, min), honoring
   $SPARK_GRAFT_CPUS — run it twice (8 vs 32) for the scaling table.

The inflated lake lives under .scratch/ (gitignored).  It is an input
to SCALE.md measurements only — the driver bench contract (bench.py at
$SPARK_GRAFT_SF_DIR) is untouched, and nothing here is read by any
catalog entry.

Usage: SPARK_GRAFT_CPUS=8 python tools/scale_bench_heavy.py [--passes=2]
                                                            [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf1"
COPIES = 10
# default: the top-10 heaviest entries of the r14 closing bench
DEFAULT = ["band_compact_probe", "ann_l0_probe", "stream_ann_replay",
           "dedup_agreement", "core_numbers", "kn_trigram_ppl",
           "text_compact_probe", "ann_compact_probe", "ann_delete_probe",
           "pagerank"]


def materialize(spark):
    from pyspark.sql import functions as F
    if os.path.exists(f"{DST}/_DONE"):
        return
    os.makedirs(DST, exist_ok=True)
    import shutil
    for name in os.listdir(SRC):
        tbl = name[:-len(".parquet")]
        src = f"{SRC}/{name}"
        if tbl not in ("documents", "embeddings", "events"):
            shutil.copyfile(src, f"{DST}/{name}")
            continue
        df = spark.read.parquet(src)
        copies = []
        for i in range(COPIES):
            c = df
            if i and tbl == "documents":
                sfx = f" copymark{i}"
                c = (c.withColumn("doc_id",
                                  F.col("doc_id") + i * 1_000_000)
                     .withColumn("text", F.concat(F.col("text"),
                                                  F.lit(sfx)))
                     .withColumn("n_chars",
                                 F.col("n_chars") + len(sfx)))
            elif i and tbl == "embeddings":
                # shift dim 0 by i/1000 — keeps vectors distinct and
                # deterministic without changing their scale (element
                # type stays float to match the stored schema)
                c = (c.withColumn("vec_id",
                                  F.col("vec_id") + i * 1_000_000)
                     .withColumn(
                         "embedding",
                         F.concat(F.array((F.element_at("embedding", 1)
                                           + F.lit(i / 1000.0))
                                          .cast("float")),
                                  F.slice("embedding", 2, 10_000))))
            elif i and tbl == "events":
                # disjoint users + event ids per copy
                c = (c.withColumn("user_id",
                                  F.col("user_id") + i * 1_000_000)
                     .withColumn("event_id",
                                 F.col("event_id") + i * 10_000_000))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.coalesce(8).write.mode("overwrite").parquet(f"{DST}/{name}")
    open(f"{DST}/_DONE", "w").close()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes_n = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes_n = int(a.split("=", 1)[1])
    entries = args or DEFAULT
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("carbonapi-spark-scale-heavy")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    materialize(spark)

    from pyspark.sql import functions as F

    from carbonapi_spark import scratch
    from carbonapi_spark.entry_queries import QUERIES, _cached_lake

    spark.read.parquet(f"{DST}/events.parquet").count()
    import pandas as pd  # noqa: F401
    (spark.range(8).repartition(int(cpus))
     .groupBy("id").applyInPandas(lambda p: p, "id long").count())
    _cached_lake(spark, DST).df.count()

    def run(fn):
        df = fn(spark, DST)
        df.agg(F.sum(F.xxhash64(*df.columns).cast("double"))).collect()
        scratch.release()

    times: dict[str, float] = {}
    for name in entries:           # untimed warmup
        run(QUERIES[name])
    for _ in range(passes_n):
        for name in entries:
            t0 = time.perf_counter()
            run(QUERIES[name])
            dt = round(time.perf_counter() - t0, 4)
            times[name] = min(times.get(name, dt), dt)
    print(json.dumps({"cpus": cpus, "scale": "sf1-standin(10x sf0.1)",
                      "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
