"""Scale smoke for the round-11 HDR quantile sketch: 50M synthetic
values (log-uniform across 8 orders of magnitude, 7 groups) through

  * hdr_buckets + hdr_quantiles  (the sketch path),
  * percentile_approx            (Spark's built-in GK sketch),
  * exact percentile             (sort-based, the naive baseline),

plus the shard-then-merge identity at this scale (per-shard sketches
re-aggregated == one-pass) and the bucket-table cardinality (the 100 TB
claim: bounded by VALUE RANGE, never row count).

Usage: python tools/scale_smoke_r11.py
Prints one JSON line per case: {"case": ..., "sec": ..., ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 50_000_000
GROUPS = 7


def main():
    from pyspark.sql import SparkSession, functions as F

    from carbonapi_spark.datapipe.sketch import (hdr_buckets, hdr_merge,
                                                 hdr_quantiles)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # log-uniform values in [1e-2, 1e6): exp = 8*u - 2 via integer hash
    df = (spark.range(N)
          .select((F.col("id") % GROUPS).cast("string").alias("g"),
                  F.pow(F.lit(10.0),
                        (F.pmod(F.xxhash64("id"), F.lit(1_000_000))
                         / 125_000.0) - 2.0).alias("value")))
    df = df.persist()
    df.count()

    t = time.time()
    b = hdr_buckets(df, "value", by=("g",)).persist()
    n_buckets = b.count()
    t_build = time.time() - t
    t = time.time()
    q = hdr_quantiles(b, qs=(0.5, 0.9, 0.99, 0.999), by=("g",))
    rows = q.collect()
    t_quant = time.time() - t
    print(json.dumps({"case": "hdr_sketch", "sec": round(t_build + t_quant, 2),
                      "build_sec": round(t_build, 2),
                      "quantile_sec": round(t_quant, 2),
                      "rows": N, "bucket_rows": n_buckets,
                      "buckets_per_group": n_buckets / GROUPS}))

    t = time.time()
    pa = (df.groupBy("g")
          .agg(F.percentile_approx("value",
                                   F.array(*[F.lit(x) for x in
                                             (0.5, 0.9, 0.99, 0.999)]),
                                   F.lit(10000)).alias("qs")).collect())
    print(json.dumps({"case": "percentile_approx",
                      "sec": round(time.time() - t, 2), "rows": N}))

    t = time.time()
    ex = (df.groupBy("g")
          .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99, 0.999))")
               .alias("qs")).collect())
    print(json.dumps({"case": "exact_percentile",
                      "sec": round(time.time() - t, 2), "rows": N}))

    # accuracy: sketch p99 within the guaranteed 2^(1-7) relative error
    # of the exact p99
    exact = {r["g"]: r["qs"] for r in ex}
    worst = 0.0
    for r in rows:
        i = {0.5: 0, 0.9: 1, 0.99: 2, 0.999: 3}[r["q"]]
        e = exact[r["g"]][i]
        worst = max(worst, abs(r["est"] - e) / e)
    print(json.dumps({"case": "hdr_accuracy_vs_exact",
                      "worst_rel_err": round(worst, 5),
                      "bound": round(2 ** -6, 5)}))

    # merge identity at scale: 32-shard sketches re-merged == one-pass
    t = time.time()
    sharded = hdr_buckets(
        df.withColumn("shard", F.pmod(F.xxhash64("value"), F.lit(32))),
        "value", by=("g", "shard"))
    merged = (hdr_merge(sharded, by=("g",))
              .withColumnRenamed("cnt", "m"))
    diff = (merged.join(b.withColumnRenamed("cnt", "o"),
                        ["g", "bucket_lo"], "full")
            .where((F.col("m").isNull()) | (F.col("o").isNull())
                   | (F.col("m") != F.col("o"))).count())
    print(json.dumps({"case": "hdr_merge_identity",
                      "sec": round(time.time() - t, 2),
                      "mismatched_buckets": diff}))
    assert diff == 0


if __name__ == "__main__":
    main()
