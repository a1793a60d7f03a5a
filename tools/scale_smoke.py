"""Scale smoke: generate a multi-million-row series lake and time
representative pipelines. The sf0.1 bench measures per-query overhead;
this measures whether the *shapes* hold when the data is 100x bigger —
the local stand-in for the 1000-executor question.

Usage: python tools/scale_smoke.py [n_series] [n_days]
Writes the lake under .scratch/ (gitignored); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAKE = "/root/repo/.scratch/scale_lake"


def main():
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    step = 60
    start = 1704067200
    stop = start + n_days * 86400
    points = (stop - start) // step

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    if not os.path.exists(LAKE):
        # srv.<group>.<host>.cpu : n_series dense minutely series over n_days
        rows = (spark.range(n_series * points)
                .select(F.col("id"),
                        (F.col("id") % n_series).alias("sid"),
                        (F.col("id") / n_series).cast("long").alias("i")))
        df = rows.select(
            F.concat(F.lit("srv.g"), (F.col("sid") % 20).cast("string"),
                     F.lit(".h"), F.col("sid").cast("string"),
                     F.lit(".cpu")).alias("name"),
            (start + F.col("i") * step).alias("ts"),
            # deterministic wave + occasional nulls (5%)
            F.when((F.col("id") % 20) != 0,
                   F.sin(F.col("i") / 100.0) * 50 + F.col("sid") % 7).alias("value"))
        df = df.withColumn("day", F.col("ts") - F.col("ts") % 86400)
        df.write.mode("overwrite").partitionBy("day").parquet(LAKE)
    gen_s = round(time.perf_counter() - t0, 2)

    from carbonapi_spark.evaluator import EvalContext, eval_target
    from carbonapi_spark.sources.lake import SeriesLake

    lake = SeriesLake(spark.read.parquet(LAKE), step, time_partition_col="day")
    total_rows = n_series * points

    cases = {
        # scan + densify + cross-series agg over every series
        "sum_all": ("sumSeries(srv.*.*.cpu)", start, stop),
        # group-by-node agg (20 groups)
        "group_by_node": ("groupByNode(srv.*.*.cpu, 1, 'avg')", start, stop),
        # window pipeline over every series (single shuffle path)
        "moving_avg_1day": ("movingAverage(srv.g1.*.cpu, 60)",
                            start + 86400, start + 2 * 86400),
        # partition-pruned narrow read: one group, one day
        "pruned_summarize": ("summarize(srv.g1.*.cpu, '1h', 'avg')",
                             start, start + 86400),
        # top-k across all series
        "topk": ("highestAverage(srv.*.*.cpu, 10)", start, start + 86400),
    }

    times = {}
    for name, (target, f, u) in cases.items():
        t0 = time.perf_counter()
        ctx = EvalContext(spark, lake, f, u)
        n = eval_target(ctx, target).df.count()
        times[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}

    print(json.dumps({"lake_rows": total_rows, "n_series": n_series,
                      "n_days": n_days, "gen_sec": gen_s, "cases": times}))
    spark.stop()


if __name__ == "__main__":
    main()
