"""Optimization-round helper: time a SUBSET of catalog entries with the
exact bench.py methodology (same session config, same xxhash64-sum
consume, warmup + N timed passes, per-query min) so before/after numbers
for a targeted change are comparable without paying a 5-minute full run.

Usage: python tools/opt_bench_subset.py [--passes N] query [query ...]
Prints one JSON line {"queries": {name: min_sec}, "passes": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes_n = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes_n = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("carbonapi-spark-opt-subset")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from carbonapi_spark.entry_queries import QUERIES

    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    import pandas as pd  # noqa: F401
    (spark.range(8).repartition(int(cpus))
     .groupBy("id").applyInPandas(lambda p: p, "id long").count())
    from carbonapi_spark.entry_queries import _cached_lake
    _cached_lake(spark, sf_dir).df.count()

    from pyspark.sql import functions as F

    from carbonapi_spark import scratch

    def run(fn):
        df = fn(spark, sf_dir)
        df.agg(F.sum(F.xxhash64(*df.columns).cast("double"))).collect()
        scratch.release()

    names = args or sys.exit("no queries given")
    for name in names:
        if name not in QUERIES:
            sys.exit(f"unknown query: {name}")

    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        run(QUERIES[name])

    times: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    for _ in range(passes_n):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            run(QUERIES[name])
            dt = round(time.perf_counter() - t0, 4)
            passes.setdefault(name, []).append(dt)
            times[name] = min(times.get(name, dt), dt)

    print(json.dumps({"queries": times, "passes": passes}))
    spark.stop()


if __name__ == "__main__":
    main()
