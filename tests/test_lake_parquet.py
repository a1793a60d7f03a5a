"""Parquet-backed lake: pushdown + partition-pruning behavior (the 100 TB
path, exercised at toy scale)."""

import pytest
from pyspark.sql import functions as F

from carbonapi_spark.sources.lake import SeriesLake


@pytest.fixture(scope="module")
def parquet_lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "series")
    rows = []
    for d in range(3):  # 3 day-partitions
        for h in range(24):
            ts = d * 86400 + h * 3600
            rows.append(("web.h1.cpu", ts, float(h)))
            rows.append(("web.h2.cpu", ts, float(h * 2)))
            rows.append(("db.h1.io", ts, 1.0))
    df = spark.createDataFrame(rows, "name STRING, ts BIGINT, value DOUBLE") \
        .withColumn("day", F.col("ts") - F.col("ts") % 86400)
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    return SeriesLake(spark.read.parquet(path), 3600, time_partition_col="day")


def test_fetch_prunes_and_pushes(spark, parquet_lake):
    frame = parquet_lake.fetch(spark, "web.*.cpu", 86400, 2 * 86400,
                               densify=False)
    plan = frame.df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "StringStartsWith(name,web.)" in plan
    rows = frame.df.collect()
    assert len(rows) == 2 * 24
    assert all(86400 <= r["ts"] < 2 * 86400 for r in rows)


def test_fetch_densify_from_parquet(spark, parquet_lake):
    frame = parquet_lake.fetch(spark, "web.h1.cpu", 0, 86400)
    assert frame.df.count() == 24
