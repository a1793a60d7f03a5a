"""Stream-stream watermarked interval join (streaming/joins.py):
batch equivalence, cross-micro-batch state buffering, and the
load-bearing rejection of an unbounded (range-free) stream join."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from carbonapi_spark.streaming.joins import stream_interval_join


def _write_events(spark, path, rows, n_files=1):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, kind string, sec long")
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def _run_join(spark, path, lookback_s=100, files_per_trigger=None,
              watermark_s=50):
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    ev = reader.parquet(path).withColumn(
        "ets", F.timestamp_seconds(F.col("sec")))
    left = (ev.where(F.col("kind") == "L")
            .select(F.col("event_id").alias("l_id"), "user_id",
                    F.col("sec").alias("lsec"), F.col("ets").alias("lts")))
    right = (ev.where(F.col("kind") == "R")
             .select(F.col("event_id").alias("r_id"),
                     F.col("user_id").alias("u2"),
                     F.col("sec").alias("rsec"), F.col("ets").alias("rts"))
             .withColumnRenamed("u2", "user_id"))
    joined = stream_interval_join(left, right, by="user_id",
                                  left_ts="lts", right_ts="rts",
                                  lookback_s=lookback_s,
                                  watermark_s=watermark_s)
    rows: list = []

    def sink(bdf, _bid):
        rows.extend((r["l_id"], r["r_id"]) for r in bdf.collect())

    with tempfile.TemporaryDirectory() as ckpt:
        q = (joined.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    return sorted(rows)


EVENTS = [
    # user 1: L at t=1000; R at 920 (in window), 899 (outside), 1001 (after)
    (1, 1, "L", 1000), (2, 1, "R", 920), (3, 1, "R", 899),
    (4, 1, "R", 1001),
    # user 2: boundary hits — exactly lookback before, and exactly at L
    (5, 2, "L", 500), (6, 2, "R", 400), (7, 2, "R", 500),
    # user 3: R only, never matches
    (8, 3, "R", 123),
]
EXPECTED = [(1, 2), (5, 6), (5, 7)]


def test_interval_join_matches_batch_semantics(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ev")
    _write_events(spark, path, EVENTS)
    assert _run_join(spark, path) == EXPECTED


def test_interval_join_buffers_across_micro_batches(spark, tmp_path):
    # one event per file + maxFilesPerTrigger=1 => every row arrives in
    # its own micro-batch, in ARBITRARY file order; matches spanning
    # batches must still emit (both sides are buffered in the state
    # store).  The watermark must exceed the dataset's time span here:
    # with a 50 s watermark a t=500 row arriving after a t=1001 row is
    # legitimately dropped as late — observed, and exactly the
    # semantics the watermark contract specifies.
    path = os.path.join(str(tmp_path), "ev_multi")
    _write_events(spark, path, EVENTS, n_files=len(EVENTS))
    got = _run_join(spark, path, files_per_trigger=1, watermark_s=10_000)
    assert got == EXPECTED


def test_unbounded_outer_stream_join_is_rejected(spark, tmp_path):
    # without a time-range condition an inner join merely leaks state
    # (Spark warns and runs — probed), but an OUTER stream-stream join
    # has no way to ever finalize unmatched rows, so Spark rejects the
    # plan — the scalability contract this module documents
    path = os.path.join(str(tmp_path), "ev_nobound")
    _write_events(spark, path, EVENTS)
    schema = spark.read.parquet(path).schema
    ev = (spark.readStream.schema(schema).parquet(path)
          .withColumn("ets", F.timestamp_seconds(F.col("sec"))))
    left = (ev.where(F.col("kind") == "L")
            .select(F.col("event_id").alias("l_id"), "user_id",
                    F.col("ets").alias("lts"))
            .withWatermark("lts", "50 seconds"))
    right = (ev.where(F.col("kind") == "R")
             .select(F.col("event_id").alias("r_id"),
                     F.col("user_id").alias("ru"),
                     F.col("ets").alias("rts"))
             .withWatermark("rts", "50 seconds"))
    joined = left.join(right, left["user_id"] == right["ru"],
                       "left_outer")
    with tempfile.TemporaryDirectory() as ckpt:
        with pytest.raises(Exception) as ei:
            q = (joined.writeStream.format("noop").outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        msg = str(ei.value)
        assert "watermark" in msg.lower() or "outer" in msg.lower() \
            or "join" in msg.lower()
