"""Scale smoke for the watermarked stream-stream interval join at 20M
events (200k users): purchases inner-join the views of the same user in
the trailing 1h window, replayed availableNow with a 10-file slicing so
match pairs genuinely cross micro-batches.

Usage: python tools/scale_smoke_r8f.py
Prints one JSON line per case.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke_events import EVENTS, build_events  # noqa: E402


def main():
    from pyspark.sql import SparkSession, functions as F

    from carbonapi_spark.streaming.joins import stream_interval_join

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark)
    batch = spark.read.parquet(EVENTS)
    batch.count()  # warm page cache

    def case(name, fn):
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"case": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}), flush=True)

    def _sides(ev):
        ets = F.timestamp_seconds(F.col("sec"))
        left = (ev.where(F.col("event_type") == "purchase")
                .select(F.col("event_id").alias("p_id"), "user_id",
                        ets.alias("pts")))
        right = (ev.where(F.col("event_type") == "view")
                 .select(F.col("event_id").alias("v_id"),
                         F.col("user_id").alias("vu"),
                         ets.alias("vts"))
                 .withColumnRenamed("vu", "user_id"))
        return left, right

    def run_batch_join():
        left, right = _sides(batch)
        j = left.join(right,
                      (left["user_id"] == right["user_id"])
                      & (right["vts"] >= left["pts"]
                         - F.expr("INTERVAL 3600 SECONDS"))
                      & (right["vts"] <= left["pts"]), "inner")
        return j.count()

    def _run(joined):
        total = [0]

        def sink(bdf, _bid):
            total[0] += bdf.count()

        with tempfile.TemporaryDirectory() as ckpt:
            q = (joined.writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            peak = 0
            for p in q.recentProgress:
                for so in (p.get("stateOperators") or []):
                    peak = max(peak, so.get("numRowsTotal", 0))
        print(json.dumps({"peak_state_rows": peak}), flush=True)
        return total[0]

    def run_stream_join():
        schema = batch.schema
        stream = (spark.readStream.schema(schema)
                  # ~7 micro-batches over the 64 files: cross-batch
                  # buffering is exercised for real
                  .option("maxFilesPerTrigger", "10")
                  .parquet(EVENTS))
        left, right = _sides(stream)
        # watermark must cover the arrival disorder of the file feed
        # (files are hash-scattered over the full 12-week range); a
        # production feed is roughly time-ordered and uses minutes.
        joined = stream_interval_join(left, right, by="user_id",
                                      left_ts="pts", right_ts="vts",
                                      lookback_s=3600,
                                      watermark_s=7_257_600)
        return _run(joined)

    ORDERED = EVENTS + "_timeordered"

    def run_stream_join_ordered():
        # production shape: the feed arrives roughly in event-time
        # order (8 sequential range-files, ordered modtimes), so a
        # 2h watermark suffices and the state store holds only
        # ~rate x (watermark + range) — NOT the whole stream.  The
        # hash-scattered variant above needs a full-span watermark and
        # buffers all 20M events: the worst case, kept for contrast.
        if not os.path.isdir(ORDERED):
            span = 7_257_600
            for b in range(8):
                lo, hi = b * span // 8, (b + 1) * span // 8
                (batch.where((F.col("sec") >= lo) & (F.col("sec") < hi))
                 .coalesce(4).write.mode("append").parquet(ORDERED))
                time.sleep(1.1)   # distinct modtimes => ordered feed
        schema = batch.schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "4")
                  .parquet(ORDERED))
        left, right = _sides(stream)
        joined = stream_interval_join(left, right, by="user_id",
                                      left_ts="pts", right_ts="vts",
                                      lookback_s=3600,
                                      watermark_s=7200)
        return _run(joined)

    case("batch_interval_join_20M", run_batch_join)
    case("stream_interval_join_20M", run_stream_join)
    case("stream_interval_join_ordered_20M", run_stream_join_ordered)
    spark.stop()


if __name__ == "__main__":
    main()
