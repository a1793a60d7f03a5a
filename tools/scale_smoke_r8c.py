"""Scale smoke for the final round-8 additions over the persistent
scratch corpora (500k docs from tools/scale_smoke_datapipe.py, 20M
events from tools/scale_smoke_events.py).

Cases: as-of join (purchases pick up the latest at-or-before view per
user — the merge-union plan must cost one shuffle over |L|+|R|, not a
range probe), rolling DAU/WAU/MAU (pair-table contribution explosion),
Bloom build + map-side probe over 500k keys, streaming CMS replay over
the 500k-doc corpus, and triangle counting on a 1.05M-edge power-law
graph with a 50k-degree hub (the orientation bound is exactly what the
hub stresses: ~d wedges, not d^2).

Usage: python tools/scale_smoke_r8c.py
Prints one JSON line per case: {"case": ..., "sec": ..., "rows": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = "/root/repo/.scratch/scale_docs"
EVENTS = "/root/repo/.scratch/scale_events"


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(EVENTS):
        from tools.scale_smoke_events import build_events
        build_events(spark)
    docs = spark.read.parquet(DOCS)
    ev = spark.read.parquet(EVENTS)
    docs.count(); ev.count()  # warm page cache

    def case(name, fn):
        from carbonapi_spark import scratch
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"case": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}), flush=True)
        scratch.release()

    from carbonapi_spark.datapipe.cluster import triangle_count
    from carbonapi_spark.datapipe.events import active_users, asof_join
    from carbonapi_spark.datapipe.sketch import bloom_build, bloom_probe

    def run_asof():
        left = (ev.where(F.col("event_type") == "purchase")
                .select("user_id", "sec", "event_id"))
        right = (ev.where(F.col("event_type") == "view")
                 .groupBy("user_id", "sec")
                 .agg(F.max("event_id").alias("value")))
        out = asof_join(left, right, on="sec", by=("user_id",),
                        right_cols=("value",), tolerance_s=86400)
        return out.count()

    def run_active():
        return active_users(ev).count()

    def run_bloom():
        member = docs.where(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
        bloom = bloom_build(member, "doc_id", m_bits=1 << 21, k=5)
        out = bloom_probe(docs, bloom, "doc_id", m_bits=1 << 21, k=5)
        return out.where(F.col("maybe_member")).count()

    def run_stream_cms():
        import tempfile

        from carbonapi_spark.streaming.stateful import stream_cms_counters
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", "16").parquet(DOCS))
        out = stream_cms_counters(stream, "text", w=2048, d=4)
        final: dict = {}

        def sink(bdf, _bid):
            for r in bdf.collect():
                k = (r["depth"], r["bucket"])
                final[k] = max(final.get(k, 0), r["cnt"])

        with tempfile.TemporaryDirectory() as ckpt:
            q = (out.writeStream.outputMode("update").foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return len(final)

    def run_triangles():
        # 1M random edges over 100k nodes + a 50k-degree hub: the
        # last-reducer stress case for any wedge generator
        base = (spark.range(1_000_000)
                .select(F.pmod(F.xxhash64(F.col("id")), F.lit(100_000))
                        .alias("src"),
                        F.pmod(F.xxhash64(F.col("id") + 1_000_000),
                               F.lit(100_000)).alias("dst")))
        hub = (spark.range(50_000)
               .select(F.lit(100_000).alias("src"),
                       F.col("id").alias("dst")))
        return triangle_count(base.unionByName(hub)).count()

    case("asof_join purchases<-views, 20M events", run_asof)
    case("active_users DAU/WAU/MAU, 20M events", run_active)
    case("bloom build 100k + map-side probe 500k", run_bloom)
    case("stream_cms availableNow replay, 500k docs", run_stream_cms)
    case("triangle_count 1.05M edges + 50k-degree hub", run_triangles)


if __name__ == "__main__":
    main()
