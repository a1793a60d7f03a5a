"""Scale smoke for the round-8 wave-2 ops: kaplan_meier /
markov_attribution / mad_outliers over the synthetic 20M-event stream
(reuses scale_smoke_events' generator), textrank over 500k docs,
k_center + pca_power over 200k x 64 vectors, and the stream_ewma_anomaly
kernel replaying 8M ordered points through availableNow micro-batches.

Usage: python tools/scale_smoke_r8g.py [case ...]
Prints one JSON line per case: {"case": ..., "sec": ..., "rows": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_smoke_events import EVENTS, build_events  # noqa: E402

DOCS = "/root/repo/.scratch/scale_docs"
VECS = "/root/repo/.scratch/scale_vecs"


def build_docs(spark):
    """500k synthetic docs, ~40 tokens each, Zipf-ish vocabulary."""
    from pyspark.sql import functions as F
    if os.path.isdir(DOCS):
        return
    words = ("array('the','data','spark','query','engine','plan','join',"
             "'shuffle','table','scan','memory','cache','index','merge',"
             "'sorted','filter','column','vector','stream','batch')")
    tok = (f"element_at({words}, cast(pmod(xxhash64(id * 40 + pos), "
           f"cast(1 + pmod(xxhash64(id * 40 + pos + 3), 19) as int)) "
           f"as int) + 1)")
    (spark.range(500_000)
     .select(F.col("id").alias("doc_id"),
             F.expr(f"array_join(transform(sequence(1, 40), "
                    f"pos -> {tok}), ' ')").alias("text"))
     .repartition(64)
     .write.mode("overwrite").parquet(DOCS))


def build_vecs(spark):
    """200k x 64 deterministic pseudo-random unit-ish vectors."""
    from pyspark.sql import functions as F
    if os.path.isdir(VECS):
        return
    (spark.range(200_000)
     .select(F.col("id").alias("vec_id"),
             F.expr("transform(sequence(0, 63), d -> "
                    "cast(pmod(xxhash64(id * 64 + d), 2001) - 1000 "
                    "as double) / 1000.0)").alias("embedding"))
     .repartition(32)
     .write.mode("overwrite").parquet(VECS))


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    build_events(spark)
    build_docs(spark)
    build_vecs(spark)
    ev = spark.read.parquet(EVENTS)
    docs = spark.read.parquet(DOCS)
    vecs = spark.read.parquet(VECS)
    # touch data pages so case order doesn't bias the numbers
    ev.agg({"sec": "max"}).collect()
    docs.agg({"text": "max"}).collect()
    vecs.count()

    def case(name, fn):
        if only and name.split("_20M")[0].split("_500k")[0] \
                .split("_200k")[0].split("_8M")[0] not in only and \
                name not in only:
            return
        from carbonapi_spark import scratch
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"case": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}), flush=True)
        scratch.release()

    from carbonapi_spark.datapipe.events import (
        kaplan_meier, mad_outliers, markov_attribution)
    case("kaplan_meier_20M",
         lambda: len(kaplan_meier(ev, period_s=7 * 86400).collect()))
    case("markov_attribution_20M",
         lambda: len(markov_attribution(
             ev, ["view", "click", "other"], "purchase").collect()))
    # metric-like value column: 2-dp quantized (the driver testdata's
    # `value` shape) — 40k distinct values, so the histogram recipe's
    # cumulative window is value-range-sized, not event-sized
    from pyspark.sql import functions as F
    evv = ev.withColumn(
        "value", (F.pmod(F.xxhash64(F.col("event_id") * 3),
                         F.lit(40_000))).cast("double") / 100.0)
    case("mad_outliers_20M",
         lambda: len(mad_outliers(evv, group_col="event_type",
                                  val_col="value").collect()))

    from carbonapi_spark.datapipe.events import (key_skew_report,
                                                  time_to_convert)
    case("key_skew_20M",
         lambda: len(key_skew_report(ev, "user_id").collect()))
    case("time_to_convert_20M",
         lambda: len(time_to_convert(
             ev, "purchase", ["view", "click", "other"]).collect()))

    from carbonapi_spark.datapipe.text import textrank_keywords
    case("textrank_500k",
         lambda: len(textrank_keywords(docs, k=20).collect()))

    from carbonapi_spark.datapipe.linalg import pca_power_top
    from carbonapi_spark.datapipe.similarity import k_center_select
    case("k_center_200k",
         lambda: len(k_center_select(vecs, k=8).collect()))
    case("pca_power_200k",
         lambda: len(pca_power_top(vecs).collect()))

    def stream_anom():
        import tempfile

        from pyspark.sql import functions as F

        from carbonapi_spark.streaming.stateful import stream_ewma_anomaly
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", "16").parquet(EVENTS)
               .where(F.col("event_id") < 8_000_000)
               .select(F.col("event_type").alias("key"),
                       F.col("event_id").alias("oid"),
                       (F.col("sec") % 100_000).alias("x_micro")))
        out = stream_ewma_anomaly(src)
        n = [0]

        def sink(bdf, _bid):
            n[0] += bdf.count()

        with tempfile.TemporaryDirectory() as ckpt:
            q = (out.writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return n[0]

    case("stream_ewma_anomaly_8M", stream_anom)

    def stream_cusum_case():
        import tempfile

        from pyspark.sql import functions as F

        from carbonapi_spark.streaming.stateful import stream_cusum
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", "16").parquet(EVENTS)
               .where(F.col("event_id") < 8_000_000)
               .select(F.col("event_type").alias("key"),
                       F.col("event_id").alias("oid"),
                       (F.col("sec") % 100_000).alias("x_micro")))
        out = stream_cusum(src)
        n = [0]

        def sink(bdf, _bid):
            n[0] += bdf.count()

        with tempfile.TemporaryDirectory() as ckpt:
            q = (out.writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return n[0]

    case("stream_cusum_8M", stream_cusum_case)


if __name__ == "__main__":
    main()
