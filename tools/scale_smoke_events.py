"""Scale smoke for the event-analytics ops: funnel / cohort_retention /
event_transitions over a synthetic 20M-event stream (200k users x 100
events), so the round-8 one-pass funnel is MEASURED at scale, not
asserted.  Also A/Bs the funnel against a join-chain reimplementation of
the pre-r8 shape to quantify the O(K^2) fix.

Usage: python tools/scale_smoke_events.py [--skip-ab]
Prints one JSON line per case: {"case": ..., "sec": ..., "rows": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = "/root/repo/.scratch/scale_events"


def build_events(spark):
    """200k users x 100 events, deterministic: type from a 5-state
    hash walk, timestamps spread over ~12 weeks."""
    from pyspark.sql import functions as F
    if os.path.isdir(EVENTS):
        return
    types = "array('view','view','click','view','purchase','other')"
    (spark.range(20_000_000)
     .select((F.col("id") % 200_000).alias("user_id"),
             F.expr(f"element_at({types}, "
                    "cast(pmod(xxhash64(id), 6) as int) + 1)")
             .alias("event_type"),
             (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(7_257_600)))
             .alias("sec"),
             F.col("id").alias("event_id"))
     .repartition(64)
     .write.mode("overwrite").parquet(EVENTS))


def funnel_join_chain(events, steps, within_s):
    """The pre-round-8 funnel shape (K joins, count per step, no
    checkpoint) — kept here ONLY as the A/B baseline."""
    from pyspark.sql import functions as F
    sec = F.col("sec")
    cur = (events.where(F.col("event_type") == steps[0])
           .groupBy("user_id").agg(F.min(sec).alias("__t1")))
    counts = [cur.count()]
    prev, prev_t = cur, "__t1"
    for i, s in enumerate(steps[1:], start=2):
        nxt = (events.where(F.col("event_type") == s)
               .join(prev, "user_id").where(sec > F.col(prev_t)))
        if within_s is not None:
            nxt = nxt.where(sec <= F.col("__t1") + F.lit(within_s))
        cur = (nxt.groupBy("user_id")
               .agg(F.min(sec).alias(f"__t{i}"),
                    F.first("__t1").alias("__t1")))
        counts.append(cur.count())
        prev, prev_t = cur, f"__t{i}"
    return counts


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
    build_events(spark)
    ev = spark.read.parquet(EVENTS)

    def case(name, fn):
        from carbonapi_spark import scratch
        t0 = time.perf_counter()
        n = fn()
        print(json.dumps({"case": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}), flush=True)
        scratch.release()

    from carbonapi_spark.datapipe.events import (
        cohort_retention, event_transitions, funnel)

    # warm the page cache (parquet count() reads only footers — touch
    # the actual data pages) + the collect_list/HOF codegen path, so
    # case order doesn't bias the A/B; every recorded number is
    # steady-state
    funnel(ev, ["view", "click"]).collect()

    steps = ["view", "click", "purchase"]
    case("funnel_3step_20M",
         lambda: len(funnel(ev, steps, within_s=14 * 86400).collect()))
    case("funnel_5step_20M",
         lambda: len(funnel(ev, ["view", "click", "view", "click",
                                 "purchase"],
                            within_s=28 * 86400).collect()))
    case("cohort_retention_20M",
         lambda: len(cohort_retention(ev).collect()))
    case("event_transitions_20M",
         lambda: len(event_transitions(ev).collect()))
    if "--skip-ab" not in sys.argv:
        case("funnel_3step_join_chain_AB",
             lambda: len(funnel_join_chain(ev, steps, 14 * 86400)))
        case("funnel_5step_join_chain_AB",
             lambda: len(funnel_join_chain(ev, ["view", "click", "view",
                                                "click", "purchase"],
                                           28 * 86400)))


if __name__ == "__main__":
    main()
