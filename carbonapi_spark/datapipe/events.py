"""Event-sequence analytics over the events table: ordered funnels,
cohort retention, and transition counts.

The events side of the engine (sessionize, per-user streams) extended
with the three classic product-analytics queries.  All three are pure
DataFrame algebra — windows keyed by user and small keyed aggregations —
and every quantity is an exact integer or a 6-dp-rounded ratio, so each
op carries an exact SQL oracle.

Scale shape: everything shuffles at most once per stage on ``user_id``
(the natural partitioner for event streams); funnel steps are K
sequential user-keyed joins with K the (tiny) funnel length; outputs are
step-/cohort-/type-pair-sized, never event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(events: DataFrame, steps: list[str],
           within_s: int | None = None, user_col: str = "user_id",
           type_col: str = "event_type",
           ts_col: str = "sec") -> DataFrame:
    """Ordered funnel conversion: for each prefix of ``steps``, how many
    users performed the steps IN ORDER (each step strictly after the
    previous one; ``within_s`` bounds the whole journey from step 1).

    The sequential dependency is K-1 user-keyed joins: step i's
    earliest qualifying timestamp is min(ts > t_{i-1}) per user —
    the standard ordered-funnel semantics (earliest-completion
    greedy, which never misses a completion for unbounded funnels).
    With ``within_s`` the greedy anchor is the EARLIEST step-1 event;
    journeys that would only complete from a later anchor are not
    counted (documented trade-off; exact per-anchor search is
    exponential).  Returns (step, event_type, n_users, conversion)
    with conversion relative to step 1."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    sec = F.col(ts_col)
    cur = (events.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(sec).alias("__t1")))
    counts = [cur.count()]
    prev, prev_t = cur, "__t1"
    for i, s in enumerate(steps[1:], start=2):
        nxt = (events.where(F.col(type_col) == s)
               .join(prev, user_col)
               .where(sec > F.col(prev_t)))
        if within_s is not None:
            nxt = nxt.where(sec <= F.col("__t1") + F.lit(within_s))
        cur = (nxt.groupBy(user_col)
               .agg(F.min(sec).alias(f"__t{i}"),
                    F.first("__t1").alias("__t1")))
        counts.append(cur.count())
        prev, prev_t = cur, f"__t{i}"
    spark = events.sparkSession
    base = counts[0]
    rows = [(i + 1, steps[i], counts[i],
             round(counts[i] / base, 6) if base else 0.0)
            for i in range(len(steps))]
    return spark.createDataFrame(
        rows, "step INT, event_type STRING, n_users LONG, "
              "conversion DOUBLE")


def cohort_retention(events: DataFrame, period_s: int = 7 * 86400,
                     user_col: str = "user_id",
                     ts_col: str = "sec") -> DataFrame:
    """Classic retention triangle: users are cohorted by the period of
    their FIRST event; cell (cohort, offset) counts cohort members
    active ``offset`` periods later.  Periods are absolute buckets
    (ts div period), so cohorts align across the corpus.

    Two user-keyed aggregations (first event, distinct active periods)
    and one join — output is (cohorts x offsets)-sized.  Returns
    (cohort_period, period_offset, n_users, retention) with retention
    relative to the cohort's size (offset 0 row = 1.0 by
    construction)."""
    sec = F.col(ts_col)
    period = F.floor(sec / F.lit(period_s)).cast("long")
    first = (events.groupBy(user_col)
             .agg(F.min(period).alias("__cohort")))
    active = (events.select(F.col(user_col), period.alias("__p"))
              .distinct())
    size = first.groupBy("__cohort").agg(
        F.count(F.lit(1)).alias("__size"))
    cells = (active.join(first, user_col)
             .groupBy("__cohort", (F.col("__p") - F.col("__cohort"))
                      .alias("period_offset"))
             .agg(F.count(F.lit(1)).alias("n_users")))
    return (cells.join(F.broadcast(size), "__cohort")
            .select(F.col("__cohort").alias("cohort_period"),
                    "period_offset", "n_users",
                    F.round(F.col("n_users") / F.col("__size"), 6)
                    .alias("retention")))


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "sec",
                      order_col: str = "event_id") -> DataFrame:
    """First-order transition counts between consecutive events of each
    user (the Markov/sankey matrix): (event_type, next_type, n) with
    the user's last event transitioning to the '__end__' sentinel.
    Deterministic ordering via (ts, order_col) — whole-second
    timestamps collide, the id breaks the tie.  One window over the
    user-partitioned stream plus one pair-keyed aggregation."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(order_col))
    nxt = F.lead(type_col).over(w)
    return (events.select(F.col(type_col),
                          F.coalesce(nxt, F.lit("__end__"))
                          .alias("next_type"))
            .groupBy(type_col, "next_type")
            .agg(F.count(F.lit(1)).alias("n")))
