"""Projections of the driver's synthetic tables into the series lake shape.

``/root/testdata/sf*/events.parquet`` (event_id, ts, user_id, event_type,
value, props) becomes two Graphite series families on a fixed hourly step
(deterministic, so the DuckDB oracle can reproduce them exactly):

- ``events.<event_type>``             value = sum(value) per hour   (depth 2)
- ``events.u<user_id%10>.<event_type>`` value = sum(value) per hour (depth 3,
  glob-able middle segment, 50 series)

The projection is sparse (only buckets with events); ``SeriesLake.fetch``
densifies to the request range, which introduces genuine NULL gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from carbonapi_spark.sources.lake import SeriesLake

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# [2024-01-01, 2024-01-31) UTC — the events table's hour-bucket coverage
EVENTS_FROM = 1704067200
EVENTS_UNTIL = 1706659200
EVENTS_STEP = 3600


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def epoch_seconds(df: DataFrame, col: str = "ts"):
    """Epoch-seconds column for whatever physical type the driver wrote the
    events timestamp as — it has varied across testdata generations:
    double epoch seconds, TIMESTAMP(NANOS) (bigint via nanosAsLong), and
    timestamp[us] (TIMESTAMP_NTZ in Spark).  All branches floor toward
    -inf to whole seconds, matching DuckDB's date_trunc semantics (UTC)."""
    dt = dict(df.dtypes).get(col)
    c = F.col(col)
    if dt == "bigint":  # TIMESTAMP(NANOS) read with nanosAsLong=true
        return F.floor(c / F.lit(1_000_000_000)).cast("long")
    if dt == "timestamp_ntz":  # naive wall clock; driver writes UTC.
        # to_utc_timestamp pins the interpretation to UTC regardless of
        # spark.sql.session.timeZone; unix_seconds floor-divides micros.
        return F.unix_seconds(F.to_utc_timestamp(c, "UTC"))
    if dt == "timestamp":  # an instant; unix_seconds is tz-independent
        return F.unix_seconds(c)
    return F.floor(c.cast("double")).cast("long")  # numeric epoch seconds


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # harmless when ts is not nanos; required when it is
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_series_df(spark: SparkSession, sf_dir: str,
                     step: int = EVENTS_STEP) -> DataFrame:
    ev = read_events(spark, sf_dir)
    sec = epoch_seconds(ev)
    bucket = (sec - sec % F.lit(step)).alias("ts")
    by_type = (ev.groupBy(F.concat(F.lit("events."), F.col("event_type")).alias("name"),
                          bucket)
                 .agg(F.sum("value").alias("value")))
    by_user = (ev.groupBy(F.concat(F.lit("events.u"), (F.col("user_id") % 10).cast("string"),
                                   F.lit("."), F.col("event_type")).alias("name"),
                          bucket)
                 .agg(F.sum("value").alias("value")))
    return by_type.unionByName(by_user)


def events_series_lake(spark: SparkSession, sf_dir: str,
                       step: int = EVENTS_STEP) -> SeriesLake:
    return SeriesLake(events_series_df(spark, sf_dir, step), step)


# The same projection as DuckDB SQL, for __spark_entry__ oracles.
ORACLE_EVENTS_CTE = """
ev AS (
  SELECT 'events.' || event_type AS name,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ts,
         SUM(value) AS value
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 'events.u' || CAST(user_id % 10 AS VARCHAR) || '.' || event_type AS name,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ts,
         SUM(value) AS value
  FROM events GROUP BY 1, 2
),
spine AS (SELECT ts FROM generate_series({from_ts}, {until_ts} - {step}, {step}) g(ts)),
names AS (SELECT DISTINCT name FROM ev WHERE {name_filter}),
dense AS (
  SELECT n.name, s.ts, e.value
  FROM names n CROSS JOIN spine s
  LEFT JOIN ev e ON e.name = n.name AND e.ts = s.ts
)
""".strip()


def oracle_prefix(name_filter: str = "TRUE", from_ts: int = EVENTS_FROM,
                  until_ts: int = EVENTS_UNTIL, step: int = EVENTS_STEP) -> str:
    """WITH-clause body giving a densified `dense(name, ts, value)` CTE."""
    return ORACLE_EVENTS_CTE.format(name_filter=name_filter, from_ts=from_ts,
                                    until_ts=until_ts, step=step)
