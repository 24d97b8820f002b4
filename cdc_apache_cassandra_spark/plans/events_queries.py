"""Event-time queries over the ``events`` stream table (SURVEY §2.5).

The reference's only time operator is TTL-bounded dedup state; the new
engine exposes the full Spark event-time surface. These run in batch with
oracles; the same expressions run under ``readStream`` + watermark (tested
in tests/test_streaming.py).

Determinism note: ``value`` is an exact 2-decimal double, so
DECIMAL(18,2) aggregation is lossless; ``ts`` is naive parquet time read
under a UTC session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table

# --- tumbling window aggregation -------------------------------------------

_TUMBLE_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


@register("events_tumbling_hourly", sql=_TUMBLE_SQL)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event type — in streaming this is
    ``groupBy(window(ts, '1 hour'), event_type)`` with a watermark; batch
    equivalent uses date_trunc so the oracle matches exactly."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# --- per-user event sequencing (lag/lead) ----------------------------------

_SEQ_SQL = """
SELECT user_id, event_id, event_type,
       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       CAST(EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 1000000 AS BIGINT) AS gap_us
FROM events
"""


@register("events_user_sequence_gaps", sql=_SEQ_SQL)
def user_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered analytics (the reference's per-key serial execution
    A4 as a window): previous event type and inter-event gap per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).cast("bigint")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        gap.alias("gap_us"),
    )


# --- sessionization (gap-based) --------------------------------------------

_SESSION_SQL = """
WITH seq AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_id
  FROM seq
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sess
GROUP BY user_id, session_id
"""


@register("events_sessionize_30m", sql=_SESSION_SQL)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative-sum session ids —
    the batch twin of streaming ``session_window``."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(wsum)
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


# --- JSON extraction (props column) ----------------------------------------

_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@register("events_json_extract_agg", sql=_JSON_SQL)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON function surface: extract ``k`` from the props JSON and
    aggregate — get_json_object stays JVM-side (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint"))
        .cast("bigint")
        .alias("sum_k"),
        F.count("*").alias("n"),
    )
