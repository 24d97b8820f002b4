"""Deep event-stream operators the reference lacks but an events engine
needs (SURVEY §2.5 note: Spark gives windows/rankings free; these add the
as-of join, range join, sliding windows, and lag/lead — each in its
scalable Spark-first formulation with a portable SQL oracle).

Timestamps: events.ts is µs-precision (sources/registry.py nanos
truncation); all window math uses integer µs so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table

# --- As-of join: purchase -> latest prior click (attribution) --------------

_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS typ
  FROM events WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN typ = 0 THEN event_id END IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, typ, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
         LAST_VALUE(CASE WHEN typ = 0 THEN epoch_us(ts) END IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, typ, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us
  FROM tagged
)
SELECT user_id, event_id AS purchase_id, value AS purchase_value,
       click_id, epoch_us(ts) - click_us AS us_since_click
FROM carried WHERE event_type = 'purchase'
"""


@register("events_asof_click_attribution", sql=_ASOF_SQL)
def events_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN, streaming-union formulation: tag clicks+purchases into
    ONE stream, single shuffle+sort per user, carry the latest click
    forward with last_value(ignore nulls), keep purchases. Never builds
    the |clicks| x |purchases| pair space — at 100 TB the only cost is the
    sort within user partitions. Ties break (ts, type, event_id): a click
    at the same µs as a purchase attributes to it."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("typ"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "typ", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.last(
        F.when(F.col("typ") == 0, F.col("event_id")), ignorenulls=True
    ).over(w)
    click_us = F.last(
        F.when(F.col("typ") == 0, F.unix_micros("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("click_id", click_id)
        .withColumn("click_us", click_us)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
            "click_id",
            (F.unix_micros("ts") - F.col("click_us")).alias("us_since_click"),
        )
    )


# --- Range join: event value -> tier table ---------------------------------

_TIERS = [
    (0, "T0_SMALL", 0.0, 50.0),
    (1, "T1_MEDIUM", 50.0, 150.0),
    (2, "T2_LARGE", 150.0, 300.0),
    (3, "T3_WHALE", 300.0, 1000.0),
]

_TIERS_VALUES = ", ".join(
    f"({i}, '{name}', {lo}, {hi})" for i, name, lo, hi in _TIERS
)

_RANGE_SQL = f"""
WITH tiers(tier_id, tier_name, lo, hi) AS (VALUES {_TIERS_VALUES})
SELECT tier_name, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY tier_name
"""


@register("join_range_value_tiers", sql=_RANGE_SQL)
def join_range_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (non-equi) JOIN against a tier dimension: the dim is tiny and
    broadcast, so the theta-join is a per-row scan of 4 ranges — no
    shuffle, no pair blow-up. For a large ranges table the same query
    switches to bucket-prejoin (equi-join on floor(value/width) + residual
    predicate); Catalyst keeps the scan-side filter pushed down."""
    e = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(_TIERS, ["tier_id", "tier_name", "lo", "hi"])
    joined = e.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("tier_name").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# --- Sliding windows (30 min window, 15 min slide) -------------------------

_SLIDE_US = 15 * 60 * 1_000_000
_WIN_US = 30 * 60 * 1_000_000

_SLIDING_SQL = f"""
WITH ks AS (SELECT unnest([0, 1]) AS k),
assigned AS (
  SELECT user_id, value,
         make_timestamp((epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}
                        - k * {_SLIDE_US}) AS window_start
  FROM events, ks
  WHERE epoch_us(ts) >= (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}
                        - k * {_SLIDE_US}
    AND epoch_us(ts) < (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}
                        - k * {_SLIDE_US} + {_WIN_US}
)
SELECT window_start, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM assigned GROUP BY window_start
"""


@register("events_sliding_30m_15m", sql=_SLIDING_SQL)
def events_sliding_30m_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows via the built-in window() — each event lands in
    duration/slide = 2 windows (Spark Expand, then one partial-agg
    shuffle). The oracle reproduces the assignment with integer-µs
    arithmetic."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "30 minutes", "15 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users",
            "sum_value",
        )
    )


# --- weekly cohort retention ------------------------------------------------

_RETENTION_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(epoch_us(ts) // 604800000000) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS active_week
  FROM events
)
SELECT f.cohort_week, a.active_week - f.cohort_week AS weeks_since,
       COUNT(DISTINCT a.user_id) AS n_active
FROM firsts f JOIN activity a ON a.user_id = f.user_id
GROUP BY f.cohort_week, a.active_week - f.cohort_week
"""


@register("events_cohort_retention", sql=_RETENTION_SQL)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    per week-offset they stay active — two aggregations and one equi-join
    on user_id (epoch-week integer arithmetic keeps both engines exact)."""
    e = load_table(spark, sf_dir, "events")
    # integer `div`, not double division: a timestamp sitting exactly on a
    # week boundary must not round down an ulp
    week = F.expr(f"unix_micros(ts) div {7 * 86400 * 1_000_000}L")
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = e.select("user_id", week.alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --- staged funnel: signup -> click -> purchase -----------------------------

_FUNNEL_SQL = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click_any,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase_any
  FROM events GROUP BY user_id
),
staged AS (
  SELECT user_id,
         (t_signup IS NOT NULL) AS did_signup,
         (t_signup IS NOT NULL AND t_click_any > t_signup) AS clicked_after,
         (t_signup IS NOT NULL AND t_click_any > t_signup
          AND t_purchase_any > t_click_any) AS purchased_after
  FROM stages
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN did_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN clicked_after THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click_after_signup,
       CAST(SUM(CASE WHEN purchased_after THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase_after_click,
       CAST(SUM(CASE WHEN purchased_after THEN 1 ELSE 0 END) AS DOUBLE)
         / SUM(CASE WHEN did_signup THEN 1 ELSE 0 END) AS conversion_rate
FROM staged
"""


@register("events_funnel_signup_click_purchase", sql=_FUNNEL_SQL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup -> first later click -> first later purchase,
    computed from per-user stage-minimum timestamps (ONE aggregation pass
    over the stream, conditional minima — no self-joins; NULL minima
    propagate falsity through the stage comparisons exactly like the SQL
    CASE logic)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")

    def stage_min(t):
        return F.min(F.when(F.col("event_type") == t, us))

    stages = e.groupBy("user_id").agg(
        stage_min("signup").alias("t_signup"),
        stage_min("click").alias("t_click_any"),
        stage_min("purchase").alias("t_purchase_any"),
    )
    did = F.col("t_signup").isNotNull()
    clicked = did & (F.col("t_click_any") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase_any") > F.col("t_click_any"))
    staged = stages.select(
        did.alias("did_signup"),
        clicked.alias("clicked_after"),
        purchased.alias("purchased_after"),
    )

    def cnt(c):
        return F.sum(F.when(F.col(c), 1).otherwise(0))

    return staged.agg(
        F.count("*").alias("n_users"),
        cnt("did_signup").alias("n_signup"),
        cnt("clicked_after").alias("n_click_after_signup"),
        cnt("purchased_after").alias("n_purchase_after_click"),
        (
            cnt("purchased_after").cast("double") / cnt("did_signup")
        ).alias("conversion_rate"),
    )


# --- lag/lead: inter-event gaps per user -----------------------------------

_GAPS_SQL = """
SELECT user_id, event_id, event_type,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS us_since_prev,
       LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
"""


@register("events_lag_lead_gaps", sql=_GAPS_SQL)
def events_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytics: per-user inter-event gap (µs, exact integers)
    and next event type — the funnel-analysis primitive. One shuffle+sort
    per user partition."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        (us - F.lag(us).over(w)).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# --- gaps & islands: consecutive-day activity streaks ----------------------

_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
grouped AS (
  SELECT user_id, d,
         datediff('day', DATE '1970-01-01', d)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS streak_len, MIN(d) AS start_day
  FROM grouped GROUP BY user_id, grp
),
ranked AS (
  SELECT user_id, streak_len, start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_len DESC, start_day) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks,
         CAST(SUM(streak_len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days
  FROM streaks
)
SELECT user_id, n_active_days, n_streaks,
       streak_len AS longest_len,
       CAST(start_day AS TIMESTAMP) AS longest_start
FROM ranked WHERE rk = 1
"""


@register("events_streak_islands", sql=_STREAK_SQL)
def streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active days per user
    via the classic (day-ordinal - row_number) grouping key — pure integer
    date arithmetic, no session state. Two keyed shuffles on user_id that
    AQE coalesces; nothing is driver-side, so it holds at any event count."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    return streak_profile(days)


def streak_profile(days: DataFrame) -> DataFrame:
    """Streak rollup over a (user_id, d date) relation — reusable so the
    hypothesis property can drive it with generated day sets."""
    w_ord = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w_ord),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_len"), F.min("d").alias("start_day")
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("start_day")
    )
    w_all = Window.partitionBy("user_id")
    return (
        streaks.select(
            "user_id",
            "streak_len",
            "start_day",
            F.row_number().over(w_rank).alias("rk"),
            F.count("*").over(w_all).cast("bigint").alias("n_streaks"),
            F.sum("streak_len").over(w_all).cast("bigint").alias("n_active_days"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_active_days",
            "n_streaks",
            F.col("streak_len").alias("longest_len"),
            # timestamp grain on both sides: DateType surfaces to pandas as
            # date-only objects while the oracle's DATE prints midnight
            F.col("start_day").cast("timestamp").alias("longest_start"),
        )
    )
