r"""Profiling / reshaping queries rounding out the relational surface:
UNPIVOT (stack), deterministic MODE, CUME_DIST windows, at-least-once
idempotent replay convergence, and a Simpson-diversity text profile.

Determinism follows plans/registry.py: DECIMAL(18,2) exact sums with one
final DOUBLE cast, double division of identically-derived integer operands,
ROW_NUMBER tie-breaks on a total key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.operators.lww import last_write_wins
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.event_source import (
    VALUE_COLS,
    events_cte,
    mutation_events,
)
from cdc_apache_cassandra_spark.sources.registry import load_table

# --- UNPIVOT: wide measures -> long (measure, value) profile ---------------

# Oracle uses UNION ALL (not DuckDB's UNPIVOT syntax) so the long-form
# derivation is textually identical to what stack() produces in Spark.
_UNPIVOT_SQL = """
WITH unpvt AS (
  SELECT 'quantity' AS measure, CAST(l_quantity AS DECIMAL(18,2)) AS val FROM lineitem
  UNION ALL
  SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
  UNION ALL
  SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
  UNION ALL
  SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
)
SELECT measure, COUNT(*) AS n_rows,
       CAST(SUM(val) AS DOUBLE) AS total,
       CAST(SUM(val) AS DOUBLE) / COUNT(*) AS avg_val,
       CAST(MIN(val) AS DOUBLE) AS min_val,
       CAST(MAX(val) AS DOUBLE) AS max_val
FROM unpvt GROUP BY measure
"""


@register("stats_unpivot_measure_profile", sql=_UNPIVOT_SQL)
def unpivot_measure_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape via ``stack`` (Spark's UNPIVOT): one profile row
    per lineitem measure. Map-side only until the 4-group aggregate — the
    explode is a narrow transform, so it scales linearly at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(4, "
            "'quantity', CAST(l_quantity AS DECIMAL(18,2)), "
            "'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)), "
            "'discount', CAST(l_discount AS DECIMAL(18,2)), "
            "'tax', CAST(l_tax AS DECIMAL(18,2))) AS (measure, val)"
        )
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n_rows"),
        F.sum("val").cast("double").alias("total"),
        (F.sum("val").cast("double") / F.count("*")).alias("avg_val"),
        F.min("val").cast("double").alias("min_val"),
        F.max("val").cast("double").alias("max_val"),
    )


# --- deterministic MODE (most frequent value, total tie-break) -------------

_MODE_SQL = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority
  ) AS rn FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
FROM ranked WHERE rn = 1
"""


@register("agg_mode_priority_by_status", sql=_MODE_SQL)
def mode_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE done deterministically: count-then-rank with a total tie-break
    (count DESC, value ASC) instead of engine-native ``mode()`` whose tie
    choice is unspecified. Two-level aggregate: map-side partial counts,
    then a tiny ranked shuffle — skew-free at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").count()
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("count").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("count").alias("mode_count"),
        )
    )


# --- CUME_DIST window ------------------------------------------------------

_CUME_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(CUME_DIST() OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal
       ), 6) AS DOUBLE) AS spend_cume
FROM customer
"""


@register("window_cume_dist_acctbal", sql=_CUME_SQL)
def cume_dist_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST per market segment — SQL-standard peer handling (ties get
    the same value), so the result is deterministic without a tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).cast("double").alias("spend_cume"),
    )


# --- at-least-once replay idempotency --------------------------------------

_CTE = events_cte()
_VALUE_LIST = ", ".join(VALUE_COLS)

_REPLAY_SQL = f"""
WITH {_CTE},
replayed AS (
  SELECT * FROM events_stream UNION ALL SELECT * FROM events_stream
),
deduped AS (
  SELECT DISTINCT pk, op, writetime, segment, position, digest, {_VALUE_LIST}
  FROM replayed
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY pk ORDER BY writetime DESC, segment DESC, position DESC
  ) AS rn
  FROM deduped
)
SELECT pk, op, (op = 'DELETE') AS is_tombstone, {_VALUE_LIST}
FROM ranked WHERE rn = 1
"""


@register("cdc_idempotent_replay", sql=_REPLAY_SQL)
def cdc_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery is absorbed by dedup: replaying the WHOLE
    stream twice (a full redelivery, beyond the per-replica duplicates
    already present) converges to the same LWW state as a single pass —
    the end-to-end guarantee the reference's nack-and-retry loop depends
    on (CassandraSource.java:596-631 + MutationCache.java:30-82)."""
    ev = mutation_events(spark, sf_dir)
    replayed = ev.unionByName(ev)
    latest = last_write_wins(dedup_mutations(replayed))
    return latest.select(
        "pk",
        "op",
        (F.col("op") == "DELETE").alias("is_tombstone"),
        *VALUE_COLS,
    )


# --- Simpson diversity (token concentration without log) -------------------

_SIMPSON_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
),
agg AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         CAST(SUM(tf * tf) AS BIGINT) AS s2
  FROM tf GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       CAST(ROUND(CAST(s2 AS DOUBLE) /
                  (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
            6) AS DOUBLE) AS simpson_r
FROM agg
"""


@register("llm_simpson_diversity", sql=_SIMPSON_SQL)
def simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token concentration as the Simpson index sum(tf^2)/n^2 (the
    probability two random tokens coincide) — an entropy-family quality
    signal with NO log(): exact integer sums, one double ratio, so the
    oracle agrees bit-for-bit. High simpson = repetitive/low-diversity doc."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("tf") * F.col("tf")).alias("s2"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("s2").cast("double") / (n * n), 6)
        .cast("double")
        .alias("simpson_r"),
    )


# --- dedup reduction report (what did dedup save?) -------------------------

_REDUCTION_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, md5(text) AS h,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
  FROM documents
),
keep AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM toks
)
SELECT lang,
       COUNT(*) AS docs_before,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS docs_after,
       CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_after
FROM keep GROUP BY lang
"""


@register("llm_dedup_reduction_report", sql=_REDUCTION_SQL)
def dedup_reduction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus accountant every training pipeline runs after dedup:
    per-language doc/token counts before vs after exact (md5) dedup with
    min-doc_id keeper selection. Keeper choice is global (duplicates can
    straddle languages) but the report is grouped per language, so the
    numbers reconcile: sum(docs_after) == count(distinct md5)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tokens"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    keep = toks.withColumn("rn", F.row_number().over(w))
    is_keeper = F.when(F.col("rn") == 1, F.lit(1)).otherwise(F.lit(0))
    return keep.groupBy("lang").agg(
        F.count("*").alias("docs_before"),
        F.sum("n_tokens").cast("bigint").alias("tokens_before"),
        F.sum(is_keeper).cast("bigint").alias("docs_after"),
        F.sum(F.col("n_tokens") * is_keeper).cast("bigint").alias("tokens_after"),
    )


# --- running peak / drawdown (decimal-exact cumulative window) -------------

_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_orderdate
),
peaks AS (
  SELECT d, rev,
         MAX(rev) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM daily
)
SELECT d, CAST(rev AS DOUBLE) AS revenue,
       CAST(peak AS DOUBLE) AS running_peak,
       CAST(peak - rev AS DOUBLE) AS drawdown
FROM peaks
"""


@register("window_running_drawdown", sql=_DRAWDOWN_SQL)
def running_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and drawdown of daily revenue — cumulative MAX over an
    exact DECIMAL aggregate (max/subtract never lose precision, unlike
    windowed float SUMs), cast to double only for presentation. Single
    unpartitioned ordered window over the tiny daily rollup — the heavy
    groupBy below it is the scalable part."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d",
        F.col("rev").cast("double").alias("revenue"),
        F.max("rev").over(w).cast("double").alias("running_peak"),
        (F.max("rev").over(w) - F.col("rev")).cast("double").alias("drawdown"),
    )
