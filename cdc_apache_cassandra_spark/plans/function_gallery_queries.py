"""Scalar-function galleries — SURVEY §7.2 item 7: the engine's
string/date/math expression surface, exercised wide (a dozen functions per
query) with exact oracles. Only functions whose semantics align between
Spark and ANSI/DuckDB are exposed 1:1; where dialects differ (day-of-week
numbering) the engine normalizes to the ISO definition.

All functions here are JVM whole-stage-codegen built-ins — zero Python in
the row path, so the gallery doubles as a codegen-width check
(`.explain` shows one WholeStageCodegen span per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.event_source import events_cte
from cdc_apache_cassandra_spark.sources.registry import load_table

# --- string functions -------------------------------------------------------

_STRING_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 4) AS name_prefix,
       strpos(p_name, ' ') AS space_at,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', 2) AS second_word,
       reverse(p_brand) AS brand_rev,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       replace(p_type, 'O', '0') AS type_leeted,
       translate(p_brand, '#', '-') AS brand_dashed,
       concat_ws('|', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len,
       repeat('*', p_size % 5) AS stars
FROM part
"""


@register("fn_string_gallery", sql=_STRING_SQL)
def string_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thirteen string built-ins in one projection — substr/strpos are
    1-based and strpos returns 0 on miss in BOTH engines, so the surface
    maps 1:1. Pure narrow map: no shuffle, one codegen span."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.instr("p_name", " ").alias("space_at"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part("p_name", F.lit(" "), F.lit(2)).alias("second_word"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.replace("p_type", F.lit("O"), F.lit("0")).alias("type_leeted"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5)).alias("stars"),
    )


# --- date/time functions ----------------------------------------------------

# day-of-week: Spark weekday() is 0=Monday, DuckDB isodow is 1=Monday —
# the engine exposes ISO numbering (weekday()+1).
_DATE_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS od,
       year(o_orderdate) AS y,
       quarter(o_orderdate) AS q,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       isodow(CAST(o_orderdate AS DATE)) AS iso_dow,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_30d,
       datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days_since_92,
       CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) AS is_month_end
FROM orders
"""


@register("fn_datetime_gallery", sql=_DATE_SQL)
def datetime_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date built-ins: extraction, ISO day-of-week (normalized across
    dialects), truncation, month boundaries, interval arithmetic, day
    diffs. Narrow map over orders."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        od.cast("timestamp").alias("od"),
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.weekday(od) + 1).alias("iso_dow"),
        F.last_day(od).cast("timestamp").alias("month_end"),
        F.date_trunc("month", od).alias("month_start"),
        F.date_add(od, 30).cast("timestamp").alias("due_30d"),
        F.datediff(od, F.lit("1992-01-01").cast("date")).alias("days_since_92"),
        (od == F.last_day(od)).alias("is_month_end"),
    )


# --- math functions ---------------------------------------------------------

_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(abs(CAST(l_discount AS DECIMAL(18,2)) - 0.05) AS DOUBLE) AS disc_dev,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
       mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
       CAST(sign(CAST(l_discount AS DECIMAL(18,2)) - 0.05) AS BIGINT) AS disc_side,
       CAST(power(2, l_linenumber) AS BIGINT) AS pow2_line,
       sqrt(CAST(l_quantity AS DOUBLE)) AS qty_sqrt,
       CAST(greatest(CAST(l_tax AS DECIMAL(18,2)), CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS rate_hi,
       CAST(least(CAST(l_tax AS DECIMAL(18,2)), CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS rate_lo
FROM lineitem WHERE l_orderkey % 50 = 0
"""


@register("fn_math_gallery", sql=_MATH_SQL)
def math_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins over exact DECIMAL derivations (abs/sign/round/
    greatest/least stay in decimal; ceil/floor/power produce integers;
    sqrt is the one true-double op — IEEE correctly-rounded, identical in
    both engines). Filter pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(dec("l_discount") - F.lit(0.05).cast("decimal(18,2)"))
        .cast("double")
        .alias("disc_dev"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.round(dec("l_extendedprice"), 1).cast("double").alias("price_r1"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum((dec("l_discount") - F.lit(0.05).cast("decimal(18,2)")))
        .cast("bigint")
        .alias("disc_side"),
        F.pow(F.lit(2), "l_linenumber").cast("bigint").alias("pow2_line"),
        F.sqrt(F.col("l_quantity").cast("double")).alias("qty_sqrt"),
        F.greatest(dec("l_tax"), dec("l_discount")).cast("double").alias("rate_hi"),
        F.least(dec("l_tax"), dec("l_discount")).cast("double").alias("rate_lo"),
    )


# --- CDC: dedup-cache sizing pressure --------------------------------------

_CACHE_PRESSURE_SQL = f"""
WITH {events_cte()},
per_key AS (
  SELECT pk, COUNT(DISTINCT digest) AS n_digests
  FROM events_stream GROUP BY pk
)
SELECT n_digests, COUNT(*) AS n_keys,
       (n_digests > 3) AS overflows_default_cache
FROM per_key GROUP BY n_digests
"""


@register("cdc_digest_cache_pressure", sql=_CACHE_PRESSURE_SQL)
def digest_cache_pressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache-sizing profile for the reference's dedup cache: distinct
    digests per key vs the default ≤3-digest bound
    (cache.max.digests, CassandraSourceConnectorConfig.java:191-217) —
    keys above the bound would evict-and-refetch. Two-level aggregate,
    map-combined; the histogram is O(distinct digest counts)."""
    from cdc_apache_cassandra_spark.sources.event_source import mutation_events

    ev = mutation_events(spark, sf_dir)
    per_key = ev.groupBy("pk").agg(F.countDistinct("digest").alias("n_digests"))
    return (
        per_key.groupBy("n_digests")
        .agg(F.count("*").alias("n_keys"))
        .select(
            "n_digests",
            "n_keys",
            (F.col("n_digests") > 3).alias("overflows_default_cache"),
        )
    )


# --- bitwise functions ------------------------------------------------------

_BITWISE_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
       CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
       CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
       CAST(~o_orderkey AS BIGINT) AS complement,
       CAST(o_orderkey << 3 AS BIGINT) AS shifted_up,
       CAST(o_orderkey >> 2 AS BIGINT) AS shifted_down,
       CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS popcount,
       CAST((o_orderkey >> 4) & 15 AS BIGINT) AS nibble1,
       CAST(o_orderkey & (o_orderkey - 1) AS BIGINT) AS clear_lowest,
       CAST(o_orderkey & -o_orderkey AS BIGINT) AS lowest_bit
FROM orders
WHERE o_orderkey % 37 = 0
"""


@register("fn_bitwise_gallery", sql=_BITWISE_SQL)
def bitwise_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten bitwise built-ins in one projection (and/or/xor/not, shifts,
    popcount, plus the nibble-extract and lowest-set-bit idioms used by
    bitmap indexes and the portable-HLL register math). Two's-complement
    BIGINT semantics agree between engines exactly; pure narrow map, one
    codegen span."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.expr("CAST(o_orderkey & 255 AS BIGINT)").alias("low_byte"),
        F.expr("CAST(o_orderkey | 4096 AS BIGINT)").alias("with_flag"),
        F.expr("CAST(o_orderkey ^ o_custkey AS BIGINT)").alias("key_xor"),
        F.expr("CAST(~o_orderkey AS BIGINT)").alias("complement"),
        F.expr("CAST(shiftleft(o_orderkey, 3) AS BIGINT)").alias("shifted_up"),
        F.expr("CAST(shiftright(o_orderkey, 2) AS BIGINT)").alias("shifted_down"),
        F.bit_count(k.cast("long")).cast("long").alias("popcount"),
        F.expr("CAST(shiftright(o_orderkey, 4) & 15 AS BIGINT)").alias("nibble1"),
        F.expr("CAST(o_orderkey & (o_orderkey - 1) AS BIGINT)").alias("clear_lowest"),
        F.expr("CAST(o_orderkey & -o_orderkey AS BIGINT)").alias("lowest_bit"),
    )
