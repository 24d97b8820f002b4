"""Gap-filling relational shapes: EXCEPT, greatest-per-group via
correlated max (TPC-H Q2's join shape on the slim schema), and the
golden type-conversion matrix (DataSpec equivalent, SURVEY §5.2) under
the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.functions.conversions import (
    date_to_cassandra_raw,
    date_to_epoch_days,
    timestamp_to_epoch_millis,
    tinyint_to_unsigned_int,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, load_tables

# --- EXCEPT ----------------------------------------------------------------

_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@register("setop_except_never_urgent", sql=_EXCEPT_SQL)
def setop_except_never_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): customers with orders but no
    URGENT order — Spark plans it as an aggregate + anti join."""
    o = load_table(spark, sf_dir, "orders")
    all_cust = o.select(F.col("o_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.subtract(urgent)  # subtract == SQL EXCEPT (distinct)


# --- Q2 shape: greatest-per-group via correlated max -----------------------

_Q2ISH_SQL = """
SELECT n_name, s1.s_suppkey, s1.s_name,
       CAST(s1.s_acctbal AS DOUBLE) AS acctbal
FROM supplier s1
JOIN nation ON n_nationkey = s1.s_nationkey
WHERE s1.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                      WHERE s2.s_nationkey = s1.s_nationkey)
"""


@register("tpch_q2ish_richest_supplier_per_nation", sql=_Q2ISH_SQL)
def q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-MAX shape on the slim schema: the supplier(s)
    holding each nation's maximum account balance. Spark side decorrelates
    explicitly (per-nation max + equi-join) — exactly Catalyst's rewrite
    of the correlated SQL; ties all surface (no arbitrary pick)."""
    t = load_tables(spark, sf_dir, "supplier", "nation")
    mx = t["supplier"].groupBy(F.col("s_nationkey").alias("mx_nk")).agg(
        F.max("s_acctbal").alias("mx_bal")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(mx),
            (F.col("s_nationkey") == F.col("mx_nk"))
            & (F.col("s_acctbal") == F.col("mx_bal")),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "n_name",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )


# --- Golden type-conversion matrix (DataSpec under the oracle gate) --------

_CONV_SQL = """
SELECT o_orderkey,
       epoch_ms(o_orderdate) AS ts_epoch_ms,
       date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         AS date_epoch_days,
       date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         + 2147483648 AS date_cassandra_raw,
       ((o_orderkey % 256 - 128) + 256) % 256 AS tinyint_widened,
       CAST(o_orderkey % 256 - 128 AS BIGINT) AS tinyint_signed
FROM orders
"""


@register("cql_type_conversions", sql=_CONV_SQL)
def cql_type_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5 golden conversions over real values (DataSpec.java:77-115
    equivalents): timestamp -> epoch millis, date -> epoch days and the
    Cassandra unsigned-int raw encoding (centered at 2^31), and the
    Byte.toUnsignedInt widening — each computed by the engine's
    conversion expressions (functions/conversions.py) and checked against
    independent integer arithmetic in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    signed_byte = (F.col("o_orderkey") % 256 - 128).cast("bigint")
    return o.select(
        "o_orderkey",
        # parquet stores TIMESTAMP_NTZ; session tz is pinned UTC, so the
        # cast reinterprets the same instant for unix_millis
        timestamp_to_epoch_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "ts_epoch_ms"
        ),
        date_to_epoch_days(F.col("o_orderdate").cast("date")).cast("bigint").alias(
            "date_epoch_days"
        ),
        date_to_cassandra_raw(F.col("o_orderdate").cast("date")).alias(
            "date_cassandra_raw"
        ),
        tinyint_to_unsigned_int(signed_byte).cast("bigint").alias("tinyint_widened"),
        signed_byte.alias("tinyint_signed"),
    )
