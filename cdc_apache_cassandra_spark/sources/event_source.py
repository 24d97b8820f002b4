"""Synthetic CDC mutation-event stream, derived deterministically from the
``customer`` table.

Models the reference's event-topic contract (SURVEY §1.1):

- one event per (mutation, replica): RF=2 replicas each emit the SAME
  mutation with an IDENTICAL md5 digest but distinct node ids — the
  duplication the connector's MutationCache suppresses
  (reference: testcontainers/.../PulsarDualNodeTests.java:161-172,
  connector/.../MutationCache.java:30-82).
- op classification INSERT/UPDATE/DELETE (reference:
  agent-c4/.../CommitLogReadHandlerImpl.java:157-225).
- writetime (µs, monotone per key), segment/position ordering metadata
  (reference: agent/.../AbstractMutation.java:32-50).
- digest = md5 over the serialized mutation identity (reference:
  CommitLogReadHandlerImpl.java:235-238). Here: md5(pk|op|writetime),
  identical across replicas by construction.
- DELETE carries null value columns = tombstone (reference:
  connector/.../CassandraSource.java:554,160-163).

The SAME derivation is emitted as a DuckDB CTE (:func:`events_cte`) so every
CDC operator query has an ANSI-SQL oracle. Keep the two in lockstep: only
integer/string arithmetic (no float formatting) feeds the digest.

Scale: the generator is a narrow map over the base table plus a 2-row
cross join — no shuffle; at 100 TB the real source would be a Kafka/Pulsar
``readStream``, and every downstream operator takes the DataFrame unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.sources.registry import load_table

#: replica count (RF) — each mutation is emitted once per replica.
REPLICAS = 2

#: value columns carried by the data topic for the `customer` table.
VALUE_COLS = ("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

#: µs-epoch base for writetimes (2020-09-13T12:26:40Z). Strictly positive,
#: realistic event times — an epoch-0 writetime would sit exactly on the
#: initial watermark and be treated as late by stateful operators.
WRITETIME_BASE = 1_600_000_000_000_000


def mutation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events DataFrame: (pk, op, writetime, segment, position, node_id,
    digest, c_name, c_nationkey, c_acctbal, c_mktsegment)."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").alias("pk"),
        (F.lit(WRITETIME_BASE) + F.col("c_custkey") * F.lit(1_000_000))
        .cast("bigint")
        .alias("writetime0"),
        *VALUE_COLS,
    )

    insert = base.select(
        F.lit("INSERT").alias("op"),
        "pk",
        F.col("writetime0").alias("writetime"),
        *VALUE_COLS,
    )
    update = (
        base.filter(F.col("pk") % 3 == 0)
        .select(
            F.lit("UPDATE").alias("op"),
            "pk",
            (F.col("writetime0") + 5_000_000).alias("writetime"),
            F.col("c_name"),
            F.col("c_nationkey"),
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.col("c_mktsegment"),
        )
    )
    delete = (
        base.filter(F.col("pk") % 7 == 0)
        .select(
            F.lit("DELETE").alias("op"),
            "pk",
            (F.col("writetime0") + 9_000_000).alias("writetime"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.lit(None).cast("double").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
    )
    mutations = insert.unionByName(update).unionByName(delete)

    replicas = spark.range(REPLICAS).select(F.col("id").alias("node_id"))
    return (
        mutations.crossJoin(F.broadcast(replicas))
        .withColumn(
            "digest",
            F.md5(F.concat_ws("|", F.col("pk"), F.col("op"), F.col("writetime"))),
        )
        .withColumn("segment", (F.col("pk") % 16).cast("bigint"))
        .withColumn("position", (F.col("writetime") % 97).cast("bigint"))
    )


def events_cte() -> str:
    """DuckDB WITH-clause body producing the identical event stream.

    Use as: ``f"WITH {events_cte()} SELECT ... FROM events_stream"``.
    """
    return """
mut_base AS (
  SELECT c_custkey AS pk,
         CAST(1600000000000000 + c_custkey * 1000000 AS BIGINT) AS writetime0,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer
),
mutations AS (
  SELECT 'INSERT' AS op, pk, writetime0 AS writetime,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM mut_base
  UNION ALL
  SELECT 'UPDATE', pk, writetime0 + 5000000,
         c_name, c_nationkey, c_acctbal + 100.0, c_mktsegment
  FROM mut_base WHERE pk % 3 = 0
  UNION ALL
  SELECT 'DELETE', pk, writetime0 + 9000000,
         NULL, NULL, NULL, NULL
  FROM mut_base WHERE pk % 7 = 0
),
events_stream AS (
  SELECT m.*,
         r.node_id,
         md5(CAST(pk AS VARCHAR) || '|' || op || '|' || CAST(writetime AS VARCHAR)) AS digest,
         CAST(pk % 16 AS BIGINT) AS segment,
         CAST(writetime % 97 AS BIGINT) AS position
  FROM mutations m
  CROSS JOIN (SELECT CAST(0 AS BIGINT) AS node_id UNION ALL SELECT 1) r
)
""".strip()
