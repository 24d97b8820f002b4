"""Synthetic CDC event stream for a COMPOUND-primary-key table with a
static column — the reference's hardest record-assembly semantics
(connector e2e tests `testClusteringKey`, `testStaticColumn`,
PulsarCassandraSourceTests.java:346-455,1253-1315).

Modeled table (from the driver corpus): ``orders_by_customer``
  PARTITION KEY  o_custkey
  CLUSTERING KEY o_orderkey
  STATIC         c_mktsegment   (per-partition value, from customer)
  REGULAR        o_totalprice, o_orderstatus

Event kinds emitted (SURVEY P2 partition-type classifier,
agent-c4/.../CommitLogReadHandlerImpl.java:75-152):

- ROW_LEVEL_MODIFICATION: INSERT for every order; UPDATE (totalprice+50)
  for orderkey%5=0; both carry the partition's static value (a Cassandra
  insert writes statics with the row).
- PARTITION_AND_CLUSTERING_KEY_ROW_DELETION: full-PK delete for
  orderkey%9=0 -> key has BOTH pk fields, null value (tombstone).
- PARTITION_KEY_ROW_DELETION: partition delete for custkey%13=0 ->
  key has NULL clustering field, null value; semantically tombstones
  every row of the partition with a lower writetime.
- PARTITION_LEVEL_MODIFICATION (static-only update) for custkey%11=0 ->
  key has NULL clustering field, value = STATIC COLUMNS ONLY (P7
  projection switch, ConverterAndQuery.java:62-78).
- skipped kinds MATERIALIZED_VIEW / SECONDARY_INDEX / COUNTER for
  custkey%17=0 — must be classified and dropped (P2 filter).

Every event is duplicated once per replica (RF=2) with an identical
digest, like the single-PK stream in event_source.py. The identical
derivation ships as a DuckDB CTE for the oracle gate; only integer/string
arithmetic feeds digests and writetimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.sources.registry import load_table
from cdc_apache_cassandra_spark.caching import persist_scoped

REPLICAS = 2
WRITETIME_BASE = 1_600_000_000_000_000

#: partition-type labels (CommitLogReadHandlerImpl.java:75-152)
PROCESSED_PTYPES = (
    "ROW_LEVEL_MODIFICATION",
    "PARTITION_AND_CLUSTERING_KEY_ROW_DELETION",
    "PARTITION_KEY_ROW_DELETION",
    "PARTITION_LEVEL_MODIFICATION",
)
SKIPPED_PTYPES = ("MATERIALIZED_VIEW", "SECONDARY_INDEX", "COUNTER")


def compound_events(
    spark: SparkSession, sf_dir: str, include_skipped: bool = False
) -> DataFrame:
    """Events DataFrame with columns (pk_p, pk_c nullable, ptype, op,
    writetime, node_id, digest, s_mktsegment, v_totalprice, v_orderstatus).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # base feeds 5+ union branches below — persist so the orders-customer
    # join runs once per query instead of once per branch (bounded: one
    # narrow row per order; a production source reads the topic once).
    base = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("o_custkey").alias("pk_p"),
            F.col("o_orderkey").alias("pk_c"),
            (F.lit(WRITETIME_BASE) + F.col("o_orderkey") * F.lit(1_000_000))
            .cast("bigint")
            .alias("wt0"),
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
        .transform(persist_scoped)
    )
    parts = (
        base.groupBy("pk_p")
        .agg(F.max("seg").alias("seg"))
        .withColumn(
            "pwt0",
            (F.lit(WRITETIME_BASE) + F.col("pk_p") * F.lit(1_000)).cast("bigint"),
        )
    )

    nul_c = F.lit(None).cast("bigint")
    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")

    def ev(df, ptype, op, pk_c, wt, seg, price, status):
        return df.select(
            F.col("pk_p"),
            pk_c.alias("pk_c"),
            F.lit(ptype).alias("ptype"),
            F.lit(op).alias("op"),
            wt.cast("bigint").alias("writetime"),
            seg.alias("s_mktsegment"),
            price.alias("v_totalprice"),
            status.alias("v_orderstatus"),
        )

    inserts = ev(base, "ROW_LEVEL_MODIFICATION", "INSERT",
                 F.col("pk_c"), F.col("wt0"),
                 F.col("seg"), F.col("price"), F.col("status"))
    updates = ev(base.filter(F.col("pk_c") % 5 == 0),
                 "ROW_LEVEL_MODIFICATION", "UPDATE",
                 F.col("pk_c"), F.col("wt0") + 3_000_000,
                 F.col("seg"), F.col("price") + 50.0, F.col("status"))
    row_dels = ev(base.filter(F.col("pk_c") % 9 == 0),
                  "PARTITION_AND_CLUSTERING_KEY_ROW_DELETION", "DELETE",
                  F.col("pk_c"), F.col("wt0") + 6_000_000,
                  nul_s, nul_d, nul_s)
    part_dels = ev(parts.filter(F.col("pk_p") % 13 == 0),
                   "PARTITION_KEY_ROW_DELETION", "DELETE",
                   nul_c, F.col("pwt0") + 8_000_000,
                   nul_s, nul_d, nul_s)
    static_upd = ev(parts.filter(F.col("pk_p") % 11 == 0),
                    "PARTITION_LEVEL_MODIFICATION", "UPDATE",
                    nul_c, F.col("pwt0") + 4_000_000,
                    F.concat(F.lit("SEG_UPD_"), F.col("pk_p")), nul_d, nul_s)

    events = (
        inserts.unionByName(updates)
        .unionByName(row_dels)
        .unionByName(part_dels)
        .unionByName(static_upd)
    )
    if include_skipped:
        for i, ptype in enumerate(SKIPPED_PTYPES):
            events = events.unionByName(
                ev(parts.filter(F.col("pk_p") % 17 == 0),
                   ptype, "UPDATE",
                   nul_c, F.col("pwt0") + 10_000_000 + i,
                   nul_s, nul_d, nul_s)
            )

    replicas = spark.range(REPLICAS).select(F.col("id").alias("node_id"))
    return (
        events.crossJoin(F.broadcast(replicas))
        .withColumn(
            "digest",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("pk_p"),
                    F.coalesce(F.col("pk_c"), F.lit(-1)),
                    F.col("ptype"),
                    F.col("op"),
                    F.col("writetime"),
                )
            ),
        )
    )


def compound_events_cte(include_skipped: bool = False) -> str:
    """DuckDB WITH-clause body for the identical compound event stream
    (table ``compound_events``)."""
    skipped = ""
    if include_skipped:
        pieces = []
        for i, ptype in enumerate(SKIPPED_PTYPES):
            pieces.append(f"""
  UNION ALL
  SELECT pk_p, CAST(NULL AS BIGINT), '{ptype}', 'UPDATE',
         pwt0 + {10_000_000 + i},
         CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
  FROM cparts WHERE pk_p % 17 = 0""")
        skipped = "".join(pieces)
    return f"""
cbase AS (
  SELECT o_custkey AS pk_p, o_orderkey AS pk_c,
         CAST({WRITETIME_BASE} + o_orderkey * 1000000 AS BIGINT) AS wt0,
         c_mktsegment AS seg, o_totalprice AS price, o_orderstatus AS status
  FROM orders JOIN customer ON c_custkey = o_custkey
),
cparts AS (
  SELECT pk_p, MAX(seg) AS seg,
         CAST({WRITETIME_BASE} + pk_p * 1000 AS BIGINT) AS pwt0
  FROM cbase GROUP BY pk_p
),
cmutations AS (
  SELECT pk_p, pk_c, 'ROW_LEVEL_MODIFICATION' AS ptype, 'INSERT' AS op,
         wt0 AS writetime, seg AS s_mktsegment,
         price AS v_totalprice, status AS v_orderstatus
  FROM cbase
  UNION ALL
  SELECT pk_p, pk_c, 'ROW_LEVEL_MODIFICATION', 'UPDATE',
         wt0 + 3000000, seg, price + 50.0, status
  FROM cbase WHERE pk_c % 5 = 0
  UNION ALL
  SELECT pk_p, pk_c, 'PARTITION_AND_CLUSTERING_KEY_ROW_DELETION', 'DELETE',
         wt0 + 6000000, NULL, NULL, NULL
  FROM cbase WHERE pk_c % 9 = 0
  UNION ALL
  SELECT pk_p, CAST(NULL AS BIGINT), 'PARTITION_KEY_ROW_DELETION', 'DELETE',
         pwt0 + 8000000, NULL, NULL, NULL
  FROM cparts WHERE pk_p % 13 = 0
  UNION ALL
  SELECT pk_p, CAST(NULL AS BIGINT), 'PARTITION_LEVEL_MODIFICATION', 'UPDATE',
         pwt0 + 4000000, 'SEG_UPD_' || CAST(pk_p AS VARCHAR), NULL, NULL
  FROM cparts WHERE pk_p % 11 = 0{skipped}
),
compound_events AS (
  SELECT m.*, r.node_id,
         md5(CAST(pk_p AS VARCHAR) || '|' ||
             CAST(COALESCE(pk_c, -1) AS VARCHAR) || '|' ||
             ptype || '|' || op || '|' || CAST(writetime AS VARCHAR)) AS digest
  FROM cmutations m
  CROSS JOIN (SELECT CAST(0 AS BIGINT) AS node_id UNION ALL SELECT 1) r
)
""".strip()
