"""Point-in-time CDC queries: snapshot-as-of and change-feed-between —
the time-travel surface a CDC consumer gets for free once mutations carry
writetime (SURVEY W2) and materialization is last-write-wins (W3).

The reference replays history from the events topic to any point by
bounded consumption (offsets); here the same semantics are a writetime
predicate pushed to the scan plus the standard dedup + LWW pipeline —
no separate code path for "historical" vs "current" state (§7.1 one
logical pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.operators.lww import last_write_wins
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.event_source import (
    VALUE_COLS,
    WRITETIME_BASE,
    events_cte,
    mutation_events,
)
from cdc_apache_cassandra_spark.sources.registry import load_table

_CTE = events_cte()
_VALUE_LIST = ", ".join(VALUE_COLS)

#: snapshot cutoff (µs): keys with writetime ≤ base+300s have happened;
#: later mutations (higher pks, and the +5s/+9s update/delete tails near
#: the boundary) have not — so the snapshot genuinely differs from the
#: converged state at every SF.
_AS_OF = WRITETIME_BASE + 300_000_000

#: change-feed window (µs]: captures a band of inserts plus the
#: update/delete tails of slightly-earlier keys.
_FROM = WRITETIME_BASE + 100_000_000
_TO = WRITETIME_BASE + 200_000_000

_SNAPSHOT_SQL = f"""
WITH {_CTE},
cut AS (SELECT * FROM events_stream WHERE writetime <= {_AS_OF}),
deduped AS (
  SELECT DISTINCT pk, op, writetime, segment, position, digest, {_VALUE_LIST}
  FROM cut
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY pk ORDER BY writetime DESC, segment DESC, position DESC
  ) AS rn
  FROM deduped
)
SELECT pk, op, (op = 'DELETE') AS is_tombstone, writetime, {_VALUE_LIST}
FROM ranked WHERE rn = 1
"""


@register("cdc_snapshot_time_travel", sql=_SNAPSHOT_SQL)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table state AS OF a past instant: writetime ≤ T filter, then the
    SAME dedup + last-write-wins pipeline as the live materializer — time
    travel is a predicate, not a code path. The filter is pushed to the
    event scan (at 100 TB with writetime-partitioned event storage it
    prunes partitions, so old snapshots don't scan the recent firehose)."""
    ev = mutation_events(spark, sf_dir).filter(F.col("writetime") <= _AS_OF)
    latest = last_write_wins(dedup_mutations(ev))
    return latest.select(
        "pk",
        "op",
        (F.col("op") == "DELETE").alias("is_tombstone"),
        "writetime",
        *VALUE_COLS,
    )


_CHANGES_SQL = f"""
WITH {_CTE},
win AS (
  SELECT * FROM events_stream
  WHERE writetime > {_FROM} AND writetime <= {_TO}
),
deduped AS (
  SELECT DISTINCT pk, op, writetime, segment, position, digest, {_VALUE_LIST}
  FROM win
)
SELECT pk, op, writetime, digest, (op = 'DELETE') AS is_tombstone,
       {_VALUE_LIST}
FROM deduped
"""


@register("cdc_changes_between", sql=_CHANGES_SQL)
def changes_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed for a half-open writetime window (T1, T2]: every
    distinct mutation in the window with its op and tombstone flag — the
    incremental-consumer contract (Delta CDF / DynamoDB-streams shape).
    Replica duplicates collapse via the digest dedup; no LWW here — a
    change feed preserves every mutation, the consumer folds it."""
    ev = mutation_events(spark, sf_dir).filter(
        (F.col("writetime") > _FROM) & (F.col("writetime") <= _TO)
    )
    return dedup_mutations(ev).select(
        "pk",
        "op",
        "writetime",
        "digest",
        (F.col("op") == "DELETE").alias("is_tombstone"),
        *VALUE_COLS,
    )


# --- tombstone GC: retention horizon on materialized state ------------------

#: GC grace horizon (µs): tombstones older than this are purged from the
#: materialized view; younger ones are retained so late replicas can
#: still observe the delete (Cassandra's gc_grace_seconds rationale).
_GC_HORIZON = WRITETIME_BASE + 600_000_000

_GC_SQL = f"""
WITH {_CTE},
deduped AS (
  SELECT DISTINCT pk, op, writetime, segment, position, digest, {_VALUE_LIST}
  FROM events_stream
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY pk ORDER BY writetime DESC, segment DESC, position DESC
  ) AS rn
  FROM deduped
),
state AS (
  SELECT pk, op, (op = 'DELETE') AS is_tombstone, writetime, {_VALUE_LIST}
  FROM ranked WHERE rn = 1
)
SELECT pk, op, is_tombstone, writetime,
       (is_tombstone AND writetime < {_GC_HORIZON}) AS gc_purged,
       {_VALUE_LIST}
FROM state
WHERE NOT (is_tombstone AND writetime < {_GC_HORIZON})
"""


@register("cdc_tombstone_gc", sql=_GC_SQL)
def tombstone_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone garbage collection on the materialized state: tombstones
    older than the grace horizon are dropped (their deletes are fully
    propagated); younger tombstones are retained so late/replaying
    replicas still see the deletion — the gc_grace_seconds contract that
    makes compaction safe under at-least-once delivery. One predicate on
    the converged state; in the foreachBatch materializer this is the
    compaction step's WHERE clause (streaming/materialize.py retention)."""
    latest = last_write_wins(dedup_mutations(mutation_events(spark, sf_dir)))
    is_tomb = F.col("op") == "DELETE"
    purged = is_tomb & (F.col("writetime") < _GC_HORIZON)
    return (
        latest.select(
            "pk",
            "op",
            is_tomb.alias("is_tombstone"),
            "writetime",
            purged.alias("gc_purged"),
            *VALUE_COLS,
        )
        .filter(~purged)
    )


# --- SCD Type-2 reconstruction: validity intervals from mutation history ----

_SCD2_SQL = f"""
WITH {_CTE},
deduped AS (
  SELECT DISTINCT pk, op, writetime, segment, position, {_VALUE_LIST}
  FROM events_stream
),
versions AS (
  SELECT pk, op, writetime AS valid_from, {_VALUE_LIST},
         LEAD(writetime) OVER (PARTITION BY pk
             ORDER BY writetime, segment, position) AS valid_to
  FROM deduped
)
SELECT pk, op, valid_from, valid_to,
       (valid_to IS NULL) AS is_current,
       (op = 'DELETE') AS is_deleted,
       {_VALUE_LIST}
FROM versions
"""


@register("cdc_scd2_intervals", sql=_SCD2_SQL)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from the CDC stream: every deduped
    mutation becomes a VERSION row with [valid_from, valid_to) — valid_to
    = the next mutation's writetime via LEAD over the per-key mutation
    order (same total order as LWW), null = the open current version,
    DELETE versions mark the key dead for their interval. This is the
    temporal-table materialization an as-of consumer joins against —
    time travel without replaying events. One shuffle on pk; LEAD is a
    bounded per-key window."""
    ev = dedup_mutations(mutation_events(spark, sf_dir)).select(
        "pk", "op", "writetime", "segment", "position", *VALUE_COLS
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pk").orderBy("writetime", "segment", "position")
    versions = ev.select(
        "pk",
        "op",
        F.col("writetime").alias("valid_from"),
        F.lead("writetime").over(w).alias("valid_to"),
        *VALUE_COLS,
    )
    return versions.select(
        "pk",
        "op",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        (F.col("op") == "DELETE").alias("is_deleted"),
        *VALUE_COLS,
    )


# --- as-of version lookup against the SCD2 table ----------------------------

#: probe offset (µs) after each key's INSERT: lands between the UPDATE
#: (+5 s, keys %3) and the DELETE (+9 s, keys %7), so probes observe a
#: mix of INSERT/UPDATE versions and never the post-delete state.
_PROBE_OFFSET = 7_000_000

_ASOF_LOOKUP_SQL = f"""
WITH {_CTE},
deduped AS (
  SELECT DISTINCT pk, op, writetime, segment, position, {_VALUE_LIST}
  FROM events_stream
),
versions AS (
  SELECT pk, op, writetime AS valid_from, {_VALUE_LIST},
         LEAD(writetime) OVER (PARTITION BY pk
             ORDER BY writetime, segment, position) AS valid_to
  FROM deduped
),
probes AS (
  SELECT c_custkey AS pk,
         CAST({WRITETIME_BASE} + c_custkey * 1000000 + {_PROBE_OFFSET}
              AS BIGINT) AS query_ts
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT p.pk, p.query_ts, v.op AS version_op, v.valid_from,
       (v.op = 'DELETE') AS was_deleted, v.c_acctbal
FROM probes p JOIN versions v
  ON v.pk = p.pk
 AND v.valid_from <= p.query_ts
 AND (v.valid_to IS NULL OR p.query_ts < v.valid_to)
"""


@register("cdc_asof_version_lookup", sql=_ASOF_LOOKUP_SQL)
def asof_version_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point lookup: (pk, ts) probes joined to the SCD2 version
    whose [valid_from, valid_to) interval contains ts — at most one match
    per probe because intervals partition each key's timeline (pinned by
    test_scd2_intervals_partition_key_timeline). The join is equi on pk
    with a range residual — Catalyst plans the pk hash join and filters
    the interval in place; no interval index needed because versions per
    key are few."""
    from pyspark.sql import Window

    ev = dedup_mutations(mutation_events(spark, sf_dir)).select(
        "pk", "op", "writetime", "segment", "position", *VALUE_COLS
    )
    w = Window.partitionBy("pk").orderBy("writetime", "segment", "position")
    versions = ev.select(
        "pk",
        "op",
        F.col("writetime").alias("valid_from"),
        F.lead("writetime").over(w).alias("valid_to"),
        "c_acctbal",
    )
    c = load_table(spark, sf_dir, "customer")
    probes = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("pk"),
        (
            F.lit(WRITETIME_BASE)
            + F.col("c_custkey") * 1_000_000
            + _PROBE_OFFSET
        ).cast("bigint").alias("query_ts"),
    )
    v = versions.withColumnRenamed("pk", "v_pk")
    return (
        probes.join(
            v,
            (F.col("v_pk") == F.col("pk"))
            & (F.col("valid_from") <= F.col("query_ts"))
            & (
                F.col("valid_to").isNull()
                | (F.col("query_ts") < F.col("valid_to"))
            ),
        )
        .select(
            "pk",
            "query_ts",
            F.col("op").alias("version_op"),
            "valid_from",
            (F.col("op") == "DELETE").alias("was_deleted"),
            "c_acctbal",
        )
    )
