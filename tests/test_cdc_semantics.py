"""CDC operator semantics — the reference's correctness-critical invariants
(SURVEY §5, FIXTURES F-9) on the synthetic event stream."""

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.operators.lookup import key_value_records, read_after_event
from cdc_apache_cassandra_spark.operators.lww import last_write_wins
from cdc_apache_cassandra_spark.sources.backfill import backfill_mutations
from cdc_apache_cassandra_spark.sources.event_source import (
    REPLICAS,
    VALUE_COLS,
    mutation_events,
)
from cdc_apache_cassandra_spark.sources.registry import load_table


def test_replica_duplication_identical_digest(spark, sf_dir):
    """F-9: every mutation appears once per replica with identical digest,
    distinct node ids (PulsarDualNodeTests.java:161-172)."""
    ev = mutation_events(spark, sf_dir)
    per_mutation = ev.groupBy("pk", "digest").agg(
        F.count("*").alias("n"), F.countDistinct("node_id").alias("nodes")
    )
    bad = per_mutation.filter(
        (F.col("n") != REPLICAS) | (F.col("nodes") != REPLICAS)
    ).count()
    assert bad == 0


def test_dedup_exactly_once(spark, sf_dir):
    """MutationCache semantics: after dedup, exactly one row per (pk, digest)."""
    ev = mutation_events(spark, sf_dir)
    deduped = dedup_mutations(ev)
    assert deduped.count() * REPLICAS == ev.count()
    assert deduped.groupBy("pk", "digest").count().filter("count > 1").count() == 0


def test_dedup_idempotent_under_replay(spark, sf_dir):
    """At-least-once delivery: re-unioning the stream with itself (a replay)
    changes nothing after dedup."""
    ev = mutation_events(spark, sf_dir)
    once = dedup_mutations(ev).count()
    twice = dedup_mutations(ev.unionByName(ev)).count()
    assert once == twice


def test_lww_tombstone_and_update(spark, sf_dir):
    """Convergence: pk%7==0 ends as tombstone (DELETE is newest); pk%3==0
    (and not %7) ends with the updated acctbal; others keep the insert."""
    state = last_write_wins(dedup_mutations(mutation_events(spark, sf_dir)))
    rows = {r["pk"]: r for r in state.collect()}
    base = {
        r["c_custkey"]: r for r in load_table(spark, sf_dir, "customer").collect()
    }
    assert set(rows) == set(base)
    for pk, r in rows.items():
        if pk % 7 == 0:
            assert r["op"] == "DELETE" and r["c_acctbal"] is None
        elif pk % 3 == 0:
            assert r["op"] == "UPDATE"
            assert abs(r["c_acctbal"] - (base[pk]["c_acctbal"] + 100.0)) < 1e-9
        else:
            assert r["op"] == "INSERT"
            assert r["c_acctbal"] == base[pk]["c_acctbal"]


def test_read_after_event_tombstones(spark, sf_dir):
    """J1: DELETE events produce null value columns regardless of snapshot."""
    ev = dedup_mutations(mutation_events(spark, sf_dir)).select(
        "pk", "op", "writetime", "digest"
    )
    snap = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "pk")
    enriched = read_after_event(ev, snap, ["pk"], list(VALUE_COLS))
    deletes = enriched.filter(F.col("op") == "DELETE")
    assert deletes.filter(~F.col("is_tombstone")).count() == 0
    assert deletes.filter(F.col("c_name").isNotNull()).count() == 0
    inserts = enriched.filter(F.col("op") == "INSERT")
    assert inserts.filter(F.col("c_name").isNull()).count() == 0


def test_key_value_record_shape(spark, sf_dir):
    """S7: data-topic projection — null value struct for tombstones."""
    ev = dedup_mutations(mutation_events(spark, sf_dir)).select(
        "pk", "op", "writetime", "digest"
    )
    snap = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "pk")
    enriched = read_after_event(ev, snap, ["pk"], list(VALUE_COLS))
    kv = key_value_records(enriched, ["pk"], list(VALUE_COLS))
    assert [f.name for f in kv.schema.fields] == ["key", "value"]
    n_tomb = enriched.filter("is_tombstone").count()
    assert kv.filter(F.col("value").isNull()).count() == n_tomb


def test_backfill_loses_to_live(spark, sf_dir):
    """T2: backfill mutations (writetime -1) never override live events."""
    live = dedup_mutations(mutation_events(spark, sf_dir)).select(
        "op", "pk", "writetime", *VALUE_COLS, "digest", "segment", "position"
    )
    snap = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "pk")
    bf = backfill_mutations(snap, "pk", list(VALUE_COLS))
    state = last_write_wins(live.unionByName(bf))
    assert state.filter(F.col("digest") == "BACK_FILL_INSERT").count() == 0
    # but backfill alone hydrates every key
    state_bf = last_write_wins(bf)
    assert state_bf.count() == snap.count()


def test_null_leading_value_column_is_not_tombstone(spark):
    """J1 edge (VERDICT r3 #1): a snapshot row whose FIRST value column is
    legitimately NULL is a live row — presence comes from the join marker,
    not value null-ness (CassandraSource.java:554)."""
    ev = spark.createDataFrame(
        [(1, "INSERT"), (2, "INSERT"), (3, "DELETE"), (4, "INSERT")],
        "pk long, op string",
    )
    snap = spark.createDataFrame(
        [(1, None, 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "pk long, name string, bal double",
    )
    out = read_after_event(ev, snap, ["pk"], ["name", "bal"])
    rows = {r["pk"]: r for r in out.collect()}
    # pk=1 exists with NULL leading column: live, name null, bal present
    assert rows[1]["is_tombstone"] is False
    assert rows[1]["name"] is None and rows[1]["bal"] == 10.0
    # pk=3 DELETE: tombstone, values nulled
    assert rows[3]["is_tombstone"] is True and rows[3]["bal"] is None
    # pk=4 missing from snapshot: tombstone
    assert rows[4]["is_tombstone"] is True


def test_pk_only_table_value_carries_pk(spark):
    """J1/S6 PK-only special case (CassandraSource.java:346-350): with no
    regular columns the value carries the PK columns; existing keys are
    NOT tombstones, DELETEs and missing keys are."""
    ev = spark.createDataFrame(
        [(1, "INSERT"), (2, "DELETE"), (9, "INSERT")], "pk long, op string"
    )
    snap = spark.createDataFrame([(1,), (2,)], "pk long")
    out = read_after_event(ev, snap, ["pk"], [])
    rows = {r["pk"]: r for r in out.collect()}
    assert rows[1]["is_tombstone"] is False and rows[1]["value_pk"] == 1
    assert rows[2]["is_tombstone"] is True and rows[2]["value_pk"] is None
    assert rows[9]["is_tombstone"] is True and rows[9]["value_pk"] is None
