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
