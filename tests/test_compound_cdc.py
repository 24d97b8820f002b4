"""Compound-PK CDC semantics (clustering keys, partition deletes, static
projection — reference e2e scenarios testClusteringKey/testStaticColumn,
PulsarCassandraSourceTests.java:346-455,1253-1315) plus a streaming replay
of the compound stream."""

import uuid

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.cdc_deep_queries import (
    cdc_compound_key_records,
    cdc_compound_lww_state,
    cdc_partition_classifier,
)
from cdc_apache_cassandra_spark.sources.compound_event_source import (
    PROCESSED_PTYPES,
    SKIPPED_PTYPES,
    compound_events,
)
from cdc_apache_cassandra_spark.streaming.pipeline import run_to_memory, with_event_time


def test_replica_fanin_identical_digests(spark, sf_dir):
    ev = compound_events(spark, sf_dir)
    bad = (
        ev.groupBy("digest")
        .agg(F.count("*").alias("n"), F.countDistinct("node_id").alias("nodes"))
        .filter((F.col("n") != 2) | (F.col("nodes") != 2))
        .count()
    )
    assert bad == 0


def test_classifier_marks_skipped_kinds(spark, sf_dir):
    rows = cdc_partition_classifier(spark, sf_dir).collect()
    by_ptype = {r["ptype"]: r for r in rows}
    for p in SKIPPED_PTYPES:
        assert not by_ptype[p]["is_processed"]
    for p in PROCESSED_PTYPES:
        assert by_ptype[p]["is_processed"]
    # replica fan-in: raw events = 2x distinct mutations
    for r in rows:
        assert r["n_events"] == 2 * r["n_mutations"]


def test_partition_events_have_null_clustering_key(spark, sf_dir):
    """P8: partition deletes and static-only updates bind only the leading
    PK column — clustering field is null in the key."""
    rec = cdc_compound_key_records(spark, sf_dir)
    part_events = rec.filter(
        F.col("ptype").isin(
            "PARTITION_KEY_ROW_DELETION", "PARTITION_LEVEL_MODIFICATION"
        )
    )
    assert part_events.count() > 0
    assert part_events.filter(F.col("key_orderkey").isNotNull()).count() == 0
    row_events = rec.filter(F.col("ptype") == "ROW_LEVEL_MODIFICATION")
    assert row_events.filter(F.col("key_orderkey").isNull()).count() == 0


def test_static_only_projection(spark, sf_dir):
    """P7: static-only updates carry ONLY static columns in the value."""
    rec = cdc_compound_key_records(spark, sf_dir)
    stat = rec.filter(F.col("ptype") == "PARTITION_LEVEL_MODIFICATION")
    assert stat.count() > 0
    assert stat.filter(F.col("s_mktsegment").isNull()).count() == 0
    assert stat.filter(F.col("v_totalprice").isNotNull()).count() == 0
    assert stat.filter(F.col("v_orderstatus").isNotNull()).count() == 0
    assert stat.filter(F.col("is_tombstone")).count() == 0


def test_deletes_are_tombstones(spark, sf_dir):
    rec = cdc_compound_key_records(spark, sf_dir)
    dels = rec.filter(F.col("op") == "DELETE")
    assert dels.count() > 0
    assert dels.filter(~F.col("is_tombstone")).count() == 0
    assert dels.filter(F.col("v_totalprice").isNotNull()).count() == 0


def test_partition_delete_dominates_older_rows(spark, sf_dir):
    """A partition tombstone kills every row of the partition with a lower
    writetime; newer rows survive."""
    state = cdc_compound_lww_state(spark, sf_dir)
    ev = compound_events(spark, sf_dir)
    pd_wt = {
        r["pk_p"]: r["wt"]
        for r in ev.filter(F.col("ptype") == "PARTITION_KEY_ROW_DELETION")
        .groupBy("pk_p")
        .agg(F.max("writetime").alias("wt"))
        .collect()
    }
    assert pd_wt, "fixture must contain partition deletes"
    surviving = state.filter(F.col("custkey").isin(*pd_wt)).collect()
    for r in surviving:
        assert r["writetime"] > pd_wt[r["custkey"]]
    # and at least one partition actually lost rows to the tombstone
    lost = (
        ev.filter(
            F.col("pk_c").isNotNull()
            & F.col("pk_p").isin(*pd_wt)
        )
        .select("pk_p", "pk_c")
        .distinct()
        .count()
    )
    assert lost > len(surviving)


def test_row_delete_removes_row(spark, sf_dir):
    """Full-PK delete: orderkey%9==0 rows are gone from the converged state
    (their delete is the newest row event)."""
    state = cdc_compound_lww_state(spark, sf_dir)
    assert state.filter(F.col("orderkey") % 9 == 0).count() == 0


def test_compound_read_after_event_branches(spark):
    """The three lookup shapes: full-PK join, prefix static join,
    lookup-free partition tombstone."""
    from cdc_apache_cassandra_spark.operators.lookup import (
        read_after_event_compound,
    )

    ev_rows = [
        (1, 10, "ROW_LEVEL_MODIFICATION", "INSERT", 100),
        (1, 99, "ROW_LEVEL_MODIFICATION", "INSERT", 101),  # missing in snap
        (1, 10, "PARTITION_AND_CLUSTERING_KEY_ROW_DELETION", "DELETE", 102),
        (1, None, "PARTITION_LEVEL_MODIFICATION", "UPDATE", 103),
        (2, None, "PARTITION_KEY_ROW_DELETION", "DELETE", 104),
    ]
    ev = spark.createDataFrame(
        ev_rows, "pk_p long, pk_c long, ptype string, op string, writetime long"
    )
    snap = spark.createDataFrame(
        [(1, 10, "SEG_A", 5.0, "O")],
        "pk_p long, pk_c long, s_seg string, r_price double, r_status string",
    )
    out = read_after_event_compound(
        ev, snap, ["pk_p"], ["pk_c"], ["s_seg"], ["r_price", "r_status"]
    )
    rows = {(r.pk_p, r.pk_c, r.ptype): r for r in out.collect()}
    assert len(rows) == 5
    # full-PK hit: current row values
    hit = rows[(1, 10, "ROW_LEVEL_MODIFICATION")]
    assert not hit.is_tombstone and hit.r_price == 5.0 and hit.s_seg == "SEG_A"
    # full-PK miss: tombstone (row vanished)
    assert rows[(1, 99, "ROW_LEVEL_MODIFICATION")].is_tombstone
    # row delete: tombstone regardless of snapshot
    assert rows[(1, 10, "PARTITION_AND_CLUSTERING_KEY_ROW_DELETION")].is_tombstone
    # static update: prefix join, statics only
    st = rows[(1, None, "PARTITION_LEVEL_MODIFICATION")]
    assert st.s_seg == "SEG_A" and st.r_price is None and not st.is_tombstone
    # partition delete: tombstone, null clustering
    assert rows[(2, None, "PARTITION_KEY_ROW_DELETION")].is_tombstone


def test_compound_static_lookup_on_vanished_partition_is_tombstone(spark):
    """A PARTITION_LEVEL_MODIFICATION whose prefix matches NO snapshot
    partition is an EMPTY read — the reference emits a null value
    (tombstone, CassandraSource.java:554), not a live record whose
    statics happen to be null."""
    from cdc_apache_cassandra_spark.operators.lookup import (
        read_after_event_compound,
    )

    ev = spark.createDataFrame(
        [(7, None, "PARTITION_LEVEL_MODIFICATION", "UPDATE", 100)],
        "pk_p long, pk_c long, ptype string, op string, writetime long",
    )
    snap = spark.createDataFrame(
        [(1, 10, "SEG_A", 5.0, "O")],
        "pk_p long, pk_c long, s_seg string, r_price double, r_status string",
    )
    out = read_after_event_compound(
        ev, snap, ["pk_p"], ["pk_c"], ["s_seg"], ["r_price", "r_status"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.is_tombstone and r.s_seg is None and r.r_price is None


def test_compound_stream_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming digest-dedup over a file replay of the compound stream
    collapses the RF=2 duplication to the batch cardinality."""
    d = str(tmp_path / "compound_events")
    compound_events(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(d)
    )
    deduped = (
        with_event_time(stream)
        .withWatermark("event_time", "365 days")
        .dropDuplicatesWithinWatermark(["digest"])
    )
    name = f"compound_{uuid.uuid4().hex[:8]}"
    run_to_memory(deduped, name)
    got = spark.table(name)
    want = spark.read.parquet(d).dropDuplicates(["digest"])
    assert got.count() == want.count()
    assert got.groupBy("digest").count().filter("count > 1").count() == 0
