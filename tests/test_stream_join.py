"""Stream-stream interval join: the streaming result must equal the batch
join of the same two relations (one logical pipeline, two run modes)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.sources.registry import load_table
from cdc_apache_cassandra_spark.streaming.pipeline import run_to_memory
from cdc_apache_cassandra_spark.streaming.stream_join import interval_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def user_event_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("user_events"))
    load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).repartition(4).write.mode("overwrite").parquet(d)
    return d


def _streams(spark, user_event_dir):
    schema = spark.read.parquet(user_event_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(user_event_dir)
    )
    clicks = src.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = src.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks, purchases


def test_stream_stream_interval_join_equals_batch(spark, user_event_dir):
    clicks_s, purchases_s = _streams(spark, user_event_dir)
    out = interval_join(
        clicks_s, purchases_s, "user_id", "click_ts", "purchase_ts",
        max_gap="30 minutes", watermark="365 days",
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    run_to_memory(out, name)
    got = spark.table(name)

    ev = spark.read.parquet(user_event_dir)
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases_b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = interval_join(
        clicks_b, purchases_b, "user_id", "click_ts", "purchase_ts",
        max_gap="30 minutes",
    )
    assert got.count() == want.count() > 0
    assert (
        got.select("click_id", "purchase_id")
        .exceptAll(want.select("click_id", "purchase_id"))
        .count()
        == 0
    )


def test_interval_join_respects_bound(spark, user_event_dir):
    ev = spark.read.parquet(user_event_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    rows = interval_join(
        clicks, purchases, "user_id", "click_ts", "purchase_ts",
        max_gap="30 minutes",
    ).collect()
    assert rows
    for r in rows:
        gap = (r.purchase_ts - r.click_ts).total_seconds()
        assert 0 <= gap <= 1800


@pytest.fixture(scope="module")
def sorted_event_dir(spark, tmp_path_factory):
    """Time-ordered replay: range-partition events by ts and land the
    slice files in ascending time order (distinct mtimes), so each
    micro-batch's data is newer than the last — no late drops, and the
    watermark advances monotonically like a healthy production source."""
    import shutil
    import time as _time

    base = tmp_path_factory.mktemp("sorted_events")
    out = str(base / "stream")
    (base / "stream").mkdir()
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    slices = ev.repartitionByRange(4, "ts")
    tmp = str(base / "slices")
    slices.sortWithinPartitions("ts").write.mode("overwrite").parquet(tmp)
    import glob
    import os

    # range partitions come out as part-0000N in ts order; re-land them
    # one by one with increasing mtimes so the file source replays in order
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*")))):
        dst = os.path.join(out, f"slice-{i:02d}.parquet")
        shutil.copy(f, dst)
        _time.sleep(0.05)
        os.utime(dst, None)
    return out


def test_streaming_tumbling_window_agg_closed_windows(spark, sorted_event_dir):
    """Watermarked tumbling-window counts in append mode: every CLOSED
    window (end ≤ final watermark) must match the batch aggregation
    exactly; open windows are withheld, not wrong. (Replay is
    time-ordered, so nothing is late — late-drop semantics are pinned
    separately by test_late_events_dropped_by_watermark.)"""
    user_event_dir = sorted_event_dir
    schema = spark.read.parquet(user_event_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(user_event_dir)
    )
    windowed = (
        src.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("ws"),
            "event_type",
            "n",
        )
    )
    name = f"twa_{uuid.uuid4().hex[:8]}"
    run_to_memory(windowed, name)
    got = {(r.ws, r.event_type): r.n for r in spark.table(name).collect()}
    assert got, "no windows closed during the replay"

    ev = spark.read.parquet(user_event_dir)
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    # emitted (closed) windows must agree with batch bit-for-bit
    for k, n in got.items():
        assert want[k] == n, k
    # and the only missing keys are windows the watermark hadn't closed
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime
    final_wm = max_ts - datetime.timedelta(minutes=30)
    for (ws, et), n in want.items():
        if ws + datetime.timedelta(hours=1) <= final_wm:
            assert (ws, et) in got, (ws, et)


def test_streaming_complete_mode_running_counts(spark, user_event_dir):
    """Complete-mode aggregation: after draining the replay, the final
    emitted table must equal the batch group-by exactly (update/complete
    modes re-emit evolving groups; complete's last snapshot is total)."""
    schema = spark.read.parquet(user_event_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(user_event_dir)
    )
    counts = src.groupBy("event_type").agg(F.count("*").alias("n"))
    name = f"cm_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.event_type, r.n) for r in spark.table(name).collect()}
    want = {
        (r.event_type, r.n)
        for r in spark.read.parquet(user_event_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
