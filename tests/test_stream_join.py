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
