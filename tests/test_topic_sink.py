"""cdc_topic custom sink: manifest-committed exactly-once publication of
keyed CDC records (S4/S7 as a first-class Spark sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.sources.commitlog_source import (
    register as register_source,
    write_segments,
)
from cdc_apache_cassandra_spark.sources.event_source import mutation_events
from cdc_apache_cassandra_spark.sources.topic_sink import (
    read_topic,
    register as register_sink,
    uncommitted_files,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def topic_run(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("topic")
    seg_dir, topic_dir, ck = (
        str(base / "segments"), str(base / "topic"), str(base / "ckpt")
    )
    write_segments(mutation_events(spark, SF), seg_dir, n_segments=3)
    register_source(spark)
    register_sink(spark)
    q = (
        spark.readStream.format("cdc_commitlog")
        .option("path", seg_dir)
        .load()
        .select("pk", "op", "writetime", "digest", "node_id")
        .writeStream.format("cdc_topic")
        .option("path", topic_dir)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return topic_dir


def test_topic_rows_match_source(spark, topic_run):
    got = read_topic(spark, topic_run)
    want = mutation_events(spark, SF)
    assert got.count() == want.count()
    # keyed identity preserved (json round-trip: pk/digest/node_id)
    g = {
        (r.pk, r.digest, r.node_id)
        for r in got.select(
            F.col("pk").cast("long").alias("pk"),
            "digest",
            F.col("node_id").cast("long").alias("node_id"),
        ).collect()
    }
    w = {
        (r.pk, r.digest, r.node_id)
        for r in want.select("pk", "digest", "node_id").collect()
    }
    assert g == w


def test_no_uncommitted_files(topic_run):
    """Everything visible is manifest-committed; staging is drained."""
    import glob
    import os

    assert uncommitted_files(topic_run) == []
    assert glob.glob(os.path.join(topic_run, "_staging", "*")) == []
