"""A6 metrics: observe() counters in batch and per-micro-batch via the
StreamingQueryListener (reference CdcMetrics sent/skipped counters and
monitor.adoc export)."""

import time
import uuid

from cdc_apache_cassandra_spark.sources.event_source import mutation_events
from cdc_apache_cassandra_spark.streaming.metrics import (
    MetricsListener,
    observe_batch,
    observe_stream,
)


def test_observe_batch_counters(spark, sf_dir):
    ev = mutation_events(spark, sf_dir)
    observed, obs = observe_batch(ev)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["events_total"] == ev.count()
    assert m["inserts"] + m["updates"] + m["deletes"] == m["events_total"]
    assert m["deletes"] > 0
    # HLL estimate of distinct mutations ~ events/RF (2% default error)
    exact = ev.select("digest").distinct().count()
    assert abs(m["approx_distinct_mutations"] - exact) / exact < 0.1


def test_streaming_listener_accumulates(spark, sf_dir, tmp_path):
    d = str(tmp_path / "ev")
    mutation_events(spark, sf_dir).repartition(4).write.parquet(d)
    schema = spark.read.parquet(d).schema
    total = spark.read.parquet(d).count()

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = (
            observe_stream(stream)
            .writeStream.format("memory")
            .queryName(f"m_{uuid.uuid4().hex[:8]}")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously
        deadline = time.time() + 10
        while time.time() < deadline:
            if listener.totals().get("events_total", 0) >= total:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    totals = listener.totals()
    assert totals["events_total"] == total
    assert len(listener.batches) >= 2  # maxFilesPerTrigger=1 => several batches
    assert totals["inserts"] + totals["updates"] + totals["deletes"] == total
