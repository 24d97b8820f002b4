"""Adaptive batch parallelism (SURVEY A5): policy parity with the
reference's adjustExecutors/decreaseExecutors/backoffRetry
(CassandraSource.java:217-275) and the Spark-side listener + drain-cycle
integration."""

import random
import uuid

import pytest

from cdc_apache_cassandra_spark.config import (
    CdcPipelineConfig,
    from_reference_keys,
)
from cdc_apache_cassandra_spark.streaming.adaptive import (
    AdaptiveLatencyListener,
    AdaptiveParallelism,
    MobileAverage,
    adaptive_drain,
)


def test_mobile_average_circular_window_integer_division():
    m = MobileAverage(3)
    assert m.value == 0
    assert m.record(10) == 10
    assert m.record(5) == 7          # (10+5)//2
    assert m.record(1) == 5          # (10+5+1)//3
    assert m.record(100) == 35       # wraps: (100+5+1)//3
    assert m.record(100) == 67       # (100+100+1)//3


def test_policy_grows_below_min_latency_up_to_max():
    p = AdaptiveParallelism(max_level=10)
    p.level = 5
    for i in range(8):
        p.record_batch(total_latency_ms=5 * 100, n_queries=100)  # 5ms < 10ms
    assert p.level == 10  # +1 per batch, capped at max_level


def test_policy_shrinks_above_max_latency_down_to_one():
    p = AdaptiveParallelism(max_level=10)
    assert p.level == 10  # reference starts at the configured pool size
    for _ in range(15):
        p.record_batch(total_latency_ms=500 * 10, n_queries=10)  # 500ms avg
    assert p.level == 1


def test_policy_steady_inside_band():
    p = AdaptiveParallelism(max_level=10)
    p.level = 4
    for _ in range(20):
        p.record_batch(total_latency_ms=50 * 10, n_queries=10)  # 50ms avg
    assert p.level == 4


def test_read_error_shrinks_ten_percent_floor_one():
    p = AdaptiveParallelism(max_level=30)
    assert p.on_read_error() == 27  # 30 - max(1, 3)
    p.level = 5
    assert p.on_read_error() == 4  # 5 - max(1, 0)
    p.level = 1
    assert p.on_read_error() == 1  # never below 1


def test_backoff_jittered_exponential_with_cap_and_reset():
    p = AdaptiveParallelism(
        max_level=10, backoff_ms=100, max_backoff_s=2, rng=random.Random(7)
    )
    waits = [p.on_unavailable() for _ in range(10)]
    assert p.consecutive_unavailable == 10
    for attempt, w in enumerate(waits, start=1):
        assert 0 <= w < max(1, min(2_000, 100 << attempt))
    # cap binds: by attempt 5, 100<<5 = 3200 > 2000
    assert all(w < 2_000 for w in waits[5:])
    p.on_success()
    assert p.consecutive_unavailable == 0
    # a successful batch also resets (reference line 594)
    p.on_unavailable()
    p.record_batch(100, 10)
    assert p.consecutive_unavailable == 0


def test_from_config_parses_reference_keys():
    cfg = from_reference_keys(
        {
            "query.executors": "16",
            "query.minMobileAvgLatency": "5",
            "query.maxMobileAvgLatency": "250",
            "query.backoffInMs": "50",
            "query.maxBackoffInSec": "10",
        }
    )
    p = AdaptiveParallelism.from_config(cfg, rng=random.Random(1))
    assert (p.max_level, p.min_latency_ms, p.max_latency_ms) == (16, 5, 250)
    assert (p.backoff_ms, p.max_backoff_s) == (50, 10)
    assert CdcPipelineConfig().min_mobile_avg_latency_ms == 10  # ref default


def test_listener_feeds_progress_and_adjusts(spark, sf_dir, tmp_path):
    """Run a real file stream with the listener attached; every observed
    micro-batch must land in the policy window and the level must stay
    within [1, max]."""
    from cdc_apache_cassandra_spark.sources.event_source import mutation_events

    d = str(tmp_path / "events")
    mutation_events(spark, sf_dir).limit(200).repartition(4).write.parquet(d)
    policy = AdaptiveParallelism(max_level=8)
    listener = AdaptiveLatencyListener(policy)
    spark.streams.addListener(listener)
    try:
        name = f"adaptive_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        import time

        for _ in range(100):
            if len(listener.batches) >= 2:
                break
            time.sleep(0.1)
    finally:
        spark.streams.removeListener(listener)
    assert len(listener.batches) >= 2  # several micro-batches observed
    for b in listener.batches:
        assert b["numInputRows"] > 0
        assert 1 <= b["level"] <= 8
        assert b["mobileAvg"] == policy.mobile_avg or b["mobileAvg"] >= 0


def test_adaptive_drain_rederives_admission_between_cycles(
    spark, sf_dir, tmp_path
):
    """Three availableNow cycles over a shared checkpoint: each cycle's
    maxFilesPerTrigger comes from the CURRENT policy level, and the
    drained rows across cycles equal the batch read exactly once."""
    from cdc_apache_cassandra_spark.sources.event_source import mutation_events

    d = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = mutation_events(spark, sf_dir).limit(300)
    ev.repartition(6).write.parquet(d)
    schema = spark.read.parquet(d).schema

    policy = AdaptiveParallelism(max_level=4)

    def start_query(max_files: int):
        # parquet sink: output accumulates ACROSS cycle restarts (a
        # memory sink would reset per query start)
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(d)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    used = adaptive_drain(start_query, policy, cycles=3, files_per_level=1)
    assert len(used) == 3
    assert all(1 <= u <= 4 for u in used)
    # nothing duplicated or lost across cycles (shared checkpoint)
    assert spark.read.parquet(out).count() == ev.count()


def test_adaptive_drain_error_triage(tmp_path):
    """'unavailable' backs off and retries the same cycle; 'overloaded'
    shrinks 10%; unknown errors propagate — CassandraSource.java:596-623."""

    class DoneQuery:
        def awaitTermination(self):
            return None

    calls = {"n": 0}

    def flaky_start(max_files: int):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("unavailable-ish")
        if calls["n"] == 2:
            raise RuntimeError("overloaded-ish")
        return DoneQuery()

    policy = AdaptiveParallelism(
        max_level=20, backoff_ms=1, max_backoff_s=1, rng=random.Random(3)
    )

    def triage(exc):
        msg = str(exc)
        if "unavailable" in msg:
            return "unavailable"
        if "overloaded" in msg:
            return "overloaded"
        return None

    used = adaptive_drain(flaky_start, policy, cycles=1, on_error=triage)
    assert used == [policy.recommend_max_files()]
    assert policy.level == 18  # 20 - max(1, 2) from the overloaded cycle
    assert policy.consecutive_unavailable == 0  # reset by the success

    with pytest.raises(ValueError):
        adaptive_drain(
            lambda mf: (_ for _ in ()).throw(ValueError("boom")),
            policy,
            cycles=1,
            on_error=triage,
        )


def test_listener_unit_calibration_reaches_both_branches():
    """Code-review r4: raw numInputRows floors per-unit latency to 0 ms
    (per-row cost is µs) so the policy could only grow. With the
    rows-per-unit mapping, an overloaded batch shrinks the level and a
    fast batch grows it back — both branches reachable."""
    from cdc_apache_cassandra_spark.streaming.adaptive import (
        AdaptiveLatencyListener,
        AdaptiveParallelism,
    )

    class _P:  # progress stand-in
        def __init__(self, ms, rows):
            self.name = None
            self.numInputRows = rows
            self.durationMs = {"triggerExecution": ms}

    class _E:
        def __init__(self, p):
            self.progress = p

    policy = AdaptiveParallelism(max_level=8)
    lst = AdaptiveLatencyListener(policy)
    # overloaded: 100k rows in 60s -> 600 ms per 1k-row unit -> shrink
    for _ in range(12):
        lst.onQueryProgress(_E(_P(60_000, 100_000)))
    assert policy.level < 8
    shrunk = policy.level
    # healthy: 100k rows in 0.5s -> 5 ms per unit -> grow back
    for _ in range(20):
        lst.onQueryProgress(_E(_P(500, 100_000)))
    assert policy.level > shrunk
    # bounded history
    for _ in range(300):
        lst.onQueryProgress(_E(_P(500, 100_000)))
    assert len(lst.batches) == AdaptiveLatencyListener.HISTORY
