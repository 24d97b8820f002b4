"""Structured Streaming pipeline tests: the batch/stream unification
(SURVEY §7.1) — the streaming slice must produce exactly the batch result."""

import uuid

import pytest
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.sources.event_source import mutation_events
from cdc_apache_cassandra_spark.sources.registry import load_table
from cdc_apache_cassandra_spark.streaming.pipeline import (
    build_pipeline,
    run_to_memory,
)
from cdc_apache_cassandra_spark.streaming.state import (
    mutation_cache_dedup_batch,
    mutation_cache_dedup_stream,
)

VALUE_COLS = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """Materialize the synthetic event stream as parquet files so a file
    source can replay them as a stream (stand-in for the events topic)."""
    d = str(tmp_path_factory.mktemp("events_parquet"))
    # several files => several source splits
    mutation_events(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, event_dir):
    schema = spark.read.parquet(event_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # multiple micro-batches (W4)
        .parquet(event_dir)
    )


def test_stream_equals_batch(spark, sf_dir, event_dir):
    """The streaming pipeline over the file-source replay produces exactly
    the batch pipeline's rows (same logical plan, two run modes)."""
    snapshot = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "pk"
    )
    stream = _read_stream(spark, event_dir)
    # TTL must cover the replay's event-time disorder (writetimes span the
    # whole key space here); with the default 60 s a genuinely-late replica
    # is dropped by the watermark — see test_late_events_dropped_by_watermark.
    out = build_pipeline(
        stream, snapshot, ["pk"], VALUE_COLS, ttl="365 days", streaming=True
    )
    name = f"cdc_out_{uuid.uuid4().hex[:8]}"
    run_to_memory(out, name)
    got = spark.table(name)

    batch_events = spark.read.parquet(event_dir)
    want = build_pipeline(batch_events, snapshot, ["pk"], VALUE_COLS, streaming=False)

    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_dedup_suppresses_replicas(spark, sf_dir, event_dir):
    """dropDuplicatesWithinWatermark collapses the RF=2 duplication even
    when replicas arrive in different micro-batches."""
    from cdc_apache_cassandra_spark.streaming.pipeline import streaming_dedup

    stream = _read_stream(spark, event_dir)
    name = f"dedup_out_{uuid.uuid4().hex[:8]}"
    run_to_memory(streaming_dedup(stream, ttl="365 days"), name)
    got = spark.table(name)
    want = dedup_mutations(spark.read.parquet(event_dir))
    assert got.count() == want.count()
    assert got.groupBy("pk", "digest").count().filter("count > 1").count() == 0


def test_late_events_dropped_by_watermark(spark):
    """W1/W3 late-data policy: an event older than watermark - TTL is
    dropped — the event-time analogue of the reference's 60 s cache TTL
    (events outside the window are no longer deduplicable either)."""
    import pandas as pd

    rows = [
        # batch 1: fresh event at t=10_000s advances watermark far ahead
        (1, "new", 10_000_000_000, 0, 0, 0),
        # batch 2 (later file): event at t=0, older than 10_000s - 60s => late
        (2, "old", 0, 0, 0, 0),
    ]
    df = pd.DataFrame(
        rows, columns=["pk", "digest", "writetime", "segment", "position", "node_id"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(df.iloc[[0]]).write.parquet(f"{d}/f1")
        spark.createDataFrame(df.iloc[[1]]).write.parquet(f"{d}/f2")
        schema = spark.read.parquet(f"{d}/f1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/*")
        )
        from cdc_apache_cassandra_spark.streaming.pipeline import streaming_dedup

        name = f"late_{uuid.uuid4().hex[:8]}"
        run_to_memory(streaming_dedup(stream, ttl="60 seconds"), name)
        got = spark.table(name).collect()
        digests = sorted(r["digest"] for r in got)
        # the late event may or may not be dropped depending on file order;
        # the invariant is: never MORE than the distinct mutations, and the
        # fresh one always survives.
        assert "new" in digests and len(digests) <= 2


def test_mutation_cache_bounded_eviction(spark):
    """Reference MutationCache semantics: ≤N digests per key, oldest
    evicted — a digest re-arriving after N others is NOT suppressed
    (at-least-once, MutationCache.java:47-73)."""
    rows = []
    # key A: digest d0 , then d1,d2,d3 (evicts d0), then d0 again => d0 passes twice
    seq = ["d0", "d1", "d2", "d3", "d0", "d1"]
    for i, d in enumerate(seq):
        rows.append((1, d, i, 0, i))
    # key B: immediate duplicate => suppressed
    rows += [(2, "x", 0, 0, 0), (2, "x", 1, 0, 1)]
    df = spark.createDataFrame(
        rows, "pk long, digest string, writetime long, segment long, position long"
    )
    out = mutation_cache_dedup_batch(df, max_digests=3)
    a = [r["digest"] for r in out.filter("pk = 1").orderBy("writetime").collect()]
    assert a == ["d0", "d1", "d2", "d3", "d0", "d1"]  # every arrival distinct-in-window
    b = out.filter("pk = 2").collect()
    assert len(b) == 1


def test_mutation_cache_suppresses_within_window(spark):
    """Duplicates within the bounded window ARE suppressed."""
    rows = [(1, "d0", 0, 0, 0), (1, "d1", 1, 0, 1), (1, "d0", 2, 0, 2)]
    df = spark.createDataFrame(
        rows, "pk long, digest string, writetime long, segment long, position long"
    )
    out = mutation_cache_dedup_batch(df, max_digests=3)
    assert [r["digest"] for r in out.orderBy("writetime").collect()] == ["d0", "d1"]


def test_mutation_cache_event_time_ttl(spark, sf_dir, event_dir):
    """EventTimeTimeout variant: dedups the replay like the batch twin;
    expiry horizon comes from the watermark, so a finite replay settles."""
    from pyspark.sql import functions as F

    from cdc_apache_cassandra_spark.streaming.state import (
        mutation_cache_dedup_stream_event_time,
    )

    stream = _read_stream(spark, event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    ).withColumn("event_time", F.timestamp_micros(F.col("writetime")))
    name = f"cache_et_{uuid.uuid4().hex[:8]}"
    run_to_memory(
        mutation_cache_dedup_stream_event_time(stream, ttl_ms=60_000), name
    )
    got = spark.table(name)
    batch = spark.read.parquet(event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    want = mutation_cache_dedup_batch(batch)
    assert got.count() == want.count()
    assert got.groupBy("pk", "digest").count().filter("count > 1").count() == 0


def test_mutation_cache_stream_matches_batch(spark, sf_dir, event_dir):
    """The applyInPandasWithState operator dedups the replayed stream to the
    same per-(pk,digest) cardinality as the batch twin."""
    stream = _read_stream(spark, event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    name = f"cache_out_{uuid.uuid4().hex[:8]}"
    # ttl_ms=None (NoTimeout): a finite replay must settle; see operator doc.
    run_to_memory(mutation_cache_dedup_stream(stream, ttl_ms=None), name)
    got = spark.table(name)
    batch = spark.read.parquet(event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    want = mutation_cache_dedup_batch(batch)
    # same digest multiset per key (order across micro-batches may differ)
    assert got.count() == want.count()
    assert (
        got.groupBy("pk", "digest").count()
        .exceptAll(want.groupBy("pk", "digest").count())
        .count()
        == 0
    )


def test_mutation_cache_transform_with_state(spark, sf_dir, event_dir):
    """The Spark-4 transformWithStateInPandas operator (RocksDB state store,
    native TTL) dedups the replay to the same per-(pk,digest) multiset as
    the batch twin — all three cache operators agree.

    The transformWithState Python worker speaks protobuf to the JVM;
    real clusters ship the wheel, and in this container the vendored
    wire-format shim (streaming/protoshim.py, activated by conftest
    BEFORE the JVM starts) stands in — so this test runs the ACTUAL
    engine path, RocksDB state store and all, either way."""
    from cdc_apache_cassandra_spark.streaming.protoshim import (
        ensure_protobuf,
    )

    assert ensure_protobuf() in ("native", "shim")
    from cdc_apache_cassandra_spark.streaming.state import (
        mutation_cache_dedup_stream_tws,
    )

    stream = _read_stream(spark, event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    name = f"tws_out_{uuid.uuid4().hex[:8]}"
    run_to_memory(mutation_cache_dedup_stream_tws(stream, ttl_ms=None), name)
    got = spark.table(name)
    batch = spark.read.parquet(event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    want = mutation_cache_dedup_batch(batch)
    assert got.count() == want.count()
    assert (
        got.groupBy("pk", "digest").count()
        .exceptAll(want.groupBy("pk", "digest").count())
        .count()
        == 0
    )


def test_mutation_cache_processor_logic_with_fake_handle(spark, event_dir):
    """Drive MutationCacheProcessor (the transformWithStateInPandas
    StatefulProcessor) through a faked handle/ValueState so its actual
    init/handleInputRows/close code EXECUTES here, even though the
    engine-side transformWithState run stays protobuf-gated in this
    container. Replays the per-key groups across two micro-batches and
    checks the surviving multiset equals the batch twin's."""
    import pandas as pd

    from cdc_apache_cassandra_spark.streaming.state import (
        MutationCacheProcessor,
        mutation_cache_dedup_batch,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}
            self.ttls = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttls[name] = ttlDurationMs
            return self.states.setdefault(name, FakeValueState())

    events = spark.read.parquet(event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    pdf_all = events.toPandas()
    got_parts = []
    for pk, group in pdf_all.groupby("pk"):
        proc = MutationCacheProcessor(ttl_ms=123456)
        handle = FakeHandle()
        proc.init(handle)
        assert handle.ttls == {"seen": 123456}  # native-TTL plumb-through
        g = group.sort_values(["segment", "position"], kind="mergesort")
        # two micro-batches per key: state must carry across them
        half = len(g) // 2
        for chunk in (g.iloc[:half], g.iloc[half:]):
            if len(chunk) == 0:
                continue
            got_parts.extend(
                proc.handleInputRows((pk,), iter([chunk]), None)
            )
        proc.close()
    got = pd.concat(got_parts, ignore_index=True)
    want = mutation_cache_dedup_batch(events).toPandas()
    key = ["pk", "digest", "writetime", "segment", "position"]
    assert (
        got[key].sort_values(key).reset_index(drop=True).equals(
            want[key].sort_values(key).reset_index(drop=True)
        )
    )


def test_mutation_cache_row_processor_matches_pandas(spark, event_dir):
    """MutationCacheRowProcessor (the row-mode transformWithState hot
    path) driven through a faked handle yields the SAME surviving
    multiset as the batch twin — including across two micro-batches per
    key (state carry) and with the bounded-eviction cache exercised
    (max_digests=2 on keys with 3+ distinct digests)."""
    import pandas as pd
    from pyspark.sql import Row

    from cdc_apache_cassandra_spark.streaming.state import (
        MutationCacheProcessor,
        MutationCacheRowProcessor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}
            self.ttls = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttls[name] = ttlDurationMs
            return self.states.setdefault(name, FakeValueState())

    cols = ["pk", "digest", "writetime", "segment", "position"]
    events = spark.read.parquet(event_dir).select(*cols)
    pdf_all = events.toPandas()
    sort_idx = (cols.index("writetime"), cols.index("segment"),
                cols.index("position"))
    digest_idx = cols.index("digest")
    for max_digests in (2, 1024):
        got_rows, want_parts = [], []
        for pk, group in pdf_all.groupby("pk"):
            rproc = MutationCacheRowProcessor(
                sort_idx, digest_idx, max_digests=max_digests, ttl_ms=9876
            )
            rhandle = FakeHandle()
            rproc.init(rhandle)
            assert rhandle.ttls == {"seen": 9876}
            pproc = MutationCacheProcessor(
                max_digests=max_digests, ttl_ms=9876
            )
            phandle = FakeHandle()
            # pandas processor probes via .get() returning None when absent
            pproc.init(phandle)
            g = group.sort_values(["segment", "position"], kind="mergesort")
            half = len(g) // 2
            for chunk in (g.iloc[:half], g.iloc[half:]):
                if len(chunk) == 0:
                    continue
                rows = [
                    Row(**{c: chunk.iloc[i][c] for c in cols})
                    for i in range(len(chunk))
                ]
                got_rows.extend(rproc.handleInputRows((pk,), iter(rows), None))
                want_parts.extend(
                    pproc.handleInputRows((pk,), iter([chunk]), None)
                )
            rproc.close()
            pproc.close()
        got = pd.DataFrame([r.asDict() for r in got_rows], columns=cols)
        want = pd.concat(want_parts, ignore_index=True)[cols]
        assert (
            got.sort_values(cols).reset_index(drop=True).astype(str).equals(
                want.sort_values(cols).reset_index(drop=True).astype(str)
            )
        ), f"row/pandas divergence at max_digests={max_digests}"


def test_engine_selector_prefers_tws_and_engines_agree(spark, event_dir):
    """mutation_cache_dedup(engine='auto') selects transformWithState
    when its protobuf dependency is satisfiable (always true here: real
    wheel or vendored shim), and both engines converge the same replay
    to the same multiset."""
    import uuid as _uuid

    from cdc_apache_cassandra_spark.streaming.state import (
        mutation_cache_dedup,
    )

    stream = _read_stream(spark, event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    names = {}
    for engine in ("auto", "pandas-state"):
        name = f"sel_{engine.replace('-', '_')}_{_uuid.uuid4().hex[:8]}"
        run_to_memory(
            mutation_cache_dedup(stream, ttl_ms=None, engine=engine), name
        )
        names[engine] = name
    a = spark.table(names["auto"])
    b = spark.table(names["pandas-state"])
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ddl_restart_listener_one_logical_stream(spark, tmp_path):
    """DdlRestartingStream: a mid-stream ALTER-ADD segment flows through
    ONE logical stream — the listener detects the widened source schema,
    stops at a micro-batch boundary, restarts from the SAME checkpoint
    (no duplicate, no loss), and pre-DDL rows backfill the new column
    with nulls."""
    import pyspark.sql.functions as F

    from cdc_apache_cassandra_spark.streaming.schema_evolution import (
        DdlRestartingStream,
        parquet_dir_schema,
    )

    src, out, ck = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "pk long, v string"
    ).coalesce(1).write.parquet(src)

    def start_query(schema):
        return (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    s = DdlRestartingStream(
        lambda: parquet_dir_schema(spark, src), start_query
    )
    try:
        # cycle 1: old schema, no DDL observed
        assert s.drain() is False and s.restarts == 0

        # DDL: new segment adds a nullable column
        spark.createDataFrame(
            [(3, "c", "X")], "pk long, v string, v2 string"
        ).coalesce(1).write.mode("append").parquet(src)
        # cycle 2: listener observes the widened schema BEFORE consuming
        assert s.drain() is True and s.restarts == 1
        assert [f.name for f in s.schema.fields] == ["pk", "v", "v2"]
        # cycle 3: nothing new, no restart
        assert s.drain() is False and s.restarts == 1
    finally:
        s.stop()

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r.pk: r for r in merged.collect()}
    assert len(rows) == 3 and merged.count() == 3  # no dup, no loss
    assert rows[1].v2 is None and rows[2].v2 is None
    assert rows[3].v2 == "X"


def test_mutation_cache_event_time_custom_column_name(spark, sf_dir, event_dir):
    """The event-time operator must honor ``event_time_col`` — the timeout
    horizon reads the CALLER'S column, not a hardcoded name (regression:
    the inner fn indexed pdf["event_time"] literally, so any other name
    KeyError'd on the executor)."""
    from cdc_apache_cassandra_spark.streaming.state import (
        mutation_cache_dedup_stream_event_time,
    )

    stream = _read_stream(spark, event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    ).withColumn("mutation_ts", F.timestamp_micros(F.col("writetime")))
    name = f"cache_etc_{uuid.uuid4().hex[:8]}"
    run_to_memory(
        mutation_cache_dedup_stream_event_time(
            stream, ttl_ms=60_000, event_time_col="mutation_ts"
        ),
        name,
    )
    got = spark.table(name)
    batch = spark.read.parquet(event_dir).select(
        "pk", "digest", "writetime", "segment", "position"
    )
    want = mutation_cache_dedup_batch(batch)
    assert got.count() == want.count()
    assert got.groupBy("pk", "digest").count().filter("count > 1").count() == 0
