"""S8/S9 CSV backfill round-trip and O3 checkpoint/resume semantics —
the reference's offset files (`<segment>_offset.dat`,
SegmentOffsetFileWriter.java:44-125) map to Structured Streaming
checkpoints: a restarted query resumes past processed files and emits no
duplicates."""

import uuid

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.sources.backfill import (
    BACKFILL_DIGEST,
    backfill_from_csv,
    backfill_mutations,
    export_pk_csv,
)
from cdc_apache_cassandra_spark.sources.event_source import mutation_events
from cdc_apache_cassandra_spark.sources.registry import load_table

VALUE_COLS = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def test_csv_backfill_roundtrip(spark, sf_dir, tmp_path):
    """Export PKs to CSV (S8), re-import with type casts + snapshot
    re-read (S9): identical mutations to the direct batch leg."""
    snap = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "pk"
    )
    csv_dir = str(tmp_path / "pk_export")
    export_pk_csv(snap, "pk", csv_dir)

    via_csv = backfill_from_csv(spark, csv_dir, snap, "pk", VALUE_COLS)
    direct = backfill_mutations(snap, "pk", VALUE_COLS)
    assert via_csv.count() == direct.count()
    assert via_csv.exceptAll(direct).count() == 0
    assert via_csv.filter(F.col("digest") != BACKFILL_DIGEST).count() == 0
    # CSV columns come back as strings; the cast must restore the PK type
    assert dict(via_csv.dtypes)["pk"] == dict(direct.dtypes)["pk"]


def test_checkpoint_resume_no_duplicates(spark, sf_dir, tmp_path):
    """O3: stop a streaming query mid-source, restart with the SAME
    checkpoint — the union of both runs is exactly-once per input row."""
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out_parquet")

    ev = mutation_events(spark, sf_dir).select(
        "pk", "op", "writetime", "digest", "node_id"
    )
    total = ev.count()
    ev.repartition(8).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    # run 1: process at least one micro-batch, then stop mid-source
    q1 = start()
    while q1.lastProgress is None or q1.lastProgress["numInputRows"] == 0:
        q1.awaitTermination(0.2)
    q1.stop()
    partial = spark.read.parquet(out).count()

    # run 2: same checkpoint resumes and finishes the remaining files
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    final = spark.read.parquet(out)
    assert partial <= total
    assert final.count() == total  # nothing lost, nothing duplicated
    assert (
        final.groupBy("pk", "digest", "node_id").count().filter("count > 1").count()
        == 0
    )


def test_file_sink_metadata_log_is_idempotent(spark, sf_dir, tmp_path):
    """Second exactly-once layer: the file sink's _spark_metadata
    transaction log records committed batch ids per SINK path, so even a
    rerun with a FRESH checkpoint (same batch ids from zero) cannot
    duplicate into the same output directory — the reference needs ack
    files + idempotent re-runs for this (TableExporter.java:106-167)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ev = mutation_events(spark, sf_dir).select("pk", "digest", "node_id").limit(100)
    ev.write.mode("overwrite").parquet(src)
    n = spark.read.parquet(src).count()
    schema = spark.read.parquet(src).schema

    for ckpt_name in ("ck_a", "ck_b"):  # two DIFFERENT checkpoints
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / ckpt_name))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    assert spark.read.parquet(out).count() == n


def test_token_range_splits_cover_ring_exactly():
    """Contiguous, disjoint, exact cover of [-2^63, 2^63) for any
    power-of-two split count; non-powers are rejected (the assignment
    must stay a single arithmetic shift)."""
    import pytest as _pytest

    from cdc_apache_cassandra_spark.sources.backfill import (
        split_id_sql,
        token_range_splits,
    )

    for n in (2, 8, 64):
        splits = token_range_splits(n)
        assert splits[0][0] == -(1 << 63)
        assert splits[-1][1] == 1 << 63
        for (lo1, hi1), (lo2, _) in zip(splits, splits[1:]):
            assert hi1 == lo2
        widths = {hi - lo for lo, hi in splits}
        assert widths == {(1 << 64) // n}
    with _pytest.raises(ValueError):
        split_id_sql("t", 6)


def test_split_id_expr_matches_boundaries(spark):
    """The shift assignment places boundary tokens exactly: each range's
    lo and hi-1 land in that range, nothing leaks to neighbors."""
    from cdc_apache_cassandra_spark.sources.backfill import (
        split_id_expr,
        token_range_splits,
    )
    from pyspark.sql import functions as F

    n = 8
    splits = token_range_splits(n)
    probe = [(lo, i) for i, (lo, hi) in enumerate(splits)] + [
        (hi - 1, i) for i, (lo, hi) in enumerate(splits)
    ]
    df = spark.createDataFrame(probe, "m3_token long, expect int")
    got = df.withColumn("sid", split_id_expr("m3_token", n))
    assert got.filter(F.col("sid") != F.col("expect")).count() == 0
