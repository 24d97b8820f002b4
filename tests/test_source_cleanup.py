"""S10 archive/error file handling: the reference moves processed
commitlog segments to archives/ or deletes them
(ArchiveCommitLogTransfer.java:25-52, BlackHoleCommitLogTransfer.java:
25-71). Spark's file source does the same via cleanSource=archive/delete.

Caveat matching the engine's semantics: archival runs lazily at the
START of later micro-batches, so with a finite replay the final batch's
files remain in place until another batch fires — the reference has the
same shape (a segment is only transferred after its successor task
completes the offsets, CommitLogReaderService.java:266-323)."""

import time
import uuid

from cdc_apache_cassandra_spark.sources.event_source import mutation_events


def _wait(cond, timeout_s=30):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.5)
    return cond()


def test_clean_source_archives_processed_files(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    archive = tmp_path / "archive"
    ev = mutation_events(spark, sf_dir).select("pk", "digest", "node_id").limit(200)
    # several files => several micro-batches => earlier batches' files get
    # archived while later batches run
    ev.repartition(6).write.parquet(str(src))
    data_files = list(src.glob("*.parquet"))
    assert len(data_files) >= 4

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("cleanSource", "archive")
        .option("sourceArchiveDir", str(archive))
        .parquet(str(src))
    )
    name = f"clean_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() > 0
        # cleaner threads archive asynchronously — poll for SOME movement
        moved = _wait(
            lambda: any(archive.rglob("*.parquet"))
            and any(not p.exists() for p in data_files)
        )
        assert moved, "no processed source file was archived"
    finally:
        q.stop()
    # nothing lost: remaining source + archived copies == original rows
    remaining = [p for p in data_files if p.exists()]
    total = 0
    if remaining:
        total += spark.read.parquet(*[str(p) for p in remaining]).count()
    total += (
        spark.read.option("recursiveFileLookup", "true").parquet(str(archive)).count()
    )
    assert total == 200
