"""foreachBatch materialization: CDC stream -> queryable table with LWW
upsert + tombstone deletion (SURVEY §7.4 'tombstones downstream')."""

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.operators.lww import last_write_wins
from cdc_apache_cassandra_spark.sources.event_source import mutation_events
from cdc_apache_cassandra_spark.streaming.materialize import (
    active_view,
    materialize_stream,
    merge_batch_lww,
)


def expected_table(spark, sf_dir):
    state = last_write_wins(dedup_mutations(mutation_events(spark, sf_dir)))
    return state.filter("op <> 'DELETE'")


def test_merge_batch_lww_semantics(spark):
    rows1 = [("INSERT", 1, 10, "a", "x", 0, 0), ("INSERT", 2, 10, "b", "x", 0, 0)]
    rows2 = [("UPDATE", 1, 20, "a2", "x", 0, 1), ("DELETE", 2, 30, None, None, 0, 2)]
    schema = "op string, pk long, writetime long, v string, w string, segment long, position long"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)
    s1 = merge_batch_lww(None, b1, ["pk"])
    assert s1.count() == 2
    s2 = merge_batch_lww(s1, b2, ["pk"])
    got = {r.pk: r for r in active_view(s2).collect()}
    assert set(got) == {1}  # pk=2 tombstoned away from the view
    assert got[1].v == "a2" and got[1].writetime == 20
    # ...but the tombstone is retained in state (resurrection guard)
    assert s2.filter("pk = 2 AND op = 'DELETE'").count() == 1


def test_tombstone_blocks_stale_insert_in_later_batch(spark):
    """Out-of-order replay: the DELETE (wt=30) lands in batch 1; the stale
    INSERT (wt=10) only arrives in batch 2. Retained tombstone wins."""
    schema = "op string, pk long, writetime long, v string, w string, segment long, position long"
    b1 = spark.createDataFrame([("DELETE", 2, 30, None, None, 0, 0)], schema)
    b2 = spark.createDataFrame([("INSERT", 2, 10, "stale", "x", 0, 0)], schema)
    s = merge_batch_lww(merge_batch_lww(None, b1, ["pk"]), b2, ["pk"])
    assert active_view(s).count() == 0


def test_materialized_stream_equals_batch_state(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    mutation_events(spark, sf_dir).repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q = materialize_stream(stream, table, ckpt, ["pk"])
    q.processAllAvailable()
    q.stop()

    got = active_view(spark.read.parquet(table)).select(
        "pk", "op", "writetime", "c_acctbal"
    )
    want = expected_table(spark, sf_dir).select("pk", "op", "writetime", "c_acctbal")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # tombstoned keys (pk%7==0 newest is DELETE) must be absent from the view
    assert got.filter(F.col("pk") % 7 == 0).count() == 0
