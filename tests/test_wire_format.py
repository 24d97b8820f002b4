"""Wire-format round trip: events -> (key/value bytes + properties) ->
typed columns, with tombstones and the writetime/segpos/token properties
(reference SEPARATED KeyValue encoding + message props)."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_apache_cassandra_spark.sources.event_source import mutation_events
from cdc_apache_cassandra_spark.sources.wire_format import (
    from_wire_records,
    to_wire_records,
    wire_codec,
)

KEY_SCHEMA = T.StructType([T.StructField("pk", T.LongType())])
VALUE_SCHEMA = T.StructType(
    [
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)
VALUE_COLS = [f.name for f in VALUE_SCHEMA.fields]


def test_codec_reported(spark):
    assert wire_codec() in ("json", "avro")


def test_round_trip_preserves_rows_and_tombstones(spark, sf_dir):
    ev = mutation_events(spark, sf_dir)
    wire = to_wire_records(ev, ["pk"], VALUE_COLS)
    # tombstones: DELETE events carry null value bytes
    n_del = ev.filter("op = 'DELETE'").count()
    assert wire.filter(F.col("value").isNull()).count() == n_del

    back = from_wire_records(wire, KEY_SCHEMA, VALUE_SCHEMA)
    assert back.count() == ev.count()
    # non-tombstones decode to the original values
    orig = ev.filter("op <> 'DELETE'").select(
        "pk", *VALUE_COLS, "writetime", "segment", "position"
    )
    dec = back.filter(~F.col("is_tombstone")).select(
        "pk", *VALUE_COLS, "writetime", "segment", "position"
    )
    assert dec.exceptAll(orig).count() == 0
    assert orig.exceptAll(dec).count() == 0


def test_key_bytes_are_canonical_json(spark, sf_dir):
    """The key encoding is stable and parseable — the dedup/partitioning
    key downstream systems see."""
    ev = mutation_events(spark, sf_dir).limit(5)
    wire = to_wire_records(ev, ["pk"], VALUE_COLS)
    for r in wire.collect():
        k = json.loads(bytes(r["key"]).decode())
        assert set(k) == {"pk"}
        assert ":" in r["segpos"]
        assert r["token"] is not None


def test_wire_records_flow_through_pipeline(spark, sf_dir):
    """Decoded wire records drive the same dedup+LWW pipeline: encoding is
    a boundary concern, not an operator change."""
    from cdc_apache_cassandra_spark.operators.lww import last_write_wins

    ev = mutation_events(spark, sf_dir)
    # op must survive the trip for LWW tombstone logic: carry it in value?
    # No — the reference derives deletion from the NULL value. Reconstruct:
    back = from_wire_records(
        to_wire_records(ev, ["pk"], VALUE_COLS), KEY_SCHEMA, VALUE_SCHEMA
    ).withColumn(
        "op", F.when(F.col("is_tombstone"), "DELETE").otherwise("UPSERT")
    )
    state = last_write_wins(back.dropDuplicates(["pk", "writetime", "segment", "position"]))
    want = last_write_wins(
        mutation_events(spark, sf_dir).drop("node_id").dropDuplicates(
            ["pk", "digest"]
        )
    )
    assert state.count() == want.count()
    # tombstone keys agree
    got_tombs = {r.pk for r in state.filter("is_tombstone").collect()}
    want_tombs = {r.pk for r in want.filter("op = 'DELETE'").collect()}
    assert got_tombs == want_tombs
