"""Schema evolution (reference ALTER TABLE ADD scenario, testSinglePk
PulsarCassandraSourceTests.java:261-343 + BACKWARD-transitive compat
rules) — additive columns flow as nulls for pre-DDL events; drops and
type changes are rejected."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_apache_cassandra_spark.streaming.schema_evolution import (
    IncompatibleSchemaChange,
    align_to_schema,
    reconcile_schemas,
    union_evolved,
)

OLD = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField("a", T.StringType(), True),
    ]
)
NEW = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField("a", T.StringType(), True),
        T.StructField("b", T.IntegerType(), True),
    ]
)


def test_reconcile_adds_nullable_column():
    merged = reconcile_schemas(OLD, NEW)
    names = [f.name for f in merged.fields]
    assert names == ["pk", "a", "b"]
    assert merged["b"].nullable


def test_reconcile_keeps_dropped_columns():
    """A column dropped upstream keeps flowing as nulls (Avro null
    default) — merged schema is the union."""
    merged = reconcile_schemas(NEW, OLD)
    assert [f.name for f in merged.fields] == ["pk", "a", "b"]


def test_reconcile_rejects_type_change():
    changed = T.StructType(
        [
            T.StructField("pk", T.LongType(), False),
            T.StructField("a", T.DoubleType(), True),
        ]
    )
    with pytest.raises(IncompatibleSchemaChange):
        reconcile_schemas(OLD, changed)


def test_align_fills_typed_nulls(spark):
    df = spark.createDataFrame([(1, "x")], OLD)
    out = align_to_schema(df, NEW)
    assert out.schema["b"].dataType == T.IntegerType()
    assert out.first()["b"] is None


def test_align_rejects_unreconciled_extra(spark):
    df = spark.createDataFrame([(1, "x", 2)], NEW)
    with pytest.raises(IncompatibleSchemaChange):
        align_to_schema(df, OLD)


def test_union_evolved_alter_table_add(spark):
    """Pre-DDL events + post-DDL events (new column) unify into one
    stream; the old rows show null for the added column and downstream
    LWW sees a single consistent schema."""
    pre = spark.createDataFrame([(1, "v1"), (2, "v1")], OLD)
    post = spark.createDataFrame([(1, "v2", 42)], NEW)
    unified = union_evolved(pre, post)
    assert [f.name for f in unified.schema.fields] == ["pk", "a", "b"]
    rows = {(r.pk, r.a): r.b for r in unified.collect()}
    assert rows[(1, "v1")] is None and rows[(1, "v2")] == 42


def test_union_evolved_streaming_file_replay(spark, tmp_path):
    """Evolved parquet files (a later file adds a column) replay as ONE
    stream once aligned — the restart-on-DDL recipe with the same
    checkpoint."""
    import uuid

    from cdc_apache_cassandra_spark.streaming.pipeline import run_to_memory

    d1, d2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1, "x"), (2, "y")], OLD).write.parquet(d1)
    spark.createDataFrame([(3, "z", 7)], NEW).write.parquet(d2)

    merged = reconcile_schemas(OLD, NEW)
    stream = spark.readStream.schema(merged).option(
        "mergeSchema", "true"
    ).parquet(str(tmp_path) + "/v*")
    name = f"evo_{uuid.uuid4().hex[:8]}"
    run_to_memory(stream.filter(F.col("pk") > 0), name)
    got = spark.table(name)
    assert got.count() == 3
    assert {r.b for r in got.collect()} == {None, 7}


def test_restart_on_ddl_with_same_checkpoint(spark, tmp_path):
    """The restart-on-DDL policy end-to-end: consume old-schema segments,
    stop, land NEW-schema segments (ALTER TABLE ADD), restart the stream
    with the reconciled schema and the SAME checkpoint — offsets must
    resume (no replay of consumed files) and old rows surface the added
    column as null in the merged sink."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    src, out, ck = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "pk long, v string"
    )
    old.coalesce(1).write.mode("overwrite").parquet(src)

    old_schema = T.StructType(
        [T.StructField("pk", T.LongType()), T.StructField("v", T.StringType())]
    )

    def run(schema):
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(old_schema)
    assert spark.read.parquet(out).count() == 2

    # DDL: new segments carry an added nullable column
    new = spark.createDataFrame(
        [(3, "c", "X"), (4, "d", "Y")], "pk long, v string, v2 string"
    )
    new.coalesce(1).write.mode("append").parquet(src)
    new_schema = reconcile_schemas(
        old_schema,
        T.StructType(
            old_schema.fields + [T.StructField("v2", T.StringType())]
        ),
    )
    run(new_schema)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert merged.count() == 4  # no replay of the consumed old segment
    assert merged.filter(F.col("pk").isin(1, 2))\
        .filter(F.col("v2").isNull()).count() == 2
    assert merged.filter(F.col("pk").isin(3, 4))\
        .filter(F.col("v2").isNotNull()).count() == 2


# --- recursive (UDT) evolution: onUserDefinedTypeUpdated -------------------

UDT_OLD = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField(
            "u",
            T.StructType([T.StructField("s", T.StringType(), True)]),
            True,
        ),
    ]
)
UDT_NEW = T.StructType(
    [
        T.StructField("pk", T.LongType(), False),
        T.StructField(
            "u",
            T.StructType(
                [
                    T.StructField("s", T.StringType(), True),
                    T.StructField("t", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def test_reconcile_recurses_into_struct():
    """ALTER TYPE ... ADD field: additive nullable field INSIDE a nested
    StructType merges instead of raising (CassandraSource.java:666-698)."""
    merged = reconcile_schemas(UDT_OLD, UDT_NEW)
    u = merged["u"].dataType
    assert [f.name for f in u.fields] == ["s", "t"]
    assert u["t"].nullable


def test_reconcile_recurses_into_array_and_map():
    inner_old = T.StructType([T.StructField("x", T.LongType(), True)])
    inner_new = T.StructType(
        [T.StructField("x", T.LongType(), True), T.StructField("y", T.StringType(), True)]
    )
    old = T.StructType(
        [
            T.StructField("arr", T.ArrayType(inner_old), True),
            T.StructField("m", T.MapType(T.StringType(), inner_old), True),
        ]
    )
    new = T.StructType(
        [
            T.StructField("arr", T.ArrayType(inner_new), True),
            T.StructField("m", T.MapType(T.StringType(), inner_new), True),
        ]
    )
    merged = reconcile_schemas(old, new)
    assert [f.name for f in merged["arr"].dataType.elementType.fields] == ["x", "y"]
    assert [f.name for f in merged["m"].dataType.valueType.fields] == ["x", "y"]


def test_reconcile_rejects_nested_type_change():
    bad = T.StructType(
        [
            T.StructField("pk", T.LongType(), False),
            T.StructField(
                "u",
                T.StructType([T.StructField("s", T.DoubleType(), True)]),
                True,
            ),
        ]
    )
    with pytest.raises(IncompatibleSchemaChange):
        reconcile_schemas(UDT_OLD, bad)


def test_reconcile_rejects_map_key_change():
    old = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.LongType()), True)]
    )
    new = T.StructType(
        [T.StructField("m", T.MapType(T.LongType(), T.LongType()), True)]
    )
    with pytest.raises(IncompatibleSchemaChange):
        reconcile_schemas(old, new)


def test_align_backfills_nested_field_and_preserves_null_udt(spark):
    """Old rows align to the widened UDT with the new field null INSIDE
    the record; a null UDT stays null (does not become a struct of
    nulls)."""
    df = spark.createDataFrame([(1, ("a",)), (2, None)], UDT_OLD)
    out = align_to_schema(df, reconcile_schemas(UDT_OLD, UDT_NEW))
    rows = {r.pk: r.u for r in out.collect()}
    assert rows[1].s == "a" and rows[1].t is None
    assert rows[2] is None


def test_union_evolved_udt_add_field(spark):
    pre = spark.createDataFrame([(1, ("a",))], UDT_OLD)
    post = spark.createDataFrame([(2, ("b", 5))], UDT_NEW)
    unified = union_evolved(pre, post)
    rows = {r.pk: r.u for r in unified.collect()}
    assert rows[1].s == "a" and rows[1].t is None
    assert rows[2].s == "b" and rows[2].t == 5
