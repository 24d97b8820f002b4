"""Golden-value tests for the CQL type system — the DataSpec matrix
(FIXTURES F-6, testcontainers/.../DataSpec.java:77-115) ported to Spark."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_apache_cassandra_spark.functions import conversions as C
from cdc_apache_cassandra_spark.functions.cql_types import (
    CqlColumn,
    UnsupportedCqlType,
    key_value_schemas,
    spark_type,
)


# --- type mapping ----------------------------------------------------------

@pytest.mark.parametrize(
    "cql,expected",
    [
        ("text", T.StringType()),
        ("ascii", T.StringType()),
        ("boolean", T.BooleanType()),
        ("blob", T.BinaryType()),
        ("tinyint", T.ByteType()),
        ("smallint", T.ShortType()),
        ("int", T.IntegerType()),
        ("bigint", T.LongType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("timestamp", T.TimestampType()),
        ("date", T.DateType()),
        ("time", T.LongType()),
        ("uuid", T.StringType()),
        ("timeuuid", T.StringType()),
        ("inet", T.StringType()),
        ("varint", T.DecimalType(38, 0)),
        ("decimal", T.DecimalType(38, 18)),
        ("list<text>", T.ArrayType(T.StringType())),
        ("set<int>", T.ArrayType(T.IntegerType())),
        ("frozen<list<text>>", T.ArrayType(T.StringType())),
        ("map<text, double>", T.MapType(T.StringType(), T.DoubleType())),
        # F10: non-string map keys stringified
        ("map<int, double>", T.MapType(T.StringType(), T.DoubleType())),
        ("vector<float>", T.ArrayType(T.FloatType())),
        (
            "tuple<int, text>",
            T.StructType(
                [
                    T.StructField("index_0", T.IntegerType(), True),
                    T.StructField("index_1", T.StringType(), True),
                ]
            ),
        ),
        (
            "list<frozen<map<text,double>>>",
            T.ArrayType(T.MapType(T.StringType(), T.DoubleType())),
        ),
    ],
)
def test_spark_type_mapping(cql, expected):
    assert spark_type(cql) == expected


def test_udt_recursive_and_counter_rejected():
    udts = {"type2": [CqlColumn("a2", "int"), CqlColumn("b2", "boolean")]}
    got = spark_type("type2", udts)
    assert got == T.StructType(
        [
            T.StructField("a2", T.IntegerType(), True),
            T.StructField("b2", T.BooleanType(), True),
        ]
    )
    assert spark_type("set<frozen<type2>>", udts) == T.ArrayType(got)
    with pytest.raises(UnsupportedCqlType):
        spark_type("counter")
    with pytest.raises(UnsupportedCqlType):
        spark_type("type_missing")


# --- key/value schema split (P6/P7, FIXTURES F-1..F-5) ---------------------

def _cols_table5():
    # F-2: CREATE TABLE table5 (pk text, c1 date, c2 uuid, val int,
    #                           PRIMARY KEY (pk, c1, c2))
    return [
        CqlColumn("pk", "text", "partition_key"),
        CqlColumn("c1", "date", "clustering"),
        CqlColumn("c2", "uuid", "clustering"),
        CqlColumn("val", "int", "regular"),
    ]


def test_key_value_split_clustering():
    key, value = key_value_schemas(_cols_table5())
    assert [f.name for f in key.fields] == ["pk", "c1", "c2"]
    assert [f.nullable for f in key.fields] == [False, True, True]
    assert [f.name for f in value.fields] == ["val"]


def test_pk_only_table_copies_pk_into_value():
    # F-4: table6 (a text, b int, PRIMARY KEY (a, b))
    cols = [
        CqlColumn("a", "text", "partition_key"),
        CqlColumn("b", "int", "clustering"),
    ]
    key, value = key_value_schemas(cols)
    assert [f.name for f in key.fields] == ["a", "b"]
    assert [f.name for f in value.fields] == ["a", "b"]


def test_static_projection_switch():
    # F-5: table4 (a text, b text, c text, d text STATIC, PRIMARY KEY ((a), b))
    cols = [
        CqlColumn("a", "text", "partition_key"),
        CqlColumn("b", "text", "clustering"),
        CqlColumn("c", "text", "regular"),
        CqlColumn("d", "text", "static"),
    ]
    _, value_row = key_value_schemas(cols, partition_event=False)
    assert [f.name for f in value_row.fields] == ["d", "c"]
    _, value_part = key_value_schemas(cols, partition_event=True)
    assert [f.name for f in value_part.fields] == ["d"]  # P7: static only


def test_column_pattern_filter():
    cols = _cols_table5() + [CqlColumn("other", "int", "regular")]
    _, value = key_value_schemas(cols, column_pattern="val")
    assert [f.name for f in value.fields] == ["val"]


def test_collection_in_pk_rejected():
    cols = [CqlColumn("a", "list<int>", "partition_key")]
    with pytest.raises(UnsupportedCqlType):
        key_value_schemas(cols)


# --- golden conversions (DataSpec values) ----------------------------------

def test_golden_values(spark):
    # DataSpec: timestamp 2020-12-25T10:10:00 -> epoch millis;
    # date 2020-12-25 -> epoch days; time 10:10:00 -> µs of day;
    # tinyint 0x01 -> 1; duration (1mo,2d,3ns) -> record{1,2,3}
    df = spark.createDataFrame(
        [
            (
                datetime.datetime(2020, 12, 25, 10, 10, 0),
                datetime.date(2020, 12, 25),
                "10:10:00",
                1,
                -1,
            )
        ],
        "ts timestamp, d date, t string, tiny int, negtiny int",
    )
    row = df.select(
        C.timestamp_to_epoch_millis(F.col("ts")).alias("ms"),
        C.date_to_epoch_days(F.col("d")).alias("days"),
        C.date_to_cassandra_raw(F.col("d")).alias("raw"),
        C.time_string_to_micros(F.col("t")).alias("us"),
        C.tinyint_to_unsigned_int(F.col("tiny")).alias("u1"),
        C.tinyint_to_unsigned_int(F.col("negtiny")).alias("u255"),
        C.make_duration(F.lit(1), F.lit(2), F.lit(3)).alias("dur"),
    ).collect()[0]
    # 2020-12-25T10:10:00 UTC epoch millis (DataSpec uses local zone; we pin UTC)
    assert row["ms"] == 1608891000000
    assert row["days"] == 18621
    assert row["raw"] == 2**31 + 18621
    assert row["us"] == (10 * 3600 + 10 * 60) * 1_000_000
    assert row["u1"] == 1 and row["u255"] == 255  # Byte.toUnsignedInt(-1)=255
    assert row["dur"].asDict() == {"months": 1, "days": 2, "nanoseconds": 3}


def test_cassandra_raw_date_roundtrip(spark):
    df = spark.createDataFrame([(2**31 + 18621,), (2**31,), (2**31 - 1,)], "raw long")
    got = df.select(C.cassandra_raw_date_to_date(F.col("raw")).alias("d")).collect()
    assert got[0]["d"] == datetime.date(2020, 12, 25)
    assert got[1]["d"] == datetime.date(1970, 1, 1)
    assert got[2]["d"] == datetime.date(1969, 12, 31)


def test_varint_decimal_roundtrip(spark):
    # DataSpec: varint 314 -> two's-complement bytes
    df = spark.createDataFrame(
        [(Decimal(314),), (Decimal(-314),), (Decimal(0),), (None,)],
        T.StructType([T.StructField("v", T.DecimalType(38, 0), True)]),
    )
    rt = df.select(
        C.varint_bytes_to_decimal(C.decimal_to_varint_bytes(F.col("v"))).alias("v2"),
        C.decimal_to_varint_bytes(F.col("v")).alias("b"),
    ).collect()
    assert [r["v2"] for r in rt] == [Decimal(314), Decimal(-314), Decimal(0), None]
    assert bytes(rt[0]["b"]) == (314).to_bytes(2, "big", signed=True)  # 0x013a


def test_decimal_record(spark):
    # DataSpec: decimal 314.16 -> record{unscaled bytes, scale}
    df = spark.createDataFrame(
        [(Decimal("314.16"),)],
        T.StructType([T.StructField("v", T.DecimalType(38, 2), True)]),
    )
    row = df.select(C.decimal_to_record(F.col("v"), scale=2).alias("r")).collect()[0]
    rec = row["r"].asDict()
    assert rec["scale"] == 2
    assert int.from_bytes(bytes(rec["bigint"]), "big", signed=True) == 31416


def test_map_key_stringify_and_collection_marshal(spark):
    df = spark.createDataFrame(
        [({1: 1.0, 2: 2.0}, [datetime.datetime(2020, 12, 25, 10, 10, 0)])],
        T.StructType(
            [
                T.StructField("m", T.MapType(T.IntegerType(), T.DoubleType())),
                T.StructField("ts_list", T.ArrayType(T.TimestampType())),
            ]
        ),
    )
    row = df.select(
        C.stringify_map_keys(F.col("m")).alias("m2"),
        C.marshal_timestamp_array(F.col("ts_list")).alias("l2"),
    ).collect()[0]
    assert row["m2"] == {"1": 1.0, "2": 2.0}
    assert row["l2"] == [1608891000000]


def test_json_rendering(spark):
    # DataSpec JSON deltas: blob -> Base64, float reads back as double
    df = spark.createDataFrame(
        [(bytearray(b"\x00\x01"), 1.0)],
        T.StructType(
            [
                T.StructField("zblob", T.BinaryType()),
                T.StructField("zfloat", T.FloatType()),
            ]
        ),
    )
    js = df.select(
        C.row_to_json(F.col("zblob"), F.col("zfloat")).alias("j")
    ).collect()[0]["j"]
    import json

    obj = json.loads(js)
    assert obj["zblob"] == "AAE="  # Base64 of 0x0001
    assert obj["zfloat"] == 1.0
