"""CQL <-> Spark type system (SURVEY §1.2) and key/value schema derivation
(P6) — the contract everything else depends on (§7.2 step 1).

The reference derives Avro schemas from live Cassandra table metadata in
three places that must agree (agent PK side
agent-c4/.../PulsarMutationSender.java:61-81, connector all-columns side
connector/.../converters/AbstractNativeConverter.java:167-224, custom
logical types commons/.../CqlLogicalTypes.java:29-62). Here the single
source of truth is ``SPARK_TYPES`` plus the recursive :func:`spark_type`.

Design decisions (documented deviations, all widening-safe):
- tinyint/smallint stay ByteType/ShortType (Spark has them; the reference
  widens to int only because Avro lacks int8/16 — F5 applies at an Avro
  boundary only).
- timestamp keeps µs TimestampType (superset of the reference's ms).
- time -> LongType µs-of-day with a metadata tag (Spark lacks TimeType).
- uuid/timeuuid/inet -> StringType (reference: logical string types).
- varint -> DecimalType(38,0); decimal -> DecimalType(38,18).
- duration -> StructType{months int, days int, nanoseconds long}
  (CqlLogicalTypes.java:50-62); no Spark interval covers months+nanos.
- map keys stringified (AbstractNativeConverter.java:265-295, F10).
- tuple -> StructType with fields index_0..n (:213-215).
- counter -> unsupported: mutation skipped upstream (P9), raise here.

Nullability (AbstractPulsarMutationSender.java:150-153): partition-key
columns non-nullable; clustering + regular nullable. Collections, UDTs and
durations are rejected inside the PK (PulsarMutationSender.java:111-122).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# scalar CQL name -> Spark type
SPARK_TYPES: dict[str, T.DataType] = {
    "text": T.StringType(),
    "ascii": T.StringType(),
    "varchar": T.StringType(),
    "boolean": T.BooleanType(),
    "blob": T.BinaryType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "time": T.LongType(),  # µs of day; tagged via metadata
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "inet": T.StringType(),
    "varint": T.DecimalType(38, 0),
    "decimal": T.DecimalType(38, 18),
}

DURATION_TYPE = T.StructType(
    [
        T.StructField("months", T.IntegerType(), False),
        T.StructField("days", T.IntegerType(), False),
        T.StructField("nanoseconds", T.LongType(), False),
    ]
)

UNSUPPORTED = frozenset({"counter"})  # CommitLogReadHandlerImpl.java:117-119

#: CQL types that may not appear in a primary key
#: (PulsarMutationSender.java:111-122; NativeAvroConverter.java:399-404).
PK_FORBIDDEN_KINDS = frozenset({"list", "set", "map", "udt", "tuple", "duration"})


@dataclass(frozen=True)
class CqlColumn:
    """One column of a CQL table definition."""

    name: str
    cql_type: str  # e.g. "int", "list<text>", "map<int,double>", "udt:zudt"
    kind: str = "regular"  # partition_key | clustering | static | regular
    udt_fields: tuple = field(default=())  # for udt: nested CqlColumns


class UnsupportedCqlType(ValueError):
    pass


def _split_args(s: str) -> list[str]:
    """Split 'a, map<b,c>, d' at top-level commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def spark_type(cql: str, udts: dict[str, list[CqlColumn]] | None = None) -> T.DataType:
    """Recursive CQL type string -> Spark DataType."""
    cql = cql.strip()
    if cql.startswith("frozen<") and cql.endswith(">"):
        return spark_type(cql[len("frozen<"):-1], udts)
    if cql in UNSUPPORTED:
        raise UnsupportedCqlType(f"CQL type {cql!r} is skipped by the reference (P9)")
    if cql in SPARK_TYPES:
        return SPARK_TYPES[cql]
    if cql == "duration":
        return DURATION_TYPE
    for prefix in ("list", "set", "vector"):
        if cql.startswith(prefix + "<") and cql.endswith(">"):
            inner = cql[len(prefix) + 1:-1]
            args = _split_args(inner)
            elem = args[0]
            return T.ArrayType(spark_type(elem, udts))
    if cql.startswith("map<") and cql.endswith(">"):
        k, v = _split_args(cql[4:-1])
        # F10: map keys stringified regardless of declared key type
        return T.MapType(T.StringType(), spark_type(v, udts))
    if cql.startswith("tuple<") and cql.endswith(">"):
        elems = _split_args(cql[6:-1])
        return T.StructType(
            [
                T.StructField(f"index_{i}", spark_type(e, udts), True)
                for i, e in enumerate(elems)
            ]
        )
    if udts and cql in udts:
        cols = udts[cql]
        if not cols:
            raise UnsupportedCqlType(f"UDT {cql!r} with no fields is forbidden")
        return T.StructType(
            [
                T.StructField(c.name, spark_type(c.cql_type, udts), True)
                for c in cols
            ]
        )
    raise UnsupportedCqlType(f"unknown CQL type {cql!r}")


def _is_pk_legal(cql: str) -> bool:
    cql = cql.strip()
    if cql.startswith("frozen<") and cql.endswith(">"):
        cql = cql[len("frozen<"):-1]
    head = cql.split("<", 1)[0]
    return head not in PK_FORBIDDEN_KINDS and head != "duration"


def key_value_schemas(
    columns: list[CqlColumn],
    udts: dict[str, list[CqlColumn]] | None = None,
    column_pattern: str | None = None,
    partition_event: bool = False,
) -> tuple[T.StructType, T.StructType]:
    """Derive (key schema, value schema) from a table definition.

    Rules (CassandraSource.java:346-366, ConverterAndQuery.java:62-78):
    - key = partition keys (non-null) + clustering keys (nullable);
    - value = regular + static columns, optionally filtered by the
      replication ``column_pattern`` regexp (P5);
    - PK-only table: value carries the PK columns too (FIXTURES F-4);
    - partition-level event with statics present: value = static columns
      ONLY (P7 static projection switch, FIXTURES F-5).
    """
    import re

    pk = [c for c in columns if c.kind == "partition_key"]
    ck = [c for c in columns if c.kind == "clustering"]
    statics = [c for c in columns if c.kind == "static"]
    regulars = [c for c in columns if c.kind == "regular"]

    for c in pk + ck:
        if not _is_pk_legal(c.cql_type):
            raise UnsupportedCqlType(
                f"PK column {c.name!r}: {c.cql_type!r} not allowed in primary key"
            )

    if column_pattern is not None:
        rx = re.compile(column_pattern)
        statics = [c for c in statics if rx.match(c.name)]
        regulars = [c for c in regulars if rx.match(c.name)]

    key = T.StructType(
        [T.StructField(c.name, spark_type(c.cql_type, udts), False) for c in pk]
        + [T.StructField(c.name, spark_type(c.cql_type, udts), True) for c in ck]
    )

    if partition_event and statics:
        value_cols = statics  # P7: static-only projection
    elif not statics and not regulars:
        value_cols = pk + ck  # F-4: PK-only table copies PK into value
    else:
        value_cols = statics + regulars

    value = T.StructType(
        [T.StructField(c.name, spark_type(c.cql_type, udts), True) for c in value_cols]
    )
    return key, value
