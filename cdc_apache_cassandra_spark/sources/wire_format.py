"""Event-topic wire format — the reference publishes KeyValue⟨Avro PK
record, MutationValue⟩ with SEPARATED encoding plus message properties
writetime / segpos / token (AbstractPulsarMutationSender.java:190-193,
253-263; commons/.../Constants.java:18-33). A Kafka/Pulsar Spark source
surfaces exactly (key binary, value binary, headers); this module encodes
our mutation events into that shape and back.

Serialization: JSON bytes (UTF-8, explicit nulls) — byte-stable across
engines and test-inspectable. The container has no spark-avro jar loaded;
:func:`wire_codec` reports which codec is active so a cluster WITH
spark-avro swaps `to_json`/`from_json` for `to_avro`/`from_avro` behind
the same two functions (encoding choice is config, not architecture —
reference key.converter/value.converter).

Tombstone rule: DELETE ⇒ value bytes NULL (CassandraSource.java:554).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_apache_cassandra_spark.functions.hashing import token_expr


def wire_codec() -> str:
    """'avro' when the spark-avro data source is loadable, else 'json'."""
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401

        return "avro"
    except Exception:
        return "json"


def _json_bytes(cols: list[str]) -> Column:
    return F.encode(
        F.to_json(F.struct(*cols), {"ignoreNullFields": "false"}), "UTF-8"
    )


def to_wire_records(
    events: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """mutation events -> (key BINARY, value BINARY|null, writetime,
    segpos, token) — the exact column set a kafka-format writeStream
    needs, with the reference's three message properties."""
    value = F.when(
        F.col(op_col) == "DELETE", F.lit(None).cast("binary")
    ).otherwise(_json_bytes(value_cols))
    return events.select(
        _json_bytes(key_cols).alias("key"),
        value.alias("value"),
        F.col("writetime"),
        F.concat_ws(":", F.col("segment"), F.col("position")).alias("segpos"),
        token_expr(key_cols[0]).alias("token"),
    )


def from_wire_records(
    wire: DataFrame, key_schema: T.StructType, value_schema: T.StructType
) -> DataFrame:
    """(key, value, props) -> typed columns; null value bytes => tombstone
    with null value columns. The inverse of to_wire_records (F12: decode
    the key record back to typed values to bind the lookup)."""
    key = F.from_json(F.decode(F.col("key"), "UTF-8"), key_schema)
    value = F.from_json(F.decode(F.col("value"), "UTF-8"), value_schema)
    out = wire.select(
        key.alias("_k"),
        value.alias("_v"),
        F.col("value").isNull().alias("is_tombstone"),
        "writetime",
        F.split(F.col("segpos"), ":")[0].cast("bigint").alias("segment"),
        F.split(F.col("segpos"), ":")[1].cast("bigint").alias("position"),
        "token",
    )
    return out.select(
        *[F.col(f"_k.{f.name}").alias(f.name) for f in key_schema.fields],
        *[F.col(f"_v.{f.name}").alias(f.name) for f in value_schema.fields],
        "is_tombstone",
        "writetime",
        "segment",
        "position",
        "token",
    )
