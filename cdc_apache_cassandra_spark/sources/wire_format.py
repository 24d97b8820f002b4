"""Event-topic wire format — the reference publishes KeyValue⟨Avro PK
record, MutationValue⟩ with SEPARATED encoding plus message properties
writetime / segpos / token (AbstractPulsarMutationSender.java:190-193,
253-263; commons/.../Constants.java:18-33). A Kafka/Pulsar Spark source
surfaces exactly (key binary, value binary, headers); this module encodes
our mutation events into that shape and back.

Two codecs behind one seam (reference key.converter/value.converter —
encoding choice is config, not architecture):

- ``avro`` (default, like the reference's NativeAvroConverter): Avro
  binary records via functions/avro_codec.py — a dependency-free
  implementation of the Avro 1.11 binary spec with the reference's CQL
  logical types (CqlLogicalTypes.java:29-62). Runs in Arrow-batched
  pandas UDFs: bytes cross the Python boundary once per record batch.
  On a cluster with spark-avro, the same seam swaps in the JVM
  ``to_avro``/``from_avro`` (detected by :func:`wire_codec`).
- ``json``: UTF-8 JSON bytes with explicit nulls — JVM-side
  (``to_json``/``from_json``), byte-stable, test-inspectable
  (reference NativeJsonConverter).

Tombstone rule: DELETE ⇒ value bytes NULL (CassandraSource.java:554).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_apache_cassandra_spark.functions.avro_codec import (
    avro_schema_for,
    decode_record,
    encode_record,
)
from cdc_apache_cassandra_spark.functions.hashing import token_expr

DEFAULT_CODEC = "avro"


def wire_codec() -> str:
    """'avro-jvm' when the spark-avro data source is loadable, else
    'avro' (the built-in Arrow-batched codec). JSON stays available as an
    explicit choice."""
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401

        return "avro-jvm"
    except Exception:
        return "avro"


def _json_bytes(cols: list[str]) -> Column:
    return F.encode(
        F.to_json(F.struct(*cols), {"ignoreNullFields": "false"}), "UTF-8"
    )


def _null_safe(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.astype(object).where(pdf.notna(), None)


def _avro_bytes(df: DataFrame, cols: list[str]) -> Column:
    """Arrow-batched Avro encode of a struct of columns."""
    node = avro_schema_for(
        T.StructType([df.schema[c] for c in cols])
    )

    @F.pandas_udf("binary")
    def enc(pdf: pd.DataFrame) -> pd.Series:
        rows = _null_safe(pdf).to_dict("records")
        return pd.Series([encode_record(node, r) for r in rows])

    return enc(F.struct(*cols))


def _avro_struct(col: Column, schema: T.StructType) -> Column:
    """Arrow-batched Avro decode back to typed columns."""
    node = avro_schema_for(schema)

    @F.pandas_udf(schema)
    def dec(s: pd.Series) -> pd.DataFrame:
        out = [
            {f.name: None for f in schema.fields}
            if blob is None
            else decode_record(node, bytes(blob))
            for blob in s
        ]
        return pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return dec(col)


def to_wire_records(
    events: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    op_col: str = "op",
    codec: str = DEFAULT_CODEC,
) -> DataFrame:
    """mutation events -> (key BINARY, value BINARY|null, writetime,
    segpos, token) — the exact column set a kafka-format writeStream
    needs, with the reference's three message properties."""
    if codec == "json":
        key_bytes = _json_bytes(key_cols)
        value_bytes = _json_bytes(value_cols)
    else:
        key_bytes = _avro_bytes(events, key_cols)
        value_bytes = _avro_bytes(events, value_cols)
    value = F.when(
        F.col(op_col) == "DELETE", F.lit(None).cast("binary")
    ).otherwise(value_bytes)
    return events.select(
        key_bytes.alias("key"),
        value.alias("value"),
        F.col("writetime"),
        F.concat_ws(":", F.col("segment"), F.col("position")).alias("segpos"),
        token_expr(key_cols[0]).alias("token"),
    )


#: MutationValue schema — the EVENTS-topic value payload
#: (commons/.../MutationValue.java:28-43): {md5Digest, nodeId,
#: columns[] nullable}. The row itself is NOT on the events topic; the
#: connector re-reads it from the table (read-after-event).
MUTATION_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("md5Digest", T.StringType(), False),
        T.StructField("nodeId", T.StringType(), True),
        T.StructField("columns", T.ArrayType(T.StringType()), True),
    ]
)


def to_event_topic_records(
    events: DataFrame,
    key_cols: list[str],
    codec: str = DEFAULT_CODEC,
    digest_col: str = "digest",
    node_col: str = "node_id",
) -> DataFrame:
    """EVENTS-topic encoding (§1.1): key = Avro PK record, value =
    MutationValue{md5Digest, nodeId, columns=null} — the compact
    PK+digest event the agent publishes
    (AbstractPulsarMutationSender.java:190-193,243-270), as opposed to
    :func:`to_wire_records`, which is the DATA-topic full-row shape."""
    mv = events.select(
        *key_cols,
        "op",
        "writetime",
        "segment",
        "position",
        F.col(digest_col).alias("md5Digest"),
        F.col(node_col).cast("string").alias("nodeId"),
        F.lit(None).cast(T.ArrayType(T.StringType())).alias("columns"),
    )
    if codec == "json":
        key_bytes = _json_bytes(key_cols)
        value_bytes = F.encode(
            F.to_json(
                F.struct("md5Digest", "nodeId", "columns"),
                {"ignoreNullFields": "false"},
            ),
            "UTF-8",
        )
    else:
        key_bytes = _avro_bytes(mv, key_cols)
        value_bytes = _avro_bytes(mv, ["md5Digest", "nodeId", "columns"])
    return mv.select(
        key_bytes.alias("key"),
        value_bytes.alias("value"),
        F.col("writetime"),
        F.concat_ws(":", F.col("segment"), F.col("position")).alias("segpos"),
        token_expr(key_cols[0]).alias("token"),
    )


def from_event_topic_records(
    wire: DataFrame, key_schema: T.StructType, codec: str = DEFAULT_CODEC
) -> DataFrame:
    """Inverse of :func:`to_event_topic_records`: typed PK columns +
    (digest, node_id) from the MutationValue — what the connector needs
    to dedup and bind the read-after-event lookup (F12)."""
    if codec == "json":
        key = F.from_json(F.decode(F.col("key"), "UTF-8"), key_schema)
        value = F.from_json(
            F.decode(F.col("value"), "UTF-8"), MUTATION_VALUE_SCHEMA
        )
    else:
        key = _avro_struct(F.col("key"), key_schema)
        value = _avro_struct(F.col("value"), MUTATION_VALUE_SCHEMA)
    out = wire.select(
        key.alias("_k"),
        value.alias("_v"),
        "writetime",
        F.split(F.col("segpos"), ":")[0].cast("bigint").alias("segment"),
        F.split(F.col("segpos"), ":")[1].cast("bigint").alias("position"),
        "token",
    )
    return out.select(
        *[F.col(f"_k.{f.name}").alias(f.name) for f in key_schema.fields],
        F.col("_v.md5Digest").alias("digest"),
        F.col("_v.nodeId").alias("node_id"),
        "writetime",
        "segment",
        "position",
        "token",
    )


def from_wire_records(
    wire: DataFrame,
    key_schema: T.StructType,
    value_schema: T.StructType,
    codec: str = DEFAULT_CODEC,
) -> DataFrame:
    """(key, value, props) -> typed columns; null value bytes => tombstone
    with null value columns. The inverse of to_wire_records (F12: decode
    the key record back to typed values to bind the lookup)."""
    if codec == "json":
        key = F.from_json(F.decode(F.col("key"), "UTF-8"), key_schema)
        value = F.from_json(F.decode(F.col("value"), "UTF-8"), value_schema)
    else:
        key = _avro_struct(F.col("key"), key_schema)
        value = _avro_struct(F.col("value"), value_schema)
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
