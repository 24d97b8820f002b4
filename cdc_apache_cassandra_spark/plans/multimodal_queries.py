"""Multimodal-column queries: binary payload metadata (Catalyst-side, with
a DuckDB oracle) and the mapInPandas decode stage (rows-only check — the
frame explosion is not SQL-expressible without the same Python decoder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.multimodal import (
    attach_payload,
    decode_frames,
    payload_meta,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table

# md5(payload bytes) == md5(text) because payload IS the UTF-8 encoding.
_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum,
       CAST(64 + octet_length(encode(text)) % 960 AS INTEGER) AS width,
       CAST(64 + (octet_length(encode(text)) * 7) % 536 AS INTEGER) AS height,
       CAST(64 + octet_length(encode(text)) % 960 AS INTEGER) *
       CAST(64 + (octet_length(encode(text)) * 7) % 536 AS INTEGER) AS n_pixels
FROM documents
"""


@register("multimodal_payload_meta", sql=_META_SQL)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata, all JVM-side: length,
    checksum, fake header geometry. The pattern: metadata columns join
    and aggregate; payload bytes never shuffle."""
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", *payload_meta(F.col("payload")))


@register("multimodal_decode_frames", sql=None)  # rows-only: Python decoder
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode: one row per sampled frame, schema
    pinned by FRAME_SCHEMA. Uses the deterministic stub decoder (real
    image/audio libs absent by design — see operators/multimodal.py)."""
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return decode_frames(d)
