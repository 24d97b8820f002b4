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


# --- chunk checksums: JVM-side window slicing over payload content ----------

_CHUNK_W = 64

_CHUNK_SQL = f"""
WITH docs AS (
  SELECT doc_id, text, length(text) AS n_chars FROM documents
  WHERE length(text) > 0
),
spans AS (
  SELECT doc_id, text,
         CAST(CEIL(CAST(n_chars AS DOUBLE) / {_CHUNK_W}) AS BIGINT) AS n_chunks
  FROM docs
)
SELECT doc_id, c.chunk_id,
       length(substr(text, CAST(c.chunk_id * {_CHUNK_W} + 1 AS BIGINT),
                     {_CHUNK_W})) AS n_chars,
       md5(substr(text, CAST(c.chunk_id * {_CHUNK_W} + 1 AS BIGINT),
                  {_CHUNK_W})) AS checksum
FROM spans, (SELECT unnest(range(0, 10000)) AS chunk_id) c
WHERE c.chunk_id < n_chunks
"""


@register("multimodal_chunk_checksums", sql=_CHUNK_SQL)
def multimodal_chunk_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window payload chunk manifest (id, size, md5 per {w}-char
    window) computed ENTIRELY JVM-side — sequence + substring + md5 under
    whole-stage codegen; the Python byte-window twin
    (operators.multimodal.chunk_payload_bytes) is for payloads needing
    format-aware logic and is pinned to these checksums in tests. The
    manifest is what ships to dedup/transfer layers — payload bytes stay
    in place."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(F.length("text") > 0).select(
        "doc_id", "text", F.length("text").alias("n_chars")
    )
    n_chunks = F.ceil(F.col("n_chars").cast("double") / _CHUNK_W).cast("bigint")
    spans = docs.select(
        "doc_id", "text", F.sequence(F.lit(0).cast("bigint"), n_chunks - 1).alias("ids")
    )
    chunk = F.substring(
        F.col("text"), (F.col("chunk_id") * _CHUNK_W + 1).cast("int"), _CHUNK_W
    )
    return spans.select(
        "doc_id", F.explode("ids").alias("chunk_id"), "text"
    ).select(
        "doc_id",
        "chunk_id",
        F.length(chunk).alias("n_chars"),
        F.md5(F.encode(chunk, "UTF-8")).alias("checksum"),
    )


@register("multimodal_bmp_decode", sql=None)  # rows-only: binary container
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode under the gate (rows-only): synthesize a
    deterministic uncompressed 24-bpp BMP per document (geometry from
    doc_id, gradient pixels) inside mapInPandas, then decode it with the
    native struct parser (operators/multimodal.py::decode_payload_real)
    — true header geometry and exact pixel means, no codec libraries.
    Both stages are Arrow-batched; payload bytes never shuffle."""
    import struct

    import pandas as pd

    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    def make_bmp(doc_id: int) -> bytes:
        width = 4 + doc_id % 5
        height = 2 + doc_id % 3
        row_bytes = width * 3
        stride = (row_bytes + 3) & ~3
        pixels = bytearray()
        for r in range(height):
            row = bytearray(
                ((doc_id + r * width + c) * k) % 251
                for c in range(width)
                for k in (1, 2, 3)
            )
            row += b"\x00" * (stride - len(row))
            pixels += row
        header_size = 54
        return (
            b"BM"
            + struct.pack("<IHHI", header_size + len(pixels), 0, 0, header_size)
            + struct.pack(
                "<iiiHHIIiiII", 40, width, height, 1, 24, 0,
                len(pixels), 2835, 2835, 0, 0,
            )
            + bytes(pixels)
        )

    def synth_and_decode(batches):
        from cdc_apache_cassandra_spark.operators.multimodal import (
            FRAME_SCHEMA,
        )

        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rows.extend(decode_payload_real(int(doc_id), make_bmp(int(doc_id))))
            yield pd.DataFrame(rows, columns=cols)

    from cdc_apache_cassandra_spark.operators.multimodal import FRAME_SCHEMA

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(synth_and_decode, FRAME_SCHEMA)
