"""Multimodal column handling: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The reference carries arbitrary bytes as CQL ``blob`` -> Avro bytes
(AbstractNativeConverter.java:173-174); this module gives those payloads
the pipeline treatment a training corpus needs: metadata extraction stays
Catalyst-side (JVM, codegen), while per-payload decode runs in
``mapInPandas`` so the heavy bytes cross the JVM->Python boundary exactly
once per Arrow batch, already column-pruned.

The real decoders (image/audio/video libs) are NOT in this container —
:func:`decode_payload_real` raises ``NotImplementedError`` by design; the
Spark-side plumbing (schema, batching, partitioning) is real and tested
with :func:`decode_payload_stub`, a deterministic fake decoder.

Scale design (100 TB of media):
- payloads never participate in joins/shuffles; metadata columns do.
- mapInPandas streams Arrow batches — peak memory is one batch, not one
  partition; `spark.sql.files.maxPartitionBytes` bounds input splits.
- frame explosion happens inside Python per batch, so the output row
  count can exceed the input without a Spark-side explode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the decoded-frame output (one row per sampled frame).
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingestion: UTF-8 bytes of the text column as an opaque
    ``binary`` payload (real pipelines read image/audio bytes the same
    way — binaryFile source or a bytes column in parquet)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def payload_meta(payload: Column) -> list[Column]:
    """Typed metadata derived JVM-side: byte length, md5 checksum, and a
    deterministic fake geometry (width/height from the length) standing in
    for a real header parse."""
    n_bytes = F.length(payload)
    width = (F.lit(64) + F.pmod(n_bytes, F.lit(960))).cast("int")
    height = (F.lit(64) + F.pmod(n_bytes * 7, F.lit(536))).cast("int")
    return [
        n_bytes.alias("n_bytes"),
        F.md5(payload).alias("checksum"),
        width.alias("width"),
        height.alias("height"),
        (width * height).alias("n_pixels"),
    ]


def decode_payload_real(payload: bytes) -> list[dict]:
    """Real decoder hook (PIL/ffmpeg/soundfile) — libs absent here."""
    raise NotImplementedError(
        "image/audio decoders are not available in this environment; "
        "plug PIL/ffmpeg here and keep decode_frames() unchanged"
    )


def decode_payload_stub(doc_id: int, payload: bytes) -> list[dict]:
    """Deterministic fake decode: frame count = len%3+1; per-frame stats
    from simple byte arithmetic. Exercises the exact schema/batch shape
    the real decoder would produce."""
    n = len(payload)
    frames = []
    for f_id in range(n % 3 + 1):
        window = payload[f_id * 16 : f_id * 16 + 16]
        mean = (sum(window) / len(window)) if window else 0.0
        frames.append(
            {
                "doc_id": doc_id,
                "frame_id": f_id,
                "width": 64 + n % 960,
                "height": 64 + (n * 7) % 536,
                "mean_intensity": float(mean),
            }
        )
    return frames


def decode_frames(df: DataFrame, decoder=decode_payload_stub) -> DataFrame:
    """mapInPandas frame extraction: (doc_id, payload) -> FRAME_SCHEMA rows.

    One Arrow batch in, one out; payload bytes stay off the driver and out
    of every shuffle. Swap ``decoder=decode_payload_real`` in production.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows.extend(decoder(int(doc_id), bytes(payload)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(extract, FRAME_SCHEMA)


#: Schema of byte-window chunks (audio-style fixed-frame sampling).
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)


def chunk_payload_bytes(
    df: DataFrame, window: int = 64, stride: int = 64
) -> DataFrame:
    """Fixed byte-window chunking of opaque payloads (the audio
    frame-sampling layout: PCM windows every ``stride`` bytes) via
    mapInPandas — payload bytes cross into Python once per Arrow batch
    and never enter a shuffle; output carries only chunk metadata +
    checksum, so downstream dedup/indexing is narrow-column."""
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                i = 0
                cid = 0
                while i < len(b) or cid == 0:
                    w = b[i : i + window]
                    if not w and cid > 0:
                        break
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "chunk_id": cid,
                            "n_bytes": len(w),
                            "checksum": hashlib.md5(w).hexdigest(),
                        }
                    )
                    i += stride
                    cid += 1
            yield pd.DataFrame(
                rows, columns=[f.name for f in CHUNK_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(extract, CHUNK_SCHEMA)


def resize_frames(frames: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage stub: recomputes geometry + scale factors JVM-side
    (a real resize would be a mapInPandas over decoded pixel buffers —
    same plumbing as decode_frames; the planner-visible part IS this
    metadata transform, which is why it stays Catalyst-side)."""
    return frames.select(
        "doc_id",
        "frame_id",
        F.lit(target_w).alias("width"),
        F.lit(target_h).alias("height"),
        (F.col("width").cast("double") / target_w).alias("scale_x"),
        (F.col("height").cast("double") / target_h).alias("scale_y"),
        "mean_intensity",
    )
