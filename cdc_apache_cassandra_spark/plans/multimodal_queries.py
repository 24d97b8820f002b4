"""Multimodal-column queries: binary payload metadata (Catalyst-side, with
a DuckDB oracle) and the mapInPandas decode stages. The real container
decodes (BMP/PNG/WAV) are HASH-CHECKED: their synthetic payloads follow a
closed-form pixel/sample grammar the DuckDB oracle recomputes without
touching bytes, so the full byte path (pack -> parse -> inflate ->
unfilter -> walk) is verified value-exact. Only the stub-decoder frame
explosion (multimodal_decode_frames) stays rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.multimodal import (
    attach_payload,
    decode_frames,
    payload_meta,
)
from cdc_apache_cassandra_spark.caching import persist_scoped
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan

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


# Closed-form oracle for the STUB decoder: the payload is the UTF-8
# encoding of pure-ASCII text (verified: octet_length == length at every
# SF), so byte windows are char windows and byte values are ascii codes —
# the frame means are SQL-expressible without running Python.
_DECODE_SQL = """
WITH docs AS (
  SELECT doc_id, text, length(text) AS n FROM documents
),
frames AS (
  SELECT doc_id, n, f.f AS frame_id,
         substr(text, f.f * 16 + 1, 16) AS win
  FROM docs, (SELECT unnest(range(0, 3)) AS f) f
  WHERE f.f <= n % 3
)
SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
       CAST(64 + n % 960 AS INTEGER) AS width,
       CAST(64 + (n * 7) % 536 AS INTEGER) AS height,
       CASE WHEN length(win) = 0 THEN 0.0
            ELSE CAST(list_sum(list_transform(range(1, length(win) + 1),
                      i -> ascii(win[i]))) AS DOUBLE) / length(win)
       END AS mean_intensity
FROM frames
"""


@register("multimodal_decode_frames", sql=_DECODE_SQL)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode: one row per sampled frame, schema
    pinned by FRAME_SCHEMA. Uses the deterministic stub decoder (real
    image/audio libs absent by design — see operators/multimodal.py);
    the oracle recomputes the byte-window means in closed form over the
    ASCII payload, so even the stub plumbing is hash-checked."""
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


# Closed-form oracle: the synthetic pixel grammar is pure modular
# arithmetic over (doc_id, row, col, channel), so the decoded geometry +
# pixel mean are SQL-expressible — the Python byte path (header pack ->
# struct parse -> padded-row walk) is verified HASH-EXACT against pixels
# the oracle derives without ever touching bytes. Integer SUM is exact;
# the single double division matches Python's int/int division.
_BMP_SQL = """
WITH geo AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS width,
         CAST(2 + doc_id % 3 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT g.doc_id, g.width, g.height,
         SUM(((g.doc_id + r.r * g.width + c.c) * k.k) % 251) AS total,
         COUNT(*) AS n
  FROM geo g,
       (SELECT unnest(range(0, 8)) AS r) r,
       (SELECT unnest(range(0, 16)) AS c) c,
       (SELECT unnest(range(1, 4)) AS k) k
  WHERE r.r < g.height AND c.c < g.width
  GROUP BY 1, 2, 3
)
SELECT doc_id, CAST(0 AS INTEGER) AS frame_id, width, height,
       CAST(total AS DOUBLE) / n AS mean_intensity
FROM px
"""


@register("multimodal_bmp_decode", sql=_BMP_SQL)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode under the gate (hash-checked): synthesize a
    deterministic uncompressed 24-bpp BMP per document (geometry from
    doc_id, gradient pixels) inside mapInPandas, then decode it with the
    native struct parser (operators/multimodal.py::decode_payload_real)
    — true header geometry and exact pixel means, no codec libraries.
    The DuckDB oracle recomputes the pixel grammar in closed form, so
    header packing, stride padding, and the byte walk are all verified
    value-exact. Both stages are Arrow-batched; payload bytes never
    shuffle."""
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


# --- PNG: real compressed-codec decode (zlib inflate + unfiltering) ---------

_PNG_SQL = """
WITH geo AS (
  SELECT doc_id,
         CAST(3 + doc_id % 6 AS INTEGER) AS width,
         CAST(2 + doc_id % 4 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT g.doc_id, g.width, g.height,
         SUM(((g.doc_id + r.r * g.width + c.c) * k.k) % 251) AS total,
         COUNT(*) AS n
  FROM geo g,
       (SELECT unnest(range(0, 8)) AS r) r,
       (SELECT unnest(range(0, 16)) AS c) c,
       (SELECT unnest(range(1, 4)) AS k) k
  WHERE r.r < g.height AND c.c < g.width
  GROUP BY 1, 2, 3
)
SELECT doc_id, CAST(0 AS INTEGER) AS frame_id, width, height,
       CAST(total AS DOUBLE) / n AS mean_intensity
FROM px
"""


def _make_png(doc_id: int) -> bytes:
    """Deterministic 8-bit RGB PNG: the same modular pixel grammar as the
    BMP fixture, DEFLATE-compressed, with the scanline filter type cycling
    r % 5 (None/Sub/Up/Average/Paeth) so every unfilter branch of the
    decoder is exercised on every image taller than 4 rows."""
    import struct
    import zlib

    from cdc_apache_cassandra_spark.operators.multimodal import _png_paeth

    width = 3 + doc_id % 6
    height = 2 + doc_id % 4
    ch = 3
    stride = width * ch

    def raw_row(r: int) -> bytes:
        return bytes(
            ((doc_id + r * width + c) * k) % 251
            for c in range(width)
            for k in (1, 2, 3)
        )

    prev = bytes(stride)
    lines = bytearray()
    for r in range(height):
        cur = raw_row(r)
        ft = r % 5
        if ft == 0:
            out = cur
        elif ft == 1:  # Sub
            out = bytes(
                (cur[i] - (cur[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            out = bytes((cur[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            out = bytes(
                (cur[i] - (((cur[i - ch] if i >= ch else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            out = bytes(
                (
                    cur[i]
                    - _png_paeth(
                        cur[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        lines += bytes([ft]) + out
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


@register("multimodal_png_decode", sql=_PNG_SQL)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode under the gate (hash-checked): a
    deterministic RGB PNG per document (filter type cycling per row) is
    DEFLATE-decoded by the native stdlib-zlib PNG parser
    (operators/multimodal.py::_decode_png) — chunk walk, inflate, and
    all five unfilter branches verified value-exact against a closed-form
    pixel oracle that never touches bytes. PNG is the one mainstream
    compressed image codec whose decompressor ships in the stdlib, which
    is what makes this a true codec decode rather than a fixture."""
    import pandas as pd

    from cdc_apache_cassandra_spark.operators.multimodal import (
        FRAME_SCHEMA,
        decode_payload_real,
    )

    cols = [f.name for f in FRAME_SCHEMA.fields]

    def synth_and_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rows.extend(
                    decode_payload_real(int(doc_id), _make_png(int(doc_id)))
                )
            yield pd.DataFrame(rows, columns=cols)

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_decode, FRAME_SCHEMA)


# --- JPEG: baseline DCT decode under the gate -------------------------------

# Per-8x8-tile-constant grayscale images with EVEN tile values at
# quality 50: every block is DC-only and q_dc = 16 divides the
# level-shifted DC (8*(v-128), v even) exactly, so quantization is
# LOSSLESS on this family and the decode is bit-exact — the closed-form
# trick that puts a lossy codec under a value-exact oracle. Equal-size
# tiles make the pixel mean equal the tile-value mean.
_JPEG_SQL = """
WITH geo AS (
  SELECT doc_id,
         CAST(2 + doc_id % 3 AS INTEGER) AS bw,
         CAST(1 + doc_id % 2 AS INTEGER) AS bh
  FROM documents
),
tiles AS (
  SELECT g.doc_id, g.bw, g.bh,
         2 * ((g.doc_id + r.r * 7 + c.c * 13) % 128) AS v
  FROM geo g,
       (SELECT unnest(range(0, 2)) AS r) r,
       (SELECT unnest(range(0, 4)) AS c) c
  WHERE r.r < g.bh AND c.c < g.bw
)
SELECT doc_id, CAST(0 AS INTEGER) AS frame_id,
       CAST(bw * 8 AS INTEGER) AS width, CAST(bh * 8 AS INTEGER) AS height,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_intensity
FROM tiles
GROUP BY doc_id, bw, bh
"""


def _make_jpeg(doc_id: int) -> bytes:
    import numpy as np

    from cdc_apache_cassandra_spark.operators.jpeg import encode_baseline

    bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 2 * (
                (doc_id + by * 7 + bx * 13) % 128
            )
    return encode_baseline(img, quality=50)


@register("multimodal_jpeg_decode", sql=_JPEG_SQL)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under the gate (hash-checked): a
    deterministic grayscale JPEG per document is entropy-decoded,
    dequantized and inverse-DCT'd by the native numpy codec
    (operators/jpeg.py — full marker parse, canonical Huffman tables
    read from the file's own DHT segments), value-exact against a
    closed-form pixel oracle. Exactness on a LOSSY codec comes from the
    fixture family: per-block-constant images whose DC quantization is
    exact (see _JPEG_SQL comment) — DC prediction, Huffman categories of
    both signs, EOB, and byte stuffing are all on the decode path. The
    round-2 'JPEG still gated' gap is closed natively; subsampled /
    progressive JPEG remains the declared PIL plug-point."""
    import pandas as pd

    from cdc_apache_cassandra_spark.operators.multimodal import (
        FRAME_SCHEMA,
        decode_payload_real,
    )

    cols = [f.name for f in FRAME_SCHEMA.fields]

    def synth_and_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rows.extend(
                    decode_payload_real(int(doc_id), _make_jpeg(int(doc_id)))
                )
            yield pd.DataFrame(rows, columns=cols)

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_decode, FRAME_SCHEMA)


# --- WAV: PCM frame sampling under the gate ---------------------------------

_WAV_SQL = """
WITH geo AS (
  SELECT doc_id,
         1200 + (doc_id % 7) * 256 AS n_samples,
         CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate
  FROM documents
),
samp AS (
  SELECT g.doc_id, g.rate,
         CAST(i.i // 1024 AS INTEGER) AS frame_id,
         ((g.doc_id * 31 + i.i * 7) % 65536) - 32768 AS s
  FROM geo g, (SELECT unnest(range(0, 4096)) AS i) i
  WHERE i.i < g.n_samples
)
SELECT doc_id, frame_id,
       CAST(COUNT(*) AS INTEGER) AS width,
       MIN(rate) AS height,
       CAST(SUM(ABS(s)) AS DOUBLE) / (COUNT(*) * 32768.0) AS mean_intensity
FROM samp
GROUP BY doc_id, frame_id
"""


def _make_wav(doc_id: int) -> bytes:
    """Deterministic mono 16-bit PCM WAV: sample[i] = ((doc_id*31 + i*7)
    % 65536) - 32768, n_samples and sample rate derived from doc_id."""
    import struct

    n_samples = 1200 + (doc_id % 7) * 256
    rate = 8000 + (doc_id % 3) * 4000
    data = struct.pack(
        f"<{n_samples}h",
        *(((doc_id * 31 + i * 7) % 65536) - 32768 for i in range(n_samples)),
    )
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@register("multimodal_wav_frames", sql=_WAV_SQL)
def multimodal_wav_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-container decode under the gate (hash-checked): a
    deterministic 16-bit PCM WAV per document is chunk-walked and
    frame-sampled (1024-sample windows, normalized mean |amplitude|) by
    the native RIFF parser (operators/multimodal.py::_decode_wav),
    verified value-exact against a closed-form sample oracle. This is the
    audio leg of the multimodal surface: fixed-window frame sampling is
    the shape a feature-extraction stage (e.g. fbank windows) needs."""
    import pandas as pd

    from cdc_apache_cassandra_spark.operators.multimodal import (
        FRAME_SCHEMA,
        decode_payload_real,
    )

    cols = [f.name for f in FRAME_SCHEMA.fields]

    def synth_and_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rows.extend(
                    decode_payload_real(int(doc_id), _make_wav(int(doc_id)))
                )
            yield pd.DataFrame(rows, columns=cols)

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_decode, FRAME_SCHEMA)


# --- MP4: native ISO-BMFF box walk + sample-range extraction ----------------
# The frame-sampling op on a video corpus is a CONTAINER operation: walk
# moov/trak/mdia/minf/stbl, resolve stsz+stco to absolute byte ranges,
# slice mdat. The inner H.264 payload stays behind the ffmpeg plug-point;
# everything the pipeline schedules on (codec fourcc, timing, per-sample
# byte ranges) is parsed natively and verified value-exact here.

_MP4_SQL = """
WITH docs AS (SELECT doc_id, 3 + doc_id % 5 AS n FROM documents),
samples AS (
  SELECT doc_id, n, s.s AS sample_id,
         20 + ((doc_id + 7 * s.s) % 40) AS sz
  FROM docs, (SELECT unnest(range(0, 8)) AS s) s
  WHERE s.s < n AND s.s % 2 = 0
)
SELECT doc_id,
       CAST(sample_id AS INTEGER) AS sample_id,
       CAST(sz AS BIGINT) AS n_bytes,
       'avc1' AS codec,
       CAST(n AS BIGINT) AS n_samples,
       CAST(600 AS BIGINT) AS timescale,
       CAST(n * (100 + doc_id % 50) AS BIGINT) AS duration_ticks,
       CAST(list_sum(list_transform(range(0, sz),
            j -> (doc_id + 13 * sample_id + 5 * j) % 251)) AS BIGINT)
           AS byte_sum
FROM samples
"""


def _make_mp4(doc_id: int) -> bytes:
    """Deterministic single-track single-chunk MP4: geometry, sample
    sizes, and sample bytes are all doc_id arithmetic (the closed-form
    grammar the oracle recomputes)."""
    import struct

    def box(name: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(body), name) + body

    n = 3 + doc_id % 5
    sizes = [20 + ((doc_id + 7 * i) % 40) for i in range(n)]
    delta = 100 + doc_id % 50
    mvhd = box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, 600, n * delta) + b"\x00" * 80,
    )
    hdlr = box(b"hdlr", struct.pack(">II4s", 0, 0, b"vide") + b"\x00" * 13)
    stsd = box(
        b"stsd",
        struct.pack(">II", 0, 1) + struct.pack(">I4s", 16, b"avc1") + b"\x00" * 8,
    )
    stsz = box(
        b"stsz",
        struct.pack(">III", 0, 0, n) + struct.pack(f">{n}I", *sizes),
    )
    stts = box(b"stts", struct.pack(">IIII", 0, 1, n, delta))
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # stco needs the absolute mdat payload offset: assemble moov with a
    # placeholder, measure, then rebuild with the real offset
    def moov_with(chunk_off: int) -> bytes:
        stco = box(b"stco", struct.pack(">III", 0, 1, chunk_off))
        stbl = box(b"stbl", stsd + stts + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        trak = box(b"trak", mdia)
        return box(b"moov", mvhd + trak)

    probe_len = len(ftyp) + len(moov_with(0)) + 8
    moov = moov_with(probe_len)
    payload = bytearray()
    for i, sz in enumerate(sizes):
        payload.extend(
            (doc_id + 13 * i + 5 * j) % 251 for j in range(sz)
        )
    return ftyp + moov + box(b"mdat", bytes(payload))


@register("multimodal_mp4_sample_ranges", sql=_MP4_SQL)
def multimodal_mp4_sample_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over MP4 without a codec: synthesize a
    deterministic single-track MP4 per doc, walk the box tree natively
    (operators/multimodal.py::probe_mp4), take every 2nd sample's byte
    range out of mdat, and report exact byte sums — the DuckDB oracle
    recomputes the sample grammar in closed form, so box packing, stsz/
    stco resolution, and the mdat slicing are all verified value-exact.
    Arrow-batched; payload bytes never shuffle."""
    import pandas as pd

    from cdc_apache_cassandra_spark.operators.multimodal import probe_mp4

    out_schema = (
        "doc_id long, sample_id int, n_bytes long, codec string, "
        "n_samples long, timescale long, duration_ticks long, byte_sum long"
    )

    def synth_and_probe(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                blob = _make_mp4(doc_id)
                info = probe_mp4(blob)
                for i, (off, sz) in enumerate(info["sample_ranges"]):
                    if i % 2:
                        continue
                    chunk = blob[off : off + sz]
                    rows.append(
                        (
                            doc_id,
                            i,
                            sz,
                            info["codec"],
                            info["n_samples"],
                            info["timescale"],
                            info["duration_ticks"],
                            sum(chunk),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_id", "n_bytes", "codec",
                    "n_samples", "timescale", "duration_ticks", "byte_sum",
                ],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(synth_and_probe, out_schema)


# --- MP3: native frame-header scan (segmentation without PCM decode) --------

_MP3_SQL = """
WITH docs AS (
  SELECT doc_id,
         2 + doc_id % 6 AS n_frames,
         CASE 1 + doc_id % 14
           WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
           WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
           WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
           WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps
  FROM documents
)
SELECT doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(kbps AS BIGINT) AS bitrate_kbps,
       CAST(44100 AS BIGINT) AS samplerate,
       CAST(n_frames * 1152 AS BIGINT) AS n_pcm_samples,
       CAST(n_frames * ((144 * kbps * 1000) // 44100) AS BIGINT)
           AS total_bytes
FROM docs
"""


def _make_mp3(doc_id: int) -> bytes:
    """Deterministic MPEG-1 Layer III frame sequence (valid headers,
    junk granule bytes — the codec payload stays behind the plug-point)."""
    n_frames = 2 + doc_id % 6
    br_idx = 1 + doc_id % 14
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][
        br_idx
    ]
    frame_len = 144 * (kbps * 1000) // 44100  # sr index 0, no padding
    out = bytearray()
    for i in range(n_frames):
        out += bytes([0xFF, 0xFB, (br_idx << 4) | 0, 0x00])
        out += bytes((doc_id + i + j) % 251 for j in range(frame_len - 4))
    return bytes(out)


@register("multimodal_mp3_frame_scan", sql=_MP3_SQL)
def multimodal_mp3_frame_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking over MP3 without PCM decode: synthesize a valid
    MPEG-1 Layer III frame sequence per doc and scan it natively
    (operators/multimodal.py::probe_mp3) — sync walk, bitrate/samplerate
    tables, exact frame-length arithmetic. The oracle recomputes frame
    count/length in closed form; a mis-stepped scan loses sync and
    errors the row, so the walk itself is the check."""
    import pandas as pd

    from cdc_apache_cassandra_spark.operators.multimodal import probe_mp3

    out_schema = (
        "doc_id long, n_frames long, bitrate_kbps long, samplerate long, "
        "n_pcm_samples long, total_bytes long"
    )

    def synth_and_scan(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                blob = _make_mp3(doc_id)
                info = probe_mp3(blob)
                rows.append(
                    (
                        doc_id,
                        info["n_frames"],
                        info["bitrate_kbps"],
                        info["samplerate"],
                        info["n_pcm_samples"],
                        len(blob),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "bitrate_kbps", "samplerate",
                    "n_pcm_samples", "total_bytes",
                ],
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_scan, out_schema)


# --- WebDataset tar shards: native ustar walk + sample grouping -------------

_WDS_SQL = """
WITH docs AS (SELECT doc_id, 2 + doc_id % 3 AS n FROM documents),
samples AS (
  SELECT doc_id, n, s.s AS i,
         16 + (doc_id + s.s) % 16 AS bin_len
  FROM docs, (SELECT unnest(range(0, 5)) AS s) s
  WHERE s.s < n
)
SELECT doc_id,
       lpad(CAST(doc_id AS VARCHAR), 6, '0') || '-' || CAST(i AS VARCHAR)
           AS sample_key,
       CAST(length('doc' || CAST(doc_id AS VARCHAR) || ' sample '
                   || CAST(i AS VARCHAR) || ' '
                   || repeat('w', doc_id % 7)) AS BIGINT) AS txt_len,
       CAST(bin_len AS BIGINT) AS bin_len,
       CAST(list_sum(list_transform(range(0, bin_len),
            j -> (doc_id + 11 * i + 3 * j) % 251)) AS BIGINT) AS bin_sum,
       CAST(n AS BIGINT) AS n_samples
FROM samples
"""


@register("multimodal_webdataset_shard", sql=_WDS_SQL)
def multimodal_webdataset_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset ingestion without a library: build one tar shard per
    document (stdlib ``tarfile`` as the INDEPENDENT writer), walk the
    ustar headers natively (operators/shards.py — checksum-validated
    512-byte stepping, GNU longnames), pair .txt/.bin members into
    samples by key, slice each member's payload out of the shard bytes,
    and report exact lengths/byte sums. The oracle recomputes the
    planted member grammar in closed form, so header layout, member
    offsets, and the sample grouping are all verified value-exact.
    At scale this is the map-side shard reader of a multimodal loader:
    one task per shard, no shuffle until the final aggregate."""
    import io
    import tarfile

    import pandas as pd

    from cdc_apache_cassandra_spark.operators.shards import (
        parse_tar_members,
        webdataset_samples,
    )

    out_schema = (
        "doc_id long, sample_key string, txt_len long, bin_len long, "
        "bin_sum long, n_samples long"
    )

    def make_shard(doc_id: int) -> bytes:
        buf = io.BytesIO()
        n = 2 + doc_id % 3
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tf:
            for i in range(n):
                key = f"{doc_id:06d}-{i}"
                txt = (f"doc{doc_id} sample {i} " + "w" * (doc_id % 7)).encode()
                blen = 16 + (doc_id + i) % 16
                bin_ = bytes((doc_id + 11 * i + 3 * j) % 251 for j in range(blen))
                for ext, data in (("txt", txt), ("bin", bin_)):
                    ti = tarfile.TarInfo(f"{key}.{ext}")
                    ti.size = len(data)
                    tf.addfile(ti, io.BytesIO(data))
        return buf.getvalue()

    def synth_and_walk(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                blob = make_shard(doc_id)
                samples = webdataset_samples(parse_tar_members(blob))
                for key, mods in samples.items():
                    t, b = mods["txt"], mods["bin"]
                    payload = blob[b["offset"] : b["offset"] + b["size"]]
                    rows.append(
                        (
                            doc_id,
                            key,
                            t["size"],
                            b["size"],
                            sum(payload),
                            len(samples),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_key", "txt_len", "bin_len",
                    "bin_sum", "n_samples",
                ],
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_walk, out_schema)


# --- gzip JSONL shards: multi-member decompression (WET/WARC convention) ----

_JSONLGZ_SQL = """
WITH docs AS (SELECT doc_id, 2 + doc_id % 2 AS n_members FROM documents),
recs AS (
  SELECT doc_id, n_members, m.m AS member_id, r.r AS rec_id,
         1 + (doc_id + m.m) % 3 AS recs_in_member
  FROM docs,
       (SELECT unnest(range(0, 4)) AS m) m,
       (SELECT unnest(range(0, 3)) AS r) r
  WHERE m.m < n_members AND r.r < 1 + (doc_id + m.m) % 3
)
SELECT doc_id,
       CAST(member_id AS INTEGER) AS member_id,
       CAST(rec_id AS INTEGER) AS rec_id,
       'u' || CAST(doc_id * 100 + member_id * 10 + rec_id AS VARCHAR)
           AS url,
       CAST(length(repeat('t', 5 + (doc_id + member_id + rec_id) % 11))
            AS BIGINT) AS text_len,
       CAST(n_members AS BIGINT) AS n_members
FROM recs
"""


@register("multimodal_jsonl_gz_shard", sql=_JSONLGZ_SQL)
def multimodal_jsonl_gz_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-text shard ingestion the WET/WARC way: one shard per
    document made of CONCATENATED gzip members (one JSONL batch each —
    naive gunzip stops after the first member and silently loses the
    rest), decompressed member-by-member with stdlib zlib
    (operators/shards.py::gzip_members) and parsed as JSON lines. The
    oracle recomputes the planted record grammar in closed form, so
    member segmentation, decompression, and line parsing are verified
    value-exact. Map-side only — the right 100 TB shape: one task per
    shard, records explode in place."""
    import gzip
    import io
    import json

    import pandas as pd

    from cdc_apache_cassandra_spark.operators.shards import (
        gzip_members,
        jsonl_records,
    )

    out_schema = (
        "doc_id long, member_id int, rec_id int, url string, "
        "text_len long, n_members long"
    )

    def make_shard(doc_id: int) -> bytes:
        parts = []
        n_members = 2 + doc_id % 2
        for m in range(n_members):
            lines = []
            for r in range(1 + (doc_id + m) % 3):
                lines.append(
                    json.dumps(
                        {
                            "url": f"u{doc_id * 100 + m * 10 + r}",
                            "text": "t" * (5 + (doc_id + m + r) % 11),
                        },
                        separators=(",", ":"),
                    )
                )
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(("\n".join(lines) + "\n").encode())
            parts.append(buf.getvalue())
        return b"".join(parts)

    def synth_and_read(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                members = gzip_members(make_shard(doc_id))
                for m, payload in enumerate(members):
                    for r, rec in enumerate(jsonl_records(payload)):
                        rows.append(
                            (
                                doc_id,
                                m,
                                r,
                                rec["url"],
                                len(rec["text"]),
                                len(members),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "member_id", "rec_id", "url",
                    "text_len", "n_members",
                ],
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_read, out_schema)


# --- ZIP code-archive shards: central-directory walk + CRC extraction -------

_ZIP_SQL = """
WITH docs AS (SELECT doc_id, 2 + doc_id % 3 AS n FROM documents),
files AS (
  SELECT doc_id, n, f.f AS file_id,
         20 + (doc_id * 7 + f.f * 13) % 60 AS body_len
  FROM docs, (SELECT unnest(range(0, 5)) AS f) f
  WHERE f.f < n
)
SELECT doc_id,
       'src/f' || CAST(file_id AS VARCHAR) || '.py' AS path,
       CAST(CASE WHEN file_id % 2 = 0 THEN 8 ELSE 0 END AS INTEGER)
           AS method,
       CAST(body_len * length('line' || CAST(doc_id AS VARCHAR) || ';')
            AS BIGINT) AS usize,
       md5(repeat('line' || CAST(doc_id AS VARCHAR) || ';',
                  CAST(body_len AS INTEGER))) AS content_md5,
       CAST(n AS BIGINT) AS n_files
FROM files
"""


@register("multimodal_zip_code_shard", sql=_ZIP_SQL)
def multimodal_zip_code_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-dataset archive ingestion: build a ZIP per document (stdlib
    zipfile as the independent writer, alternating stored/deflate
    members), walk the CENTRAL directory natively
    (operators/shards.py::parse_zip_members — the authoritative index;
    local headers can lie under streaming writers), extract each member
    with CRC verification, and report md5 of the decompressed content.
    The oracle recomputes the planted file grammar in closed form, so
    directory offsets, inflate, and CRC checks are all value-exact."""
    import hashlib
    import io
    import zipfile

    import pandas as pd

    from cdc_apache_cassandra_spark.operators.shards import (
        parse_zip_members,
        read_zip_member,
    )

    out_schema = (
        "doc_id long, path string, method int, usize long, "
        "content_md5 string, n_files long"
    )

    def make_zip(doc_id: int) -> bytes:
        buf = io.BytesIO()
        n = 2 + doc_id % 3
        with zipfile.ZipFile(buf, "w") as zf:
            for f in range(n):
                body_len = 20 + (doc_id * 7 + f * 13) % 60
                body = (f"line{doc_id};" * body_len).encode()
                zf.writestr(
                    f"src/f{f}.py",
                    body,
                    compress_type=(
                        zipfile.ZIP_DEFLATED if f % 2 == 0 else zipfile.ZIP_STORED
                    ),
                )
        return buf.getvalue()

    def synth_and_extract(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                blob = make_zip(doc_id)
                members = parse_zip_members(blob)
                for m in members:
                    data = read_zip_member(blob, m)
                    rows.append(
                        (
                            doc_id,
                            m["name"],
                            m["method"],
                            m["usize"],
                            hashlib.md5(data).hexdigest(),
                            len(members),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "path", "method", "usize",
                    "content_md5", "n_files",
                ],
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(synth_and_extract, out_schema)


# --- perceptual near-dup: dHash over decoded BMP pixels ----------------------

_DHASH_SQL = """
WITH px AS (
  SELECT d.doc_id, r.r, c.c,
         SUM(((d.doc_id % 17 + r.r * 18 + c.c) * k.k) % 240
             + (d.doc_id % 3) * 3) AS lum3
  FROM documents d,
       (SELECT unnest(range(0, 16)) AS r) r,
       (SELECT unnest(range(0, 18)) AS c) c,
       (SELECT unnest(range(1, 4)) AS k) k
  GROUP BY 1, 2, 3
),
blk AS (
  SELECT doc_id, r // 2 AS rb, c // 2 AS cb, SUM(lum3) AS bsum
  FROM px GROUP BY 1, 2, 3
),
bits AS (
  SELECT doc_id, rb, cb, bsum,
         LEAD(bsum) OVER (PARTITION BY doc_id, rb ORDER BY cb) AS nxt
  FROM blk
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bsum > nxt
                       THEN CAST(1 AS BIGINT) << (rb * 8 + cb)
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM bits WHERE nxt IS NOT NULL
  GROUP BY doc_id
)
SELECT dhash,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT doc_id % 3) AS n_variants,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM hashes
GROUP BY dhash
"""


@register("multimodal_image_dhash_dedup", sql=_DHASH_SQL)
def multimodal_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE near-dup — the difference-hash (dHash) sweep a
    multimodal training pipeline runs before exact byte dedup can help:
    synthesize a deterministic 18x16 24-bpp BMP per document where the
    CONTENT is shared across docs (base pattern = doc_id % 17) but each
    doc carries a brightness variant (+3 * (doc_id % 3) per channel, a
    re-export/gamma stand-in), decode the actual BMP bytes back to the
    pixel grid (stride-padded walk, numpy — no codec libs), block-
    average to a 9x8 grid and hash the horizontal gradient signs.
    A uniform brightness shift moves every block sum equally, so the
    gradient SIGNS — and the hash — are invariant: variants of one base
    pattern MUST collide (n_variants proves it), different patterns
    separate. Exact-integer block sums both sides, so the oracle is
    value-exact, not approximate. Scale shape: hash is map-side per
    image; the only shuffle is the groupBy on the 64-bit hash — the
    bucket-join near-dup topology, never pairwise image comparison.
    The hash covers the generation grid (BMP file-row order), a fixed
    vertical flip of the display image — irrelevant to dedup."""
    import struct

    import numpy as np
    import pandas as pd

    W, H = 18, 16
    stride = (W * 3 + 3) & ~3  # 56: rows pad to 4 bytes

    def make_bmp(doc_id: int) -> bytes:
        s = doc_id % 17
        off = (doc_id % 3) * 3
        pixels = bytearray()
        for r in range(H):
            row = bytearray(
                ((s + r * W + c) * k) % 240 + off
                for c in range(W)
                for k in (1, 2, 3)
            )
            row += b"\x00" * (stride - len(row))
            pixels += row
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
            + struct.pack(
                "<iiiHHIIiiII", 40, W, H, 1, 24, 0,
                len(pixels), 2835, 2835, 0, 0,
            )
            + bytes(pixels)
        )

    def dhash_of(payload: bytes) -> int:
        # decode the BMP byte walk back to the pixel grid, then hash
        arr = (
            np.frombuffer(payload[54:], np.uint8)
            .reshape(H, stride)[:, : W * 3]
            .reshape(H, W, 3)
            .astype(np.int64)
        )
        lum3 = arr.sum(axis=2)                      # 3-channel sum, exact
        bsum = lum3.reshape(8, 2, 9, 2).sum(axis=(1, 3))
        bits = bsum[:, :-1] > bsum[:, 1:]           # 8x8 gradient signs
        weights = 1 << (
            np.arange(8)[:, None] * 8 + np.arange(8)[None, :]
        ).astype(np.int64)
        return int((bits * weights).sum())

    def synth_hash(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "dhash": [
                        dhash_of(make_bmp(int(i))) for i in pdf["doc_id"]
                    ],
                }
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    hashed = d.mapInPandas(synth_hash, "doc_id long, dhash long")
    return hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col("doc_id") % 3).alias("n_variants"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --- perceptual audio near-dup: L1 energy-envelope hash over WAV samples -----

_AHASH_SQL = """
WITH s AS (
  SELECT d.doc_id, i.i // 64 AS b,
         SUM(ABS((((d.doc_id % 13) * 31 + i.i * 7)
                   % (97 + (d.doc_id % 13) * 8)
                   - (97 + (d.doc_id % 13) * 8) // 2)
                 * (1 + d.doc_id % 3))) AS bsum
  FROM documents d, (SELECT unnest(range(0, 1024)) AS i) i
  GROUP BY 1, 2
),
bits AS (
  SELECT doc_id, b, bsum,
         LEAD(bsum) OVER (PARTITION BY doc_id ORDER BY b) AS nxt
  FROM s
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bsum > nxt
                       THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT)
           AS ahash
  FROM bits WHERE nxt IS NOT NULL
  GROUP BY doc_id
)
SELECT ahash,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT doc_id % 3) AS n_variants,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM hashes
GROUP BY ahash
"""


@register("multimodal_audio_envelope_dedup", sql=_AHASH_SQL)
def multimodal_audio_envelope_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual AUDIO near-dup — the energy-envelope fingerprint
    (the 1-D sibling of the image dHash): synthesize a 1024-sample
    16-bit PCM WAV per document whose WAVEFORM is shared across docs
    (base pattern = doc_id % 13) at a per-doc gain (x1/x2/x3 — the
    re-encode/normalization stand-in), decode the actual RIFF bytes
    back to samples, L1 block energies over 16 x 64-sample windows,
    hash the envelope's gradient signs. Gain scales every block energy
    by the same positive factor, so the signs — and the hash — are
    invariant: gain variants of one waveform MUST collide (n_variants
    proves it), different waveforms separate. Exact integer energies
    both sides. Map-side hash per clip; the only shuffle is the hash
    groupBy — never pairwise audio comparison."""
    import struct

    import numpy as np
    import pandas as pd

    N = 1024

    def make_wav(doc_id: int) -> bytes:
        s = doc_id % 13
        g = 1 + doc_id % 3
        m = 97 + s * 8  # per-pattern modulus: structurally distinct shapes
        data = struct.pack(
            f"<{N}h",
            *(((s * 31 + i * 7) % m - m // 2) * g for i in range(N)),
        )
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def ahash_of(payload: bytes) -> int:
        # fixed-layout RIFF: samples start at byte 44
        samples = np.frombuffer(payload[44 : 44 + 2 * N], "<i2").astype(
            np.int64
        )
        bsum = np.abs(samples).reshape(16, 64).sum(axis=1)
        bits = bsum[:-1] > bsum[1:]
        return int((bits * (1 << np.arange(15, dtype=np.int64))).sum())

    def synth_hash(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ahash": [
                        ahash_of(make_wav(int(i))) for i in pdf["doc_id"]
                    ],
                }
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    hashed = d.mapInPandas(synth_hash, "doc_id long, ahash long")
    return hashed.groupBy("ahash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col("doc_id") % 3).alias("n_variants"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --- hamming-banded dHash matching: near-match, not just exact collision -----

_DHAM_K = 4          # max hamming distance counted as a near-dup
_DHAM_BANDS = 4      # 4 x 16-bit bands: any exact band => candidate pair

_DHAM_SQL = """
WITH px AS (
  SELECT d.doc_id, r.r, c.c,
         -- each k-row is ONE channel: corrupted pixels are 250 PER
         -- CHANNEL (lum3 = 750 after the SUM over k), value-identical
         -- to the BMP fixture's bytes — not just gradient-sign-equal
         SUM(CASE WHEN d.doc_id % 3 = 2
                   AND ((r.r < 2 AND c.c < 2) OR
                        (r.r >= 6 AND r.r < 8 AND c.c >= 8 AND c.c < 10))
                  THEN 250
                  ELSE ((d.doc_id % 17 + r.r * 18 + c.c) * k.k) % 240
                       + (d.doc_id % 3) * 3
             END) AS lum3
  FROM documents d,
       (SELECT unnest(range(0, 16)) AS r) r,
       (SELECT unnest(range(0, 18)) AS c) c,
       (SELECT unnest(range(1, 4)) AS k) k
  GROUP BY 1, 2, 3
),
blk AS (
  SELECT doc_id, r // 2 AS rb, c // 2 AS cb, SUM(lum3) AS bsum
  FROM px GROUP BY 1, 2, 3
),
bits AS (
  SELECT doc_id, rb, cb, bsum,
         LEAD(bsum) OVER (PARTITION BY doc_id, rb ORDER BY cb) AS nxt
  FROM blk
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bsum > nxt
                       THEN CAST(1 AS BIGINT) << (rb * 8 + cb)
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM bits WHERE nxt IS NOT NULL
  GROUP BY doc_id
),
bands AS (
  SELECT doc_id, dhash, b.b AS band_id,
         (dhash >> (b.b * 16)) & 65535 AS band_key
  FROM hashes, (SELECT unnest(range(0, 4)) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.dhash AS ha,
         c.doc_id AS doc_b, c.dhash AS hb
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_key = c.band_key
   AND a.doc_id < c.doc_id
)
SELECT CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
       COUNT(*) AS n_pairs,
       MIN(doc_a) AS min_doc_a
FROM cand
WHERE bit_count(xor(ha, hb)) BETWEEN 1 AND 4
GROUP BY 1
"""


@register("multimodal_image_dhash_hamming", sql=_DHAM_SQL)
def multimodal_image_dhash_hamming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hamming-banded dHash matching — the NEAR-match half perceptual
    dedup needs (exact-collision grouping is
    multimodal_image_dhash_dedup): a third variant class corrupts two
    pixel blocks (a localized watermark/crop-artifact stand-in), so its
    hash lands a FEW BITS from the base pattern's instead of colliding.
    The 64-bit hash splits into 4 x 16-bit bands; by pigeonhole every
    pair within hamming 3 shares at least one exact band (guaranteed
    recall at distance < bands), and distance-4 pairs are found when
    their differing bits cluster into <= 3 bands — the banded join
    generates candidates without any pairwise scan, and exact
    popcount(xor) verifies. Histogram by hamming distance (exact dups
    excluded — the collision query owns those). At 100 TB the band
    join's cost tracks collisions, the SimHash/LSH topology; a
    production run exact-dedups first so band groups stay small."""
    import struct

    import numpy as np
    import pandas as pd

    W, H = 18, 16
    stride = (W * 3 + 3) & ~3

    def pixels_of(doc_id: int) -> np.ndarray:
        s = doc_id % 17
        off = (doc_id % 3) * 3
        r_idx = np.arange(H)[:, None, None]
        c_idx = np.arange(W)[None, :, None]
        k_idx = np.arange(1, 4)[None, None, :]
        arr = ((s + r_idx * W + c_idx) * k_idx) % 240 + off
        if doc_id % 3 == 2:
            # localized corruption: two 2x2 blocks pinned to 250/channel
            arr[0:2, 0:2, :] = 250
            arr[6:8, 8:10, :] = 250
        return arr.astype(np.uint8)

    def make_bmp(doc_id: int) -> bytes:
        arr = pixels_of(doc_id)
        pixels = bytearray()
        for r in range(H):
            row = bytearray(arr[r].reshape(-1).tobytes())
            row += b"\x00" * (stride - len(row))
            pixels += row
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
            + struct.pack(
                "<iiiHHIIiiII", 40, W, H, 1, 24, 0,
                len(pixels), 2835, 2835, 0, 0,
            )
            + bytes(pixels)
        )

    def dhash_of(payload: bytes) -> int:
        arr = (
            np.frombuffer(payload[54:], np.uint8)
            .reshape(H, stride)[:, : W * 3]
            .reshape(H, W, 3)
            .astype(np.int64)
        )
        bsum = arr.sum(axis=2).reshape(8, 2, 9, 2).sum(axis=(1, 3))
        bits = bsum[:, :-1] > bsum[:, 1:]
        weights = 1 << (
            np.arange(8)[:, None] * 8 + np.arange(8)[None, :]
        ).astype(np.int64)
        return int((bits * weights).sum())

    def synth_hash(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "dhash": [
                        dhash_of(make_bmp(int(i))) for i in pdf["doc_id"]
                    ],
                }
            )

    d = spread_scan(load_table(spark, sf_dir, "documents").select("doc_id"))
    hashed = d.mapInPandas(synth_hash, "doc_id long, dhash long").transform(
        persist_scoped
    )
    bands = hashed.select(
        "doc_id", "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftright("dhash", b * 16)
                    .bitwiseAND(F.lit(65535)).alias("band_key"),
                )
                for b in range(_DHAM_BANDS)
            ])
        ).alias("bd"),
    ).select("doc_id", "dhash", "bd.band_id", "bd.band_key")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("dhash").alias("ha"),
        "band_id", "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("dhash").alias("hb"),
        "band_id", "band_key",
    )
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "ha", "doc_b", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.filter((ham >= 1) & (ham <= _DHAM_K))
        .select(ham.cast("int").alias("hamming"), "doc_a")
        .groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("doc_a").alias("min_doc_a"),
        )
    )
