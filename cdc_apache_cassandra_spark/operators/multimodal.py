"""Multimodal column handling: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The reference carries arbitrary bytes as CQL ``blob`` -> Avro bytes
(AbstractNativeConverter.java:173-174); this module gives those payloads
the pipeline treatment a training corpus needs: metadata extraction stays
Catalyst-side (JVM, codegen), while per-payload decode runs in
``mapInPandas`` so the heavy bytes cross the JVM->Python boundary exactly
once per Arrow batch, already column-pruned.

:func:`decode_payload_real` genuinely decodes BMP (24-bpp), WAV (16-bit
PCM), PNG (stdlib zlib inflate + all five unfilter branches) and
baseline JPEG (native numpy Huffman + IDCT codec, operators/jpeg.py) —
no codec libraries needed. Remaining compressed codecs (MP3/MP4)
require ffmpeg, absent from this container, and raise
``NotImplementedError`` at the format dispatch; plug ffmpeg there and
``decode_frames()`` is unchanged. :func:`decode_payload_stub` stays
as the deterministic fixture for plumbing tests.

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


def _decode_bmp(doc_id: int, b: bytes) -> list[dict]:
    """Uncompressed 24-bpp BMP (BITMAPINFOHEADER): pure struct parse —
    one frame, true geometry, mean over the RGB bytes (row padding
    excluded)."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression}: only uncompressed "
            "24-bpp is decoded natively; plug PIL for the rest"
        )
    height = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    total = 0
    n = 0
    for r in range(height):
        row = b[pixel_off + r * stride : pixel_off + r * stride + row_bytes]
        total += sum(row)
        n += len(row)
    return [
        {
            "doc_id": doc_id,
            "frame_id": 0,
            "width": width,
            "height": height,
            "mean_intensity": (total / n) if n else 0.0,
        }
    ]


def _png_paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(doc_id: int, b: bytes) -> list[dict]:
    """Real PNG decode with the stdlib only: chunk walk -> IHDR geometry,
    IDAT concat -> ``zlib.decompress`` (PNG's compression IS zlib/DEFLATE,
    RFC 1950/1951 — no codec library needed) -> per-scanline unfiltering
    (filter types 0-4 incl. Paeth). Supported: 8-bit depth, color types
    0 (gray), 2 (RGB), 6 (RGBA), non-interlaced. mean_intensity averages
    the color channels (alpha excluded)."""
    import struct
    import zlib

    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(b):
        size, ctype = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if depth != 8 or channels is None or comp != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color_type} "
            f"interlace={interlace}: only 8-bit gray/RGB/RGBA "
            "non-interlaced is decoded natively; plug PIL for the rest"
        )
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    prev = bytearray(stride)
    total = 0
    n = 0
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _png_paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG filter type {ft} invalid")
        if color_type == 6:
            total += sum(v for i, v in enumerate(line) if i % 4 != 3)
            n += width * 3
        else:
            total += sum(line)
            n += stride
        prev = line
    return [
        {
            "doc_id": doc_id,
            "frame_id": 0,
            "width": width,
            "height": height,
            "mean_intensity": (total / n) if n else 0.0,
        }
    ]


def _decode_jpeg(doc_id: int, b: bytes) -> list[dict]:
    """Baseline JPEG via the native numpy codec (operators/jpeg.py):
    full marker parse, Huffman entropy decode, dequant + IDCT, YCbCr
    conversion for 3-component scans. mean_intensity = exact integer
    pixel sum over all channels, one double division."""
    from cdc_apache_cassandra_spark.operators.jpeg import decode_baseline

    arr = decode_baseline(b)
    h, w = arr.shape[:2]
    total = int(arr.astype("int64").sum())
    n = arr.size
    return [
        {
            "doc_id": doc_id,
            "frame_id": 0,
            "width": w,
            "height": h,
            "mean_intensity": total / n,
        }
    ]


_WAV_FRAME_SAMPLES = 1024


def _decode_wav(doc_id: int, b: bytes) -> list[dict]:
    """RIFF/WAVE 16-bit PCM: chunk walk with the stdlib only. Frame =
    {fs} samples; FRAME_SCHEMA reuse: width = samples in the frame,
    height = sample rate, mean_intensity = mean |amplitude| (normalized
    to [0,1])."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits}: only 16-bit PCM is "
            "decoded natively; plug soundfile/ffmpeg for the rest"
        )
    samples = struct.unpack(f"<{len(data) // 2}h", data[: len(data) & ~1])
    frames = []
    step = _WAV_FRAME_SAMPLES * channels
    for f_id, start in enumerate(range(0, len(samples), step)):
        window = samples[start : start + step]
        mean_abs = sum(abs(s) for s in window) / (len(window) * 32768.0)
        frames.append(
            {
                "doc_id": doc_id,
                "frame_id": f_id,
                "width": len(window) // channels,
                "height": sample_rate,
                "mean_intensity": mean_abs,
            }
        )
    return frames


def decode_payload_real(doc_id: int, payload: bytes) -> list[dict]:
    """Real decode for self-describing UNCOMPRESSED containers — pure
    stdlib struct parsing, no codec libraries:

    - BMP (24-bpp uncompressed) -> one frame with true geometry + pixel
      mean;
    - WAV (RIFF 16-bit PCM) -> fixed-sample frames with normalized mean
      amplitude;
    - PNG (8-bit gray/RGB/RGBA, non-interlaced) -> one frame: zlib
      inflate + full scanline unfiltering (Sub/Up/Average/Paeth) — a
      REAL compressed-codec decode, since PNG's DEFLATE is stdlib zlib;
    - baseline JPEG (SOF0, 8-bit, gray or 4:4:4 color) -> one frame via
      the native numpy codec (operators/jpeg.py): marker parse, Huffman
      entropy decode, dequant + IDCT, YCbCr->RGB, restart markers.

    Other compressed formats (MP3/MP4, progressive/subsampled JPEG...)
    dispatch to the PIL / ffmpeg plug-points below WHEN those codecs are
    present on the cluster (:func:`pil_available` /
    :func:`ffmpeg_available` — the spark-avro capability-probe pattern);
    otherwise they raise ``NotImplementedError``. decode_frames() is
    unchanged either way."""
    if payload[:2] == b"BM":
        return _decode_bmp(doc_id, payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(doc_id, payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(doc_id, payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(doc_id, payload)
    is_mp4 = len(payload) >= 12 and payload[4:8] == b"ftyp"
    is_mp3 = payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    )
    if is_mp4 or is_mp3:
        if ffmpeg_available():
            return _decode_with_ffmpeg(doc_id, payload, audio=is_mp3)
        raise NotImplementedError(
            "MP3/MP4 decode needs the ffmpeg binary on the worker image "
            "(capability-probed; container probes probe_mp4/probe_mp3 "
            "work without it)"
        )
    if pil_available():
        try:
            return _decode_with_pil(doc_id, payload)
        except NotImplementedError:
            raise
        except Exception as e:
            # keep the function's contract: unsupported/corrupt payloads
            # raise NotImplementedError (callers quarantine on it), not
            # PIL.UnidentifiedImageError or friends
            raise NotImplementedError(
                f"payload is not decodable by Pillow either: {e}"
            ) from e
    raise NotImplementedError(
        "payload is not a BMP/WAV/PNG/JPEG; other image codecs need "
        "PIL, MP3/MP4 need ffmpeg — neither is in this environment"
    )


# --- capability-gated codec plug-points (PIL / ffmpeg) ----------------------


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def ffmpeg_available() -> bool:
    import shutil

    # the video path shells out to BOTH binaries (ffprobe for geometry,
    # ffmpeg for frames); some minimal images package them separately,
    # so gate on both — a half-present install must take the documented
    # NotImplementedError path, not die mid-decode
    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


def _decode_with_pil(doc_id: int, payload: bytes) -> list[dict]:
    """Any PIL-supported image -> the same frame row shape as the native
    decoders (geometry + normalized pixel mean). Activates only where
    Pillow is installed (worker image); Arrow-batched callers are
    unchanged — this runs inside the same mapInPandas batch loop."""
    import io

    import numpy as np
    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64)
    return [
        {
            "doc_id": doc_id,
            "frame_id": 0,
            "width": img.width,
            "height": img.height,
            "mean_intensity": float(arr.mean() / 255.0),
        }
    ]


_FFMPEG_AUDIO_RATE = 16_000
_FFMPEG_AUDIO_FRAME = 1024  # samples per emitted frame row (matches WAV path)


def _decode_with_ffmpeg(
    doc_id: int, payload: bytes, audio: bool
) -> list[dict]:
    """MP3/MP4 full decode through the ffmpeg binary. Audio decodes to
    mono s16le at 16 kHz and emits fixed-1024-sample frames like the
    native WAV path; video decodes the first frame to rgb24 with
    geometry from ffprobe. MP3 streams through a pipe; MP4 goes via a
    worker-local temp file because most encoders write the moov atom
    AFTER mdat (non-faststart) and ffmpeg cannot seek a pipe — a
    pipe-only path fails on the majority of real MP4s. Bounded: one
    subprocess per payload inside the Arrow batch loop — acceptable
    because compressed-media decode dominates the fork cost at any
    batch size."""
    import json as _json
    import subprocess

    import numpy as np

    if audio:
        out = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", "pipe:0",
                "-f", "s16le", "-ac", "1", "-ar", str(_FFMPEG_AUDIO_RATE),
                "pipe:1",
            ],
            input=payload, capture_output=True, check=True,
        ).stdout
        samples = np.frombuffer(out, dtype="<i2")
        frames = []
        step = _FFMPEG_AUDIO_FRAME
        for f_id, off in enumerate(range(0, len(samples), step)):
            window = samples[off : off + step]
            frames.append(
                {
                    "doc_id": doc_id,
                    "frame_id": f_id,
                    "width": len(window),
                    "height": _FFMPEG_AUDIO_RATE,
                    "mean_intensity": float(
                        np.abs(window.astype(np.float64)).mean() / 32768.0
                    ),
                }
            )
        return frames
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".mp4")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        probe = _json.loads(
            subprocess.run(
                [
                    "ffprobe", "-v", "error", "-select_streams", "v:0",
                    "-show_entries", "stream=width,height", "-of", "json",
                    tmp,
                ],
                capture_output=True, check=True,
            ).stdout
        )
        w = int(probe["streams"][0]["width"])
        h = int(probe["streams"][0]["height"])
        out = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", tmp, "-frames:v", "1",
                "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
            ],
            capture_output=True, check=True,
        ).stdout
    finally:
        os.unlink(tmp)
    arr = np.frombuffer(out[: w * h * 3], dtype=np.uint8).astype(np.float64)
    return [
        {
            "doc_id": doc_id,
            "frame_id": 0,
            "width": w,
            "height": h,
            "mean_intensity": float(arr.mean() / 255.0),
        }
    ]


# --- container PROBES: MP4 box walk / MP3 frame scan ------------------------
# The pipeline-level multimodal ops on video/audio corpora are container
# operations — sample-table extraction, frame segmentation, chunking —
# not codec decode. These parse the real container structures natively;
# only the inner codec payload (H.264 NALs, MP3 granules) stays behind
# the declared ffmpeg plug-point in decode_payload_real.


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF (MP4) box walk: mvhd timing, first track's handler +
    sample-description fourcc, and the stbl sample table (stsz sizes,
    stco chunk offsets) resolved to absolute per-sample byte ranges —
    exactly what a frame-sampling pipeline needs to slice ``mdat``
    without decoding video. Single-chunk layouts (samples consecutive
    from stco[0]) are resolved exactly; multi-chunk needs stsc and is
    rejected explicitly."""
    import struct

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size, box = struct.unpack_from(">I4s", payload, pos)
            off = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", payload, pos + 8)
                off = 16
            if size < off or pos + size > hi:
                raise ValueError(f"bad box size {size} at {pos}")
            yield box, pos + off, pos + size
            pos += size

    def find(lo, hi, name):
        for box, blo, bhi in walk(lo, hi):
            if box == name:
                return blo, bhi
        raise ValueError(f"missing box {name.decode()}")

    info: dict = {}
    moov = find(0, len(payload), b"moov")
    mvhd = find(*moov, b"mvhd")
    ver = payload[mvhd[0]]
    if ver == 0:
        _, _, _, timescale, duration = struct.unpack_from(
            ">IIIII", payload, mvhd[0]
        )
    else:  # version 1: 64-bit times
        _, _, _, timescale, duration = struct.unpack_from(
            ">IQQIQ", payload, mvhd[0]
        )
    info["timescale"] = timescale
    info["duration_ticks"] = duration
    trak = find(*moov, b"trak")
    mdia = find(*trak, b"mdia")
    hdlr = find(*mdia, b"hdlr")
    info["handler"] = payload[hdlr[0] + 8 : hdlr[0] + 12].decode(
        "ascii", "replace"
    )
    stbl = find(*find(*mdia, b"minf"), b"stbl")
    stsd = find(*stbl, b"stsd")
    info["codec"] = payload[stsd[0] + 12 : stsd[0] + 16].decode(
        "ascii", "replace"
    )
    stsz = find(*stbl, b"stsz")
    _, fixed, count = struct.unpack_from(">III", payload, stsz[0])
    sizes = (
        [fixed] * count
        if fixed
        else list(
            struct.unpack_from(f">{count}I", payload, stsz[0] + 12)
        )
    )
    stco = find(*stbl, b"stco")
    _, n_chunks = struct.unpack_from(">II", payload, stco[0])
    if n_chunks != 1:
        raise NotImplementedError(
            "multi-chunk MP4 needs the stsc chunk map; single-chunk "
            "layouts cover the synthesized corpus"
        )
    (chunk0,) = struct.unpack_from(">I", payload, stco[0] + 8)
    ranges = []
    off = chunk0
    for s in sizes:
        ranges.append((off, s))
        off += s
    info["n_samples"] = count
    info["sample_ranges"] = ranges
    return info


_MP3_BITRATES = [  # kbps, MPEG-1 Layer III, index 1..14
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_RATES = [44100, 48000, 32000]  # samplerate index 0..2


def probe_mp3(payload: bytes) -> dict:
    """MPEG-1 Layer III frame scan: walk sync headers, decode
    bitrate/samplerate indices, advance by the exact frame length
    ``144 * bitrate / samplerate + padding`` — the segmentation an audio
    corpus pipeline uses for chunking/duration without decoding PCM.
    Returns frame count, per-scan constant header params, and exact PCM
    sample count (1152 per MPEG-1 L3 frame)."""
    pos = 0
    n_frames = 0
    bitrate_kbps = None
    samplerate = None
    frame_offsets = []
    while pos + 4 <= len(payload):
        h0, h1, h2, _ = payload[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at {pos}")
        if (h1 & 0x18) != 0x18 or (h1 & 0x06) != 0x02:
            raise NotImplementedError(
                "only MPEG-1 Layer III frames are scanned natively"
            )
        br_idx = (h2 >> 4) & 0x0F
        sr_idx = (h2 >> 2) & 0x03
        padding = (h2 >> 1) & 0x01
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"invalid bitrate/samplerate index at {pos}")
        br = _MP3_BITRATES[br_idx] * 1000
        sr = _MP3_RATES[sr_idx]
        if bitrate_kbps is None:
            bitrate_kbps, samplerate = br // 1000, sr
        frame_len = 144 * br // sr + padding
        frame_offsets.append((pos, frame_len))
        pos += frame_len
        n_frames += 1
    if pos != len(payload):
        raise ValueError("trailing bytes after last MP3 frame")
    return {
        "n_frames": n_frames,
        "bitrate_kbps": bitrate_kbps,
        "samplerate": samplerate,
        "n_pcm_samples": n_frames * 1152,
        "frame_offsets": frame_offsets,
    }


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
