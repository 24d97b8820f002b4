"""Unit tests for the fuzzy-dedup / vector / multimodal operator modules
(SURVEY §7.2 step 9). DataFrame-level, local[*] session from conftest."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.multimodal import (
    FRAME_SCHEMA,
    attach_payload,
    decode_frames,
    decode_payload_stub,
)
from cdc_apache_cassandra_spark.operators.text_dedup import (
    MINHASH_PRIME,
    candidate_pairs,
    jaccard_expr,
    lsh_band_rows,
    minhash_lsh_candidates,
    minhash_signature,
    shingle_hash32,
    simhash32_sql,
    token_hash32_expr,
    tokens_expr,
    word_shingles,
)
from cdc_apache_cassandra_spark.operators.vectors import (
    as_double_vec,
    cosine,
    ivf_assign,
    sign_lsh_bucket,
)


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    out = df.select(
        word_shingles(tokens_expr(F.col("text")), 3).alias("sh")
    ).first()
    assert out.sh == ["a b c", "b c d"]


def test_shingles_distinct(spark):
    df = spark.createDataFrame([("x y x y x y",)], ["text"])
    out = df.select(word_shingles(tokens_expr(F.col("text")), 2).alias("sh")).first()
    assert sorted(out.sh) == ["x y", "y x"]


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps")],
        ["doc_id", "text"],
    )
    sh = df.select(
        "doc_id", word_shingles(tokens_expr(F.col("text")), 3).alias("s")
    )
    sig = sh.select(
        "doc_id", minhash_signature(shingle_hash32(F.col("s")), 8).alias("m")
    )
    a, b = [r.m for r in sig.orderBy("doc_id").collect()]
    assert a == b and len(a) == 8


def test_minhash_element_matches_python_reference(spark):
    # single shingle "a b c": permutation s maps its 32-bit md5-prefix hash
    # through ((2s+1)h + 12345s + 678) mod p
    h = int(hashlib.md5(b"a b c").hexdigest()[:8], 16)
    expect = [((2 * s + 1) * h + 12345 * s + 678) % MINHASH_PRIME for s in range(4)]
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    sh = df.select(word_shingles(tokens_expr(F.col("text")), 3).alias("s"))
    sig = sh.select(
        minhash_signature(shingle_hash32(F.col("s")), 4).alias("m")
    ).first()
    assert sig.m == expect


def test_lsh_bands_and_candidates(spark):
    # identical signatures -> all bands collide -> one candidate pair
    df = spark.createDataFrame(
        [(1, ["h1", "h2", "h3", "h4"]), (2, ["h1", "h2", "h3", "h4"]),
         (3, ["x1", "x2", "x3", "x4"])],
        ["doc_id", "sig"],
    )
    bands = lsh_band_rows(df, "doc_id", "sig", bands=2, rows_per_band=2)
    assert bands.count() == 6
    pairs = candidate_pairs(bands, "doc_id").collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]


def test_minhash_agg_pipeline_matches_array_formulation(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different words appear in this sentence here now"),
        (4, "unrelated text with nothing shared at all whatsoever indeed"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = df.select(
        "doc_id", word_shingles(tokens_expr(F.col("text")), 3).alias("shingles")
    )
    # array formulation
    sig = sh.select(
        "doc_id",
        minhash_signature(shingle_hash32(F.col("shingles")), 8).alias("m"),
    )
    bands = lsh_band_rows(sig, "doc_id", "m", 4, 2)
    arr_pairs = {
        (r.doc_a, r.doc_b) for r in candidate_pairs(bands, "doc_id").collect()
    }
    # aggregate formulation
    agg_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(sh, "doc_id", "shingles", 8, 4, 2).collect()
    }
    assert arr_pairs == agg_pairs
    assert (1, 2) in agg_pairs  # near-identical docs must collide


def test_connected_components_chain_and_singletons(spark):
    """A 4-node chain (1-2, 2-3, 3-4) collapses to component 1 (needing
    several propagation hops); disconnected nodes stay singletons."""
    from cdc_apache_cassandra_spark.operators.text_dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (6, 7)], ["doc_a", "doc_b"]
    )
    out = {
        r.doc_id: r.component
        for r in connected_components(nodes, edges, "doc_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}


def test_grouped_cc_matches_iterative(spark):
    """grouped_connected_components (per-blocking-key union-find) labels
    exactly as the iterative min-label fixpoint when every edge lies
    inside one group: multi-hop chains, merged stars, reversed edge
    order, and ids shared across groups (each group labels its own)."""
    from cdc_apache_cassandra_spark.operators.text_dedup import (
        connected_components,
        grouped_connected_components,
    )

    edges = [
        # group 10: a 5-node chain given in unhelpful order (forces real
        # union-by-min + path compression, not first-edge luck)
        (10, 4, 5), (10, 2, 3), (10, 1, 2), (10, 3, 4),
        # group 20: two stars merged by a bridge
        (20, 11, 12), (20, 11, 13), (20, 14, 15), (20, 13, 14),
        # group 30: reuses ids 1 and 2 — must label within its own group
        (30, 2, 7), (30, 1, 9),
    ]
    edf = spark.createDataFrame(edges, ["cid", "doc_a", "doc_b"])
    got = {
        (r.cid, r.doc_id): r.component
        for r in grouped_connected_components(edf, "cid").collect()
    }
    # per-group expectation from the iterative operator on the same edges
    want = {}
    for cid in (10, 20, 30):
        sub = edf.filter(F.col("cid") == cid)
        nodes = (
            sub.select(F.col("doc_a").alias("doc_id"))
            .union(sub.select("doc_b"))
            .distinct()
        )
        for r in connected_components(nodes, sub, "doc_id").collect():
            want[(cid, r.doc_id)] = r.component
    assert got == want
    # spot-check the values themselves
    assert got[(10, 5)] == 1 and got[(20, 15)] == 11
    assert got[(30, 7)] == 2 and got[(30, 9)] == 1


def test_jaccard(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], ["x", "y"])
    j = df.select(jaccard_expr(F.col("x"), F.col("y")).alias("j")).first().j
    assert abs(j - 2 / 4) < 1e-12


def test_simhash_deterministic_and_32bit(spark):
    df = spark.createDataFrame([(1, ["alpha", "beta"]), (2, ["alpha", "beta"])],
                               ["doc_id", "tokens"])
    hs = df.select("doc_id", token_hash32_expr(F.col("tokens")).alias("hashes"))
    sig = hs.select("doc_id", F.expr(simhash32_sql("hashes")).alias("s")).collect()
    vals = {r.s for r in sig}
    assert len(vals) == 1
    v = vals.pop()
    assert 0 <= v < 2**32


def test_simhash_single_token_equals_hash(spark):
    # one token: every bit's vote is +-1 from that token alone, so the
    # simhash IS the token hash
    tok = "hello"
    expect = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
    df = spark.createDataFrame([(1, [tok])], ["doc_id", "tokens"])
    hs = df.select(token_hash32_expr(F.col("tokens")).alias("hashes"))
    got = hs.select(F.expr(simhash32_sql("hashes")).alias("s")).first().s
    assert got == expect


def test_cosine_and_double_vec(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
                               ["a", "b"])
    out = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert abs(out[0].c - 1.0) < 1e-12 and abs(out[1].c) < 1e-12


def test_sign_lsh_bucket(spark):
    df = spark.createDataFrame(
        [([1.0, -1.0, 1.0, -1.0],), ([-1.0, 1.0, -1.0, 1.0],)], ["v"]
    )
    out = [r.b for r in df.select(sign_lsh_bucket(F.col("v"), 4).alias("b")).collect()]
    assert out == [0b0101, 0b1010]


def test_ivf_assign_nearest(spark):
    vecs = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [5.0, 5.1]), (3, [0.0, 0.2])], ["vec_id", "vec"]
    ).select("vec_id", as_double_vec(F.col("vec")).alias("vec"))
    cents = spark.createDataFrame(
        [(10, [0.0, 0.0]), (20, [5.0, 5.0])], ["cid", "cvec"]
    ).select("cid", as_double_vec(F.col("cvec")).alias("cvec"))
    out = {r.vec_id: r.cid for r in ivf_assign(vecs, cents, "vec").collect()}
    assert out == {1: 10, 2: 20, 3: 10}


def test_decode_stub_deterministic():
    frames = decode_payload_stub(7, b"x" * 33)
    assert len(frames) == 33 % 3 + 1
    assert frames[0]["doc_id"] == 7
    assert frames == decode_payload_stub(7, b"x" * 33)


def test_decode_frames_schema_and_rows(spark):
    df = attach_payload(
        spark.createDataFrame([(1, "hello world"), (2, "abc")], ["doc_id", "text"])
    )
    out = decode_frames(df)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    # len("hello world")=11 -> 11%3+1=3 frames; len("abc")=3 -> 3%3+1=1
    per_doc = {r.doc_id for r in rows}
    assert per_doc == {1, 2}
    assert len([r for r in rows if r.doc_id == 1]) == 3
    assert len([r for r in rows if r.doc_id == 2]) == 1


def test_payload_meta_checksum_is_md5_of_text(spark):
    from cdc_apache_cassandra_spark.operators.multimodal import payload_meta

    df = attach_payload(spark.createDataFrame([(1, "abc")], ["doc_id", "text"]))
    row = df.select(*payload_meta(F.col("payload"))).first()
    assert row.checksum == hashlib.md5(b"abc").hexdigest()
    assert row.n_bytes == 3
    assert row.n_pixels == row.width * row.height


def test_byte_chunker_matches_jvm_checksums(spark):
    """The mapInPandas byte-window chunker must produce the same chunk
    manifest as the JVM substring+md5 query for ASCII payloads (character
    slicing == byte slicing there)."""
    from collections import Counter

    from cdc_apache_cassandra_spark.operators.multimodal import (
        attach_payload,
        chunk_payload_bytes,
    )
    from cdc_apache_cassandra_spark.plans import QUERIES
    from cdc_apache_cassandra_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.001"
    d = attach_payload(
        load_table(spark, sf, "documents").filter(F.length("text") > 0)
    )
    got = chunk_payload_bytes(d, window=64, stride=64)
    want = QUERIES["multimodal_chunk_checksums"].fn(spark, sf)
    g = Counter(
        (r.doc_id, r.chunk_id, r.n_bytes, r.checksum) for r in got.collect()
    )
    w = Counter(
        (r.doc_id, r.chunk_id, r.n_chars, r.checksum) for r in want.collect()
    )
    assert g == w


def test_resize_frames_scales_geometry(spark):
    from cdc_apache_cassandra_spark.operators.multimodal import (
        attach_payload,
        decode_frames,
        resize_frames,
    )
    from cdc_apache_cassandra_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.001"
    frames = decode_frames(
        attach_payload(load_table(spark, sf, "documents").limit(50))
    )
    resized = resize_frames(frames, 32, 32)
    rows = resized.collect()
    assert rows
    for r in rows:
        assert r.width == 32 and r.height == 32
        assert r.scale_x > 0 and r.scale_y > 0


# --- real uncompressed-container decoders (BMP / WAV, stdlib-only) ----------


def _make_bmp(width: int, height: int) -> bytes:
    """Minimal uncompressed 24-bpp BMP with a deterministic gradient."""
    import struct

    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pixels = bytearray()
    for r in range(height):
        row = bytearray()
        for c in range(width):
            v = (r * width + c) % 251
            row += bytes([v, (v * 2) % 251, (v * 3) % 251])
        row += b"\x00" * (stride - len(row))
        pixels += row
    header_size = 14 + 40
    size = header_size + len(pixels)
    return (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, header_size)
        + struct.pack("<iiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
        + bytes(pixels)
    )


def _make_wav(n_samples: int, rate: int = 8000) -> bytes:
    """Minimal RIFF 16-bit mono PCM with a deterministic sawtooth."""
    import struct

    samples = [((i * 37) % 2001) - 1000 for i in range(n_samples)]
    data = struct.pack(f"<{n_samples}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_real_bmp_decode_through_spark(spark):
    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_make_bmp(5, 3))), (2, bytearray(_make_bmp(8, 2)))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in decode_frames(df, decoder=decode_payload_real).collect()
    }
    assert rows[1].width == 5 and rows[1].height == 3
    assert rows[2].width == 8 and rows[2].height == 2
    # exact mean over the gradient (padding excluded)
    b = _make_bmp(5, 3)
    want = decode_payload_real(1, b)[0]["mean_intensity"]
    assert abs(rows[1].mean_intensity - want) < 1e-12
    assert 0 < rows[1].mean_intensity < 255


def test_real_wav_decode_frames_and_amplitude(spark):
    from cdc_apache_cassandra_spark.operators.multimodal import (
        _WAV_FRAME_SAMPLES,
        decode_payload_real,
    )

    n = _WAV_FRAME_SAMPLES * 2 + 100  # 3 frames, last partial
    df = spark.createDataFrame(
        [(7, bytearray(_make_wav(n)))], "doc_id long, payload binary"
    )
    rows = sorted(
        decode_frames(df, decoder=decode_payload_real).collect(),
        key=lambda r: r.frame_id,
    )
    assert [r.frame_id for r in rows] == [0, 1, 2]
    assert rows[0].width == _WAV_FRAME_SAMPLES and rows[2].width == 100
    assert rows[0].height == 8000  # sample rate in the geometry slot
    assert all(0.0 < r.mean_intensity < 1.0 for r in rows)


def test_compressed_formats_still_gated(spark):
    import pytest as _pytest

    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    # JPEG is natively decoded now (operators/jpeg.py): a truncated blob
    # with JPEG magic reaches the real marker parser and fails there,
    # not at the format gate.
    with _pytest.raises(ValueError, match="no SOS scan"):
        decode_payload_real(1, b"\xff\xd8\xff\xe0JFIF-like")
    # MP3/MP4 remain gated behind the declared plug-point.
    with _pytest.raises(NotImplementedError):
        decode_payload_real(1, b"\x00\x00\x00\x18ftypmp42")  # MP4 magic


def _encode_png(width: int, height: int, color_type: int, rows: list[bytes]) -> bytes:
    """Minimal PNG encoder (filter 0 on every scanline) for decoder tests."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    lines = b"".join(b"\x00" + r for r in rows)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types_match_grammar():
    """The fixture generator cycles filter types 0-4 per row; decoding must
    recover the exact modular pixel grammar (closed-form mean)."""
    from cdc_apache_cassandra_spark.plans.multimodal_queries import _make_png
    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    for doc_id in range(24):  # covers all width/height mods and >4-row images
        width = 3 + doc_id % 6
        height = 2 + doc_id % 4
        total = sum(
            ((doc_id + r * width + c) * k) % 251
            for r in range(height)
            for c in range(width)
            for k in (1, 2, 3)
        )
        frame = decode_payload_real(doc_id, _make_png(doc_id))[0]
        assert frame["width"] == width and frame["height"] == height
        assert frame["mean_intensity"] == total / (width * height * 3)


def test_png_decode_gray_and_rgba():
    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    gray = _encode_png(3, 2, 0, [bytes([10, 20, 30]), bytes([40, 50, 60])])
    f = decode_payload_real(1, gray)[0]
    assert f["width"] == 3 and f["height"] == 2
    assert f["mean_intensity"] == (10 + 20 + 30 + 40 + 50 + 60) / 6

    # RGBA: alpha bytes (255) must be excluded from the mean
    rgba_row = bytes([100, 110, 120, 255, 10, 20, 30, 255])
    f = decode_payload_real(2, _encode_png(2, 1, 6, [rgba_row]))[0]
    assert f["mean_intensity"] == (100 + 110 + 120 + 10 + 20 + 30) / 6


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import pytest as _pytest

    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 13))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_payload_real(1, png16)

    # Adam7 interlace
    ihdr_i = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 1)
    png_i = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_i)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_payload_real(1, png_i)


def test_png_decode_through_spark(spark):
    from cdc_apache_cassandra_spark.plans.multimodal_queries import _make_png
    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    df = spark.createDataFrame(
        [(3, bytearray(_make_png(3))), (4, bytearray(_make_png(4)))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in decode_frames(df, decoder=decode_payload_real).collect()
    }
    assert rows[3].width == 3 + 3 % 6 and rows[4].height == 2 + 4 % 4


def test_mp4_probe_walks_boxes_and_rejects_multichunk():
    from cdc_apache_cassandra_spark.operators.multimodal import probe_mp4
    from cdc_apache_cassandra_spark.plans.multimodal_queries import _make_mp4

    info = probe_mp4(_make_mp4(42))
    assert info["codec"] == "avc1" and info["handler"] == "vide"
    assert info["n_samples"] == 3 + 42 % 5
    assert info["timescale"] == 600
    # ranges are contiguous and inside the blob
    blob = _make_mp4(42)
    offs = info["sample_ranges"]
    for (o1, s1), (o2, _) in zip(offs, offs[1:]):
        assert o1 + s1 == o2
    assert offs[-1][0] + offs[-1][1] == len(blob)
    # first sample bytes follow the grammar
    o0, s0 = offs[0]
    assert list(blob[o0 : o0 + 4]) == [(42 + 5 * j) % 251 for j in range(4)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing box"):
        probe_mp4(b"\x00\x00\x00\x08free")


def test_mp3_probe_scans_frames_and_detects_desync():
    import pytest as _pytest

    from cdc_apache_cassandra_spark.operators.multimodal import probe_mp3
    from cdc_apache_cassandra_spark.plans.multimodal_queries import _make_mp3

    blob = _make_mp3(7)
    info = probe_mp3(blob)
    assert info["n_frames"] == 2 + 7 % 6
    assert info["n_pcm_samples"] == info["n_frames"] * 1152
    assert sum(l for _, l in info["frame_offsets"]) == len(blob)
    # corrupt one frame length -> scan loses sync and says so
    with _pytest.raises(ValueError, match="lost MP3 sync|trailing"):
        probe_mp3(blob[:-1])
    with _pytest.raises(ValueError, match="lost MP3 sync"):
        probe_mp3(b"\x00\x00" + blob)


def test_tar_parser_cross_checked_against_stdlib_writer():
    """Native ustar walk vs the stdlib tarfile writer (independent
    implementation): names, sizes, payload offsets, GNU longnames, and
    the checksum/truncation error paths."""
    import io
    import tarfile

    import pytest as _pytest

    from cdc_apache_cassandra_spark.operators.shards import (
        parse_tar_members,
        webdataset_samples,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tf:
        for key, ext, data in (
            ("0001", "txt", b"alpha"),
            ("0001", "img", bytes(range(7))),
            ("0002", "cls.txt", b"3"),
            ("d/" + "n" * 140, "bin", b"xy"),  # forces a GNU longname entry
        ):
            ti = tarfile.TarInfo(f"{key}.{ext}")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    blob = buf.getvalue()
    members = parse_tar_members(blob)
    by_name = {m["name"]: m for m in members}
    assert blob[
        by_name["0001.txt"]["offset"] : by_name["0001.txt"]["offset"] + 5
    ] == b"alpha"
    samples = webdataset_samples(members)
    assert set(samples["0001"]) == {"txt", "img"}
    assert set(samples["0002"]) == {"cls.txt"}  # modality = after FIRST dot
    assert ("n" * 140) in samples  # longname resolved into the key
    # checksum validation: flip a header byte
    bad = bytearray(blob)
    bad[0] ^= 0xFF
    with _pytest.raises(ValueError, match="checksum"):
        parse_tar_members(bytes(bad))
    # truncation mid-payload: the walk runs off the end without ever
    # seeing the end-of-archive marker (tarfile pads archives to 10 KiB
    # records, so a small tail cut would still leave zero blocks)
    last = max(m["offset"] for m in members)
    with _pytest.raises(ValueError, match="truncated"):
        parse_tar_members(blob[: last + 1])


def test_gzip_members_multi_member_and_errors():
    """Multi-member gzip: members recovered individually (the WET/WARC
    shape naive gunzip truncates); trailing garbage and truncation are
    loud errors."""
    import gzip
    import io

    import pytest as _pytest

    from cdc_apache_cassandra_spark.operators.shards import gzip_members

    def gz(data: bytes) -> bytes:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(data)
        return buf.getvalue()

    blob = gz(b"first") + gz(b"") + gz(b"third " * 100)
    assert gzip_members(blob) == [b"first", b"", b"third " * 100]
    # naive single-shot gunzip loses members 2..n — the reason this op exists
    assert gzip.decompress(blob) != b"first"  # stdlib concatenates...
    with _pytest.raises(ValueError, match="trailing non-gzip"):
        gzip_members(blob + b"junk")
    with _pytest.raises(ValueError, match="truncated"):
        gzip_members(blob[:-5])


def test_zip_parser_cross_checked_against_stdlib_writer():
    """Native central-directory walk vs the stdlib zipfile writer:
    stored + deflate members extract CRC-verified; corruption and a
    missing EOCD record fail loudly."""
    import io
    import zipfile

    import pytest as _pytest

    from cdc_apache_cassandra_spark.operators.shards import (
        parse_zip_members,
        read_zip_member,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "hello stored", compress_type=zipfile.ZIP_STORED)
        zf.writestr(
            "dir/b.txt", "deflate me " * 50, compress_type=zipfile.ZIP_DEFLATED
        )
    blob = buf.getvalue()
    by = {m["name"]: m for m in parse_zip_members(blob)}
    assert read_zip_member(blob, by["a.txt"]) == b"hello stored"
    assert read_zip_member(blob, by["dir/b.txt"]) == b"deflate me " * 50
    assert (by["a.txt"]["method"], by["dir/b.txt"]["method"]) == (0, 8)
    bad = bytearray(blob)
    bad[by["a.txt"]["offset"]] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        read_zip_member(bytes(bad), parse_zip_members(bytes(bad))[0])
    with _pytest.raises(ValueError, match="end-of-central-directory"):
        parse_zip_members(b"not a zip at all")


def test_codec_plug_points_capability_gated():
    """r3 verdict item 8: MP3/MP4 (and PIL-only image formats) dispatch
    through decode_payload_real's capability probes. Without ffmpeg/PIL
    the dispatch raises the documented NotImplementedError; where the
    codecs exist the same seam decodes (gated below)."""
    import pytest

    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
        ffmpeg_available,
        pil_available,
    )

    # minimal MP4 signature (ftyp box) — dispatch must route to ffmpeg
    mp4_sig = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16
    if not ffmpeg_available():
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            decode_payload_real(1, mp4_sig)
    if not pil_available():
        with pytest.raises(NotImplementedError):
            decode_payload_real(1, b"GIF89a" + b"\x00" * 32)


def test_ffmpeg_decode_when_available():
    """Activates only on images that carry ffmpeg (the spark-avro
    contract-test pattern): a generated sine WAV transcoded through the
    ffmpeg seam must produce frame rows with plausible amplitude."""
    import math
    import struct
    import subprocess

    import pytest

    from cdc_apache_cassandra_spark.operators.multimodal import (
        _decode_with_ffmpeg,
        ffmpeg_available,
    )

    if not ffmpeg_available():
        pytest.skip("ffmpeg binary not on this image")
    rate, n = 16000, 16000
    pcm = b"".join(
        struct.pack("<h", int(20000 * math.sin(2 * math.pi * 440 * i / rate)))
        for i in range(n)
    )
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    mp3 = subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "wav", "-i", "pipe:0",
         "-f", "mp3", "pipe:1"],
        input=wav, capture_output=True, check=True,
    ).stdout
    frames = _decode_with_ffmpeg(7, mp3, audio=True)
    assert len(frames) >= 10
    assert all(f["doc_id"] == 7 and f["height"] == 16000 for f in frames)
    mid = frames[len(frames) // 2]["mean_intensity"]
    assert 0.3 < mid < 0.9  # sine mean-abs ~ 2/pi * 0.61


def test_pil_decode_when_available():
    import pytest

    from cdc_apache_cassandra_spark.operators.multimodal import (
        _decode_with_pil,
        pil_available,
    )

    if not pil_available():
        pytest.skip("Pillow not on this image")
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (8, 4), (255, 0, 0)).save(buf, format="GIF")
    frames = _decode_with_pil(3, buf.getvalue())
    assert frames[0]["width"] == 8 and frames[0]["height"] == 4
    assert abs(frames[0]["mean_intensity"] - (255 / 3) / 255.0) < 0.02


def test_minhash_signature_rows_matches_array_form(spark):
    """The r11 flat-aggregate signature must be value-identical to the
    nested-lambda array form (same affine permutations, same mins)."""
    from pyspark.sql import functions as F

    from cdc_apache_cassandra_spark.operators.text_dedup import (
        minhash_signature,
        minhash_signature_rows,
        shingle_hash32,
    )

    df = spark.createDataFrame(
        [(1, ["a b", "b c", "c d"]), (2, ["b c", "x y"]), (3, ["zz top"])],
        "doc_id int, shingles array<string>",
    )
    array_form = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id",
            minhash_signature(shingle_hash32(F.col("shingles")), 8).alias("m"),
        ).collect()
    }
    rows_form = {
        r["doc_id"]: r["minhash"]
        for r in minhash_signature_rows(df, "doc_id", "shingles", 8).collect()
    }
    assert rows_form == array_form
