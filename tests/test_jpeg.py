"""Native baseline-JPEG codec tests (operators/jpeg.py) — the round-3
'JPEG baseline decode' verdict item. Strategy (no JPEG library exists in
this container to compare against):

1. the ENTROPY layer is provably lossless: decoded quantized
   coefficients == the encoder's own fdct_quant output, bit-exact, on
   random images (exercises Huffman, zigzag, DC prediction, EOB/ZRL,
   byte stuffing, restart markers);
2. the IDCT is cross-checked against an independent naive cosine-sum
   reference;
3. DC-only tile images decode EXACTLY (the closed-form family behind
   the oracle-checked multimodal_jpeg_decode query);
4. lossy error is bounded on generic images; out-of-scope streams
   (progressive, subsampled) raise NotImplementedError.
"""

from __future__ import annotations

import numpy as np
import pytest

from cdc_apache_cassandra_spark.operators import jpeg


def _tile_image(doc_id: int, bw: int, bh: int) -> np.ndarray:
    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 2 * (
                (doc_id + by * 7 + bx * 13) % 128
            )
    return img


@pytest.mark.parametrize("restart", [0, 3])
def test_entropy_layer_lossless_gray(restart):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    data = jpeg.encode_baseline(img, quality=75, restart_interval=restart)
    sink: list = []
    jpeg.decode_baseline(data, _coef_sink=sink)
    q = jpeg.scaled_quant(jpeg.QUANT_LUMA, 75)
    bw = 40 // 8
    for m, c, coef in sink:
        assert c == 0
        by, bx = divmod(m, bw)
        want = jpeg.fdct_quant(
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64), q
        )
        assert np.array_equal(coef, want), (m, c)
    assert len(sink) == (24 // 8) * bw


def test_entropy_layer_lossless_rgb():
    """3-component interleaved scan: per-component DC predictors and the
    chroma quant table all round-trip bit-exactly."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = jpeg.encode_baseline(img, quality=60)
    sink: list = []
    jpeg.decode_baseline(data, _coef_sink=sink)
    assert len(sink) == 4 * 3  # 4 MCUs x 3 components
    # reproduce the encoder's color transform + blocks
    p = img.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ]
    qt = [
        jpeg.scaled_quant(jpeg.QUANT_LUMA, 60),
        jpeg.scaled_quant(jpeg.QUANT_CHROMA, 60),
        jpeg.scaled_quant(jpeg.QUANT_CHROMA, 60),
    ]
    for m, c, coef in sink:
        by, bx = divmod(m, 2)
        block = np.round(planes[c]).clip(0, 255)[
            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
        ]
        assert np.array_equal(coef, jpeg.fdct_quant(block, qt[c])), (m, c)


def test_idct_matches_naive_cosine_reference():
    """dequant_idct vs an independent O(N^4) cosine-sum IDCT."""
    rng = np.random.default_rng(3)

    def naive_idct(coef):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                        cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                        s += (
                            cu * cv * coef[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s
        return np.clip(np.round(out) + 128, 0, 255).astype(np.uint8)

    q = np.ones((8, 8), dtype=np.int32)
    for _ in range(5):
        coef = rng.integers(-64, 64, (8, 8)).astype(np.int32)
        assert np.array_equal(jpeg.dequant_idct(coef, q), naive_idct(coef))


def test_dc_only_tile_images_decode_exactly():
    """Even tile values at quality 50 (q_dc = 16): lossless by
    construction — the oracle family."""
    for doc_id in (0, 1, 7, 42, 123):
        img = _tile_image(doc_id, 2 + doc_id % 3, 1 + doc_id % 2)
        dec = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=50))
        assert np.array_equal(dec, img), doc_id


def test_lossy_error_bounded():
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    d = jpeg.decode_baseline(jpeg.encode_baseline(noise, quality=95))
    assert np.abs(d.astype(int) - noise.astype(int)).max() <= 16
    yy, xx = np.mgrid[0:32, 0:32]
    smooth = ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)
    d = jpeg.decode_baseline(jpeg.encode_baseline(smooth, quality=90))
    assert np.abs(d.astype(int) - smooth.astype(int)).max() <= 8


def test_rgb_constant_color_near_exact():
    img = np.full((16, 24, 3), (200, 40, 90), dtype=np.uint8)
    d = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=50))
    assert d.shape == img.shape
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 2


def test_non_multiple_of_8_geometry():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    d = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=90))
    assert d.shape == (13, 21)


def test_out_of_scope_streams_raise():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(jpeg.encode_baseline(img, quality=50))
    # flip SOF0 -> SOF2 (progressive)
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg.decode_baseline(bytes(data))
    # corrupt sampling factor to 2x2
    data[i + 1] = 0xC0
    data[i + 11] = 0x22
    with pytest.raises(NotImplementedError, match="subsampling"):
        jpeg.decode_baseline(bytes(data))
    with pytest.raises(ValueError):
        jpeg.decode_baseline(b"\x00\x01not a jpeg")


def test_restart_marker_out_of_sequence_rejected():
    img = _tile_image(3, 4, 2)
    data = bytearray(jpeg.encode_baseline(img, quality=50, restart_interval=2))
    i = data.index(b"\xff\xd0")
    data[i + 1] = 0xD5  # wrong RSTn
    with pytest.raises(ValueError, match="restart"):
        jpeg.decode_baseline(bytes(data))


def test_multimodal_dispatch_and_mean():
    """decode_payload_real routes FFD8 to the JPEG codec; mean matches
    the closed-form tile mean exactly."""
    from cdc_apache_cassandra_spark.operators.multimodal import (
        decode_payload_real,
    )

    doc_id = 9
    bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
    img = _tile_image(doc_id, bw, bh)
    frames = decode_payload_real(doc_id, jpeg.encode_baseline(img, quality=50))
    assert len(frames) == 1
    f = frames[0]
    assert (f["width"], f["height"]) == (bw * 8, bh * 8)
    tiles = [
        2 * ((doc_id + by * 7 + bx * 13) % 128)
        for by in range(bh)
        for bx in range(bw)
    ]
    assert f["mean_intensity"] == sum(tiles) / len(tiles)
