"""Baseline JPEG (ITU T.81 sequential DCT, Huffman) encoder + decoder in
numpy/stdlib — no codec libraries.

Why both directions: the container has no JPEG library at all, so the
decoder can only be tested against fixtures we synthesize ourselves. The
encoder is therefore part of the test apparatus (and the fixture
generator for the oracle-checked ``multimodal_jpeg_decode`` query), while
the decoder is the production surface
(operators/multimodal.py::decode_payload_real dispatches FFD8 here).

Scope (raises NotImplementedError outside it):
- baseline sequential DCT, 8-bit samples (SOF0);
- grayscale (1 component) and 4:4:4 color (3 components, all sampling
  factors 1x1 — no chroma subsampling);
- restart markers (DRI / RSTn) supported in both directions.

Correctness strategy (tests/test_jpeg.py):
- entropy layer is LOSSLESS: decode(encode(quantized coefficients))
  round-trips bit-exactly through Huffman + zigzag + DC prediction +
  byte stuffing on random coefficients;
- the IDCT is cross-checked against an independent naive cosine-sum
  reference;
- DC-only images (per-8x8-tile constants with even values at quality
  50, where q_dc = 16 divides the level-shifted DC exactly) decode
  EXACTLY — the closed-form family the DuckDB oracle recomputes.

The Huffman tables are self-contained canonical tables written into the
file's DHT segments (all DC categories 4 bits, all AC symbols 8 bits) —
valid per T.81 (incomplete codes, all-ones code unused), deliberately
NOT a from-memory copy of the Annex K defaults, and decoded from the
file like any conforming reader would.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1/K.2 base quantization tables (public in ITU T.81).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Orthonormal DCT-II basis: F = C @ X @ C.T gives DC = 8 * mean(X).
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 5000/q below 50, 200-2q above."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- canonical Huffman tables (self-contained, written into DHT) ------------

#: DC: categories 0..11, every code 4 bits.
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
#: AC: EOB(0x00), ZRL(0xF0) and (run 0..15, size 1..10), every code 8 bits,
#: symbols in numeric order.
AC_VALS = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
AC_BITS = [0] * 7 + [len(AC_VALS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


class _BitReader:
    """Entropy-coded segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(v: int, cat: int) -> int:
    return v if v >= 1 << (cat - 1) else v - (1 << cat) + 1


def fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """8x8 spatial (uint8-ish ints) -> quantized coefficient block."""
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    return np.round(f / q).astype(np.int32)


def dequant_idct(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized coefficients -> clamped uint8 spatial block."""
    x = _C.T @ (coef.astype(np.float64) * q) @ _C
    return np.clip(np.round(x) + 128, 0, 255).astype(np.uint8)


def _encode_blocks_scan(
    comps_blocks: list[list[np.ndarray]],
    n_mcus: int,
    restart_interval: int,
) -> bytes:
    """Entropy-code interleaved MCUs (one block per component per MCU —
    4:4:4). comps_blocks[c][m] = quantized block."""
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = [0] * len(comps_blocks)
    out = bytearray()
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            w.pad()
            out += w.out
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            prev_dc = [0] * len(comps_blocks)
        for c, blocks in enumerate(comps_blocks):
            zz = blocks[m].flatten()[_ZZ]
            diff = int(zz[0]) - prev_dc[c]
            prev_dc[c] = int(zz[0])
            cat = _category(diff)
            code, ln = dc_codes[cat]
            w.write(code, ln)
            if cat:
                w.write(_value_bits(diff, cat), cat)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = ac_codes[(run << 4) | cat]
                w.write(code, ln)
                w.write(_value_bits(v, cat), cat)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]
                w.write(code, ln)
    w.pad()
    out += w.out
    return bytes(out)


def encode_baseline(
    pixels: np.ndarray, quality: int = 50, restart_interval: int = 0
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB, converted to YCbCr BT.601
    full-range) into a baseline 4:4:4 JFIF-less JPEG."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        qtabs = [scaled_quant(QUANT_LUMA, quality)]
        qids = [0]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [y, cb, cr]
        qtabs = [
            scaled_quant(QUANT_LUMA, quality),
            scaled_quant(QUANT_CHROMA, quality),
        ]
        qids = [0, 1, 1]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    comps_blocks: list[list[np.ndarray]] = []
    for plane, qid in zip(planes, qids):
        # edge-replicate padding to full blocks
        padded = np.pad(
            np.round(plane).clip(0, 255),
            ((0, bh * 8 - h), (0, bw * 8 - w)),
            mode="edge",
        )
        blocks = [
            fdct_quant(padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qtabs[qid])
            for by in range(bh)
            for bx in range(bw)
        ]
        comps_blocks.append(blocks)

    out = bytearray(b"\xff\xd8")  # SOI
    for i, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, i)
        out += bytes(int(v) for v in q.flatten()[_ZZ])
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, qids[c])
    out += b"\xff\xc0" + sof
    for cls, (bits, vals) in ((0, (DC_BITS, DC_VALS)), (1, (AC_BITS, AC_VALS))):
        seg = struct.pack(">HB", 19 + len(vals), (cls << 4) | 0) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        sos += struct.pack(">BB", c + 1, 0x00)  # DC table 0, AC table 0
    sos += struct.pack(">BBB", 0, 63, 0)
    out += b"\xff\xda" + sos
    out += _encode_blocks_scan(comps_blocks, bw * bh, restart_interval)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _Huff:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()
        }

    def decode(self, r: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | r.bit()
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def decode_baseline(data: bytes, _coef_sink: list | None = None) -> np.ndarray:
    """Decode a baseline JPEG within scope (SOF0, 8-bit, 1 or 3
    components, 1x1 sampling). Returns HxW (gray) or HxWx3 (RGB).

    ``_coef_sink`` (tests only): collects (mcu_index, comp_index,
    quantized 8x8 coefficient block) BEFORE dequantization — the hook
    that lets tests assert the entropy layer (Huffman + zigzag + DC
    prediction + byte stuffing + restarts) is bit-exactly lossless."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        size = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + size]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZZ] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0}: baseline only")
        elif marker == 0xC0:  # SOF0
            depth, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if depth != 8:
                raise NotImplementedError("only 8-bit samples")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling: only 4:4:4 (1x1) decoded"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _Huff(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ncomp_s = seg[0]
            tables = {}
            for c in range(ncomp_s):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                tables[cid] = (tt >> 4, tt & 0xF)
            h, w, comps = frame
            bw, bh = (w + 7) // 8, (h + 7) // 8
            planes = [
                np.zeros((bh * 8, bw * 8), dtype=np.uint8) for _ in comps
            ]
            r = _BitReader(data, pos + size)
            prev_dc = [0] * len(comps)
            m = 0
            expected_rst = 0
            while m < bw * bh:
                try:
                    for c, (cid, tq) in enumerate(comps):
                        dct, act = tables[cid]
                        zz = np.zeros(64, dtype=np.int32)
                        cat = huff[(0, dct)].decode(r)
                        diff = _extend(r.bits(cat), cat) if cat else 0
                        prev_dc[c] += diff
                        zz[0] = prev_dc[c]
                        k = 1
                        while k < 64:
                            sym = huff[(1, act)].decode(r)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            cat = sym & 0xF
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(r.bits(cat), cat)
                            k += 1
                        coef = np.zeros(64, dtype=np.int32)
                        coef[_ZZ] = zz
                        if _coef_sink is not None:
                            _coef_sink.append((m, c, coef.reshape(8, 8).copy()))
                        block = dequant_idct(coef.reshape(8, 8), qtabs[tq])
                        by, bx = divmod(m, bw)
                        planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
                    m += 1
                except _RestartMarker as rm:
                    if rm.marker - 0xD0 != expected_rst % 8:
                        raise ValueError("restart marker out of sequence")
                    expected_rst += 1
                    r.pos += 2
                    r.align_to_marker()
                    prev_dc = [0] * len(comps)
            if len(comps) == 1:
                return planes[0][:h, :w]
            y = planes[0][:h, :w].astype(np.float64)
            cb = planes[1][:h, :w].astype(np.float64) - 128.0
            cr = planes[2][:h, :w].astype(np.float64) - 128.0
            rgb = np.stack(
                [y + 1.402 * cr, y - 0.344136286 * cb - 0.714136286 * cr, y + 1.772 * cb],
                axis=-1,
            )
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        else:  # APPn/COM/unknown: skip
            pass
        pos += size
    raise ValueError("no SOS scan found")
