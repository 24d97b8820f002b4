"""Deletion-vector READ support for foreign Delta tables.

Implements the PUBLIC Delta deletion-vector format (delta.io
PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Descriptor Schema" +
"Deletion Vector Format"; reference parity bar: the DataStax connector
consumes whatever the live table serves — CassandraSource.java:666-698
rebuilds schema on change — so this lakehouse import must tolerate the
reader features a modern delta-spark table actually carries):

* An ``add`` action may carry a ``deletionVector`` descriptor
  ``{storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}``
  marking rows of that parquet file as deleted by ROW INDEX (the
  position of the row within the physical file).
* ``storageType``:
  - ``"u"`` — relative file: ``pathOrInlineDv`` is
    ``<random prefix><z85-encoded 16-byte uuid>`` (uuid = the LAST 20
    characters; anything before it is a path prefix under the table
    root); the on-disk name is ``deletion_vector_<uuid>.bin``.
  - ``"p"`` — ``pathOrInlineDv`` is an absolute path to the DV file.
  - ``"i"`` — inline: ``pathOrInlineDv`` is the z85 encoding of the
    serialized bitmap itself (no file IO).
* DV FILE layout: byte 0 is the format version (must be ``1``); each
  stored DV is ``<dataSize: 4-byte big-endian><data><crc32(data):
  4-byte big-endian>`` at the descriptor's ``offset`` (pointing at the
  length prefix). ``sizeInBytes`` is ``len(data)``.
* ``data`` (the serialized bitmap): 4-byte LITTLE-endian magic
  ``1681511377``, then the official 64-bit portable RoaringBitmap
  serialization (RoaringFormatSpec, as implemented by delta-spark's
  ``RoaringBitmapArray`` Portable format and RoaringBitmap's
  ``Roaring64NavigableMap``): an 8-byte little-endian bitmap count,
  then for each 32-bit bitmap in ascending key order a 4-byte
  little-endian key (the high 32 bits) followed by the standard 32-bit
  portable serialization. Some independent implementations serialize
  the KEYLESS variant (bucket index = position); the decoder detects
  that by cookie inspection and accepts both (documented tolerance —
  a key whose low 16 bits collide with a roaring cookie would imply
  > 5e13 rows in one parquet file, far beyond any real file).
* 32-bit portable RoaringBitmap: little-endian cookie ``12346`` (no run
  containers; container count in the next 4 bytes) or ``12347`` (run
  containers; container count - 1 in the cookie's high 16 bits,
  followed by a run-container presence bitset). Then per container a
  2-byte key + 2-byte (cardinality-1) descriptive header; a 4-byte
  offset header (always for cookie 12346, for 12347 only when >= 4
  containers); then the containers themselves: sorted 2-byte arrays
  (cardinality <= 4096), 8 KiB bitmaps, or run lists (2-byte run
  count, then per run 2-byte start + 2-byte length-1).

Row-index semantics, scale shape, and the Spark-side filter live in
``delta_log.py`` (the snapshot reader); this module is pure
bytes <-> numpy. The encoder half serves tests and queries building
SPEC-CONFORMANT fixtures AND, since r10, ``delta_export``'s
sparse-delete path (``deletion_vectors=True`` re-points a bucket's
existing parquet at a DV instead of rewriting it); it always writes
the keyed (official) portable variant.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

# --- Z85 (ZeroMQ spec 32) ---------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}

#: little-endian magic prepended to the serialized 64-bit bitmap
MAGIC_NUMBER = 1681511377
#: DV file format version byte
FORMAT_VERSION = 1

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # cookie-12347 streams omit offsets below this


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 input length must be a multiple of 4, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i : i + 4])
        chunk = [""] * 5
        for j in range(4, -1, -1):
            n, r = divmod(n, 85)
            chunk[j] = _Z85_ALPHABET[r]
        out.append("".join(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input length must be a multiple of 5, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("z85 quintet overflows 32 bits")
        out += struct.pack(">I", n)
    return bytes(out)


# --- 32-bit portable RoaringBitmap ------------------------------------------


def _parse_rbm32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one 32-bit portable RoaringBitmap at ``pos``; return the
    sorted uint32 values and the position one past the bitmap."""
    (word,) = struct.unpack_from("<I", buf, pos)
    cookie = word & 0xFFFF
    if cookie == _COOKIE_RUN:
        n = (word >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_bits = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif word == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_bits = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a portable RoaringBitmap (cookie {word:#x})")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are a seek aid; sequential parse skips them
    parts: list[np.ndarray] = []
    for i in range(n):
        base = np.uint32(keys[i]) << np.uint32(16)
        is_run = bool(run_bits[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            starts = runs[0::2].astype(np.uint32)
            lengths = runs[1::2].astype(np.int64) + 1
            vals = np.concatenate(
                [np.arange(s, s + l, dtype=np.uint32) for s, l in zip(starts, lengths)]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] <= 4096:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(base | vals)
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, pos


def _serialize_rbm32(values: np.ndarray) -> bytes:
    """Serialize sorted uint32 values as a portable 32-bit
    RoaringBitmap (cookie 12346; array containers <= 4096 values,
    bitmap containers above — runs never emitted)."""
    values = np.asarray(values, dtype=np.uint32)
    hi = (values >> np.uint32(16)).astype(np.uint16)
    keys, starts = np.unique(hi, return_index=True)
    bounds = list(starts) + [len(values)]
    out = bytearray(struct.pack("<II", _COOKIE_NO_RUN, len(keys)))
    containers: list[bytes] = []
    for i, k in enumerate(keys):
        chunk = (values[bounds[i] : bounds[i + 1]] & np.uint32(0xFFFF)).astype(
            "<u2"
        )
        card = len(chunk)
        out += struct.pack("<HH", int(k), card - 1)
        if card <= 4096:
            containers.append(chunk.tobytes())
        else:
            words = np.zeros(1024, dtype="<u8")
            idx = chunk.astype(np.int64)
            np.bitwise_or.at(
                words, idx >> 6, (np.uint64(1) << (idx & 63).astype(np.uint64))
            )
            containers.append(words.tobytes())
    offset = len(out) + 4 * len(keys)
    for c in containers:
        out += struct.pack("<I", offset)
        offset += len(c)
    for c in containers:
        out += c
    return bytes(out)


# --- 64-bit RoaringBitmapArray (magic + portable) ----------------------------


def deserialize_dv(data: bytes) -> np.ndarray:
    """``data`` (magic + 64-bit portable bitmap) -> sorted int64 row
    indexes. Accepts both the keyed (official / delta-spark) and
    keyless bucket layouts — see module docstring."""
    if len(data) < 12:
        raise ValueError(f"deletion vector too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC_NUMBER:
        raise ValueError(
            f"bad deletion-vector magic {magic} (expected {MAGIC_NUMBER})"
        )
    (count,) = struct.unpack_from("<q", data, 4)
    if count < 0:
        raise ValueError(f"negative bitmap count {count}")
    pos = 12
    parts: list[np.ndarray] = []
    keyed: bool | None = None
    for i in range(count):
        if keyed is None:
            (word,) = struct.unpack_from("<I", data, pos)
            cookie = word & 0xFFFF
            keyed = cookie not in (_COOKIE_NO_RUN, _COOKIE_RUN)
        if keyed:
            (key,) = struct.unpack_from("<I", data, pos)
            pos += 4
        else:
            key = i
        vals32, pos = _parse_rbm32(data, pos)
        parts.append(vals32.astype(np.int64) | (np.int64(key) << np.int64(32)))
    if pos != len(data):
        raise ValueError(
            f"deletion vector has {len(data) - pos} trailing bytes"
        )
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def serialize_dv(row_indexes) -> bytes:
    """Sorted-or-not row indexes -> magic + keyed 64-bit portable
    bitmap (the official variant delta-spark writes)."""
    idx = np.unique(np.asarray(list(row_indexes), dtype=np.int64))
    if len(idx) and idx[0] < 0:
        raise ValueError("row indexes must be non-negative")
    hi = (idx >> np.int64(32)).astype(np.uint32)
    keys, starts = np.unique(hi, return_index=True)
    bounds = list(starts) + [len(idx)]
    out = bytearray(struct.pack("<iq", MAGIC_NUMBER, len(keys)))
    for i, k in enumerate(keys):
        out += struct.pack("<I", int(k))
        out += _serialize_rbm32(
            (idx[bounds[i] : bounds[i + 1]] & np.int64(0xFFFFFFFF)).astype(
                np.uint32
            )
        )
    return bytes(out)


# --- descriptor resolution ----------------------------------------------------


def dv_unique_id(dv: dict | None) -> tuple | None:
    """Stable identity of a DV descriptor — what makes (path, dv) the
    file-diff identity in the change feed: re-adding the same parquet
    path with a different DV IS a change."""
    if not dv:
        return None
    return (
        dv.get("storageType"),
        dv.get("pathOrInlineDv"),
        dv.get("offset"),
    )


def dv_absolute_path(table_root: str, dv: dict) -> str:
    """Resolve a "u"/"p" descriptor to the DV file path."""
    st = dv["storageType"]
    payload = dv["pathOrInlineDv"]
    if st == "p":
        return payload
    if st != "u":
        raise NotImplementedError(
            f"deletion-vector storageType {st!r} is not in the spec "
            "(expected 'u', 'i' or 'p')"
        )
    if len(payload) < 20:
        raise ValueError(f"storageType 'u' payload too short: {payload!r}")
    prefix, enc = payload[:-20], payload[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    parts = [table_root] + ([prefix] if prefix else []) + [name]
    return os.path.join(*parts)


def load_dv_bytes(table_root: str, dv: dict, read_bytes) -> bytes:
    """Resolve a descriptor to its serialized-bitmap bytes, verifying
    the file-format version, the length prefix against ``sizeInBytes``
    and the CRC-32 footer. ``read_bytes(path) -> bytes`` is injected so
    the caller picks the IO seam (delta_log._io_read_bytes locally /
    over pyarrow.fs for URI roots)."""
    st = dv["storageType"]
    size = int(dv["sizeInBytes"])
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        # z85 pads to 4-byte quartets; sizeInBytes is authoritative
        if len(data) < size:
            raise ValueError(
                f"inline DV decodes to {len(data)} bytes < sizeInBytes {size}"
            )
        return data[:size]
    blob = read_bytes(dv_absolute_path(table_root, dv))
    if not blob or blob[0] != FORMAT_VERSION:
        raise ValueError(
            f"unsupported deletion-vector file version "
            f"{blob[0] if blob else '<empty>'}"
        )
    off = int(dv.get("offset") or 0)
    (data_size,) = struct.unpack_from(">i", blob, off)
    if data_size != size:
        raise ValueError(
            f"DV length prefix {data_size} != descriptor sizeInBytes {size}"
        )
    data = blob[off + 4 : off + 4 + data_size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + data_size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV checksum mismatch (torn or corrupt DV file)")
    return data


def load_dv_indexes(table_root: str, dv: dict, read_bytes) -> np.ndarray:
    """Descriptor -> sorted int64 deleted-row indexes, cardinality
    verified against the descriptor."""
    idx = deserialize_dv(load_dv_bytes(table_root, dv, read_bytes))
    card = dv.get("cardinality")
    if card is not None and int(card) != len(idx):
        raise ValueError(
            f"DV cardinality {card} != decoded {len(idx)} indexes"
        )
    return idx


# --- DV writer (fixtures, oracle queries, AND delta_export's sparse-
# delete path since r10) ------------------------------------------------------


def write_dv_file(
    path: str,
    dv_sets,
    table_root: str | None = None,
    write_bytes=None,
) -> list[dict]:
    """Write one spec-layout DV FILE holding each set of row indexes in
    ``dv_sets``; return the matching descriptors. When ``table_root``
    is given the file lands under it with a fresh uuid name and the
    descriptors use storageType "u" (the layout delta-spark writes);
    otherwise the file is written at ``path`` verbatim and descriptors
    use the absolute-path form "p". ``write_bytes(path, data)``
    overrides the local write — delta_export passes the pyarrow-fs
    seam (delta_log._io_write_bytes) so DV blobs land on URI table
    roots like every other driver-side byte."""
    if table_root is not None:
        u = _uuid.uuid4()
        name = f"deletion_vector_{u}.bin"
        path = os.path.join(table_root, name)
        path_or_inline = z85_encode(u.bytes)
        storage = "u"
    else:
        path_or_inline = os.path.abspath(path)
        storage = "p"
    blob = bytearray([FORMAT_VERSION])
    descriptors = []
    for rows in dv_sets:
        data = serialize_dv(rows)
        descriptors.append(
            {
                "storageType": storage,
                "pathOrInlineDv": path_or_inline,
                "offset": len(blob),
                "sizeInBytes": len(data),
                "cardinality": int(len(np.unique(np.asarray(list(rows))))),
            }
        )
        blob += struct.pack(">i", len(data)) + data + struct.pack(
            ">I", zlib.crc32(data) & 0xFFFFFFFF
        )
    if write_bytes is not None:
        write_bytes(path, bytes(blob))
    else:
        with open(path, "wb") as f:
            f.write(bytes(blob))
    return descriptors


def inline_dv_descriptor(row_indexes) -> dict:
    """Build a storageType "i" descriptor (bitmap z85-inlined in the
    log action itself — what delta-spark emits for tiny DVs)."""
    data = serialize_dv(row_indexes)
    padded = data + b"\x00" * (-len(data) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(data),
        "cardinality": int(
            len(np.unique(np.asarray(list(row_indexes), dtype=np.int64)))
        ),
    }
