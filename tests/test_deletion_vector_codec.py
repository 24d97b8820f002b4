"""Deletion-vector codec (streaming/deletion_vectors.py) — byte-layout
pins against the PUBLIC spec: Z85 (ZeroMQ spec 32 test vector), the
portable 32/64-bit RoaringBitmap container forms, DV file layout
(version byte / big-endian length prefix / CRC-32 footer), inline z85
descriptors, and the keyed/keyless tolerance."""

import os
import struct

import numpy as np
import pytest

from cdc_apache_cassandra_spark.streaming import deletion_vectors as dv


def test_z85_spec_vector():
    # the reference vector from ZeroMQ RFC 32
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw
    with pytest.raises(ValueError):
        dv.z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        dv.z85_encode(b"abc")  # not a multiple of 4


@pytest.mark.parametrize(
    "case",
    [
        [],
        [0],
        [0, 1, 2, 3, 65535, 65536],
        list(range(10_000, 30_000)),  # bitmap container (card > 4096)
        [5, 2**32 + 7, 5 * 2**32 + 1],  # multiple 64-bit keys
    ],
    ids=["empty", "zero", "boundary", "bitmap", "multikey"],
)
def test_roundtrip(case):
    want = np.unique(np.asarray(case, dtype=np.int64))
    got = dv.deserialize_dv(dv.serialize_dv(case))
    assert np.array_equal(got, want)


def test_roundtrip_random():
    rng = np.random.default_rng(7)
    idx = np.unique(
        np.concatenate(
            [
                rng.choice(500_000, 20_000, replace=False),
                (3 << 32) + rng.choice(100_000, 5_000, replace=False),
            ]
        ).astype(np.int64)
    )
    assert np.array_equal(dv.deserialize_dv(dv.serialize_dv(idx)), idx)


def test_run_container_parse():
    """The encoder never emits run containers, but real writers do —
    hand-assemble one (cookie 12347) and parse it."""
    # one run container, key 0, runs [5..9] and [100..102]
    cookie = struct.pack("<I", dv._COOKIE_RUN | (0 << 16))  # 1 container
    run_flags = b"\x01"  # container 0 is a run
    desc = struct.pack("<HH", 0, 8 - 1)  # key 0, cardinality 8
    body = struct.pack("<H", 2) + struct.pack("<HH", 5, 4) + struct.pack(
        "<HH", 100, 2
    )
    rbm = cookie + run_flags + desc + body  # < 4 containers: no offsets
    data = struct.pack("<iq", dv.MAGIC_NUMBER, 1) + struct.pack("<I", 0) + rbm
    got = dv.deserialize_dv(data)
    assert list(got) == [5, 6, 7, 8, 9, 100, 101, 102]


def test_keyless_variant_tolerated():
    """Some independent implementations serialize the bucket index
    implicitly (no 4-byte key); the decoder detects that by cookie."""
    idx = np.unique(
        np.concatenate([np.arange(100), (1 << 32) + np.arange(50)])
    ).astype(np.int64)
    data = dv.serialize_dv(idx)
    pos, out = 12, bytearray(data[:12])
    for _ in range(2):
        pos += 4  # strip the key
        _, newpos = dv._parse_rbm32(data, pos)
        out += data[pos:newpos]
        pos = newpos
    assert np.array_equal(dv.deserialize_dv(bytes(out)), idx)


def test_bad_magic_and_trailing_bytes():
    with pytest.raises(ValueError, match="magic"):
        dv.deserialize_dv(b"\x00" * 16)
    data = dv.serialize_dv([1, 2]) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        dv.deserialize_dv(data)


def test_dv_file_layout(tmp_path):
    root = str(tmp_path)
    descs = dv.write_dv_file(None, [[1, 2, 3], [10**10, 10**10 + 5]], table_root=root)
    # one "u"-form file: version byte 1, uuid recoverable from z85
    files = [f for f in os.listdir(root) if f.startswith("deletion_vector_")]
    assert len(files) == 1
    blob = open(os.path.join(root, files[0]), "rb").read()
    assert blob[0] == dv.FORMAT_VERSION
    for desc, want in zip(descs, [[1, 2, 3], [10**10, 10**10 + 5]]):
        assert desc["storageType"] == "u"
        got = dv.load_dv_indexes(
            root, desc, lambda p: open(p, "rb").read()
        )
        assert list(got) == want
        # big-endian length prefix matches sizeInBytes
        off = desc["offset"]
        (n,) = struct.unpack_from(">i", blob, off)
        assert n == desc["sizeInBytes"]


def test_absolute_path_descriptor(tmp_path):
    p = str(tmp_path / "abs.bin")
    (desc,) = dv.write_dv_file(p, [[42]])
    assert desc["storageType"] == "p"
    got = dv.load_dv_indexes("/unused", desc, lambda q: open(q, "rb").read())
    assert list(got) == [42]


def test_inline_descriptor_roundtrip():
    d = dv.inline_dv_descriptor([3, 7, 1, 7])
    assert d["storageType"] == "i" and d["cardinality"] == 3
    got = dv.load_dv_indexes("/unused", d, None)
    assert list(got) == [1, 3, 7]


def test_cardinality_mismatch_raises(tmp_path):
    d = dv.inline_dv_descriptor([1, 2, 3])
    d["cardinality"] = 5
    with pytest.raises(ValueError, match="cardinality"):
        dv.load_dv_indexes("/unused", d, None)
