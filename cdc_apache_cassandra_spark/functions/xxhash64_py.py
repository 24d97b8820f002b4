"""Driver-side Spark-compatible ``xxhash64`` — pure Python, no JVM.

The bucket store routes rows with ``F.pmod(F.xxhash64(*cols), n)``
(streaming/materialize.py ``_bucket_expr``). Scan-level pruning in the
``cdc_store`` Python DataSource (sources/store_source.py) must compute the
SAME bucket for a pushed-down key filter *during planning*, where no Spark
job may run — so the hash is re-derived here exactly as Catalyst's
``XxHash64`` expression does (seed 42, per-column chaining: the running
hash of column *i* seeds column *i+1*, nulls skipped).

Implements the standard XXH64 algorithm (public spec,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) plus
Spark's type→bytes mapping (integral types hash through the int/long fast
paths, strings through UTF-8 bytes, floats normalize -0.0 and hash their
IEEE bit patterns). Parity with the JVM expression is pinned per type and
per multi-column chain in tests/test_store_source.py — if Spark ever
changed this hash the test would catch it (it can't: the hash is part of
Spark's on-disk bucketing contract).

Reference anchor: the reference routes mutations to topic partitions by
Murmur3 token (PulsarMutationSender.java murmur3 partitioner); this is
the same key→shard idea applied to the store's bucket layout.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark XXH64.hashLong)."""
    value &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int (Spark XXH64.hashInt): the int is read as
    an unsigned 32-bit lane, exactly the tail-4-byte step of the spec."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark XXH64.hashUnsafeBytes:
    same algorithm, little-endian lane reads)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off <= n - 32:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, off)
            v1 = (_rotl((v1 + k1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + k2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + k3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + k4 * _P2) & _M, 31) * _P1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off <= n - 8:
        (k,) = struct.unpack_from("<Q", data, off)
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off <= n - 4:
        (k,) = struct.unpack_from("<I", data, off)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_columns(values, spark_types, seed: int = SPARK_SEED) -> int:
    """Spark's multi-column ``xxhash64(c1, c2, ...)``: fold the columns
    left-to-right, each non-null value hashed with the running result as
    seed; nulls contribute nothing. ``spark_types`` are
    ``pyspark.sql.types.DataType`` instances (simpleString consulted).
    Returns the SIGNED 64-bit value Spark's expression yields."""
    h = seed
    for value, dt in zip(values, spark_types):
        if value is None:
            continue
        s = dt.simpleString()
        if s in ("tinyint", "smallint", "int"):
            h = hash_int(int(value), h)
        elif s == "bigint":
            h = hash_long(int(value), h)
        elif s == "boolean":
            h = hash_int(1 if value else 0, h)
        elif s == "float":
            f = 0.0 if value == 0.0 else float(value)
            (bits,) = struct.unpack("<i", struct.pack("<f", f))
            h = hash_int(bits, h)
        elif s == "double":
            d = 0.0 if value == 0.0 else float(value)
            (bits,) = struct.unpack("<q", struct.pack("<d", d))
            h = hash_long(bits, h)
        elif s == "string":
            h = hash_bytes(value.encode("utf-8"), h)
        elif s == "binary":
            h = hash_bytes(bytes(value), h)
        elif s == "date":
            import datetime

            days = (value - datetime.date(1970, 1, 1)).days
            h = hash_int(days, h)
        else:
            raise TypeError(
                f"xxhash64_py: unsupported pushdown key type {s!r} — "
                "route this predicate through the JVM instead"
            )
    return _to_signed(h)


def spark_bucket(values, spark_types, n_buckets: int) -> int:
    """``pmod(xxhash64(cols), n_buckets)`` — the store's bucket id for a
    concrete key (must equal materialize._bucket_expr on the same row)."""
    return xxhash64_columns(values, spark_types) % n_buckets
