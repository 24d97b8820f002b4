"""Cassandra Murmur3Partitioner token — the REAL partition token
(reference routes events by it: Murmur3MessageRouter.java:25-28 routes
``((token >>> 48) + 32768) % numPartitions``; the agent computes the
token per mutation in CommitLogReadHandlerImpl.java:322-323). Round 2
shipped an oracle-portable Knuth-hash stand-in (functions/hashing.py);
this module adds hash fidelity: any user inter-operating with real
Cassandra token ranges (locality routing, token-range backfill splits)
gets the same placement Cassandra computes.

Three implementations, one semantics:

1. :func:`murmur3_hash` — pure-Python reference of Cassandra's
   ``MurmurHash.hash3_x64_128(key, 0)[0]`` (agent + commons). NOTE this
   is NOT canonical MurmurHash3: Cassandra's Java port sign-extends the
   TAIL bytes (``k1 ^= ((long) key[i]) << shift`` — Java bytes are
   signed), a divergence kept forever for on-disk compatibility. The
   Apache Cassandra python driver replicates it (cassandra/murmur3.py);
   the golden vectors in tests/test_murmur3.py are the driver's
   published test values.
2. :func:`token_steps` — the SAME computation for 8-byte (bigint) keys
   as a sequence of named 16-bit-LIMB integer columns, emitted in either
   the Spark-SQL or DuckDB dialect from one builder. Every intermediate
   stays below 2^63, so it runs under ANSI overflow checking on the JVM
   (no Python in the hot path) and under DuckDB's checked BIGINT — the
   oracle gate covers the token end-to-end.
3. :func:`murmur3_token_pandas` — Arrow-batched fallback for arbitrary
   byte keys (text / composite), vectorized per batch.

Key serialization follows Cassandra's type codecs: bigint/int are
big-endian two's complement (LongType/Int32Type), text is UTF-8.
``token`` normalizes Long.MIN_VALUE -> Long.MAX_VALUE exactly like
Murmur3Partitioner.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_FM1 = 0xFF51AFD7ED558CCD
_FM2 = 0xC4CEB9FE1A85EC53


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * _FM1) & _MASK64
    k ^= k >> 33
    k = (k * _FM2) & _MASK64
    k ^= k >> 33
    return k


def murmur3_hash(data: bytes) -> int:
    """Cassandra's hash3_x64_128 upper half as a SIGNED 64-bit int
    (pre-normalization). Sign-extended tail bytes — see module doc."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = 0
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = data[nblocks * 16 :]
    sb = [b - 256 if b >= 128 else b for b in tail]  # SIGNED bytes (the quirk)
    k1 = k2 = 0
    tl = len(tail)
    for i in range(tl - 1, 7, -1):  # bytes 8..14 -> k2
        # negative << n then mask = Java's sign-extended shift pattern
        k2 ^= (sb[i] << (8 * (i - 8))) & _MASK64
    if tl > 8:
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    for i in range(min(tl, 8) - 1, -1, -1):  # bytes 0..7 -> k1
        k1 ^= (sb[i] << (8 * i)) & _MASK64
    if tl > 0:
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK64
    return h1 - (1 << 64) if h1 >= 1 << 63 else h1


def token(data: bytes) -> int:
    """Murmur3Partitioner.getToken: hash with MIN_VALUE normalized to
    MAX_VALUE (MIN is the partitioner's reserved minimum token)."""
    t = murmur3_hash(data)
    return (1 << 63) - 1 if t == -(1 << 63) else t


def serialize_bigint(v: int) -> bytes:
    return (v & _MASK64).to_bytes(8, "big")


def serialize_int(v: int) -> bytes:
    return (v & 0xFFFFFFFF).to_bytes(4, "big")


def serialize_text(s: str) -> bytes:
    return s.encode("utf-8")


def token_bigint(v: int) -> int:
    return token(serialize_bigint(v))


def route(tok: int, num_partitions: int) -> int:
    """Murmur3MessageRouter.choosePartition: ((token >>> 48) + 32768) %
    numPartitions — unsigned shift on the signed token."""
    return (((tok & _MASK64) >> 48) + 32768) % num_partitions


# --- limb-program builder: the same hash as engine-native columns -----------
#
# A u64 is carried as two NONNEGATIVE BIGINT limb columns (hi, lo, each
# < 2^32); multiplication splits further into 16-bit limbs so every
# intermediate stays below 2^63 — no wrap-around arithmetic anywhere, so
# the program runs under Spark's ANSI overflow checking AND DuckDB's
# checked BIGINT. One builder emits both dialects; the only differences
# are the xor / shift spellings.

_DIALECTS = {
    "spark": {
        "xor": lambda a, b: f"({a} ^ {b})",
        "shl": lambda a, n: f"shiftleft({a}, {n})",
        "shr": lambda a, n: f"shiftright({a}, {n})",
    },
    "duckdb": {
        "xor": lambda a, b: f"xor({a}, {b})",
        "shl": lambda a, n: f"({a} << {n})",
        "shr": lambda a, n: f"({a} >> {n})",
    },
}

Steps = list[tuple[str, str]]


class _U64Builder:
    """Emits (column_name, sql_expr) steps computing the Cassandra
    murmur3 token of a fixed-width big-endian integer key."""

    def __init__(self, dialect: str):
        d = _DIALECTS[dialect]
        self.xor: Callable[[str, str], str] = d["xor"]
        self.shl: Callable[[str, int], str] = d["shl"]
        self.shr: Callable[[str, int], str] = d["shr"]
        self.steps: Steps = []
        self._n = 0

    def emit(self, name: str, expr: str) -> str:
        self.steps.append((name, expr))
        return name

    def fresh(self, tag: str) -> str:
        self._n += 1
        return f"_m3_{tag}{self._n}"

    # -- primitives on (hi, lo) limb pairs --------------------------------

    def mul_const(self, hi: str, lo: str, c: int) -> tuple[str, str]:
        """(hi,lo) * c mod 2^64 via 16-bit schoolbook columns."""
        b = [(c >> (16 * k)) & 0xFFFF for k in range(4)]
        a = [
            self.emit(self.fresh("a"), e)
            for e in (
                f"({lo} & 65535)",
                self.shr(lo, 16),
                f"({hi} & 65535)",
                self.shr(hi, 16),
            )
        ]
        cols = []
        for k in range(4):
            terms = [
                f"{a[i]} * {b[k - i]}" for i in range(k + 1) if b[k - i]
            ]
            cols.append(
                self.emit(self.fresh("c"), " + ".join(terms) or "0")
            )
        t0 = self.emit(self.fresh("t"), cols[0])
        t1 = self.emit(self.fresh("t"), f"{cols[1]} + {self.shr(t0, 16)}")
        t2 = self.emit(self.fresh("t"), f"{cols[2]} + {self.shr(t1, 16)}")
        t3 = self.emit(self.fresh("t"), f"{cols[3]} + {self.shr(t2, 16)}")
        lo2 = self.emit(
            self.fresh("lo"),
            f"({t0} & 65535) | {self.shl(f'({t1} & 65535)', 16)}",
        )
        hi2 = self.emit(
            self.fresh("hi"),
            f"({t2} & 65535) | {self.shl(f'({t3} & 65535)', 16)}",
        )
        return hi2, lo2

    def rotl(self, hi: str, lo: str, r: int) -> tuple[str, str]:
        if r >= 32:
            hi, lo, r = lo, hi, r - 32
        if r == 0:
            return hi, lo
        m = 0xFFFFFFFF
        hi2 = self.emit(
            self.fresh("hi"),
            f"({self.shl(hi, r)} | {self.shr(lo, 32 - r)}) & {m}",
        )
        lo2 = self.emit(
            self.fresh("lo"),
            f"({self.shl(lo, r)} | {self.shr(hi, 32 - r)}) & {m}",
        )
        return hi2, lo2

    def xor_shr(self, hi: str, lo: str, n: int) -> tuple[str, str]:
        """x ^= x >>> n (fmix step); n in (32, 64)."""
        assert 32 < n < 64
        shifted_lo = self.shr(hi, n - 32)  # hi >> (n-32); shifted hi = 0
        hi2 = hi  # unchanged: x >>> n has zero high limb
        lo2 = self.emit(self.fresh("lo"), self.xor(lo, shifted_lo))
        return hi2, lo2

    def add(
        self, hi_a: str, lo_a: str, hi_b: str, lo_b: str
    ) -> tuple[str, str]:
        t = self.emit(self.fresh("t"), f"{lo_a} + {lo_b}")
        lo2 = self.emit(self.fresh("lo"), f"{t} & 4294967295")
        hi2 = self.emit(
            self.fresh("hi"),
            f"({hi_a} + {hi_b} + {self.shr(t, 32)}) & 4294967295",
        )
        return hi2, lo2

    def add_const(self, hi: str, lo: str, c: int) -> tuple[str, str]:
        chi, clo = (c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF
        t = self.emit(self.fresh("t"), f"{lo} + {clo}")
        lo2 = self.emit(self.fresh("lo"), f"{t} & 4294967295")
        hi2 = self.emit(
            self.fresh("hi"),
            f"({hi} + {chi} + {self.shr(t, 32)}) & 4294967295",
        )
        return hi2, lo2

    def xor_const(self, hi: str, lo: str, c: int) -> tuple[str, str]:
        chi, clo = (c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF
        hi2 = self.emit(self.fresh("hi"), self.xor(hi, str(chi))) if chi else hi
        lo2 = self.emit(self.fresh("lo"), self.xor(lo, str(clo))) if clo else lo
        return hi2, lo2

    def fmix(self, hi: str, lo: str) -> tuple[str, str]:
        hi, lo = self.xor_shr(hi, lo, 33)
        hi, lo = self.mul_const(hi, lo, _FM1)
        hi, lo = self.xor_shr(hi, lo, 33)
        hi, lo = self.mul_const(hi, lo, _FM2)
        hi, lo = self.xor_shr(hi, lo, 33)
        return hi, lo


def token_steps(
    x_expr: str, dialect: str, key_bytes: int = 8, out: str = "m3_token"
) -> Steps:
    """(name, expr) steps computing the Cassandra token of a big-endian
    ``key_bytes``-wide integer key given by BIGINT expression ``x_expr``.

    Tail-only case of :func:`murmur3_hash` (4- and 8-byte keys never
    reach a 16-byte body block): k1 is the XOR of SIGN-EXTENDED key
    bytes at their little-endian positions — the Java quirk — then one
    (mul, rotl31, mul) mix, length/finalization adds and two fmixes.
    Also emits ``{out}_route16`` = (token >>> 48) + 32768, the numerator
    of Murmur3MessageRouter's partition choice."""
    b = _U64Builder(dialect)
    L = key_bytes
    # serialized big-endian bytes: byte_i = (x >> 8*(L-1-i)) & 0xff
    byte_names = [
        b.emit(b.fresh("b"), f"({b.shr(f'({x_expr})', 8 * (L - 1 - i))} & 255)")
        for i in range(L)
    ]
    # k1 = XOR_i sign_extended(byte_i) << 8i   (within 64 bits)
    lo_terms, hi_terms = [], []
    for i, bn in enumerate(byte_names):
        neg = f"(CASE WHEN {bn} >= 128 THEN 1 ELSE 0 END)"
        if 8 * i < 32:
            ext_lo = (0xFFFFFFFF >> (8 * i + 8) << (8 * i + 8)) if 8 * i + 8 < 32 else 0
            shifted = b.shl(bn, 8 * i) if i else bn
            lo_terms.append(
                f"({shifted} | ({neg} * {ext_lo}))" if ext_lo else shifted
            )
            hi_terms.append(f"({neg} * 4294967295)")
        else:
            sh = 8 * i - 32
            ext_hi = (0xFFFFFFFF >> (sh + 8) << (sh + 8)) if sh + 8 < 32 else 0
            shifted = b.shl(bn, sh) if sh else bn
            hi_terms.append(
                f"({shifted} | ({neg} * {ext_hi}))" if ext_hi else shifted
            )
    from functools import reduce

    k1_lo = b.emit(b.fresh("lo"), reduce(b.xor, lo_terms))
    k1_hi = b.emit(b.fresh("hi"), reduce(b.xor, hi_terms))
    # k1 *= C1; k1 = rotl(k1,31); k1 *= C2; h1 ^= k1  (h1 was 0)
    k1_hi, k1_lo = b.mul_const(k1_hi, k1_lo, _C1)
    k1_hi, k1_lo = b.rotl(k1_hi, k1_lo, 31)
    h1_hi, h1_lo = b.mul_const(k1_hi, k1_lo, _C2)
    # h1 ^= len; h2 = 0 ^ len = len
    h1_hi, h1_lo = b.xor_const(h1_hi, h1_lo, L)
    h2_hi = b.emit(b.fresh("hi"), "0")
    h2_lo = b.emit(b.fresh("lo"), str(L))
    # h1 += h2; h2 += h1
    h1_hi, h1_lo = b.add(h1_hi, h1_lo, h2_hi, h2_lo)
    h2_hi, h2_lo = b.add(h2_hi, h2_lo, h1_hi, h1_lo)
    h1_hi, h1_lo = b.fmix(h1_hi, h1_lo)
    h2_hi, h2_lo = b.fmix(h2_hi, h2_lo)
    h1_hi, h1_lo = b.add(h1_hi, h1_lo, h2_hi, h2_lo)
    # signed token with Long.MIN -> Long.MAX normalization
    signed = (
        f"CASE WHEN {h1_hi} >= 2147483648 THEN "
        f"({h1_hi} - 4294967296) * 4294967296 + {h1_lo} "
        f"ELSE {h1_hi} * 4294967296 + {h1_lo} END"
    )
    b.emit(
        out,
        f"CAST(CASE WHEN ({signed}) = -9223372036854775808 "
        f"THEN 9223372036854775807 ELSE ({signed}) END AS BIGINT)",
    )
    # router numerator on the NORMALIZED token: token >>> 48 + 32768.
    # Arithmetic shift + mask == unsigned shift in both engines (DuckDB
    # >> on negative BIGINT is arithmetic; Spark shiftright likewise).
    b.emit(f"{out}_route16", f"({b.shr(out, 48)} & 65535) + 32768")
    return b.steps


def attach_token_columns(df, x_expr: str, key_bytes: int = 8, out: str = "m3_token"):
    """Append the token limb program to a Spark DataFrame — pure
    Catalyst expressions (whole-stage codegen, no Python)."""
    from pyspark.sql import functions as F

    steps = token_steps(x_expr, "spark", key_bytes, out)
    internal = [n for n, _ in steps if n.startswith("_m3_")]
    for name, expr in steps:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(*internal)


def murmur3_token_pandas():
    """Arrow-batched pandas UDF: Cassandra token of an arbitrary BINARY
    key (text / composite PKs — anything :func:`token_steps` doesn't
    cover). Per-row Python inside the batch, so this is the SLOW path:
    use :func:`attach_token_columns` for fixed-width integer keys."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _tok(keys: pd.Series) -> pd.Series:
        return keys.map(lambda b: token(bytes(b)))

    return _tok


def token_sql(
    inner_sql: str, x_expr: str, key_bytes: int = 8, out: str = "m3_token"
) -> str:
    """DuckDB: wrap ``inner_sql`` in the token limb program, returning a
    query exposing the inner columns plus ``{out}`` / ``{out}_route16``."""
    steps = token_steps(x_expr, "duckdb", key_bytes, out)
    sql = f"({inner_sql})"
    for name, expr in steps:
        sql = f"(SELECT *, {expr} AS {name} FROM {sql})"
    internal = ", ".join(n for n, _ in steps if n.startswith("_m3_"))
    return f"SELECT * EXCLUDE ({internal}) FROM {sql}"
