"""Digest / token / routing expressions (SURVEY A3/F14/F15/T3).

Every hash here must be computable IDENTICALLY in DuckDB for the oracle
gate, so we avoid engine-specific hashes (Spark murmur3 `hash()`, DuckDB
`hash()`) in checked queries and build on md5 (both engines agree) plus
integer arithmetic.

- ``digest_expr``      md5 hex of a '|'-joined identity — the dedup key
                       (reference CommitLogReadHandlerImpl.java:235-238).
- ``token_expr``       64-bit-ish deterministic token from the pk via a
                       Knuth multiplicative hash — stands in for the
                       murmur3 partition token (Murmur3MessageRouter.java:25-28).
- ``route_expr``       token -> partition routing, mirroring
                       ``((token >>> 48) + 32768) % num_partitions``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth's 2^32 multiplicative constant; all arithmetic stays in BIGINT so
#: DuckDB and Spark agree bit-for-bit.
_KNUTH = 2654435761
_MOD = 2**31 - 1  # Mersenne prime keeps values positive and bounded


def digest_expr(*cols: str) -> Column:
    """md5 hex digest over '|'-joined columns (Spark side)."""
    return F.md5(F.concat_ws("|", *[F.col(c) for c in cols]))


def digest_sql(*cols: str) -> str:
    """The identical digest in DuckDB SQL."""
    joined = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"md5({joined})"


def token_expr(pk: str) -> Column:
    return ((F.col(pk) * F.lit(_KNUTH)) % F.lit(_MOD)).cast("bigint")


def wire_token_expr(schema, key_cols: list[str]) -> Column:
    """Token property for wire records, total over EVERY key shape
    (code-review r4: ``token_expr(key_cols[0])`` assumes one numeric
    column — a text partition key casts to null under non-ANSI Spark,
    silently shipping token=NULL on every record, and a composite key
    hashed only its first column). Single numeric key keeps the
    oracle-portable Knuth ring hash (bit-compatible with
    :func:`token_sql`); composite or non-numeric keys fold xxhash64
    over ALL key columns into the same [0, 2^31-1) ring."""
    from pyspark.sql import types as T

    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    if len(key_cols) == 1 and isinstance(
        schema[key_cols[0]].dataType, numeric
    ):
        return token_expr(key_cols[0])
    return F.pmod(F.xxhash64(*key_cols), F.lit(_MOD)).cast("bigint")


def token_sql(pk: str) -> str:
    return f"CAST(({pk} * {_KNUTH}) % {_MOD} AS BIGINT)"


def route_expr(token: Column, num_partitions: int) -> Column:
    return (token % F.lit(num_partitions)).cast("bigint")


def route_sql(token_sql_text: str, num_partitions: int) -> str:
    return f"CAST(({token_sql_text}) % {num_partitions} AS BIGINT)"


# --- portable HyperLogLog (m=64) --------------------------------------------
# Register math for the cross-engine-exact HLL sketch (see
# plans/analytics_extra_queries.py::stats_hll_portable_sketch for the
# DuckDB twin): 60-bit md5 hash, bucket = h % 64, rank = integer
# leading-zero count via binary-string length. MAX-mergeable registers
# make the sketch valid under any partitioning/micro-batching.

HLL_M = 64
#: alpha_64 * m^2 * 2^55 as double literals multiplied in a fixed order —
#: both engines fold these with identical IEEE semantics.
HLL_EST_NUMERATOR = "(0.709e0 * 4096.0e0 * 36028797018963968.0e0)"


def hll_lc_case(n_filled: str = "n_filled") -> str:
    """Linear-counting lookup m*ln(m/empty) for the small-range regime,
    as a CASE over the 63 possible fill counts with PRECOMPUTED double
    literals — no runtime ln(), so both engines parse the identical
    constant and the correction is bit-exact (the repo-wide rule: never
    evaluate transcendental functions in two engines)."""
    import math

    arms = " ".join(
        f"WHEN {n_filled} = {f} THEN {64.0 * math.log(64.0 / (64 - f))!r}e0"
        for f in range(1, HLL_M)
    )
    return f"CASE {arms} END"


def hll_estimate_sql(s_total: str, n_filled: str = "n_filled") -> str:
    """The corrected-estimate expression (identical text for Spark expr
    and DuckDB SQL apart from the engine-specific ``s_total`` spelling):
    raw harmonic estimate, switched to linear counting when raw <= 2.5m
    and empty registers remain (Flajolet et al. 2007 §4)."""
    raw = f"({HLL_EST_NUMERATOR} / CAST({s_total} AS DOUBLE))"
    return (
        f"CAST(ROUND(CASE WHEN {raw} <= 160.0e0 AND {n_filled} < {HLL_M} "
        f"THEN {hll_lc_case(n_filled)} ELSE {raw} END, 6) AS DOUBLE)"
    )


def hll_bucket_rho(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) register-update columns for one value. All integer:
    h is 15 md5 hex chars (60 bits, positive BIGINT); rho = leading
    zeros of the 54-bit remainder + 1 via ``length(bin(w))``."""
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = h % HLL_M
    # integer shift, NOT `(h - bucket) / HLL_M`: Spark evaluates `/` as
    # DOUBLE division, and for h >= 2^59 the 54-bit quotient rounds —
    # at bit-length boundaries rho then diverges from the oracle's exact
    # `h // 64` (e.g. h=(2^54-1)*64+7: double gives w=2^54 -> rho=0,
    # exact gives w=2^54-1 -> rho=1)
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    return bucket, rho


def hll_registers(df, group_cols: list[str], value_col: str):
    """Sketch registers per group: MAX(rho) per (group, bucket). Works
    identically as a batch aggregate or a streaming (complete/update
    mode) aggregate — MAX is the merge operator."""
    bucket, rho = hll_bucket_rho(F.col(value_col))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_finalize(regs, group_cols: list[str]):
    """Registers -> (n_filled, harmonic_scaled, hll_estimate_r). The
    harmonic sum is exact BIGINT: sum(2^(55-M)) + empties * 2^55 <= 2^61."""
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_filled"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))")
        ).alias("s_filled"),
    )
    s_total = (
        "CAST(s_filled + (64 - n_filled) * "
        "shiftleft(CAST(1 AS BIGINT), 55) AS BIGINT)"
    )
    return agg.select(
        *group_cols,
        "n_filled",
        F.expr(s_total).alias("harmonic_scaled"),
        F.expr(hll_estimate_sql(s_total)).alias("hll_estimate_r"),
    )
