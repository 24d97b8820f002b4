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


def token_sql(pk: str) -> str:
    return f"CAST(({pk} * {_KNUTH}) % {_MOD} AS BIGINT)"


def route_expr(token: Column, num_partitions: int) -> Column:
    return (token % F.lit(num_partitions)).cast("bigint")


def route_sql(token_sql_text: str, num_partitions: int) -> str:
    return f"CAST(({token_sql_text}) % {num_partitions} AS BIGINT)"
