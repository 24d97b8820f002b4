"""Scalar conversion functions F1-F15 (SURVEY §2.8) — the reference's
"expression library", as Catalyst column expressions wherever possible.

Reference encodings (golden values in FIXTURES F-6 / DataSpec.java:77-115):
timestamp->epoch ms, date->epoch days (Cassandra stores an unsigned int
centered at 2^31), time->µs of day, tinyint/smallint->unsigned-widened int,
duration->{months,days,nanoseconds}, blob->Base64 in JSON, float widened to
double in JSON.

Only the varint/decimal byte round-trips (F6/F7) need Python — they are
schema-boundary codecs, never in a per-row hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

CASSANDRA_DATE_CENTER = 2**31  # PulsarMutationSender.java:141-146


# --- F1: timestamp -> epoch millis ----------------------------------------

def timestamp_to_epoch_millis(col: Column) -> Column:
    return F.unix_millis(col)


# --- F2: Cassandra raw date (unsigned int centered 2^31) <-> DateType ------

def cassandra_raw_date_to_date(raw: Column) -> Column:
    """raw uint32 (0 = -2^31 days, 2^31 = epoch) -> DateType."""
    return F.date_add(F.lit("1970-01-01").cast("date"), (raw - F.lit(CASSANDRA_DATE_CENTER)).cast("int"))


def date_to_epoch_days(col: Column) -> Column:
    return F.datediff(col, F.lit("1970-01-01").cast("date"))


def date_to_cassandra_raw(col: Column) -> Column:
    return (date_to_epoch_days(col) + F.lit(CASSANDRA_DATE_CENTER)).cast("bigint")


# --- F3: time -> µs of day -------------------------------------------------

def time_string_to_micros(col: Column) -> Column:
    """'HH:mm:ss[.SSSSSS]' -> µs since midnight (nanoOfDay/1000)."""
    ts = F.to_timestamp(F.concat(F.lit("1970-01-01 "), col))
    return F.unix_micros(ts)


# --- F5: unsigned widen ----------------------------------------------------

def tinyint_to_unsigned_int(col: Column) -> Column:
    """Byte.toUnsignedInt: -1 -> 255 (Avro-boundary widening)."""
    return F.pmod(col.cast("int"), F.lit(256)).cast("int")


def smallint_to_unsigned_int(col: Column) -> Column:
    return F.pmod(col.cast("int"), F.lit(65536)).cast("int")


# --- F6/F7: varint / decimal byte codecs (Pandas UDF, boundary only) -------

# pandas_udf construction requires an active SparkSession, so build lazily.
_UDF_CACHE: dict[str, object] = {}


def _varint_decode_fn(b: pd.Series) -> pd.Series:
    from decimal import Decimal

    return b.map(
        lambda x: None
        if x is None
        else Decimal(int.from_bytes(bytes(x), "big", signed=True))
    )


def _varint_encode_fn(d: pd.Series) -> pd.Series:
    def enc(x):
        if x is None:
            return None
        n = int(x)
        length = max(1, (n.bit_length() + 8) // 8)
        return n.to_bytes(length, "big", signed=True)

    return d.map(enc)


def varint_bytes_to_decimal(col: Column) -> Column:
    """Two's-complement big-endian bytes -> integer decimal
    (CqlLogicalTypes.java:109-131)."""
    if "dec" not in _UDF_CACHE:
        _UDF_CACHE["dec"] = F.pandas_udf(_varint_decode_fn, "decimal(38,0)")
    return _UDF_CACHE["dec"](col)


def decimal_to_varint_bytes(col: Column) -> Column:
    if "enc" not in _UDF_CACHE:
        _UDF_CACHE["enc"] = F.pandas_udf(_varint_encode_fn, "binary")
    return _UDF_CACHE["enc"](col)


def decimal_to_record(col: Column, scale: int = 18) -> Column:
    """F7: DecimalType -> record{bigint: bytes, scale: int}
    (CqlLogicalTypes.java:133-160)."""
    unscaled = (col * F.lit(10**scale).cast("decimal(38,0)")).cast("decimal(38,0)")
    return F.struct(
        decimal_to_varint_bytes(unscaled).alias("bigint"),
        F.lit(scale).alias("scale"),
    )


# --- F8: duration struct ---------------------------------------------------

def make_duration(months: Column, days: Column, nanoseconds: Column) -> Column:
    return F.struct(
        months.cast("int").alias("months"),
        days.cast("int").alias("days"),
        nanoseconds.cast("bigint").alias("nanoseconds"),
    )


# --- F10: map-key stringify ------------------------------------------------

def stringify_map_keys(col: Column) -> Column:
    return F.transform_keys(col, lambda k, _: k.cast("string"))


# --- F11: collection element marshalling (timestamps in collections) -------

def marshal_timestamp_array(col: Column) -> Column:
    """list/set<timestamp> -> array<bigint epoch-millis>
    (AbstractNativeConverter.java:305-332)."""
    return F.transform(col, F.unix_millis)


def marshal_timestamp_map_values(col: Column) -> Column:
    return F.transform_values(col, lambda _, v: F.unix_millis(v))


# --- F13: JSON rendering ---------------------------------------------------

def row_to_json(*cols: Column) -> Column:
    """Jackson-equivalent row JSON. Spark's to_json already renders binary
    as Base64 and floats as doubles — the two DataSpec JSON deltas."""
    return F.to_json(F.struct(*cols))
