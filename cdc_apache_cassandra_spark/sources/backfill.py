"""Batch backfill — table snapshot re-emitted as synthetic mutations
(SURVEY S8/S9/T2).

Reference: backfill-cli exports the table's PK columns with dsbulk and
re-injects each row through the live agent sender with digest
``BACK_FILL_INSERT``, segment -1, writetime -1
(backfill-cli/.../PulsarImporter.java:80-102,124-230). Because the digest is
constant and the writetime is minimal, live events always win last-write-wins
and re-runs are idempotent under dedup.

Spark mapping: a batch ``select`` over the snapshot unioned (``unionByName``)
into the event stream — batch and stream share one logical plan (SURVEY §7.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BACKFILL_DIGEST = "BACK_FILL_INSERT"


def backfill_mutations(
    snapshot: DataFrame, pk_col: str, value_cols: list[str]
) -> DataFrame:
    """Snapshot rows -> synthetic INSERT mutations (reference sentinel values)."""
    return snapshot.select(
        F.lit("INSERT").alias("op"),
        F.col(pk_col).alias("pk"),
        F.lit(-1).cast("bigint").alias("writetime"),
        *[F.col(c) for c in value_cols],
        F.lit(BACKFILL_DIGEST).alias("digest"),
        F.lit(-1).cast("bigint").alias("segment"),
        F.lit(-1).cast("bigint").alias("position"),
    )


def export_pk_csv(snapshot: DataFrame, pk_col: str, path: str) -> None:
    """S8, dsbulk-unload equivalent: export the table's PK column(s) to CSV
    (TableExporter.buildExportQuery — `SELECT pk1,…,pkN FROM ks.t`).
    Distributed write, one file per partition."""
    snapshot.select(pk_col).write.mode("overwrite").option("header", True).csv(path)


def token_range_splits(n_splits: int) -> list[tuple[int, int]]:
    """Contiguous [lo, hi) ranges covering the full Murmur3Partitioner
    ring [-2^63, 2^63), the way dsbulk/backfill-cli parallelize a table
    export (each worker scans one token range; TableExporter builds
    `WHERE token(pk) > ? AND token(pk) <= ?` slices). Boundaries are
    exact integers — no float ring arithmetic."""
    ring = 1 << 64
    lo = -(1 << 63)
    bounds = [lo + (i * ring) // n_splits for i in range(n_splits + 1)]
    return [(bounds[i], bounds[i + 1]) for i in range(n_splits)]


def _split_shift(n_splits: int) -> int:
    k = n_splits.bit_length() - 1
    if 1 << k != n_splits:
        raise ValueError(
            f"n_splits must be a power of two, got {n_splits}: the "
            "assignment is then ONE arithmetic shift — a CASE chain over "
            "boundaries would reference the (large) token expression "
            "once per split and blow up plan optimization"
        )
    return 64 - k


def split_id_expr(token_col: str, n_splits: int):
    """Token -> range index, exactly: arithmetic shift keeps the sign
    (ring lower half -> negative), ``+ n/2`` rebases to [0, n). A single
    reference to the token column, so the (large) Catalyst token
    expression is never duplicated."""
    shift = _split_shift(n_splits)
    return (
        F.shiftright(F.col(token_col), shift) + F.lit(n_splits // 2)
    ).cast("int")


def split_id_sql(token_col: str, n_splits: int) -> str:
    """DuckDB twin — ``>>`` on BIGINT is the same arithmetic shift."""
    shift = _split_shift(n_splits)
    return f"CAST(({token_col} >> {shift}) + {n_splits // 2} AS INT)"


def backfill_token_splits(
    snapshot: DataFrame, pk_col: str, n_splits: int = 8
) -> DataFrame:
    """Snapshot + (m3_token, split_id): the parallel-export partitioning.
    Writing with ``partitionBy('split_id')`` gives one independent,
    re-runnable export slice per token range — at 100 TB each slice is
    scanned and written by its own tasks, and a failed slice re-exports
    alone (the dsbulk resume property). Token is pure Catalyst
    (functions/murmur3.py), so no Python in the scan."""
    from cdc_apache_cassandra_spark.functions.murmur3 import (
        attach_token_columns,
    )

    tk = attach_token_columns(
        snapshot.withColumn("__pk_long", F.col(pk_col).cast("bigint")),
        "__pk_long",
        8,
    ).drop("__pk_long", "m3_token_route16")
    return tk.withColumn("split_id", split_id_expr("m3_token", n_splits))


def backfill_from_csv(
    spark, csv_path: str, snapshot: DataFrame, pk_col: str, value_cols: list[str]
) -> DataFrame:
    """S9, the CSV import leg: read exported PK rows (strings on disk, like
    dsbulk's CSV), cast back to the PK type (PulsarImporter.java:157-174
    string->CQL codec conversion), re-read the current row per PK from the
    snapshot, and emit synthetic mutations through the SAME
    backfill_mutations path the batch leg uses (T2 unification)."""
    pk_type = dict(snapshot.dtypes)[pk_col]
    keys = (
        spark.read.option("header", True).csv(csv_path)
        .select(F.col(pk_col).cast(pk_type).alias(pk_col))
    )
    rows = keys.join(snapshot, pk_col, "inner")
    return backfill_mutations(rows, pk_col, value_cols)
