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
