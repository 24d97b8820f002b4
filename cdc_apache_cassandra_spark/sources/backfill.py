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
