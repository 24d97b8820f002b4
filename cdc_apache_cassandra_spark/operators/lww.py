"""Last-write-wins materialization (SURVEY W3).

The reference converges under replica duplication + hint-handoff reordering
because (a) dedup suppresses identical digests and (b) each event re-reads
the CURRENT row from Cassandra, so the final data-topic record per key is
the newest state (testcontainers/.../PulsarDualNodeTests.java:222-320).

Without a live Cassandra, the engine materializes the same converged state
from the event stream itself: for each pk keep the event with the greatest
(writetime, segment, position) — the canonical mutation order the reference
uses for commitlog replay (agent/.../CommitLogUtil.java:64-76 for segment
order; writetime from the mutation itself).

Spark mapping: ranking window over the dedup output. One shuffle on pk;
the window sort is per-key (tiny). DELETE winning ⇒ tombstone row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ("writetime", "segment", "position")


def last_write_wins(deduped: DataFrame, pk_cols: list[str] | None = None) -> DataFrame:
    """One row per pk: the latest mutation by (writetime, segment, position)."""
    keys = pk_cols or ["pk"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in ORDER_COLS])
    return (
        deduped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_intervals(
    deduped: DataFrame, pk_cols: list[str] | None = None
) -> DataFrame:
    """SCD Type-2 view of a deduped mutation stream: every mutation
    becomes a version row with [valid_from, valid_to) from LEAD over the
    same (writetime, segment, position) total order LWW uses — so the
    open version per key is exactly the LWW winner. Null valid_to = the
    current version; DELETE versions mark the key dead for the interval.
    One shuffle on the key; LEAD is a bounded per-key window."""
    from pyspark.sql import Window

    keys = pk_cols or ["pk"]
    w = Window.partitionBy(*keys).orderBy("writetime", "segment", "position")
    out = deduped.withColumn(
        "valid_from", F.col("writetime")
    ).withColumn("valid_to", F.lead("writetime").over(w))
    return (
        out.withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("is_deleted", F.col("op") == "DELETE")
    )
