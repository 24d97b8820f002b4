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


PARTITION_DELETE_PTYPE = "PARTITION_KEY_ROW_DELETION"


def compound_reduce(
    events: DataFrame,
    part_col: str = "pk_p",
    cluster_col: str = "pk_c",
    static_col: str = "s_mktsegment",
) -> DataFrame:
    """Reduce a compound-PK mutation set to its retained state — the
    merge step of partition-tombstone-aware materialization:

    - latest ROW event per (partition, clustering) key — DELETE winners
      retained (row tombstones);
    - latest PARTITION-RANGE tombstone per partition (dominates older
      rows at READ time, kept so later batches can't resurrect);
    - latest STATIC event per partition (statics converge independently,
      ConverterAndQuery.getProjectionClause / SURVEY P7).

    Idempotent and merge-associative (argmax per group), so ANY batching
    of the same events reduces to the same state — the property
    merge_into needs. Ties beyond writetime break on (op, cluster key)
    for cross-engine determinism."""
    w_row = Window.partitionBy(part_col, cluster_col).orderBy(
        F.col("writetime").desc(), F.col("op").desc()
    )
    rows = (
        events.filter(F.col(cluster_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w_row))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_part = Window.partitionBy(part_col).orderBy(
        F.col("writetime").desc(), F.col("op").desc()
    )
    pdel = (
        events.filter(F.col("ptype") == PARTITION_DELETE_PTYPE)
        .withColumn("_rn", F.row_number().over(w_part))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    statics = (
        events.filter(F.col(static_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w_part))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return rows.unionByName(pdel).unionByName(statics).distinct()


def compound_active_view(
    state: DataFrame,
    part_col: str = "pk_p",
    cluster_col: str = "pk_c",
    static_col: str = "s_mktsegment",
) -> DataFrame:
    """Queryable table over a compound_reduce state: a row is live iff
    its latest event isn't a DELETE and is newer than its partition's
    range tombstone; the static column attaches when IT outlives the
    tombstone (same dominance rules as the cdc_compound_lww_state
    oracle)."""
    pdel = (
        state.filter(F.col("ptype") == PARTITION_DELETE_PTYPE)
        .groupBy(part_col)
        .agg(F.max("writetime").alias("_wt_pd"))
    )
    w_part = Window.partitionBy(part_col).orderBy(F.col("writetime").desc())
    statics = (
        state.filter(F.col(static_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w_part))
        .filter(F.col("_rn") == 1)
        .select(
            part_col,
            F.col(static_col).alias("_static"),
            F.col("writetime").alias("_wt_s"),
        )
    )
    # the statics branch of compound_reduce may retain an OLDER row event
    # (it was the partition's static-latest) — re-rank per key so only the
    # true row winner reaches the dominance filter
    w_row = Window.partitionBy(part_col, cluster_col).orderBy(
        F.col("writetime").desc(), F.col("op").desc()
    )
    rows = (
        state.filter(F.col(cluster_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w_row))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    alive = (
        rows.join(pdel, part_col, "left")
        .join(statics, part_col, "left")
        .filter(
            (F.col("op") != "DELETE")
            & (F.col("writetime") > F.coalesce(F.col("_wt_pd"), F.lit(-1)))
        )
    )
    return alive.withColumn(
        static_col,
        F.when(
            F.col("_wt_s") > F.coalesce(F.col("_wt_pd"), F.lit(-1)),
            F.col("_static"),
        ),
    ).drop("_wt_pd", "_wt_s", "_static")
