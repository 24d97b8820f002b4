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


def compound_reduce_bucketed(
    events: DataFrame,
    part_col: str = "pk_p",
    cluster_col: str = "pk_c",
    static_col: str = "s_mktsegment",
    bucket_col: str = "__bucket",
) -> DataFrame:
    """:func:`compound_reduce` as a SINGLE-EXCHANGE plan for
    ``merge_into(reducer_bucketed=True)`` — input pre-partitioned by
    ``bucket_col`` (a deterministic function of ``part_col``), output
    value-identical to ``compound_reduce``.

    Why a second form (guide §2.4): the three-branch union shape costs
    an exchange per window branch plus one more for the closing
    ``distinct`` (UnionExec forgets its children's partitioning, so the
    distinct re-shuffles by every column), and merge_into then pays a
    final repartition to restore the one-file-per-bucket layout — five
    shuffles of the full bucket payload per commit. Here each branch
    becomes a row_number over a window whose partition spec PREFIXES
    ``bucket_col`` and APPENDS the branch's filter as a partition
    expression — rank-within-(part, branch-subset), exactly what
    filter-then-rank computed, evaluated without an exchange because
    hash(bucket) already clusters every spec. A row is retained iff it
    wins at least one branch; the closing dropDuplicates over all
    columns reproduces ``distinct``'s collapse of identical winners
    (redelivered events make old ∪ batch carry exact duplicate rows)
    and stays exchange-free for the same clustering reason. Windows
    preserve the input partitioning, so each bucket still lands in
    exactly ONE write task — the staging invariant delta_export checks.

    Equivalence argument, branch by branch: rows — ranking ALL rows per
    (part, cluster) gives cluster-null rows their own groups, and every
    non-null group contains exactly the rows the filtered form ranked;
    pdel/statics — appending ``ptype = PDEL`` / ``static IS NOT NULL``
    to the partition spec makes the TRUE subgroup exactly the filtered
    branch's group, and the FALSE subgroup is dropped by the retention
    predicate. Pinned value-equal to compound_reduce by
    tests/test_compound_reduce_bucketed.py and the three compound
    oracle gates."""
    pdel_pred = F.col("ptype") == PARTITION_DELETE_PTYPE
    static_pred = F.col(static_col).isNotNull()
    order = [F.col("writetime").desc(), F.col("op").desc()]
    w_row = Window.partitionBy(bucket_col, part_col, cluster_col).orderBy(*order)
    w_pd = Window.partitionBy(bucket_col, part_col, pdel_pred).orderBy(*order)
    w_st = Window.partitionBy(bucket_col, part_col, static_pred).orderBy(*order)
    flagged = (
        events.withColumn("_rnr", F.row_number().over(w_row))
        .withColumn("_rnp", F.row_number().over(w_pd))
        .withColumn("_rns", F.row_number().over(w_st))
    )
    keep = (
        (F.col(cluster_col).isNotNull() & (F.col("_rnr") == 1))
        | (pdel_pred & (F.col("_rnp") == 1))
        | (static_pred & (F.col("_rns") == 1))
    )
    out = flagged.filter(keep).drop("_rnr", "_rnp", "_rns")
    return out.dropDuplicates(out.columns)


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
