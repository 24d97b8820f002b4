"""Read-after-event enrichment join (SURVEY J1/S6/P6/S7) — the correctness
heart of the reference pipeline.

Reference: for each deduped event the connector issues
``SELECT <projection> FROM ks.t WHERE pk=? LIMIT 1`` against Cassandra and
emits key + current-row value, null value when the row is gone (tombstone)
(connector/.../CassandraSource.java:534-565, CassandraClient.java:292-337).

Spark mapping: a LEFT OUTER equi-join of the event stream against the
current table snapshot on the primary key — Catalyst picks broadcast vs
sort-merge; in streaming mode the same call is a stream-static join where
the static side is re-read per micro-batch.

Tombstone semantics: a DELETE event yields (key, null value) regardless of
what the snapshot holds; a non-delete event whose key misses the snapshot
also yields a tombstone (row vanished between event and lookup — same
behavior as the reference's null read, CassandraSource.java:554).

Scale: the join shuffles both sides on pk unless the snapshot is broadcast;
for a 100 TB snapshot use bucketed storage on pk so the join co-locates
without a shuffle. The event side arrives pre-partitioned by key when the
source is a keyed topic (T3/T4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_after_event(
    events: DataFrame,
    snapshot: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    op_col: str = "op",
    broadcast_snapshot: bool = False,
) -> DataFrame:
    """events ⟕ snapshot on pk → (pk..., op, value struct | null tombstone).

    ``snapshot`` must expose ``pk_cols`` + ``value_cols``.
    Output columns: pk_cols, op, ``is_tombstone``, and each value column
    (null when tombstone).

    Row presence is detected by an explicit ``_snap_exists`` join marker,
    NOT by null-ness of a value column: a snapshot row whose leading value
    column is legitimately NULL is still a live row, matching the
    reference where tombstone means the whole row is absent
    (CassandraSource.java:554).

    PK-only tables (``value_cols == []``): the reference special-cases
    them by putting the PK columns IN the value
    (CassandraSource.java:346-350, testOnlyPk). Here that surfaces as
    output columns ``value_<pk>`` (null on tombstone); an event whose key
    exists in the snapshot is NOT a tombstone.
    """
    snap = snapshot.select(
        *pk_cols,
        F.lit(1).alias("_snap_exists"),
        *[F.col(c).alias(f"_snap_{c}") for c in value_cols],
    )
    if broadcast_snapshot:
        snap = F.broadcast(snap)

    joined = events.join(snap, on=pk_cols, how="left")
    found = F.col("_snap_exists").isNotNull()
    tombstone = (F.col(op_col) == "DELETE") | ~found

    out = joined.withColumn("is_tombstone", tombstone)
    if value_cols:
        out_value_cols = list(value_cols)
        for c in value_cols:
            out = out.withColumn(
                c,
                F.when(F.col("is_tombstone"), F.lit(None)).otherwise(
                    F.col(f"_snap_{c}")
                ),
            )
    else:
        # PK-only table: value carries the PK columns themselves.
        out_value_cols = [f"value_{c}" for c in pk_cols]
        for c in pk_cols:
            out = out.withColumn(
                f"value_{c}",
                F.when(F.col("is_tombstone"), F.lit(None)).otherwise(F.col(c)),
            )
    passthrough = [
        c
        for c in events.columns
        if c not in pk_cols and c != op_col
    ]
    return out.select(
        *pk_cols, op_col, *passthrough, "is_tombstone", *out_value_cols
    )


def read_after_event_compound(
    events: DataFrame,
    snapshot: DataFrame,
    partition_cols: list[str],
    clustering_cols: list[str],
    static_cols: list[str],
    regular_cols: list[str],
    op_col: str = "op",
    ptype_col: str = "ptype",
) -> DataFrame:
    """Compound-PK read-after-event with the reference's THREE lookup
    shapes (SURVEY §7.4 'partition events join on a PK prefix — second
    join branch + union, not a dynamic key list'):

    - row-level events (full PK bound): left join on partition+clustering
      keys; value = statics + regulars; DELETE or missing row → tombstone
      (ConverterAndQuery full projection).
    - partition-level modification (statics present): PREFIX join against
      the per-partition static row; value = STATIC COLUMNS ONLY (P7,
      ConverterAndQuery.getProjectionClause).
    - partition-level deletion: no lookup at all — tombstone with null
      clustering fields (P8, CassandraSource.java:534,540).

    Output: partition_cols, clustering_cols (null on partition events),
    op, ptype, is_tombstone, static_cols, regular_cols.
    """
    full_pk = partition_cols + clustering_cols
    passthrough = [
        c for c in events.columns
        if c not in full_pk and c not in (op_col, ptype_col)
    ]
    row_kinds = (
        "ROW_LEVEL_MODIFICATION",
        "PARTITION_AND_CLUSTERING_KEY_ROW_DELETION",
    )

    # branch 1: full-PK lookup — explicit presence marker so rows whose
    # leading value column is NULL are not mistaken for missing rows
    row_snap = snapshot.select(
        *full_pk,
        F.lit(1).alias("_s_exists"),
        *[F.col(c).alias(f"_s_{c}") for c in static_cols + regular_cols],
    )
    row_ev = events.filter(F.col(ptype_col).isin(*row_kinds)).join(
        row_snap, on=full_pk, how="left"
    )
    row_found = F.col("_s_exists").isNotNull()
    row_tomb = (F.col(op_col) == "DELETE") | ~row_found
    row_out = row_ev.select(
        *partition_cols,
        *clustering_cols,
        op_col,
        ptype_col,
        *passthrough,
        row_tomb.alias("is_tombstone"),
        *[
            F.when(row_tomb, F.lit(None)).otherwise(F.col(f"_s_{c}")).alias(c)
            for c in static_cols + regular_cols
        ],
    )

    # branch 2: PK-prefix lookup, static-only projection (one static row
    # per partition — max() collapses the per-row copies). The aggregated
    # count doubles as the presence marker: a prefix that matches NO
    # snapshot partition is an empty read → tombstone, exactly the
    # reference's null-row result (CassandraSource.java:554) — NOT a live
    # record with null statics.
    static_snap = snapshot.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("_s_cnt"),
        *[F.max(c).alias(f"_s_{c}") for c in static_cols],
    )
    stat_ev = events.filter(
        F.col(ptype_col) == "PARTITION_LEVEL_MODIFICATION"
    ).join(static_snap, on=partition_cols, how="left")
    stat_tomb = F.col("_s_cnt").isNull()
    stat_out = stat_ev.select(
        *partition_cols,
        *[F.lit(None).cast(dict(snapshot.dtypes)[c]).alias(c)
          for c in clustering_cols],
        op_col,
        ptype_col,
        *passthrough,
        stat_tomb.alias("is_tombstone"),
        *[
            F.when(stat_tomb, F.lit(None)).otherwise(F.col(f"_s_{c}")).alias(c)
            for c in static_cols
        ],
        *[F.lit(None).cast(dict(snapshot.dtypes)[c]).alias(c) for c in regular_cols],
    )

    # branch 3: partition delete — tombstone, no lookup
    del_ev = events.filter(F.col(ptype_col) == "PARTITION_KEY_ROW_DELETION")
    del_out = del_ev.select(
        *partition_cols,
        *[F.lit(None).cast(dict(snapshot.dtypes)[c]).alias(c)
          for c in clustering_cols],
        op_col,
        ptype_col,
        *passthrough,
        F.lit(True).alias("is_tombstone"),
        *[
            F.lit(None).cast(dict(snapshot.dtypes)[c]).alias(c)
            for c in static_cols + regular_cols
        ],
    )
    return row_out.unionByName(stat_out).unionByName(del_out)


def key_value_records(
    enriched: DataFrame, pk_cols: list[str], value_cols: list[str]
) -> DataFrame:
    """Project to the data-topic shape: key struct + nullable value struct
    (null = tombstone), mirroring the SEPARATED KeyValue encoding
    (CassandraSource.java:745-810)."""
    key = F.struct(*[F.col(c) for c in pk_cols]).alias("key")
    value = F.when(
        F.col("is_tombstone"), F.lit(None)
    ).otherwise(F.struct(*[F.col(c) for c in value_cols])).alias("value")
    return enriched.select(key, value)
