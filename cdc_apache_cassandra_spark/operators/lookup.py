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
    """
    snap = snapshot.select(
        *pk_cols, *[F.col(c).alias(f"_snap_{c}") for c in value_cols]
    )
    if broadcast_snapshot:
        snap = F.broadcast(snap)

    joined = events.join(snap, on=pk_cols, how="left")
    found = F.col(f"_snap_{value_cols[0]}").isNotNull() if value_cols else F.lit(False)
    tombstone = (F.col(op_col) == "DELETE") | ~found

    out = joined.withColumn("is_tombstone", tombstone)
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col("is_tombstone"), F.lit(None)).otherwise(F.col(f"_snap_{c}"))
        )
    passthrough = [c for c in events.columns if c not in pk_cols and c != op_col]
    return out.select(*pk_cols, op_col, *passthrough, "is_tombstone", *value_cols)


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
