"""Materialize the CDC stream into a queryable table — the data-topic ->
table leg the reference leaves to downstream sinks (ES/another C* via
Pulsar sinks). Spark mapping: ``foreachBatch`` upsert with last-write-wins
merge and tombstone deletion (SURVEY §7.4: 'null-value rows must survive
every sink' — here a DELETE winner removes the key, the parquet analogue
of Delta's ``whenMatchedDelete``).

Each micro-batch:
  state' = LWW( state ∪ batch )   — tombstones RETAINED in state

Tombstones must stay in the state table (with their writetime): micro-
batches replay files in arbitrary order, so an INSERT older than an
already-applied DELETE can arrive LATER — dropping the tombstone on merge
would let that stale insert resurrect the key. Queries read through
:func:`active_view`, which hides tombstones (Delta's `whenMatchedDelete`
has the same retention underneath via the transaction log). Compact
tombstones out only once the source's disorder horizon (watermark) has
passed them.

The state table is partition-pruned parquet; swap the read/overwrite pair
for a Delta/Iceberg MERGE on a cluster with a table format — the merge
logic (operators/lww.py) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_apache_cassandra_spark.operators.lww import last_write_wins


def merge_batch_lww(
    state: DataFrame | None, batch: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """Pure merge: union prior state with the new batch, keep the newest
    mutation per key. Tombstone winners are kept (see module doc)."""
    merged = batch if state is None else state.unionByName(batch)
    return last_write_wins(merged, pk_cols=pk_cols)


def active_view(state: DataFrame) -> DataFrame:
    """The queryable table: live rows only, tombstones hidden."""
    return state.filter("op <> 'DELETE'")


def foreach_batch_upsert(path: str, pk_cols: list[str]):
    """foreachBatch hook: read current state (if any), merge, overwrite.

    The read-modify-overwrite is atomic per micro-batch because
    foreachBatch serializes batches; retried batches are idempotent (the
    merge is deterministic and LWW absorbs replays — at-least-once safe).
    """

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            state = spark.read.parquet(path)
        except Exception:
            state = None
        out = merge_batch_lww(state, batch, pk_cols)
        # materialize BEFORE overwrite: the new state depends on the files
        # being replaced
        rows = out.collect()
        spark.createDataFrame(rows, out.schema).write.mode("overwrite").parquet(path)

    return apply


def materialize_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    pk_cols: list[str],
):
    """Wire a mutation-event stream into the materialized table."""
    return (
        events.writeStream.foreachBatch(foreach_batch_upsert(path, pk_cols))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
