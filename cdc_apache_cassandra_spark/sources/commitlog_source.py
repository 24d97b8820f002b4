"""Custom Spark streaming source for CDC commitlog segments — the
BASELINE.json approach ("Structured Streaming + custom source for CDC
events") built on the PySpark 4 Python DataSource API.

Models the agent's source machinery (SURVEY §2.1) as a first-class Spark
source instead of a generic file stream:

- S1 directory watcher: ``latestOffset`` lists the segment directory.
- S2 segment replay: each micro-batch gets one InputPartition per NEW
  segment; ``read`` replays that segment's mutations.
- S3/O3 offset resume: the offset is the count of segments consumed in
  ascending segment order — JSON-serializable, checkpoint-managed by
  Structured Streaming (the reference's ``<segment>_offset.dat`` files).
- O1 segment-order sort: segments are processed in ascending segment-id
  order (zero-padded file names), like the reference's
  PriorityBlockingQueue ordered by segment id
  (agent/.../CommitLogUtil.java:64-76).

Segments are parquet files named ``segment-<id>.parquet`` (append-only,
ids ascending — the commitlog contract). ``write_segments`` produces them
from any mutation-event DataFrame.

Scale: one InputPartition per segment ⇒ segment replay parallelism equals
new-segment count (the reference got one task per segment too,
CommitLogReaderService.java:198-212); reads are Arrow-native pyarrow
scans. The batch reader exposes the SAME directory for backfill —
one source, two run modes (§7.1).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: event schema carried by segments (single-PK customer stream layout —
#: matches sources.event_source.mutation_events)
EVENT_SCHEMA = (
    "op string, pk bigint, writetime bigint, c_name string, "
    "c_nationkey int, c_acctbal double, c_mktsegment string, "
    "node_id bigint, digest string, segment bigint, position bigint"
)

_COLUMNS = [
    "op", "pk", "writetime", "c_name", "c_nationkey", "c_acctbal",
    "c_mktsegment", "node_id", "digest", "segment", "position",
]


def _list_segments(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "segment-*.parquet")))


class _SegmentPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


def _read_segment(file: str):
    import pyarrow.parquet as pq

    table = pq.read_table(file, columns=_COLUMNS)
    for batch in table.to_batches():
        cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
        yield from zip(*cols)


class CommitLogStreamReader(DataSourceStreamReader):
    """Offset = {"n": segments consumed}; a batch covers segments
    [start.n, end.n) in ascending id order."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_commitlog requires option 'path'")

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(_list_segments(self.path))}

    def partitions(self, start: dict, end: dict):
        files = _list_segments(self.path)[start["n"] : end["n"]]
        return [_SegmentPartition(f) for f in files] or [
            _SegmentPartition("")  # empty batch placeholder
        ]

    def read(self, partition: _SegmentPartition):
        if not partition.file:
            return iter(())
        return _read_segment(partition.file)

    def commit(self, end: dict) -> None:
        # segments are immutable; nothing to GC here (the reference's
        # archive/delete transfer is the cleanSource analogue)
        pass

    def stop(self) -> None:
        pass


class CommitLogBatchReader(DataSourceReader):
    """Backfill twin: the whole directory as one batch relation."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_commitlog requires option 'path'")

    def partitions(self):
        return [_SegmentPartition(f) for f in _list_segments(self.path)]

    def read(self, partition: _SegmentPartition):
        return _read_segment(partition.file)


class CommitLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_commitlog"

    def schema(self) -> str:
        return EVENT_SCHEMA

    def streamReader(self, schema) -> CommitLogStreamReader:
        return CommitLogStreamReader(self.options)

    def reader(self, schema) -> CommitLogBatchReader:
        return CommitLogBatchReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(CommitLogDataSource)


def write_segments(events_df, path: str, n_segments: int = 4) -> list[str]:
    """Lay a mutation-event DataFrame down as ascending commitlog
    segments (segment id = the event's segment column % n_segments so
    replay order interleaves keys like a real commitlog)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    pdf = events_df.select(*_COLUMNS).toPandas()
    seg_of = pdf["segment"] % n_segments
    out = []
    for sid in range(n_segments):
        part = pdf[seg_of == sid]
        f = os.path.join(path, f"segment-{sid:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), f)
        out.append(f)
    return out
