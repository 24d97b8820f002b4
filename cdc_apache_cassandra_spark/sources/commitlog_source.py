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

Schema is DYNAMIC, like the reference's — the connector derives key/value
schemas from live table metadata and rebuilds them on DDL
(CassandraSource.java:346-366,666-698). Three resolution modes, by option:

- ``tableDescriptor``: JSON list of ``{name, cql_type, kind}`` column
  descriptors (kind ∈ partition_key|clustering|static|regular). The event
  schema is DERIVED through functions/cql_types.py::key_value_schemas —
  the same §1.2 type table the rest of the engine uses — and wrapped in
  the mutation envelope (op, ptype, key…, writetime, value…, node_id,
  digest, segment, position).
- ``schema``: an explicit Spark DDL string.
- neither: the single-PK customer stream layout (EVENT_SCHEMA), matching
  sources.event_source.mutation_events.

Segments are parquet files named ``segment-<id>.parquet`` (append-only,
ids ascending — the commitlog contract). ``write_segments`` produces them
from any mutation-event DataFrame.

Scale: one InputPartition per segment ⇒ segment replay parallelism equals
new-segment count (the reference got one task per segment too,
CommitLogReaderService.java:198-212). ``read`` yields
``pyarrow.RecordBatch`` objects — the scan stays Arrow-vectorized across
the Python↔JVM boundary instead of materializing per-row tuples. The
batch reader exposes the SAME directory for backfill — one source, two
run modes (§7.1).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from cdc_apache_cassandra_spark.functions.cql_types import (
    CqlColumn,
    key_value_schemas,
)

#: default event schema (single-PK customer stream layout — matches
#: sources.event_source.mutation_events)
EVENT_SCHEMA = (
    "op string, pk bigint, writetime bigint, c_name string, "
    "c_nationkey int, c_acctbal double, c_mktsegment string, "
    "node_id bigint, digest string, segment bigint, position bigint"
)

#: mutation envelope around the table-derived key/value columns
#: (AbstractMutation.java:32-50 + Constants.java:18-33 properties)
_ENVELOPE_HEAD = [
    T.StructField("op", T.StringType(), False),
    T.StructField("ptype", T.StringType(), True),
]
_ENVELOPE_TAIL = [
    T.StructField("node_id", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("segment", T.LongType(), True),
    T.StructField("position", T.LongType(), True),
]


def schema_from_descriptor(descriptor: str | list) -> T.StructType:
    """Derive the mutation-event schema for a table descriptor — the
    engine's analogue of the reference's metadata-driven schema build
    (CassandraSource.java:346-366): key columns keep PK nullability
    rules, value columns are nullable (deletes carry null values)."""
    cols = descriptor
    if isinstance(cols, str):
        cols = json.loads(cols)
    cql_cols = [
        CqlColumn(c["name"], c["cql_type"], c.get("kind", "regular"))
        for c in cols
    ]
    key_schema, value_schema = key_value_schemas(cql_cols)
    value_names = {f.name for f in key_schema.fields}
    fields = list(_ENVELOPE_HEAD) + list(key_schema.fields)
    fields.append(T.StructField("writetime", T.LongType(), True))
    for f in value_schema.fields:
        if f.name not in value_names:  # PK-only tables repeat key cols
            fields.append(T.StructField(f.name, f.dataType, True))
    fields += _ENVELOPE_TAIL
    return T.StructType(fields)


def _declared_schema(options) -> T.StructType | str:
    """Descriptor mode yields a StructType (built session-free); DDL mode
    returns the string — Spark resolves it and hands the final StructType
    to the readers."""
    descriptor = options.get("tabledescriptor") or options.get("tableDescriptor")
    if descriptor:
        return schema_from_descriptor(descriptor)
    return options.get("schema") or EVENT_SCHEMA


def _list_segments(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "segment-*.parquet")))


class _SegmentPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


def _read_segment(file: str, schema: T.StructType):
    """Arrow-vectorized segment replay: RecordBatches cross the boundary
    whole (no per-row Python tuples). The parquet file is cast to the
    source's arrow schema so field order/width always match the plan.

    BACKWARD-compatible read (CassandraSource.java:666-698 rebuild-on-DDL
    semantics): a segment written before an ALTER TABLE ADD lacks the new
    column — those fields surface as nulls, exactly like the reference
    re-reading an old row under the evolved schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    pf = pq.ParquetFile(file)
    present = set(pf.schema_arrow.names)
    wanted = [f.name for f in schema.fields]
    table = pq.read_table(file, columns=[c for c in wanted if c in present])
    for field in arrow_schema:
        if field.name not in present:
            table = table.append_column(
                field.name, pa.nulls(table.num_rows, type=field.type)
            )
    table = table.select(wanted).cast(arrow_schema)
    yield from table.to_batches()


class CommitLogStreamReader(DataSourceStreamReader):
    """Offset = {"n": segments consumed}; a batch covers segments
    [start.n, end.n) in ascending id order."""

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        self.schema = schema
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
        return _read_segment(partition.file, self.schema)

    def commit(self, end: dict) -> None:
        # segments are immutable; nothing to GC here (the reference's
        # archive/delete transfer is the cleanSource analogue)
        pass

    def stop(self) -> None:
        pass


class CommitLogBatchReader(DataSourceReader):
    """Backfill twin: the whole directory as one batch relation."""

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        self.schema = schema
        if not self.path:
            raise ValueError("cdc_commitlog requires option 'path'")

    def partitions(self):
        return [_SegmentPartition(f) for f in _list_segments(self.path)]

    def read(self, partition: _SegmentPartition):
        return _read_segment(partition.file, self.schema)


class CommitLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_commitlog"

    def schema(self):
        return _declared_schema(self.options)

    def streamReader(self, schema) -> CommitLogStreamReader:
        return CommitLogStreamReader(self.options, schema)

    def reader(self, schema) -> CommitLogBatchReader:
        return CommitLogBatchReader(self.options, schema)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(CommitLogDataSource)


def write_segments(events_df, path: str, n_segments: int = 4) -> list[str]:
    """Lay a mutation-event DataFrame down as ascending commitlog
    segments (segment id = the event's segment column % n_segments so
    replay order interleaves keys like a real commitlog). Test fixture:
    driver-side pandas is fine at fixture scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    os.makedirs(path, exist_ok=True)
    arrow_schema = to_arrow_schema(events_df.schema)
    pdf = events_df.toPandas()
    seg_of = pdf["segment"] % n_segments
    out = []
    for sid in range(n_segments):
        part = pdf[seg_of == sid]
        f = os.path.join(path, f"segment-{sid:05d}.parquet")
        tbl = pa.Table.from_pandas(part, preserve_index=False).cast(arrow_schema)
        pq.write_table(tbl, f)
        out.append(f)
    return out
