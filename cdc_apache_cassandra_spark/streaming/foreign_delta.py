"""Hand-built FOREIGN Delta tables — fixture surface for interop tests
and oracle queries.

The engine's own exporter (delta_log.py) writes base-protocol tables
only; a migrating user's table was written by delta-spark and commonly
carries reader features (deletion vectors, column mapping) the exporter
never emits. To prove the READ side against those features without a
delta-spark jar in this environment, this module constructs minimal
spec-layout tables byte-by-byte from the public PROTOCOL.md: parquet
data files, JSON commits, DV files via
streaming/deletion_vectors.write_dv_file. It is NOT a writer API — no
optimistic concurrency, no checkpoints, no stats beyond what a fixture
needs; production writes go through delta_export/merge_into.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

LOG_DIR = "_delta_log"


def protocol_action(
    min_reader: int = 1,
    min_writer: int = 2,
    reader_features: list[str] | None = None,
    writer_features: list[str] | None = None,
) -> dict:
    proto: dict = {
        "minReaderVersion": min_reader,
        "minWriterVersion": min_writer,
    }
    if reader_features is not None:
        proto["readerFeatures"] = reader_features
    if writer_features is not None:
        proto["writerFeatures"] = writer_features
    return {"protocol": proto}


def metadata_action(
    schema_fields: list[dict],
    configuration: dict | None = None,
    partition_columns: list[str] | None = None,
) -> dict:
    """``schema_fields`` are Delta schemaString field dicts (name /
    type / nullable / metadata) — metadata is where
    ``delta.columnMapping.physicalName`` lives."""
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": schema_fields}
            ),
            "partitionColumns": partition_columns or [],
            "configuration": configuration or {},
            "createdTime": 1_700_000_000_000,
        }
    }


def field(
    name: str,
    dtype,
    nullable: bool = True,
    physical: str | None = None,
    fid: int | None = None,
) -> dict:
    md = {"delta.columnMapping.physicalName": physical} if physical else {}
    if physical:
        # delta-spark also assigns ids under mapping; readers in name
        # mode ignore them but real tables carry both (stable value —
        # fixtures must be deterministic across processes). ID-mode
        # fixtures pass ``fid`` explicitly so the schema id matches the
        # PARQUET:field_id stamped into the data files.
        md["delta.columnMapping.id"] = (
            fid if fid is not None else sum(name.encode()) % 1000 + 1
        )
    return {"name": name, "type": dtype, "nullable": nullable, "metadata": md}


def write_data_file(
    table_root: str, rel_path: str, table: pa.Table, stats_cols: list[str] | None = None
) -> dict:
    """Write one parquet data file and return its ``add`` action (with
    file-level numeric min/max stats for ``stats_cols``)."""
    abs_path = os.path.join(table_root, rel_path)
    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    pq.write_table(table, abs_path)
    stats: dict = {"numRecords": table.num_rows}
    if stats_cols:
        mins, maxs, nulls = {}, {}, {}
        for c in stats_cols:
            col = table.column(c)
            import pyarrow.compute as pc

            mins[c] = pc.min(col).as_py()
            maxs[c] = pc.max(col).as_py()
            nulls[c] = col.null_count
        stats.update(minValues=mins, maxValues=maxs, nullCount=nulls)
    return {
        "add": {
            "path": rel_path,
            "partitionValues": {},
            "size": os.path.getsize(abs_path),
            "modificationTime": 1_700_000_000_000,
            "dataChange": True,
            "stats": json.dumps(stats),
        }
    }


def write_commit(table_root: str, version: int, actions: list[dict]) -> None:
    log_dir = os.path.join(table_root, LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def remove_action(add: dict) -> dict:
    """The ``remove`` matching a previous ``add`` action dict (pass the
    whole ``{"add": {...}}`` wrapper or the inner dict)."""
    inner = add.get("add", add)
    r = {
        "path": inner["path"],
        "deletionTimestamp": 1_700_000_000_001,
        "dataChange": True,
    }
    if inner.get("deletionVector"):
        r["deletionVector"] = inner["deletionVector"]
    return {"remove": r}


def with_dv(add: dict, dv_descriptor: dict) -> dict:
    """A copy of the ``add`` action re-pointed at a deletion vector —
    the delta-spark DELETE shape (remove(p) + add(p, dv) in one
    commit)."""
    inner = dict(add.get("add", add))
    inner["deletionVector"] = dv_descriptor
    return {"add": inner}


# --- V2 checkpoints (table feature ``v2Checkpoint``) -------------------------
#
# Spec layout (delta.io PROTOCOL.md, "V2 Spec Checkpoints"): a
# SELF-CONTAINED top-level file — UUID-named
# ``{v:020d}.checkpoint.{uniqueStr}.{json|parquet}`` or compat-named
# ``{v:020d}.checkpoint.parquet`` — carrying exactly one
# ``checkpointMetadata`` action plus the non-file actions, with file
# actions either inline or in parquet SIDECAR files under
# ``_delta_log/_sidecars/`` referenced by ``sidecar`` actions.

def _v2_arrow_schema():
    """Since r11 this is delta_log's own V2 WRITER schema
    (``_v2_checkpoint_arrow_schema``) — one source of truth shared by
    the engine's V2 checkpoint writer, its reader, and these
    fixtures, so the three can never drift."""
    from cdc_apache_cassandra_spark.streaming.delta_log import (
        _v2_checkpoint_arrow_schema,
    )

    return _v2_checkpoint_arrow_schema()


def _rows_for(actions: list[dict], schema: pa.Schema) -> pa.Table:
    rows = []
    for a in actions:
        (kind, payload), = a.items()
        rows.append({kind: payload})
    return pa.Table.from_pylist(rows, schema=schema)


def write_sidecar(table_root: str, adds: list[dict]) -> dict:
    """Write one parquet sidecar holding ``adds`` (file actions only,
    per spec) and return its ``sidecar`` action."""
    from cdc_apache_cassandra_spark.streaming.delta_log import SIDECAR_DIR

    side_dir = os.path.join(table_root, LOG_DIR, SIDECAR_DIR)
    os.makedirs(side_dir, exist_ok=True)
    name = f"{uuid.uuid4()}.parquet"
    path = os.path.join(side_dir, name)
    pq.write_table(_rows_for(adds, _v2_arrow_schema()), path)
    return {
        "sidecar": {
            "path": name,
            "sizeInBytes": os.path.getsize(path),
            "modificationTime": 1_700_000_000_000,
        }
    }


def write_v2_checkpoint(
    table_root: str,
    version: int,
    actions: list[dict],
    sidecar_groups: list[list[dict]] | None = None,
    fmt: str = "parquet",
    compat_name: bool = False,
    pointer: bool = True,
) -> str:
    """Write a spec-conformant V2 checkpoint at ``version``:
    ``actions`` are the non-file (and optionally inline file) actions;
    each entry of ``sidecar_groups`` becomes one parquet sidecar of
    file actions referenced from the top-level file. Returns the
    top-level file's path."""
    log_dir = os.path.join(table_root, LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    all_actions = [
        {"checkpointMetadata": {"version": version}},
        *actions,
        *[write_sidecar(table_root, g) for g in (sidecar_groups or [])],
    ]
    if compat_name:
        name = f"{version:020d}.checkpoint.parquet"
    else:
        name = f"{version:020d}.checkpoint.{uuid.uuid4()}.{fmt}"
    path = os.path.join(log_dir, name)
    if fmt == "json" and not compat_name:
        with open(path, "w") as f:
            for a in all_actions:
                f.write(json.dumps(a) + "\n")
    else:
        pq.write_table(_rows_for(all_actions, _v2_arrow_schema()), path)
    if pointer:
        with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
            json.dump({"version": version, "size": len(all_actions)}, f)
    return path
