"""Custom data-topic sink — the S4/S7 twin of the cdc_commitlog source,
on the PySpark 4 DataSource writer API.

The reference publishes keyed records to a Pulsar topic; the broker's
acknowledgment protocol gives at-least-once. Here the "topic" is a
directory of JSON-lines batch files with a MANIFEST commit protocol that
upgrades to exactly-once-per-batch:

- ``write`` (executor): stage the partition's rows to
  ``<path>/_staging/<uuid>.jsonl``; return the staged name.
- ``commit`` (driver): rename staged files to ``batch-<id>-<k>.jsonl``
  and write ``_manifest/batch-<id>.json`` atomically LAST — a reader
  only trusts files listed in manifests, so a crash between renames
  publishes nothing.
- ``abort``: delete staged files; nothing becomes visible.

``read_topic`` is the consumer view (manifest-listed files only).
Scale: one staged file per partition, no driver data movement — the
driver handles names only; at 100 TB swap the directory for an object
store and the manifest for the transaction log (the same protocol Delta
commits use).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str, n_rows: int):
        self.staged = staged
        self.n_rows = n_rows


class TopicStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_topic requires option 'path'")

    def write(self, iterator) -> _StagedFile:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged, n)

    def commit(self, messages, batchId: int) -> None:
        manifest_dir = os.path.join(self.path, "_manifest")
        os.makedirs(manifest_dir, exist_ok=True)
        manifest = os.path.join(manifest_dir, f"batch-{batchId:010d}.json")
        if os.path.exists(manifest):
            # replayed batch (restart after commit): already published
            for m in messages:
                if m and os.path.exists(m.staged):
                    os.remove(m.staged)
            return
        published, total = [], 0
        for k, m in enumerate(m for m in messages if m):
            final = os.path.join(
                self.path, f"batch-{batchId:010d}-{k:05d}.jsonl"
            )
            os.replace(m.staged, final)  # atomic on one FS
            published.append(os.path.basename(final))
            total += m.n_rows
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch": batchId, "files": published, "rows": total}, f)
        os.replace(tmp, manifest)  # manifest LAST: the commit point

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m and os.path.exists(m.staged):
                os.remove(m.staged)


class TopicDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_topic"

    def streamWriter(self, schema, overwrite) -> TopicStreamWriter:
        return TopicStreamWriter(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(TopicDataSource)


def read_topic(spark: SparkSession, path: str) -> DataFrame:
    """Consumer view: only manifest-committed files, in batch order."""
    files = []
    for mf in sorted(glob.glob(os.path.join(path, "_manifest", "batch-*.json"))):
        with open(mf) as f:
            meta = json.load(f)
        files.extend(os.path.join(path, name) for name in meta["files"])
    if not files:
        return spark.createDataFrame([], "key string")
    return spark.read.json(files)


def uncommitted_files(path: str) -> list[str]:
    """Audit helper: topic-dir data files NOT listed in any manifest
    (should be empty unless a batch is mid-commit)."""
    listed = set()
    for mf in glob.glob(os.path.join(path, "_manifest", "batch-*.json")):
        with open(mf) as f:
            listed.update(json.load(f)["files"])
    present = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(path, "batch-*.jsonl"))
    }
    return sorted(present - listed)
