"""Bucket-store scale proofs (round-3 verdict item 7):

1. incremental MERGE IO is proportional to TOUCHED buckets — untouched
   buckets' files are not merely equivalent but BYTE-IDENTICAL across
   commits (same inode-level content, never rewritten);
2. the manifest commit is a compare-and-swap: a commit computed against
   a stale manifest raises CommitConflict instead of clobbering.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from cdc_apache_cassandra_spark.streaming.materialize import (
    CommitConflict,
    LocalManifestStore,
    merge_into,
    read_state,
)

PK = ["pk"]


def _batch(spark, rows):
    """rows: (pk, op, writetime, val) — segment/position derived so the
    default full-PK LWW reducer has its total order."""
    full = [(pk, op, wt, val, wt // 1000, wt % 1000) for pk, op, wt, val in rows]
    return spark.createDataFrame(
        full,
        "pk long, op string, writetime long, val string, segment long, position long",
    )


def _manifest(store, path):
    return store.load(path)[0]


def _bucket_files(path: str, manifest: dict, bucket: str) -> dict[str, str]:
    """{relative file path: sha256} for one bucket's LIVE files."""
    from cdc_apache_cassandra_spark.streaming.materialize import version_dir

    ver = manifest["buckets"][bucket]
    d = os.path.join(path, version_dir(manifest, ver), f"__bucket={bucket}")
    out = {}
    for f in sorted(glob.glob(os.path.join(d, "*"))):
        with open(f, "rb") as fh:
            out[os.path.relpath(f, path)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_untouched_buckets_byte_identical_across_commits(spark, tmp_path):
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    store = LocalManifestStore()
    n_buckets = 8
    # seed: keys spread over every bucket
    merge_into(
        spark,
        path,
        _batch(spark, [(k, "INSERT", 1000 + k, f"v{k}") for k in range(64)]),
        PK,
        n_buckets=n_buckets,
    )
    m1 = _manifest(store, path)
    assert len(m1["buckets"]) == n_buckets
    before = {b: _bucket_files(path, m1, b) for b in m1["buckets"]}

    # second commit touches exactly ONE key -> at most one bucket
    merge_into(
        spark,
        path,
        _batch(spark, [(3, "UPDATE", 9000, "v3b")]),
        PK,
        n_buckets=n_buckets,
    )
    m2 = _manifest(store, path)
    touched = {b for b in m2["buckets"] if m2["buckets"][b] != m1["buckets"][b]}
    assert len(touched) == 1
    for b in m2["buckets"]:
        if b in touched:
            continue
        # untouched: the manifest still points at the SAME files with the
        # SAME bytes — zero rewrite amplification outside the touched set
        assert _bucket_files(path, m2, b) == before[b], b

    # correctness didn't regress: the updated key reads back the new value
    rows = {r.pk: r.val for r in read_state(spark, path).collect()}
    assert rows[3] == "v3b" and rows[5] == "v5"


def test_commit_io_proportional_to_touched_buckets(spark, tmp_path):
    """Bytes written by a 1-key commit must be a small fraction of the
    table (one bucket of 32), not a table rewrite."""
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    n_buckets = 32
    merge_into(
        spark,
        path,
        _batch(
            spark,
            [(k, "INSERT", 1000 + k, "x" * 64) for k in range(4096)],
        ),
        PK,
        n_buckets=n_buckets,
    )
    store = LocalManifestStore()
    m1 = _manifest(store, path)

    def table_bytes(manifest):
        total = 0
        from cdc_apache_cassandra_spark.streaming.materialize import version_dir

        for b, v in manifest["buckets"].items():
            d = os.path.join(path, version_dir(manifest, v), f"__bucket={b}")
            total += sum(
                os.path.getsize(f) for f in glob.glob(os.path.join(d, "*"))
            )
        return total

    t_before = table_bytes(m1)
    merge_into(
        spark, path, _batch(spark, [(7, "UPDATE", 9999, "y" * 64)]), PK,
        n_buckets=n_buckets,
    )
    m2 = _manifest(store, path)
    rewritten = sum(
        sum(
            os.path.getsize(f)
            for f in glob.glob(
                os.path.join(
                    path,
                    __import__("cdc_apache_cassandra_spark.streaming.materialize", fromlist=["version_dir"]).version_dir(m2, m2["version"]),
                    f"__bucket={b}",
                    "*",
                )
            )
        )
        for b in m2["buckets"]
    )
    # one touched bucket out of 32: rewritten bytes ~ 1/32 of the table
    # (parquet per-file overhead makes tiny buckets relatively fat; 1/8
    # is a conservative ceiling that still rules out any table rewrite)
    assert rewritten < t_before / 8, (rewritten, t_before)


def test_manifest_commit_is_compare_and_swap(spark, tmp_path):
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    store = LocalManifestStore()
    merge_into(
        spark, path, _batch(spark, [(1, "INSERT", 1, "a")]), PK, n_buckets=4
    )
    manifest, tag = store.load(path)
    # a second writer commits first
    winner = dict(manifest, version=manifest["version"] + 1)
    store.commit(path, winner, tag)
    # ... so our commit against the now-stale tag must CONFLICT
    loser = dict(manifest, version=manifest["version"] + 1)
    with pytest.raises(CommitConflict):
        store.commit(path, loser, tag)
    # and the store still holds the winner
    assert store.load(path)[0]["version"] == winner["version"]


def test_first_commit_preconditions_on_absence(spark, tmp_path):
    """Version 1 commits with expect_tag=None (the If-None-Match case);
    a duplicate bootstrap attempt conflicts."""
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    store = LocalManifestStore()
    m = {"version": 1, "n_buckets": 4, "buckets": {"0": 1}}
    store.commit(path, m, None)
    with pytest.raises(CommitConflict):
        store.commit(path, m, None)
