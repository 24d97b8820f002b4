"""Contended compare-and-swap through the ManifestStore seam (r4 verdict
item 2) — the object-store correctness story, testable offline.

``merge_into``/``delta_export`` commit through a pluggable CAS pointer
(:class:`ManifestStore` / create-only Delta commit files). On S3/GCS that
is a conditional PUT; these tests prove the seam's contract with an
in-memory store whose interleaving is FORCED: writer X loads the
manifest, writer Y commits a full merge in between, X's CAS must fail
with :class:`CommitConflict`, X's retry (reload + re-merge) must land on
top of Y's result, and the store must end bit-identical to the
sequential execution with no orphaned version directory and no
double-pruned data file. Both orderings (A-interrupted-by-B and
B-interrupted-by-A) run; the final state must not depend on who won.
"""

import json
import os

import pytest

from cdc_apache_cassandra_spark.streaming.materialize import (
    CommitConflict,
    InMemoryManifestStore as MemoryManifestStore,
    active_view,
    merge_into,
)

SCHEMA = (
    "op string, pk long, writetime long, v string, w string, "
    "segment long, position long"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state_rows(spark, path, store):
    from pyspark.sql import functions as F  # noqa: F401
    from cdc_apache_cassandra_spark.streaming.materialize import _bucket_paths

    manifest, _ = store.load(path)
    paths = _bucket_paths(path, manifest)
    df = (
        spark.read.option("basePath", path)
        .option("mergeSchema", "true")
        .parquet(*paths)
        .drop("__ver", "__bucket")
    )
    return sorted((r.pk, r.op, r.writetime, r.v) for r in df.collect())


BASE = [("INSERT", i, 10, f"v{i}", "x", 0, i) for i in range(8)]
BATCH_A = [("UPDATE", 1, 20, "a1", "x", 1, 0), ("UPDATE", 2, 20, "a2", "x", 1, 1)]
BATCH_B = [("UPDATE", 2, 30, "b2", "x", 2, 0), ("DELETE", 3, 30, None, None, 2, 1)]


def _sequential_result(spark, tmp_path, first, second):
    store = MemoryManifestStore()
    path = str(tmp_path / "seq")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4, store=store)
    merge_into(spark, path, _batch(spark, first), ["pk"], n_buckets=4, store=store)
    merge_into(spark, path, _batch(spark, second), ["pk"], n_buckets=4, store=store)
    return _state_rows(spark, path, store)


@pytest.mark.parametrize("loser_batch,winner_batch", [(BATCH_A, BATCH_B), (BATCH_B, BATCH_A)])
def test_contended_cas_exactly_one_wins_and_retry_converges(
    spark, tmp_path, loser_batch, winner_batch
):
    store = MemoryManifestStore()
    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4, store=store)

    # Force the race: the loser loads the manifest, then the winner's
    # FULL commit lands before the loser's CAS executes.
    def winner_commits():
        merge_into(
            spark, path, _batch(spark, winner_batch), ["pk"], n_buckets=4, store=store
        )

    store.on_commit = winner_commits
    with pytest.raises(CommitConflict):
        merge_into(
            spark, path, _batch(spark, loser_batch), ["pk"], n_buckets=4, store=store
        )

    # exactly one of the two contending commits published
    manifest, _ = store.load(path)
    assert manifest["version"] == 2  # base + winner only
    assert store.commits == 2

    # the loser retries from scratch: reload + re-merge on top of the winner
    merge_into(
        spark, path, _batch(spark, loser_batch), ["pk"], n_buckets=4, store=store
    )
    manifest, _ = store.load(path)
    assert manifest["version"] == 3

    # convergence: same rows as the sequential winner-then-loser execution
    got = _state_rows(spark, path, store)
    assert got == _sequential_result(spark, tmp_path, winner_batch, loser_batch)

    # no orphaned version directory: everything on disk is referenced
    from cdc_apache_cassandra_spark.streaming.materialize import version_dir

    live = {
        version_dir(manifest, v)
        for v in {manifest["buckets"][k] for k in manifest["buckets"]}
    }
    on_disk = {n for n in os.listdir(path) if n.startswith("__ver=")}
    assert on_disk == live

    # no double-prune: every manifest pointer resolves to real files
    for b, ver in manifest["buckets"].items():
        bdir = os.path.join(path, version_dir(manifest, ver), f"__bucket={b}")
        assert os.path.isdir(bdir) and any(
            f.endswith(".parquet") for f in os.listdir(bdir)
        )


def test_contended_delta_commit_loser_rediffs_to_noop(spark, tmp_path, monkeypatch):
    """Same race through the Delta log's create-only commit files: two
    exporters diff the SAME store state and race to publish version 1.
    The winner's commit is interleaved exactly between the loser's log
    replay and its publish (the create-only link / conditional-PUT
    window): the loser's link fails (CommitConflict), and its retry —
    replay the log, re-diff — finds the winner already published
    identical content, so it writes nothing. The table stays readable
    and correct."""
    import shutil

    import cdc_apache_cassandra_spark.streaming.delta_log as dl
    from cdc_apache_cassandra_spark.streaming.materialize import read_state

    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4)
    out = str(tmp_path / "delta")
    dl.delta_export(spark, path, out)
    merge_into(spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=4)

    # the winner's version-1 commit, produced from an identical table copy
    shadow = str(tmp_path / "shadow")
    shutil.copytree(out, shadow)
    assert dl.delta_export(spark, path, shadow) == 1
    commit1 = os.path.join(shadow, "_delta_log", f"{1:020d}.json")
    winner_actions = [json.loads(line) for line in open(commit1)]

    real_write = dl._write_commit

    def interleaved(out_path, version, actions):
        # winner lands first, inside the loser's replay→publish window
        os.makedirs(os.path.join(out, "data"), exist_ok=True)
        for a in winner_actions:
            if "add" in a:
                dst = os.path.join(out, a["add"]["path"])
                if os.path.exists(dst):
                    # the loser pre-published its (identical) file under
                    # this name — since exports hard-link the store's
                    # active file, src and dst may share an inode, which
                    # copyfile refuses; replace like real publication does
                    os.remove(dst)
                shutil.copyfile(os.path.join(shadow, a["add"]["path"]), dst)
        real_write(out, 1, winner_actions)
        return real_write(out_path, version, actions)

    monkeypatch.setattr(dl, "_write_commit", interleaved)
    with pytest.raises(CommitConflict):
        dl.delta_export(spark, path, out, checkpoint_interval=None)
    monkeypatch.setattr(dl, "_write_commit", real_write)

    # exactly one version-1 commit exists (the winner's)
    assert sorted(
        n
        for n in os.listdir(os.path.join(out, "_delta_log"))
        if n.endswith(".json")
    ) == [f"{0:020d}.json", f"{1:020d}.json"]

    # loser's retry: replay + re-diff ⇒ already current, no-op
    assert dl.delta_export(spark, path, out, checkpoint_interval=None) is None
    got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
    want = sorted(
        (r.pk, r.v) for r in active_view(read_state(spark, path)).collect()
    )
    assert got == want
    # no loser-created orphan: vacuum (zero retention) reclaims exactly
    # the files the winner's commit REMOVED (superseded bucket versions)
    # — the loser's pre-conflict staging left nothing else behind
    removed = sorted(
        a["remove"]["path"] for a in winner_actions if "remove" in a
    )
    assert dl.delta_vacuum(out, retain_ms=0) == removed


def test_merge_into_retrying_recovers_from_conflict(spark, tmp_path):
    """The multi-writer ergonomics wrapper: a forced mid-commit conflict
    is absorbed, the retry re-merges on top of the winner, and the final
    state equals the sequential execution."""
    from cdc_apache_cassandra_spark.streaming.materialize import (
        merge_into_retrying,
    )

    store = MemoryManifestStore()
    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4, store=store)

    def winner_commits():
        merge_into(
            spark, path, _batch(spark, BATCH_B), ["pk"], n_buckets=4, store=store
        )

    store.on_commit = winner_commits
    attempts = merge_into_retrying(
        spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=4, store=store
    )
    assert attempts == 2  # one conflict, one clean retry
    got = _state_rows(spark, path, store)
    assert got == _sequential_result(spark, tmp_path, BATCH_B, BATCH_A)


def test_parallel_threads_all_commit_via_retry(spark, tmp_path):
    """REAL concurrency (not forced interleave): four driver threads
    race merge_into_retrying against the LocalManifestStore (O_EXCL
    lock + re-check + replace). Every writer must eventually land —
    losers reload and re-merge — and the final state must equal the
    sequential merge of all batches in ANY order (reducer
    associativity). This is the multi-writer shape object-store
    deployments run; the local store's critical section is the
    conditional PUT stand-in."""
    import threading

    from cdc_apache_cassandra_spark.streaming.materialize import (
        active_view,
        merge_into_retrying,
        read_state,
    )

    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2)

    batches = [
        [("UPDATE", i, 20 + w, f"w{w}", "x", w, i) for i in range(w, 8, 4)]
        for w in range(4)
    ]
    errors = []

    def writer(w):
        try:
            merge_into_retrying(
                spark, path, _batch(spark, batches[w]), ["pk"],
                n_buckets=2, max_attempts=10,
            )
        except Exception as e:  # noqa: BLE001
            errors.append((w, repr(e)))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    got = {r.pk: (r.v, r.writetime) for r in active_view(read_state(spark, path)).collect()}
    # every key 0..7 was updated by exactly one writer (w = pk % 4)
    for pk in range(8):
        w = pk % 4
        assert got[pk] == (f"w{w}", 20 + w), (pk, got[pk])


def test_gc_orphan_dirs_reclaims_only_stale_staging(spark, tmp_path):
    """Crashed-writer staging (never referenced) is reclaimed only once
    its newest mtime ages past the grace window; a fresh in-flight
    staging dir and every live dir survive."""
    from cdc_apache_cassandra_spark.streaming.materialize import (
        gc_orphan_dirs,
        version_dir,
    )

    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2)

    stale = os.path.join(path, "__ver=99-deadbeef", "__bucket=0")
    fresh = os.path.join(path, "__ver=99-cafef00d", "__bucket=0")
    os.makedirs(stale)
    os.makedirs(fresh)
    for d in (stale, fresh):
        with open(os.path.join(d, "part-0.parquet"), "wb") as f:
            f.write(b"x")
    old = 1_000_000_000  # 2001 — far past any grace window
    os.utime(os.path.join(stale, "part-0.parquet"), (old, old))
    os.utime(stale, (old, old))
    os.utime(os.path.dirname(stale), (old, old))

    deleted = gc_orphan_dirs(path, older_than_seconds=60)
    assert deleted == ["__ver=99-deadbeef"]
    assert os.path.isdir(os.path.dirname(fresh))
    from cdc_apache_cassandra_spark.streaming.materialize import (
        LocalManifestStore,
    )

    manifest = LocalManifestStore().load(path)[0]
    live = version_dir(manifest, manifest["version"])
    assert os.path.isdir(os.path.join(path, live))
