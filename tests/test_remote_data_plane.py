"""VERDICT r7 item 1+4: the table LIVES in a bucket, not just commits
through one.

Full bucket-store + Delta-export lifecycle against a ``file://`` table
root treated as REMOTE: every driver-side byte must move through the
pyarrow.fs seam (``delta_log._io_*``) — a monkeypatched os-audit fails
the test on ANY Python-level ``os``/``open``/``shutil`` call that
touches the root's local path — with commits routed through the HTTP
conditional-write adapters and NO local manifest mirror. Plus the
no-mirror LOG shape: replay resolved entirely through the commit
store's reader half (``list_dir``/``read_bytes``), closing the
object_store caveat that a fully remote log 'needs the replay reader
pointed at the store'.
"""

import builtins
import contextlib
import json
import os
import shutil
import threading

import pytest

import cdc_apache_cassandra_spark.streaming.delta_log as dl
from cdc_apache_cassandra_spark.streaming.materialize import (
    active_view,
    compact,
    gc_orphan_dirs,
    merge_into,
    merge_into_retrying,
    point_read,
    read_state,
)
from cdc_apache_cassandra_spark.streaming.object_store import (
    ConditionalPutServer,
    HttpLogCommitStore,
    HttpManifestStore,
)

SCHEMA = (
    "op string, pk long, writetime long, v string, w string, "
    "segment long, position long"
)
BASE = [("INSERT", i, 10, f"v{i}", "x", 0, i) for i in range(12)]
BATCH_A = [("UPDATE", 1, 20, "a1", "x", 1, 0), ("UPDATE", 2, 20, "a2", "x", 1, 1)]
BATCH_B = [("UPDATE", 2, 30, "b2", "x", 2, 0), ("DELETE", 3, 30, None, None, 2, 1)]


@pytest.fixture()
def server():
    s = ConditionalPutServer()
    url = s.start()
    yield s, url
    s.stop()


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@contextlib.contextmanager
def os_audit(forbidden_local_prefix: str):
    """Fail on any Python-level filesystem call that touches the audited
    tree directly — the proof that the data plane goes through the
    pyarrow.fs seam (whose C++ syscalls do not pass through these
    functions) and the commit plane through the HTTP stores. Spark's JVM
    IO is likewise out of process; anything Python-side that reaches the
    root is a seam violation by construction."""
    violations: list[tuple[str, str]] = []

    def guard(mod, name):
        orig = getattr(mod, name)

        def wrapped(*a, **k):
            for arg in a[:2]:
                try:
                    sp = os.fspath(arg)
                except TypeError:
                    continue
                if isinstance(sp, bytes):
                    sp = sp.decode(errors="replace")
                if isinstance(sp, str) and sp.startswith(forbidden_local_prefix):
                    violations.append((f"{mod.__name__}.{name}", sp))
            return orig(*a, **k)

        setattr(mod, name, wrapped)
        return mod, name, orig

    targets = [
        (os, "listdir"), (os, "replace"), (os, "rename"), (os, "makedirs"),
        (os, "mkdir"), (os, "unlink"), (os, "remove"), (os, "link"),
        (os, "stat"), (os, "open"), (os, "scandir"), (os, "walk"),
        (os.path, "getsize"), (os.path, "getmtime"),
        (shutil, "rmtree"), (builtins, "open"),
    ]
    restore = [guard(m, n) for m, n in targets]
    try:
        yield violations
    finally:
        for mod, name, orig in restore:
            setattr(mod, name, orig)
    assert not violations, f"direct os IO on the remote-shaped root: {violations[:8]}"


def _state_rows(df):
    return sorted(
        (r.pk, r.op, r.writetime, r.v) for r in df.collect()
    )


def _oracle(spark, tmp_path):
    """Same batches through the default local store = the expected state."""
    path = str(tmp_path / "oracle_store")
    os.makedirs(path)
    for rows in (BASE, BATCH_A, BATCH_B):
        merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
    return _state_rows(read_state(spark, path))


def test_full_lifecycle_on_remote_root_passes_os_audit(spark, tmp_path, server):
    """merge ×3, read, point_read, compact, delta_export, read_delta,
    delta_changes, checkpoint, cleanup, vacuum, orphan GC — all against
    a file:// root under the os-audit, manifests in the HTTP store with
    NO local mirror, Delta commits conditional-PUT + fs-mirrored into
    the remote root."""
    _, url = server
    want = _oracle(spark, tmp_path)

    local_root = str(tmp_path / "remote_store")
    local_out = str(tmp_path / "remote_delta")
    os.makedirs(local_root)
    os.makedirs(local_out)
    root = f"file://{local_root}"
    out = f"file://{local_out}"
    mstore = HttpManifestStore(url, mirror_local=False)
    prev = dl.set_log_commit_store(HttpLogCommitStore(url))
    try:
        with os_audit(local_root + "/"), os_audit(local_out + "/"):
            for rows in (BASE, BATCH_A, BATCH_B):
                merge_into(
                    spark, root, _batch(spark, rows), ["pk"],
                    n_buckets=4, store=mstore,
                )
            st = read_state(spark, root, store=mstore)
            assert _state_rows(st) == want

            pr = point_read(spark, root, ["pk"], [1, 2, 3], store=mstore)
            assert sorted((r.pk, r.op, r.v) for r in pr.collect()) == [
                (1, "UPDATE", "a1"), (2, "UPDATE", "b2"), (3, "DELETE", None),
            ]

            # Delta export: staging + content-addressed renames through
            # the fs seam, commit via conditional PUT, mirrored into the
            # remote root so URI replay readers see the log
            assert dl.delta_export(
                spark, root, out, manifest_store=mstore,
                checkpoint_interval=None,
            ) == 0
            got = sorted(
                (r.pk, r.v) for r in dl.read_delta(spark, out).collect()
            )
            assert got == sorted(
                (pk, v) for pk, op, _wt, v in want if op != "DELETE"
            )

            # incremental export + change feed over the remote root
            merge_into(
                spark, root,
                _batch(spark, [("UPDATE", 5, 40, "z5", "x", 3, 0)]),
                ["pk"], n_buckets=4, store=mstore,
            )
            assert dl.delta_export(
                spark, root, out, manifest_store=mstore,
                checkpoint_interval=None,
            ) == 1
            ch = dl.delta_changes(spark, out, 0, 1, ["pk"])
            chg = {(r.pk, r["_change_type"]) for r in ch.collect()}
            assert chg == {(5, "update_preimage"), (5, "update_postimage")}

            # maintenance surfaces, all through the seam
            cp = dl.write_checkpoint(out)
            assert cp.startswith("file://")
            assert dl.delta_log_cleanup(out, respect_consumers=False) == [
                f"{0:020d}.json"
            ]
            # vacuum reclaims exactly the files v1's export superseded
            deleted = dl.delta_vacuum(out, retain_ms=-60_000)
            _, live_files, _ = dl.delta_log_replay(out)
            assert deleted and not (set(deleted) & set(live_files))
            assert sorted(
                (r.pk, r.v) for r in dl.read_delta(spark, out).collect()
            ) == sorted([(pk, v) for pk, v in got if pk != 5] + [(5, "z5")])
            compact(spark, root, ["pk"], store=mstore)
            assert _state_rows(read_state(spark, root, store=mstore)) == sorted(
                r if r[0] != 5 else r for r in
                [t for t in want if t[0] != 5] + [(5, "UPDATE", 40, "z5")]
            )
            assert gc_orphan_dirs(root, older_than_seconds=10**6, store=mstore) == []
    finally:
        dl.set_log_commit_store(prev)

    # nothing leaked a local manifest or lock next to the data
    assert not os.path.exists(os.path.join(local_root, "_MANIFEST.json"))
    assert not os.path.exists(os.path.join(local_root, "_MANIFEST.json.lock"))
    # but the data and the mirrored log DID land in the 'bucket'
    assert any(n.startswith("__ver=") for n in os.listdir(local_root))
    assert os.path.isdir(os.path.join(local_out, "_delta_log"))


def test_remote_root_race_exactly_one_wins(spark, tmp_path, server):
    """The ConditionalPutServer race suite over the remote-shaped path:
    4 threads merge disjoint keys through the HTTP CAS against the
    file:// root; every commit lands, the final state equals the
    sequential result."""
    _, url = server
    local_root = str(tmp_path / "race_store")
    os.makedirs(local_root)
    root = f"file://{local_root}"
    store = HttpManifestStore(url, mirror_local=False)
    merge_into(spark, root, _batch(spark, BASE), ["pk"], n_buckets=4, store=store)

    errs = []

    def worker(w):
        rows = [
            ("UPDATE", pk, 20 + w, f"w{w}", "x", 10 + w, pk)
            for pk in range(12) if pk % 4 == w
        ]
        try:
            merge_into_retrying(
                spark, root, _batch(spark, rows), ["pk"],
                n_buckets=4, store=store, max_attempts=8,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    got = {
        r.pk: (r.v, r.writetime)
        for r in read_state(spark, root, store=store).collect()
    }
    for pk in range(12):
        w = pk % 4
        assert got[pk] == (f"w{w}", 20 + w), (pk, got[pk])


def test_no_mirror_log_replays_through_the_store(spark, tmp_path, server):
    """mirror_local=False on the LOG store: zero filesystem copy of
    _delta_log anywhere — listing and reading commits resolve through
    the store's reader half; export, read, CDF, consumer offsets and
    idempotent re-publish all work; a reader session replaying via the
    store matches the oracle."""
    _, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    for rows in (BASE, BATCH_A):
        merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)

    prev = dl.set_log_commit_store(HttpLogCommitStore(url, mirror_local=False))
    try:
        assert dl.delta_export(spark, path, out) == 0
        # the log exists ONLY in the store
        assert not os.path.exists(os.path.join(out, "_delta_log"))
        last, files, meta = dl.delta_log_replay(out)
        assert last == 0 and files and meta is not None

        got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
        want = sorted(
            (r.pk, r.v)
            for r in active_view(read_state(spark, path)).collect()
        )
        assert got == want

        # incremental second version + net CDF between them
        merge_into(spark, path, _batch(spark, BATCH_B), ["pk"], n_buckets=4)
        assert dl.delta_export(spark, path, out) == 1
        ch = dl.delta_changes(spark, out, 0, 1, ["pk"])
        types = {(r.pk, r["_change_type"]) for r in ch.collect()}
        assert (3, "delete") in types and (2, "update_postimage") in types

        # consumer cursor rides the store-resident log
        v = dl.record_consumer_offset(out, "remote-job", 1)
        assert v == 2
        assert dl.consumer_offset(out, "remote-job") == 1

        # racing republication of an existing version loses cleanly
        from cdc_apache_cassandra_spark.streaming.materialize import (
            CommitConflict,
        )

        with pytest.raises(CommitConflict):
            dl._write_commit(out, 0, [{"commitInfo": {"timestamp": 1}}])

        # a FRESH 'session' (new store instance, same URL) replays the
        # same state — the cross-machine reader shape
        prev2 = dl.set_log_commit_store(
            HttpLogCommitStore(url, mirror_local=False)
        )
        try:
            last2, files2, _ = dl.delta_log_replay(out)
            want_files = set(dl._replay(out, 1).files)
            assert (last2, set(files2)) == (2, want_files)
            got2 = sorted(
                (r.pk, r.v) for r in dl.read_delta(spark, out).collect()
            )
            want2 = sorted(
                (r.pk, r.v)
                for r in active_view(read_state(spark, path)).collect()
            )
            assert got2 == want2
        finally:
            dl.set_log_commit_store(prev2)
    finally:
        dl.set_log_commit_store(prev)


def test_no_mirror_ambiguous_500_still_absorbed(spark, tmp_path, server):
    """The applied-then-500 fault with NO mirror: publish verifies by
    content through the store and the exporter proceeds; replay (also
    through the store) sees the landed commit."""
    srv, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4)

    prev = dl.set_log_commit_store(HttpLogCommitStore(url, mirror_local=False))
    try:
        srv.fail_after_commit(srv.puts + 1)  # commit v0: applied, then 500
        assert dl.delta_export(spark, path, out) == 0
        last, files, _ = dl.delta_log_replay(out)
        assert last == 0 and len(files) > 0
    finally:
        dl.set_log_commit_store(prev)


def test_cdc_store_scan_resolves_manifest_through_http(spark, tmp_path, server):
    """Cross-machine DECLARATIVE reads: a store committed with NO local
    manifest mirror scans via spark.read.format('cdc_store') with the
    manifestUrl option — schema, bucket routing (pushdown) and rows all
    resolved through the HTTP store, against a file:// (remote-shaped)
    root."""
    from cdc_apache_cassandra_spark.sources.store_source import register

    _, url = server
    local_root = str(tmp_path / "scan_store")
    os.makedirs(local_root)
    root = f"file://{local_root}"
    mstore = HttpManifestStore(url, mirror_local=False)
    for rows in (BASE, BATCH_A, BATCH_B):
        merge_into(spark, root, _batch(spark, rows), ["pk"], n_buckets=4, store=mstore)
    assert not os.path.exists(os.path.join(local_root, "_MANIFEST.json"))

    register(spark)
    scan = (
        spark.read.format("cdc_store")
        .option("path", root)
        .option("manifestUrl", url)
        .option("mode", "state")
        .load()
    )
    assert _state_rows(scan) == _state_rows(read_state(spark, root, store=mstore))
    # pushdown routing still prunes buckets through the HTTP manifest
    got = (
        spark.read.format("cdc_store")
        .option("path", root)
        .option("manifestUrl", url)
        .load()
        .filter("pk = 2")
        .collect()
    )
    assert [(r.pk, r.v) for r in got] == [(2, "b2")]


def test_change_feed_stream_resolves_log_through_http(spark, tmp_path, server):
    """cdc_delta_changes with logStoreUrl: the streaming source's worker
    process replays a log that exists ONLY in the HTTP store (no
    _delta_log anywhere on disk) and the tail matches the batch CDF;
    the consumer cursor commits back through the same store."""
    import uuid as _uuid

    from cdc_apache_cassandra_spark.sources.change_feed_source import (
        register,
    )

    _, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    log_store = HttpLogCommitStore(url, mirror_local=False)
    prev = dl.set_log_commit_store(log_store)
    try:
        for rows in (BASE, BATCH_A, BATCH_B):
            merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
            dl.delta_export(spark, path, out)
        assert not os.path.exists(os.path.join(out, "_delta_log"))

        register(spark)
        name = "cdf_remote_" + _uuid.uuid4().hex[:8]
        q = (
            spark.readStream.format("cdc_delta_changes")
            .option("path", out)
            .option("pkCols", "pk")
            .option("startingVersion", 0)
            .option("maxVersionsPerBatch", 1)
            .option("consumerId", "remote-tail")
            .option("logStoreUrl", url)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.table(name)
        want = dl.delta_changes(spark, out, 0, 1, ["pk"]).unionByName(
            dl.delta_changes(spark, out, 1, 2, ["pk"])
        )
        assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
            map(tuple, want.collect())
        )
        # cursor rode the HTTP-resident log
        assert dl.consumer_offset(out, "remote-tail") >= 1
    finally:
        dl.set_log_commit_store(prev)


def test_lost_mirror_recovers_by_adopting_remote_commit(spark, tmp_path, server):
    """Review fix (r7): a crash between a landed PUT and the local
    mirror must not livelock the exporter. On a conflict, publish()
    adopts the store's authoritative bytes into the mirror, so the
    caller's retry replays a log that includes the landed version and
    converges instead of recomputing the same version forever."""
    from cdc_apache_cassandra_spark.streaming.materialize import (
        CommitConflict,
    )

    _, url = server
    store = HttpLogCommitStore(url)

    # unit: conflict adopts remote bytes into the mirror
    p = str(tmp_path / "log" / ("0" * 20 + ".json"))
    os.makedirs(os.path.dirname(p))
    store.publish(p, b'{"v":"first"}\n')
    os.remove(p)  # crash-before-mirror simulation
    with pytest.raises(CommitConflict):
        store.publish(p, b'{"v":"recomputed"}\n')
    assert open(p, "rb").read() == b'{"v":"first"}\n'  # adopted

    # integration: exporter converges after the crash
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4)
    prev = dl.set_log_commit_store(store)
    try:
        assert dl.delta_export(spark, path, out) == 0
        os.remove(dl._commit_path(out, 0))  # the mirror never happened
        merge_into(spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=4)
        # first attempt replays an empty local log, recomputes v0,
        # loses to the store — and adopts v0 into the mirror
        with pytest.raises(CommitConflict):
            dl.delta_export(spark, path, out)
        # the retry (exactly what foreach_batch_upsert does) converges
        assert dl.delta_export(spark, path, out) == 1
        got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
        want = sorted(
            (r.pk, r.v) for r in active_view(read_state(spark, path)).collect()
        )
        assert got == want
    finally:
        dl.set_log_commit_store(prev)


def test_torn_last_checkpoint_pointer_recovers(spark, tmp_path):
    """Review fix (r7): a torn/empty _last_checkpoint (crash between
    rename and durability) must not make the table unreadable — the
    reader falls back to the newest complete checkpoint parquet, or to
    pure-JSON replay when none exists."""
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    for rows in (BASE, BATCH_A, BATCH_B):
        merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
        dl.delta_export(spark, path, out, checkpoint_interval=None)
    dl.write_checkpoint(out)
    want = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())

    lc = os.path.join(out, "_delta_log", "_last_checkpoint")
    open(lc, "wb").write(b"")  # torn: zero-length after power loss
    assert dl._read_last_checkpoint(out) == {"version": 2}
    assert sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect()) == want

    # no checkpoint parquet at all -> pure-JSON replay
    os.remove(os.path.join(out, "_delta_log", f"{2:020d}.checkpoint.parquet"))
    assert dl._read_last_checkpoint(out) is None
    assert sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect()) == want


def test_store_authoritative_log_checkpoints_and_cleans(spark, tmp_path, server):
    """Review fix (r7): a no-mirror (store-authoritative) log must not
    replay O(all versions) forever — write_checkpoint publishes the
    checkpoint parquet + pointer INTO the store (LWW CAS overwrite:
    derived artifacts), cleanup DELETEs covered JSON from the store,
    and replay restores from the store-resident checkpoint."""
    _, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    store = HttpLogCommitStore(url, mirror_local=False)
    prev = dl.set_log_commit_store(store)
    try:
        for i, rows in enumerate((BASE, BATCH_A, BATCH_B)):
            merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
            assert dl.delta_export(
                spark, path, out, checkpoint_interval=2
            ) == i
        # version 2 crossed the cadence: checkpoint lives in the store
        assert dl._read_last_checkpoint(out)["version"] == 2
        assert not os.path.exists(os.path.join(out, "_delta_log"))
        deleted = dl.delta_log_cleanup(out, respect_consumers=False)
        assert deleted == [f"{0:020d}.json", f"{1:020d}.json"]
        names = store.list_dir(os.path.join(out, "_delta_log"))
        assert f"{0:020d}.json" not in names and f"{2:020d}.json" in names
        # replay now restores from the store-resident checkpoint + tail
        got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
        want = sorted(
            (r.pk, r.v) for r in active_view(read_state(spark, path)).collect()
        )
        assert got == want
    finally:
        dl.set_log_commit_store(prev)


def test_put_overwrite_guards_absorbs_and_never_regresses(spark, tmp_path, server):
    """Review fixes (r7, second pass): put_overwrite absorbs the
    applied-then-500 fault by content; the checkpoint POINTER never
    moves backwards (a stalled checkpointer must not point below JSON
    that cleanup already removed); cleanup tolerates a concurrently
    deleted key; consumer commits never persist an empty memo."""
    srv, url = server
    store = HttpLogCommitStore(url, mirror_local=False)

    # ambiguous 500 absorbed by content on the overwrite path
    key = str(tmp_path / "artifact")
    srv.fail_after_commit(srv.puts + 1)
    assert store.put_overwrite(key, b"v1") is True
    assert store.read_bytes(key) == b"v1"
    # LWW without a guard replaces; a declining guard returns False
    assert store.put_overwrite(key, b"v2") is True
    assert store.put_overwrite(key, b"v0", should_replace=lambda b: False) is False
    assert store.read_bytes(key) == b"v2"

    # end-to-end: stalled checkpointer cannot regress the pointer
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    prev = dl.set_log_commit_store(store)
    try:
        for rows in (BASE, BATCH_A, BATCH_B):
            merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
            dl.delta_export(spark, path, out, checkpoint_interval=None)
        dl.write_checkpoint(out)  # pointer -> 2
        assert dl._read_last_checkpoint(out)["version"] == 2
        dl.write_checkpoint(out, version=1)  # the stalled older attempt
        assert dl._read_last_checkpoint(out)["version"] == 2  # not regressed

        # cleanup tolerates a concurrently-deleted key
        log_dir = os.path.join(out, "_delta_log")
        store.delete(os.path.join(log_dir, f"{0:020d}.json"))
        deleted = dl.delta_log_cleanup(out, respect_consumers=False)
        assert f"{1:020d}.json" in deleted  # run completed past the 404
        got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
        want = sorted(
            (r.pk, r.v) for r in active_view(read_state(spark, path)).collect()
        )
        assert got == want

        # consumer commit with an EMPTY memo omits the key entirely
        v = dl.record_consumer_offset(out, "memo-job", 2)
        commit = json.loads(
            store.read_bytes(dl._commit_path(out, v)).decode().splitlines()[1]
        )
        assert "emptyBuckets" not in commit["commitInfo"]
    finally:
        dl.set_log_commit_store(prev)


def test_store_scan_reader_reuses_resolved_manifest():
    """One manifest load per scan: the reader must honor the manifest
    the DataSource's schema() call resolved instead of re-loading (two
    loads = two HTTP round trips + a routing-vs-schema skew window)."""
    from pyspark.sql import types as T

    from cdc_apache_cassandra_spark.sources.store_source import (
        StoreScanReader,
    )

    manifest = {
        "version": 1,
        "n_buckets": 4,
        "buckets": {},
        "bucket_cols": ["pk"],
        "kind": "lww",
    }
    schema = T.StructType([T.StructField("pk", T.LongType())])
    r = StoreScanReader({"path": "/nonexistent/store"}, schema, manifest=manifest)
    assert r.manifest is manifest  # no _load_manifest call (would raise)


# ---------------------------------------------------------------------------
# Property: remoteness must not change one row, under random batching
# ---------------------------------------------------------------------------

import shutil as _shutil
import tempfile as _tempfile

from hypothesis import HealthCheck, example, given, seed, settings
from hypothesis import strategies as st

_ops = st.tuples(
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]), st.integers(0, 9)
)
_histories = st.tuples(
    st.lists(st.lists(_ops, min_size=1, max_size=5), min_size=1, max_size=4),
    st.booleans(),  # compact the remote store at the end
    st.sampled_from([2, 4]),  # n_buckets
)

_PINNED = ([[("INSERT", 1)], [("DELETE", 1), ("INSERT", 2)]], True, 2)


@seed(20260815)
@example(_PINNED)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_histories)
def test_remote_lifecycle_equals_local_under_random_batching(spark, scenario):
    """The round-7 claim as a property: the SAME random batch history
    through (a) the default local store and (b) a file:// root with
    HTTP manifest CAS (no mirror) + HTTP commit publication must
    produce identical state rows and identical Delta-export read-backs
    — compaction on the remote side included."""
    history, do_compact, n_buckets = scenario
    root = _tempfile.mkdtemp(prefix="t_remote_prop_")
    server = ConditionalPutServer()
    url = server.start()
    try:
        local_store = os.path.join(root, "local")
        remote_local = os.path.join(root, "remote")
        local_out = os.path.join(root, "local_delta")
        remote_out_local = os.path.join(root, "remote_delta")
        os.makedirs(local_store)
        os.makedirs(remote_local)
        os.makedirs(remote_out_local)
        remote_store = f"file://{remote_local}"
        remote_out = f"file://{remote_out_local}"
        mstore = HttpManifestStore(url, mirror_local=False)
        prev = dl.set_log_commit_store(HttpLogCommitStore(url))
        try:
            wt = 0
            for seg, batch in enumerate(history):
                rows = []
                for pos, (kind, pk) in enumerate(batch):
                    wt += 1
                    rows.append((
                        kind, pk, wt,
                        None if kind == "DELETE" else f"v{wt}",
                        "x", seg, pos,
                    ))
                df = _batch(spark, rows)
                merge_into(spark, local_store, df, ["pk"], n_buckets=n_buckets)
                merge_into(
                    spark, remote_store, df, ["pk"],
                    n_buckets=n_buckets, store=mstore,
                )
            if do_compact:
                compact(spark, remote_store, ["pk"], store=mstore)
            lhs = _state_rows(read_state(spark, local_store))
            rhs = _state_rows(read_state(spark, remote_store, store=mstore))
            assert lhs == rhs

            # the LOCAL side commits through plain POSIX link, so the
            # comparison really is local-vs-remote, not HTTP-vs-HTTP
            prev2 = dl.set_log_commit_store(dl.LocalLogCommitStore())
            try:
                dl.delta_export(spark, local_store, local_out)
            finally:
                dl.set_log_commit_store(prev2)
            dl.delta_export(
                spark, remote_store, remote_out, manifest_store=mstore
            )
            l_rows = sorted(
                map(tuple, dl.read_delta(spark, local_out).collect())
            )
            r_rows = sorted(
                map(tuple, dl.read_delta(spark, remote_out).collect())
            )
            assert l_rows == r_rows
        finally:
            dl.set_log_commit_store(prev)
    finally:
        server.stop()
        _shutil.rmtree(root, ignore_errors=True)


def test_streaming_materialization_into_remote_root(spark, tmp_path, server):
    """The STREAMING leg of the remote data plane: materialize_stream
    writes micro-batches straight into a file:// root with the HTTP
    manifest CAS (no mirror) and mirrors every commit into a remote
    Delta log — the same shape the batch lifecycle gate pins, driven by
    a real writeStream."""
    _, url = server
    src = str(tmp_path / "events_src")
    local_root = str(tmp_path / "stream_store")
    local_out = str(tmp_path / "stream_delta")
    os.makedirs(local_root)
    os.makedirs(local_out)
    root = f"file://{local_root}"
    out = f"file://{local_out}"
    mstore = HttpManifestStore(url, mirror_local=False)

    rows = BASE + BATCH_A + BATCH_B
    spark.createDataFrame(rows, SCHEMA).repartition(3).write.parquet(src)
    events = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)

    from cdc_apache_cassandra_spark.streaming.materialize import (
        materialize_stream,
    )

    prev = dl.set_log_commit_store(HttpLogCommitStore(url))
    try:
        q = materialize_stream(
            events,
            root,
            str(tmp_path / "ckpt"),
            ["pk"],
            n_buckets=4,
            delta_path=out,
            store=mstore,
        )
        q.processAllAvailable()
        q.stop()
        want = _oracle(spark, tmp_path)
        assert _state_rows(read_state(spark, root, store=mstore)) == want
        got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
        assert got == sorted(
            (pk, v) for pk, op, _wt, v in want if op != "DELETE"
        )
        assert not os.path.exists(os.path.join(local_root, "_MANIFEST.json"))
    finally:
        dl.set_log_commit_store(prev)


def test_uri_root_with_local_store_refused_up_front(spark, tmp_path):
    """Review fix (r7, third pass): a URI table root combined with the
    local-filesystem ManifestStore has no valid configuration (URI
    roots never have a local manifest) — writers AND readers refuse
    before any distributed work, instead of treating an existing
    remote table as empty or reaping 'unreferenced' directories."""
    root = f"file://{tmp_path}/t"
    df = _batch(spark, BASE)
    with pytest.raises(ValueError, match="ManifestStore"):
        merge_into(spark, root, df, ["pk"])
    with pytest.raises(ValueError, match="ManifestStore"):
        read_state(spark, root)
    with pytest.raises(ValueError, match="ManifestStore"):
        point_read(spark, root, ["pk"], [1])
    with pytest.raises(ValueError, match="ManifestStore"):
        compact(spark, root, ["pk"])
    with pytest.raises(ValueError, match="ManifestStore"):
        gc_orphan_dirs(root)


def test_compact_remote_no_mirror_actually_compacts(spark, tmp_path, server):
    """Review fix (r7, third pass): compact() must read through the
    SAME store it commits with — previously the full-rewrite path read
    the (absent) local mirror and silently no-op'd on no-mirror remote
    stores."""
    _, url = server
    local_root = str(tmp_path / "c_store")
    os.makedirs(local_root)
    root = f"file://{local_root}"
    store = HttpManifestStore(url, mirror_local=False)
    for rows in (BASE, BATCH_A, BATCH_B):
        merge_into(spark, root, _batch(spark, rows), ["pk"], n_buckets=4, store=store)
    before, _ = store.load(root)
    compact(spark, root, ["pk"], tombstone_horizon=100, store=store)
    after, _ = store.load(root)
    assert after["version"] == before["version"] + 1  # NOT a silent no-op
    rows = _state_rows(read_state(spark, root, store=store))
    # the pk=3 tombstone (writetime 30 < horizon) is gone; live rows kept
    assert all(op != "DELETE" for _pk, op, _wt, _v in rows)
    assert (2, "UPDATE", 30, "b2") in rows and (1, "UPDATE", 20, "a1") in rows


def test_facade_use_object_store_wires_everything(spark, tmp_path, server):
    """CdcEngine.use_object_store: one call routes the manifest CAS and
    Delta commit publication through the HTTP endpoint (no mirror) and
    every facade surface — materialize-adjacent store methods,
    read_store (manifestUrl), point_read, export_delta, read_table,
    stream_changes (logStoreUrl) — works against URI roots with zero
    per-call store plumbing."""
    from cdc_apache_cassandra_spark.engine import CdcEngine

    _, url = server
    local_root = str(tmp_path / "fac_store")
    local_out = str(tmp_path / "fac_delta")
    os.makedirs(local_root)
    os.makedirs(local_out)
    root = f"file://{local_root}"
    out = f"file://{local_out}"

    eng = CdcEngine(spark)
    mstore, prev_log = eng.use_object_store(url)  # mirror_local=False
    try:
        for rows in (BASE, BATCH_A, BATCH_B):
            merge_into(spark, root, _batch(spark, rows), ["pk"], n_buckets=4, store=mstore)

        scan = eng.read_store(root, mode="state")
        assert _state_rows(scan) == _state_rows(read_state(spark, root, store=mstore))
        pr = eng.point_read(root, [2])
        assert [(r.pk, r.v) for r in pr.collect()] == [(2, "b2")]

        assert eng.export_delta(root, out) == 0
        got = sorted((r.pk, r.v) for r in eng.read_table(out).collect())
        assert got == sorted(
            (r.pk, r.v)
            for r in active_view(read_state(spark, root, store=mstore)).collect()
        )
        # zero filesystem copies of any commit artifact
        assert not os.path.exists(os.path.join(local_root, "_MANIFEST.json"))
        assert not os.path.exists(os.path.join(local_out, "_delta_log"))

        # the streaming tail resolves the store-resident log via
        # logStoreUrl injected by the facade
        import uuid as _uuid

        name = "fac_" + _uuid.uuid4().hex[:8]
        q = (
            eng.stream_changes(out, starting_version=-1)
            .writeStream.format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        snap = spark.table(name)
        assert snap.count() == len(got)
        assert {r["_change_type"] for r in snap.collect()} == {"insert"}
    finally:
        dl.set_log_commit_store(prev_log)


def test_facade_detach_and_unwired_table_guards(spark, tmp_path, server):
    """Facade review fixes: detach_object_store restores the original
    commit store and stops option injection (no split-brain); a wired
    engine refuses a table committed OUTSIDE the store loudly (both
    point_read and read_store) instead of reading live data as absent;
    read_store injects manifestUrl in BOTH mirror modes (URI roots
    never mirror manifests)."""
    from cdc_apache_cassandra_spark.engine import CdcEngine

    _, url = server
    # a table committed BEFORE wiring, through the local default store
    local_tbl = str(tmp_path / "pre_store")
    os.makedirs(local_tbl)
    merge_into(spark, local_tbl, _batch(spark, BASE), ["pk"], n_buckets=4)

    eng = CdcEngine(spark)
    orig_log = dl._LOG_COMMIT_STORE
    eng.use_object_store(url, mirror_local=True)
    try:
        with pytest.raises(ValueError, match="wired object store"):
            eng.point_read(local_tbl, [1])
        with pytest.raises(Exception, match="no manifest"):
            # ValueError surfaces wrapped in Spark's AnalysisException
            eng.read_store(local_tbl, mode="state").collect()

        # mirror_local=True + URI root: read_store must STILL resolve
        # through the store (URI roots never carry a local manifest)
        uri_local = str(tmp_path / "uri_store")
        os.makedirs(uri_local)
        uri_root = f"file://{uri_local}"
        merge_into(
            spark, uri_root, _batch(spark, BASE), ["pk"],
            n_buckets=4, store=eng._manifest_store,
        )
        got = eng.read_store(uri_root, mode="state")
        assert got.count() == len(BASE)
    finally:
        eng.detach_object_store()
    assert dl._LOG_COMMIT_STORE is orig_log  # fully restored
    # unwired again: the local table reads normally
    assert eng.point_read(local_tbl, [1]).count() == 1


def test_change_feed_stream_over_uri_table_root(spark, tmp_path, server):
    """The streaming tail end-to-end on a URI root: offsets replay the
    log through pyarrow.fs, partitions read data files via file:// URIs
    inside the worker, output matches the batch CDF over the same
    root."""
    import uuid as _uuid

    from cdc_apache_cassandra_spark.sources.change_feed_source import (
        register,
    )

    _, url = server
    local_root = str(tmp_path / "u_store")
    local_out = str(tmp_path / "u_delta")
    os.makedirs(local_root)
    os.makedirs(local_out)
    root = f"file://{local_root}"
    out = f"file://{local_out}"
    mstore = HttpManifestStore(url, mirror_local=False)
    prev = dl.set_log_commit_store(HttpLogCommitStore(url))
    try:
        for rows in (BASE, BATCH_A, BATCH_B):
            merge_into(spark, root, _batch(spark, rows), ["pk"], n_buckets=4, store=mstore)
            dl.delta_export(spark, root, out, manifest_store=mstore,
                            checkpoint_interval=None)
        register(spark)
        name = "uri_cdf_" + _uuid.uuid4().hex[:8]
        q = (
            spark.readStream.format("cdc_delta_changes")
            .option("path", out)
            .option("pkCols", "pk")
            .option("startingVersion", 0)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.table(name)
        want = dl.delta_changes(spark, out, 0, 2, ["pk"])
        assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        dl.set_log_commit_store(prev)


def test_torn_pointer_fallback_recognizes_multipart_checkpoints(spark, tmp_path):
    """ADVICE r7: the torn-_last_checkpoint fallback must also recognize
    a foreign writer's MULTI-PART checkpoint (V.checkpoint.i.n.parquet)
    — if older JSON commits were cleaned past it, a single-part-only
    scan would return an older version (or None) and replay would fail
    on the commit gap. Incomplete part sets must NOT be chosen."""
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    for rows in (BASE, BATCH_A, BATCH_B):
        merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
        dl.delta_export(spark, path, out, checkpoint_interval=None)
    dl.write_checkpoint(out)
    want = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
    log_dir = os.path.join(out, "_delta_log")

    # rewrite our single-part v2 checkpoint as a 1-of-1 multi-part set
    single = os.path.join(log_dir, f"{2:020d}.checkpoint.parquet")
    multi = os.path.join(
        log_dir, f"{2:020d}.checkpoint.{1:010d}.{1:010d}.parquet"
    )
    os.rename(single, multi)
    # plus an INCOMPLETE newer set (part 1 of 2 only) — must be ignored
    open(
        os.path.join(log_dir, f"{3:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
        "wb",
    ).write(b"not a complete set")

    open(os.path.join(log_dir, "_last_checkpoint"), "wb").write(b"")  # torn
    ptr = dl._read_last_checkpoint(out)
    assert ptr == {"version": 2, "parts": 1}
    assert dl._checkpoint_files(out, ptr) == [multi]
    # cleanup past the checkpoint, then full replay through the fallback
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    os.remove(os.path.join(log_dir, f"{1:020d}.json"))
    got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
    assert got == want

    # unit: tie between forms prefers single-part; incomplete sets skipped
    pick = dl._newest_complete_checkpoint
    assert pick([f"{5:020d}.checkpoint.parquet",
                 f"{5:020d}.checkpoint.{1:010d}.{1:010d}.parquet"]) == {
        "version": 5
    }
    assert pick([f"{7:020d}.checkpoint.{2:010d}.{2:010d}.parquet"]) is None
    assert pick([]) is None


def test_tree_newest_mtime_tolerates_vanished_tree():
    """ADVICE r7: a version directory pruned concurrently between the
    caller's listdir and the stat must read as FRESH (never abort the
    gc run, never read as ancient) — both the POSIX and the pyarrow.fs
    branches."""
    import time

    from cdc_apache_cassandra_spark.streaming.materialize import (
        _tree_newest_mtime,
    )

    t0 = time.time()
    assert _tree_newest_mtime("/nonexistent/gc_race_dir") >= t0
    assert _tree_newest_mtime("file:///nonexistent/gc_race_dir") >= t0


def test_mirror_mode_cursor_commits_reach_http_store(spark, tmp_path, server):
    """ADVICE r7 (medium): with use_object_store(mirror_local=True) +
    stream_changes(consumer_id=...), the source WORKER's cursor commits
    must publish through the conditional-PUT store too — a worker
    committing only locally leaves holes in the authoritative
    create-only HTTP sequence that a later HTTP winner's mirror would
    silently overwrite. The facade now passes logStoreUrl+logStoreMirror
    in BOTH mirror modes."""
    import uuid as _uuid

    from cdc_apache_cassandra_spark.engine import CdcEngine

    _, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)

    eng = CdcEngine(spark)
    mstore, prev_log = eng.use_object_store(url, mirror_local=True)
    try:
        for rows in (BASE, BATCH_A, BATCH_B):
            merge_into(
                spark, path, _batch(spark, rows), ["pk"],
                n_buckets=4, store=mstore,
            )
            eng.export_delta(path, out)

        name = "cur_" + _uuid.uuid4().hex[:8]
        q = (
            eng.stream_changes(
                out, starting_version=0, max_versions_per_batch=1,
                consumer_id="mirror-tail",
            )
            .writeStream.format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        import time

        for _ in range(100):  # commit(N) fires on a later engine cycle
            if dl.consumer_offset(out, "mirror-tail") >= 1:
                break
            q.processAllAvailable()
            time.sleep(0.1)
        q.stop()
        cursor_v = dl.consumer_offset(out, "mirror-tail")
        assert cursor_v >= 1

        # every version in the LOCAL mirror also exists on HTTP — the
        # authoritative create-only sequence has no holes
        log_dir = os.path.join(out, "_delta_log")
        local = {n for n in os.listdir(log_dir) if n.endswith(".json")}
        reader = HttpLogCommitStore(url, mirror_local=False)
        remote = {n for n in reader.list_dir(log_dir) if n.endswith(".json")}
        assert local == remote
        assert len(local) >= 4  # 3 exports + ≥1 cursor txn commit
    finally:
        dl.set_log_commit_store(prev_log)
        eng.detach_object_store()


def test_list_objects_v2_dialect_pagination_and_rollup(server):
    """VERDICT r7 item 1: the log reader's LIST half speaks the REAL
    S3 ListObjectsV2 dialect — XML ListBucketResult, delimiter roll-up
    into CommonPrefixes, max-keys pagination traversed via an OPAQUE
    NextContinuationToken — and DELETE is S3's idempotent 204 whether
    or not the key existed."""
    _, url = server
    srv = server[0]
    store = HttpLogCommitStore(url, mirror_local=False)

    # 7 commits + a subdirectory that must roll up, not leak through
    for i in range(7):
        store.publish(f"/t/_delta_log/{i:020d}.json", b"{}" + str(i).encode())
    store.publish("/t/_delta_log/_staging/part-0.tmp", b"x")
    want = [f"{i:020d}.json" for i in range(7)] + ["_staging"]

    assert store.list_dir("/t/_delta_log") == sorted(want)

    # force pagination: page size 2 -> ≥4 round trips, same answer
    srv.lists = 0
    store.list_max_keys = 2
    assert store.list_dir("/t/_delta_log") == sorted(want)
    assert srv.lists >= 4

    # idempotent DELETE: second delete of the same key succeeds quietly
    store.delete("/t/_delta_log/" + f"{0:020d}.json")
    store.delete("/t/_delta_log/" + f"{0:020d}.json")
    store.list_max_keys = 1000
    assert f"{0:020d}.json" not in store.list_dir("/t/_delta_log")

    # ETags are served quoted (S3 form) and round-trip opaquely through
    # the CAS overwrite loop
    from cdc_apache_cassandra_spark.streaming.object_store import http_get

    _, etag = http_get(store._url("/t/_delta_log/" + f"{1:020d}.json"))
    assert etag is not None and etag.startswith('"') and etag.endswith('"')
    assert store.put_overwrite("/t/artifact", b"v1") is True
    assert store.put_overwrite("/t/artifact", b"v2") is True
    assert store.read_bytes("/t/artifact") == b"v2"


def test_facade_maintain_over_object_store(spark, tmp_path, server):
    """maintain() against the wired object-store deployment (r8): the
    whole five-step loop runs over a URI table root + HTTP manifest/log
    stores — compact commits through the CAS, orphan GC reads the
    HTTP manifest, checkpoint/cleanup ride the no-mirror log store —
    and a second run is an idempotent no-op."""
    from cdc_apache_cassandra_spark.engine import CdcEngine

    _, url = server
    local_root = str(tmp_path / "m_store")
    local_out = str(tmp_path / "m_delta")
    os.makedirs(local_root)
    os.makedirs(local_out)
    root = f"file://{local_root}"
    out = f"file://{local_out}"

    eng = CdcEngine(spark)
    mstore, prev_log = eng.use_object_store(url)  # mirror_local=False
    try:
        for rows in (BASE, BATCH_A, BATCH_B):
            merge_into(
                spark, root, _batch(spark, rows), ["pk"],
                n_buckets=4, store=mstore,
            )
            eng.export_delta(root, out, checkpoint_interval=None)
        assert not os.path.exists(os.path.join(local_out, "_delta_log"))

        # expired tombstone: BATCH_B's DELETE at writetime 30 < horizon
        m1 = eng.maintain(
            root, out, pk_cols=["pk"], tombstone_horizon=100, retain_ms=0,
        )
        assert m1["compacted"] is True
        assert m1["checkpoint"] == 2
        assert m1["cleaned"] == []  # no previous checkpoint to clean under
        state = eng.read_store(root, mode="state")
        assert state.filter("op = 'DELETE'").count() == 0

        m2 = eng.maintain(root, out, retain_ms=0)
        assert m2["cleaned"] == [f"{v:020d}.json" for v in (0, 1)]
        # compact bumps the STORE manifest, not the Delta log — the
        # head stays at the checkpointed 2, so no new checkpoint
        assert m2["checkpoint"] is None
        # the store-resident log replays from its checkpoint + tail
        got = sorted((r.pk, r.v) for r in eng.read_table(out).collect())
        assert (2, "b2") in got and all(pk != 3 for pk, _ in got)
    finally:
        dl.set_log_commit_store(prev_log)
        eng.detach_object_store()


def test_dialect_keys_with_spaces_and_unicode(server):
    """Object keys containing spaces and non-ASCII must round-trip
    through the URL-encoded request path — publish, GET, LIST (the
    ListObjectsV2 prefix is query-encoded), DELETE."""
    _, url = server
    store = HttpLogCommitStore(url, mirror_local=False)
    key = "/t tables/üñï code/00000000000000000000.json"
    store.publish(key, b"{}")
    assert store.read_bytes(key) == b"{}"
    assert store.list_dir("/t tables/üñï code") == [
        "00000000000000000000.json"
    ]
    # parent listing rolls the subdirectory up as a CommonPrefix
    assert store.list_dir("/t tables") == ["üñï code"]
    store.delete(key)
    assert store.list_dir("/t tables/üñï code") == []


def test_io_seam_over_real_s3_wire(server, monkeypatch):
    """The last inference gap in 'real-bucket true' (r8): every _io_*
    primitive the driver-side data plane uses — multipart writes,
    ranged-GET parquet footer/content reads, CopyObject+DELETE moves,
    ListObjectsV2 with Size/LastModified, batch delete, vacuum-grade
    mtimes — exercised through pyarrow's REAL AWS SDK S3 client
    (S3FileSystem + endpoint_override) against the emulator, not
    through LocalFileSystem. Spark's distributed reads would need the
    hadoop-aws jars (absent in this env, documented); the driver-side
    seam is fully provable."""
    import io
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    pafs = pytest.importorskip("pyarrow.fs")
    if not hasattr(pafs, "S3FileSystem"):
        pytest.skip("pyarrow built without S3")

    _, url = server
    fs = pafs.S3FileSystem(
        access_key="k", secret_key="s", endpoint_override=url,
        scheme="http", allow_bucket_creation=True,
        request_timeout=10, connect_timeout=10,
    )

    def fake_fs_cached(authority_uri: str):
        assert authority_uri == "s3://bkt/", authority_uri
        return fs, "bkt/"

    monkeypatch.setattr(dl, "_fs_cached", fake_fs_cached)
    root = "s3://bkt/table"

    dl._io_mkdirs(root + "/data")
    dl._io_write_bytes(root + "/data/x.tmp", b"hello")  # multipart PUT
    dl._io_move(root + "/data/x.tmp", root + "/data/x.bin")  # Copy+DELETE
    assert dl._io_exists(root + "/data/x.bin")
    assert not dl._io_exists(root + "/data/x.tmp")
    assert dl._io_read_bytes(root + "/data/x.bin") == b"hello"
    assert dl._io_size(root + "/data/x.bin") == 5
    assert dl._io_listdir(root + "/data") == ["x.bin"]
    infos = dl._io_file_infos(root + "/data")
    assert [(n, s) for n, s, _m in infos] == [("x.bin", 5)]
    assert infos[0][2] > 0  # LastModified flowed through the XML

    # parquet: footer via ranged GETs, then full content
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"pk": pa.array(range(100), pa.int64())}),
        buf, row_group_size=10,
    )
    dl._io_write_bytes(root + "/data/t.parquet", buf.getvalue())
    pf = dl._io_parquet_file(root + "/data/t.parquet")
    assert pf.metadata.num_row_groups == 10
    assert dl._io_read_parquet(root + "/data/t.parquet").num_rows == 100

    # the change-feed range split's footer refinement over the same wire
    from cdc_apache_cassandra_spark.sources.change_feed_source import (
        ChangeFeedStreamReader,
    )

    r = ChangeFeedStreamReader.__new__(ChangeFeedStreamReader)
    r.pk_cols = ["pk"]
    units = r._row_group_units(root + "/data/t.parquet", 1)
    assert [mn for mn, _ in units] == list(range(0, 100, 10))

    # vacuum/GC mtimes through the wire; a vanished tree reads FRESH
    from cdc_apache_cassandra_spark.streaming.materialize import (
        _tree_newest_mtime,
    )

    assert _tree_newest_mtime(root + "/data") > 0
    t0 = time.time()
    assert _tree_newest_mtime(root + "/never-existed") >= t0

    dl._io_delete(root + "/data/x.bin")
    assert not dl._io_exists(root + "/data/x.bin")
    dl._io_rmtree(root + "/data")  # batch DeleteObjects
    assert dl._io_listdir(root + "/data") == []


def test_multipart_checkpoint_write_and_restore(spark, tmp_path, server):
    """r9-candidate closed early (r8): write_checkpoint goes MULTI-PART
    (V.checkpoint.i.n.parquet + parts in _last_checkpoint) when forced
    or past CHECKPOINT_PART_ACTIONS — we already READ that layout, so
    both directions interoperate. Restore works after cleanup (JSON
    prefix gone), the torn-pointer fallback resolves the set, and the
    store-authoritative (no-mirror) log writes the same layout through
    put_overwrite."""
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    for rows in (BASE, BATCH_A, BATCH_B):
        merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4)
        dl.delta_export(spark, path, out, checkpoint_interval=None)
    want = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())

    cp = dl.write_checkpoint(out, parts=3)
    log_dir = os.path.join(out, "_delta_log")
    names = sorted(os.listdir(log_dir))
    part_names = [
        f"{2:020d}.checkpoint.{i:010d}.{3:010d}.parquet" for i in (1, 2, 3)
    ]
    assert [n for n in names if ".checkpoint." in n] == part_names
    assert cp.endswith(part_names[-1])
    ptr = dl._read_last_checkpoint(out)
    assert ptr["version"] == 2 and ptr["parts"] == 3

    # cleanup drops the covered JSON; replay restores from the parts
    assert dl.delta_log_cleanup(out, respect_consumers=False) == [
        f"{0:020d}.json", f"{1:020d}.json"
    ]
    got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
    assert got == want

    # torn pointer: the fallback reconstructs {version, parts}
    open(os.path.join(log_dir, "_last_checkpoint"), "wb").write(b"")
    assert dl._read_last_checkpoint(out) == {"version": 2, "parts": 3}
    got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
    assert got == want

    # store-authoritative log: same layout through the CAS overwrite
    _, url = server
    path2 = str(tmp_path / "store2")
    out2 = str(tmp_path / "delta2")
    os.makedirs(path2)
    store = HttpLogCommitStore(url, mirror_local=False)
    prev = dl.set_log_commit_store(store)
    try:
        for rows in (BASE, BATCH_A):
            merge_into(spark, path2, _batch(spark, rows), ["pk"], n_buckets=4)
            dl.delta_export(spark, path2, out2, checkpoint_interval=None)
        dl.write_checkpoint(out2, parts=2)
        ptr2 = dl._read_last_checkpoint(out2)
        assert ptr2["version"] == 1 and ptr2["parts"] == 2
        remote = store.list_dir(os.path.join(out2, "_delta_log"))
        assert [n for n in remote if ".checkpoint." in n] == [
            f"{1:020d}.checkpoint.{i:010d}.{2:010d}.parquet" for i in (1, 2)
        ]  # BOTH parts published, never a half set
        assert dl.delta_log_cleanup(out2, respect_consumers=False) == [
            f"{0:020d}.json"
        ]
        got2 = sorted((r.pk, r.v) for r in dl.read_delta(spark, out2).collect())
        want2 = sorted(
            (r.pk, r.v)
            for r in active_view(read_state(spark, path2)).collect()
        )
        assert got2 == want2
        # auto threshold: an unforced checkpoint of this tiny log stays
        # single-part (rows << CHECKPOINT_PART_ACTIONS) and the pointer
        # advances past the forced multi-part one without a parts field
        merge_into(spark, path2, _batch(spark, BATCH_B), ["pk"], n_buckets=4)
        dl.delta_export(spark, path2, out2, checkpoint_interval=None)
        dl.write_checkpoint(out2)
        ptr3 = dl._read_last_checkpoint(out2)
        assert ptr3["version"] == 2 and "parts" not in ptr3
    finally:
        dl.set_log_commit_store(prev)


def test_dialect_guards_range_416_tripwire_and_if_none_match(server):
    """Review fixes (r8, second pass): past-EOF Range answers S3's 416
    (never a fake 206); a data-plane write (multipart / CopyObject)
    that would OVERWRITE a Delta commit key with DIFFERENT bytes is
    refused 403 (the blind-write tripwire holds through the data plane;
    same-bytes mirror copies pass); If-None-Match with anything but '*'
    is a clean 400, not a handler crash."""
    import urllib.error
    import urllib.request

    import pyarrow.fs as pafs

    srv, url = server
    store = HttpLogCommitStore(url, mirror_local=False)
    commit_key = "bkt/t/_delta_log/" + f"{7:020d}.json"
    store.publish("/" + commit_key, b'{"v":1}\n')

    fs = pafs.S3FileSystem(
        access_key="k", secret_key="s", endpoint_override=url,
        scheme="http", allow_bucket_creation=True,
    )
    # 416 past EOF
    f = fs.open_input_file("bkt/t/_delta_log/" + f"{7:020d}.json")
    with pytest.raises(Exception):
        f.read_at(10, 500)  # offset past the 8-byte object

    # multipart overwrite of the commit key with DIFFERENT bytes -> 403
    with pytest.raises(OSError):
        with fs.open_output_stream("bkt/t/_delta_log/" + f"{7:020d}.json") as o:
            o.write(b"clobber!")
    assert store.read_bytes("/" + commit_key) == b'{"v":1}\n'
    # ... but the SAME bytes (a mirror copy) pass
    with fs.open_output_stream("bkt/t/_delta_log/" + f"{7:020d}.json") as o:
        o.write(b'{"v":1}\n')
    # CopyObject onto the commit key with different bytes -> 403 too
    with fs.open_output_stream("bkt/t/other.bin") as o:
        o.write(b"different")
    with pytest.raises(OSError):
        fs.copy_file("bkt/t/other.bin", "bkt/t/_delta_log/" + f"{7:020d}.json")
    assert store.read_bytes("/" + commit_key) == b'{"v":1}\n'

    # If-None-Match: <etag> (not '*') -> clean 400
    req = urllib.request.Request(
        f"{url}/bkt/t/_delta_log/{8:020d}.json", data=b"x", method="PUT"
    )
    req.add_header("If-None-Match", '"123"')
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=10)
    assert exc.value.code == 400


def test_multipart_checkpoint_forced_uneven_has_no_empty_parts(spark, tmp_path):
    """Review fix (r8, second pass): a forced part count that doesn't
    divide the action count evenly must write BALANCED parts (sizes
    differ by ≤1), never zero-row trailing files a strict foreign
    reader could choke on."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4)
    dl.delta_export(spark, path, out, checkpoint_interval=None)
    # state: protocol + metaData + 4 adds = 6 actions; parts=4 -> 2,2,1,1
    dl.write_checkpoint(out, parts=4)
    log_dir = os.path.join(out, "_delta_log")
    sizes = [
        pq.read_table(
            os.path.join(
                log_dir, f"{0:020d}.checkpoint.{i:010d}.{4:010d}.parquet"
            )
        ).num_rows
        for i in (1, 2, 3, 4)
    ]
    assert sum(sizes) == 6 and min(sizes) >= 1 and max(sizes) - min(sizes) <= 1
    got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
    assert len(got) == len(BASE)


def test_sources_read_uri_roots_without_jvm_parquet(server, monkeypatch):
    """VERDICT r8 item 6: the engine's OWN sources never route URI-root
    DATA reads through the JVM parquet scan — proven constructively:
    both the cdc_store scan reader and the cdc_delta_changes stream
    reader drain an ``s3://`` table root end-to-end IN THIS PROCESS
    with no SparkSession anywhere (this env has zero hadoop-aws jars,
    so any JVM routing of an s3:// path would be a loud failure; the
    readers' read() is exactly what Spark pickles into Python workers,
    so in-process success pins the executor-side path too). Every byte
    moves through the ``_io_*`` pyarrow seam — one cached S3 client per
    authority — over the real AWS SDK wire."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    pafs = pytest.importorskip("pyarrow.fs")
    if not hasattr(pafs, "S3FileSystem"):
        pytest.skip("pyarrow built without S3")

    _, url = server
    fs = pafs.S3FileSystem(
        access_key="k", secret_key="s", endpoint_override=url,
        scheme="http", allow_bucket_creation=True,
        request_timeout=10, connect_timeout=10,
    )
    monkeypatch.setattr(
        dl, "_fs_cached", lambda uri: (fs, uri.split("://", 1)[1])
    )

    def parquet_bytes(table):
        buf = io.BytesIO()
        pq.write_table(table, buf)
        return buf.getvalue()

    # ---- cdc_store scan over an s3:// root (manifest via HTTP) ----
    from cdc_apache_cassandra_spark.sources.store_source import (
        StoreScanReader,
        _spark_table_schema,
    )

    store_root = "s3://bkt/store"
    rows = pa.table(
        {
            "op": pa.array(["INSERT"] * 6),
            "pk": pa.array(range(6), pa.int64()),
            "v": pa.array([f"v{i}" for i in range(6)]),
        }
    )
    dl._io_mkdirs(store_root + "/__ver=1-t/__bucket=0")
    dl._io_write_bytes(
        store_root + "/__ver=1-t/__bucket=0/part-0.parquet",
        parquet_bytes(rows),
    )
    manifest = {
        "version": 1, "n_buckets": 1, "buckets": {"0": 1},
        "dirs": {"1": "__ver=1-t"}, "bucket_cols": ["pk"], "kind": "lww",
    }
    mstore = HttpManifestStore(url, mirror_local=False)
    mstore.commit(store_root, manifest, mstore.load(store_root)[1])

    schema = _spark_table_schema(store_root, manifest)  # footer via _io_*
    reader = StoreScanReader(
        {"path": store_root, "manifesturl": url, "mode": "state"}, schema
    )
    got = sorted(
        row["pk"]
        for p in reader.partitions()
        for b in reader.read(p)
        for row in b.to_pylist()
    )
    assert got == list(range(6))

    # ---- cdc_delta_changes over an s3:// root (log ONLY in the store) ----
    from cdc_apache_cassandra_spark.sources.change_feed_source import (
        ChangeFeedStreamReader,
        _table_schema,
    )

    droot = "s3://bkt/dtable"
    f0 = pa.table(
        {"pk": pa.array(range(4), pa.int64()),
         "v": pa.array(["a0", "a1", "a2", "a3"])}
    )
    f1 = pa.table(
        {"pk": pa.array(range(4), pa.int64()),
         "v": pa.array(["a0", "B1", "a2", "a3"])}
    )
    dl._io_mkdirs(droot + "/data")
    dl._io_write_bytes(droot + "/data/f0.parquet", parquet_bytes(f0))
    dl._io_write_bytes(droot + "/data/f1.parquet", parquet_bytes(f1))
    meta = {
        "id": "t-uri", "name": None, "description": None,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [
                {"name": "pk", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }),
        "partitionColumns": [], "configuration": {}, "createdTime": 0,
    }

    def add(name):
        return {"add": {
            "path": f"data/{name}", "partitionValues": {},
            "size": int(dl._io_size(droot + f"/data/{name}")),
            "modificationTime": 0, "dataChange": True,
        }}

    log_store = HttpLogCommitStore(url, mirror_local=False)
    prev = dl.set_log_commit_store(log_store)
    try:
        dl._write_commit(droot, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta}, add("f0.parquet"),
        ])
        dl._write_commit(droot, 1, [
            {"remove": {"path": "data/f0.parquet", "deletionTimestamp": 1,
                        "dataChange": True}},
            add("f1.parquet"),
        ])
    finally:
        dl.set_log_commit_store(prev)

    schema = _table_schema(droot, url)
    from pyspark.sql import types as T

    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_change_type", T.StringType()),
           T.StructField("_commit_version", T.LongType())]
    )
    r = ChangeFeedStreamReader(
        {"path": droot, "pkcols": "pk", "startingversion": "0",
         "logstoreurl": url}, full,
    )
    parts = r.partitions({"version": 0}, {"version": 1})
    feed = sorted(
        (row["pk"], row["_change_type"], row["v"])
        for p in parts
        for b in r.read(p)
        for row in b.to_pylist()
    )
    assert feed == [
        (1, "update_postimage", "B1"),
        (1, "update_preimage", "a1"),
    ]
