"""The SAME contended-CAS contract as tests/test_manifest_cas.py, run over
HTTP conditional writes (streaming/object_store.py) against an in-process
S3-semantics emulator — the object-store deployment shape, end to end:
ETag-preconditioned manifest CAS, create-only Delta commit publication,
exactly-one-wins under both a forced interleave and a real thread race,
and the ambiguous 500-after-apply fault."""

import json
import os
import threading

import pytest

from cdc_apache_cassandra_spark.streaming.materialize import (
    CommitConflict,
    active_view,
    merge_into,
    merge_into_retrying,
    read_state,
)
from cdc_apache_cassandra_spark.streaming.object_store import (
    ConditionalPutServer,
    HttpLogCommitStore,
    HttpManifestStore,
    http_get,
    http_put_conditional,
)

SCHEMA = (
    "op string, pk long, writetime long, v string, w string, "
    "segment long, position long"
)

BASE = [("INSERT", i, 10, f"v{i}", "x", 0, i) for i in range(8)]
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


def _state_rows(spark, path, store):
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


def _sequential_result(spark, tmp_path, url, first, second):
    store = HttpManifestStore(url)
    path = str(tmp_path / "seq")
    os.makedirs(path)
    for rows in (BASE, first, second):
        merge_into(spark, path, _batch(spark, rows), ["pk"], n_buckets=4, store=store)
    return _state_rows(spark, path, store)


# ---------------------------------------------------------------------------
# primitive semantics
# ---------------------------------------------------------------------------


def test_conditional_put_primitive(server):
    _, url = server
    key = f"{url}/k1"
    assert http_get(key) == (None, None)
    etag = http_put_conditional(key, b"one", if_none_match=True)
    assert http_get(key) == (b"one", etag)
    # create-only on an existing key fails
    with pytest.raises(CommitConflict):
        http_put_conditional(key, b"two", if_none_match=True)
    # CAS with a stale tag fails; with the current tag succeeds
    with pytest.raises(CommitConflict):
        http_put_conditional(key, b"two", if_match="999")
    etag2 = http_put_conditional(key, b"two", if_match=etag)
    assert http_get(key) == (b"two", etag2) and etag2 != etag


def test_blind_put_is_refused(server):
    """Unconditional PUT of a real OBJECT key (anything nested) is
    refused — this engine must never blind-write a commit point. The
    AWS SDK's bucket-creation / directory-marker PUTs (bare names,
    trailing slash) are the only unconditional writes allowed (r8
    data-plane subset)."""
    import urllib.error

    _, url = server
    with pytest.raises(urllib.error.HTTPError):
        # no precondition header on a nested (object) key
        http_put_conditional(f"{url}/t/_delta_log/k2", b"x")
    # the SDK's markers pass: bare bucket name and trailing-slash dir
    http_put_conditional(f"{url}/bkt", b"")
    http_put_conditional(f"{url}/bkt/dir/", b"")
    # CreateBucket semantics (r9): the real SDK sends a
    # CreateBucketConfiguration BODY for every region but us-east-1,
    # and re-creating an owned bucket is the idempotent 200 — neither
    # may be refused (the body is config, never object data)
    http_put_conditional(
        f"{url}/bkt2",
        b"<CreateBucketConfiguration><LocationConstraint>eu-west-1"
        b"</LocationConstraint></CreateBucketConfiguration>",
    )
    http_put_conditional(f"{url}/bkt2", b"")  # idempotent re-create
    # ADVICE r9: a non-empty bare-name body must actually PARSE as a
    # CreateBucketConfiguration document — arbitrary bytes PUT to a
    # root-level key are DATA, and silently storing b"" for them would
    # weaken the blind-write tripwire to a silent data drop
    with pytest.raises(urllib.error.HTTPError):
        http_put_conditional(f"{url}/bkt3", b"real object payload")
    with pytest.raises(urllib.error.HTTPError):
        http_put_conditional(f"{url}/bkt3", b"<NotBucketConfig/>")


# ---------------------------------------------------------------------------
# manifest CAS: the exactly-one-wins suite over HTTP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "loser_batch,winner_batch", [(BATCH_A, BATCH_B), (BATCH_B, BATCH_A)]
)
def test_contended_http_cas_exactly_one_wins_and_retry_converges(
    spark, tmp_path, server, loser_batch, winner_batch
):
    _, url = server
    store = HttpManifestStore(url)
    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=4, store=store)

    def winner_commits():
        merge_into(
            spark, path, _batch(spark, winner_batch), ["pk"], n_buckets=4, store=store
        )

    store.on_commit = winner_commits
    with pytest.raises(CommitConflict):
        merge_into(
            spark, path, _batch(spark, loser_batch), ["pk"], n_buckets=4, store=store
        )

    manifest, _ = store.load(path)
    assert manifest["version"] == 2  # base + winner only

    # the loser retries from scratch: reload + re-merge on top of the winner
    merge_into(
        spark, path, _batch(spark, loser_batch), ["pk"], n_buckets=4, store=store
    )
    manifest, _ = store.load(path)
    assert manifest["version"] == 3
    assert _state_rows(spark, path, store) == _sequential_result(
        spark, tmp_path, url, winner_batch, loser_batch
    )

    # no orphaned version directory, no dead pointer
    from cdc_apache_cassandra_spark.streaming.materialize import version_dir

    live = {
        version_dir(manifest, v)
        for v in {manifest["buckets"][k] for k in manifest["buckets"]}
    }
    on_disk = {n for n in os.listdir(path) if n.startswith("__ver=")}
    assert on_disk == live
    for b, ver in manifest["buckets"].items():
        bdir = os.path.join(path, version_dir(manifest, ver), f"__bucket={b}")
        assert os.path.isdir(bdir)


def test_parallel_threads_all_commit_over_http(spark, tmp_path, server):
    """Real concurrency against the HTTP CAS: four driver threads race
    merge_into_retrying; every writer lands; the result equals the
    sequential merge (reducer associativity). The emulator enforces the
    precondition atomically, exactly like S3."""
    _, url = server
    store = HttpManifestStore(url)
    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2, store=store)

    batches = [
        [("UPDATE", i, 20 + w, f"w{w}", "x", w, i) for i in range(w, 8, 4)]
        for w in range(4)
    ]
    errors = []

    def writer(w):
        try:
            # each thread gets its own adapter (no shared hook state)
            merge_into_retrying(
                spark, path, _batch(spark, batches[w]), ["pk"],
                n_buckets=2, store=HttpManifestStore(url), max_attempts=10,
            )
        except Exception as e:  # noqa: BLE001
            errors.append((w, repr(e)))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    manifest, _ = store.load(path)
    paths_df = _state_rows(spark, path, store)
    got = {pk: (v, wt) for pk, op, wt, v in paths_df if op != "DELETE"}
    for pk in range(8):
        w = pk % 4
        assert got[pk] == (f"w{w}", 20 + w), (pk, got[pk])


def test_ambiguous_500_after_apply_then_reload_converges(spark, tmp_path, server):
    """The object-store fault CAS must absorb: the PUT applies but the
    writer sees HTTP 500. The writer reloads — its manifest IS there —
    and the next merge lands on top; nothing is lost or doubled."""
    import urllib.error

    srv, url = server
    store = HttpManifestStore(url)
    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2, store=store)
    srv.fail_after_commit(srv.puts + 1)  # next PUT: applied, then 500
    with pytest.raises(urllib.error.HTTPError):
        merge_into(spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=2, store=store)
    manifest, _ = store.load(path)
    assert manifest["version"] == 2  # the 'failed' commit actually landed
    # follow-up merge proceeds normally on top of it
    merge_into(spark, path, _batch(spark, BATCH_B), ["pk"], n_buckets=2, store=store)
    assert _state_rows(spark, path, store) == _sequential_result(
        spark, tmp_path, url, BATCH_A, BATCH_B
    )


# ---------------------------------------------------------------------------
# Delta commit files: create-only publication through the same primitive
# ---------------------------------------------------------------------------


def test_delta_commits_route_through_http_create_only(spark, tmp_path, server):
    """set_log_commit_store(HttpLogCommitStore): every numbered Delta
    commit publishes via conditional PUT (If-None-Match: *). The server
    holds the authoritative copy; racing a second publish of the same
    version raises CommitConflict and the loser's re-diff is a no-op —
    the exact contract the local os.link path has."""
    import cdc_apache_cassandra_spark.streaming.delta_log as dl

    srv, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2)

    prev = dl.set_log_commit_store(HttpLogCommitStore(url))
    try:
        assert dl.delta_export(spark, path, out) == 0
        # authoritative copy is ON THE SERVER, mirrored locally for replay
        from urllib.parse import quote

        commit0 = dl._commit_path(out, 0)
        body, _ = http_get(f"{url}/" + quote(commit0.strip("/"), safe=""))
        assert body is not None and os.path.exists(commit0)
        assert [json.loads(l) for l in body.decode().splitlines()] == [
            json.loads(l) for l in open(commit0)
        ]
        # replay reads the mirrored log normally
        got = sorted(r.pk for r in dl.read_delta(spark, out).collect())
        want = sorted(
            r.pk for r in active_view(read_state(spark, path)).collect()
        )
        assert got == want
        # a second exporter racing the SAME version loses cleanly
        with pytest.raises(CommitConflict):
            dl._write_commit(out, 0, [{"commitInfo": {"timestamp": 1}}])
        # and an incremental follow-up export still works over HTTP
        merge_into(spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=2)
        assert dl.delta_export(spark, path, out) == 1
        got2 = sorted(
            (r.pk, r.v) for r in dl.read_delta(spark, out).collect()
        )
        want2 = sorted(
            (r.pk, r.v) for r in active_view(read_state(spark, path)).collect()
        )
        assert got2 == want2
    finally:
        dl.set_log_commit_store(prev)


def test_http_mirror_makes_default_readers_work(spark, tmp_path, server):
    """HttpManifestStore mirrors the winning manifest locally (default),
    so the module-default readers — read_state, point_read, delta_export,
    the cdc_store scan — see HTTP-committed state; with mirror_local=False
    the same readers take the store explicitly (cross-machine shape)."""
    import cdc_apache_cassandra_spark.streaming.delta_log as dl
    from cdc_apache_cassandra_spark.streaming.materialize import point_read

    _, url = server
    store = HttpManifestStore(url)
    path = str(tmp_path / "store")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2, store=store)

    # default (LocalManifestStore-resolved) readers see the mirror
    st = read_state(spark, path)
    assert st is not None and st.count() == len(BASE)
    pr = point_read(spark, path, ["pk"], [1, 2])
    assert sorted(r.pk for r in pr.collect()) == [1, 2]
    out = str(tmp_path / "delta")
    assert dl.delta_export(spark, path, out) == 0

    # mirror_local=False: default readers see nothing; explicit store works
    store2 = HttpManifestStore(url, mirror_local=False)
    path2 = str(tmp_path / "store2")
    os.makedirs(path2)
    merge_into(spark, path2, _batch(spark, BASE), ["pk"], n_buckets=2, store=store2)
    assert read_state(spark, path2) is None  # no local manifest
    st2 = read_state(spark, path2, store=store2)
    assert st2 is not None and st2.count() == len(BASE)
    pr2 = point_read(spark, path2, ["pk"], [3], store=store2)
    assert [r.pk for r in pr2.collect()] == [3]
    out2 = str(tmp_path / "delta2")
    assert dl.delta_export(spark, path2, out2, manifest_store=store2) == 0
    got = sorted(r.pk for r in dl.read_delta(spark, out2).collect())
    assert got == sorted(b[1] for b in BASE)


def test_log_publish_ambiguous_500_absorbed(spark, tmp_path, server):
    """ADVICE r6 (medium): a Delta-commit PUT that APPLIES but returns
    500 must not livelock the exporter — publish() verifies by content
    (GET; byte-identical body == our commit landed) and proceeds,
    including the local mirror, so replay sees the commit."""
    import cdc_apache_cassandra_spark.streaming.delta_log as dl

    srv, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2)

    prev = dl.set_log_commit_store(HttpLogCommitStore(url))
    try:
        assert dl.delta_export(spark, path, out) == 0
        merge_into(spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=2)
        srv.fail_after_commit(srv.puts + 1)  # commit v1: applied, then 500
        assert dl.delta_export(spark, path, out) == 1  # absorbed, no raise
        # mirror written -> local replay sees both versions
        last, files, _ = (lambda s: (s.last, s.files, s.meta))(dl._replay(out))
        assert last == 1
        got = sorted((r.pk, r.v) for r in dl.read_delta(spark, out).collect())
        want = sorted(
            (r.pk, r.v) for r in active_view(read_state(spark, path)).collect()
        )
        assert got == want
        # and the next export still proceeds normally on top
        merge_into(spark, path, _batch(spark, BATCH_B), ["pk"], n_buckets=2)
        assert dl.delta_export(spark, path, out) == 2
    finally:
        dl.set_log_commit_store(prev)


def test_log_publish_conflict_with_foreign_body_still_raises(tmp_path, server):
    """Content verification must NOT absorb a genuine lost race: the key
    exists with someone else's bytes -> CommitConflict, both on 412 and
    on an ambiguous 500."""
    srv, url = server
    store = HttpLogCommitStore(url, mirror_local=False)
    path = str(tmp_path / "t" / "_delta_log" / ("0" * 20 + ".json"))
    store.publish(path, b'{"theirs":1}\n')
    with pytest.raises(CommitConflict):
        store.publish(path, b'{"ours":2}\n')
    # idempotent retry of OUR OWN bytes is absorbed silently
    store.publish(path, b'{"theirs":1}\n')


def test_read_change_feed_stream_over_http_log_store(
    spark, tmp_path, server
):
    """readChangeFeed × routed log store (mirror mode): a CDF-writing
    export whose commits publish via conditional PUT is tailed by the
    cdc-file stream with logStoreUrl/logStoreMirror — the worker-side
    planner (window plan + incremental timestamp cache) resolves
    through the store context and the output equals the batch CDF."""
    import uuid

    import cdc_apache_cassandra_spark.streaming.delta_log as dl
    from cdc_apache_cassandra_spark.sources.change_feed_source import (
        register as register_feed,
    )

    srv, url = server
    path = str(tmp_path / "store")
    out = str(tmp_path / "delta")
    os.makedirs(path)
    merge_into(spark, path, _batch(spark, BASE), ["pk"], n_buckets=2)
    prev = dl.set_log_commit_store(HttpLogCommitStore(url))
    try:
        dl.delta_export(spark, path, out, change_data_feed=True,
                        cdf_pk_cols=["pk"])
        merge_into(spark, path, _batch(spark, BATCH_A), ["pk"], n_buckets=2)
        dl.delta_export(spark, path, out)
        want = sorted(
            (r.pk, r._change_type, r.v)
            for r in dl.delta_changes_cdf(spark, out, 0, 1).collect()
        )
    finally:
        dl.set_log_commit_store(prev)
    register_feed(spark)
    name = "httpcdf_" + uuid.uuid4().hex[:10]
    q = (
        spark.readStream.format("cdc_delta_changes")
        .option("path", out)
        .option("readChangeFeed", "true")
        .option("maxVersionsPerBatch", 1)
        .option("logStoreUrl", url)
        .option("logStoreMirror", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.pk, r._change_type, r.v) for r in spark.table(name).collect()
    )
    assert got == want
