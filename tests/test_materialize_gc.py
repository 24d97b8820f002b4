"""Manifest bucket stats, incremental tombstone GC, and bucket-routed
point reads — the store's 'IO proportional to what you touch' contract
extended from writes to GC and key lookups."""

import json
import os

import pytest

from cdc_apache_cassandra_spark.streaming.materialize import (
    MANIFEST,
    active_view,
    compact,
    expired_tombstone_buckets,
    merge_into,
    point_read,
    read_state,
)

SCHEMA = (
    "op string, pk long, writetime long, v string, w string, "
    "segment long, position long"
)


def _manifest(path):
    return json.load(open(os.path.join(path, MANIFEST)))


@pytest.fixture()
def store(spark, tmp_path):
    """64 keys over 8 buckets, then tombstone two keys: both WIN their
    key's LWW (newer than the insert at wt=10), one already expired vs
    horizon=50 (wt=20) and one still protected (wt=100)."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    base = spark.createDataFrame(
        [("INSERT", i, 10, f"v{i}", "x", 0, i) for i in range(64)], SCHEMA
    )
    merge_into(spark, path, base, ["pk"], n_buckets=8)
    dels = spark.createDataFrame(
        [
            ("DELETE", 3, 20, None, None, 0, 100),  # expired vs horizon=50
            ("DELETE", 7, 100, None, None, 0, 101),  # still protected
        ],
        SCHEMA,
    )
    merge_into(spark, path, dels, ["pk"])
    return path


def test_manifest_records_bucket_stats(spark, store):
    m = _manifest(store)
    stats = m["stats"]
    assert set(stats) == set(m["buckets"])  # every live bucket has stats
    # stats agree with the files they describe
    state = read_state(spark, store)
    assert sum(s["rows"] for s in stats.values()) == state.count()
    assert sum(s["tombstones"] for s in stats.values()) == 2
    with_dels = [b for b, s in stats.items() if s["tombstones"]]
    assert len(with_dels) in (1, 2)  # pk=3 / pk=7 may share a bucket
    for b, s in stats.items():
        if s["tombstones"] == 0:
            assert s["min_del_wt"] is None


def test_expired_bucket_selection_from_stats_alone(store):
    m = _manifest(store)
    got = expired_tombstone_buckets(m, tombstone_horizon=50)
    # exactly the bucket(s) holding the wt=20 tombstone, chosen w/o IO
    assert got and all(m["stats"][str(b)]["min_del_wt"] < 50 for b in got)
    assert expired_tombstone_buckets(m, tombstone_horizon=1) == []
    # a bucket with no stats entry is conservatively a candidate
    m2 = json.loads(json.dumps(m))
    victim = next(iter(m2["buckets"]))
    del m2["stats"][victim]
    assert int(victim) in expired_tombstone_buckets(m2, 1)


def test_incremental_compact_touches_only_expired_buckets(spark, store):
    m_before = _manifest(store)
    targets = expired_tombstone_buckets(m_before, 50)
    compact(spark, store, ["pk"], tombstone_horizon=50, only_expired=True)
    m_after = _manifest(store)
    moved = [
        b
        for b in m_before["buckets"]
        if m_after["buckets"].get(b) != m_before["buckets"][b]
    ]
    assert sorted(int(b) for b in moved) == targets  # GC IO ∝ expired buckets
    state = read_state(spark, store)
    # expired tombstone gone, protected one retained, live rows intact
    assert state.filter("op = 'DELETE' AND pk = 3").count() == 0
    assert state.filter("op = 'DELETE' AND pk = 7").count() == 1
    assert active_view(state).count() == 62
    # stats refreshed for the rewritten buckets
    assert sum(s["tombstones"] for s in m_after["stats"].values()) == 1
    # idempotent: nothing expired remains, second GC is a no-op commit-wise
    v = m_after["version"]
    compact(spark, store, ["pk"], tombstone_horizon=50, only_expired=True)
    assert _manifest(store)["version"] == v


def test_incremental_compact_matches_full_compact(spark, store, tmp_path):
    """Same observable state whichever GC ran."""
    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(store, clone)
    compact(spark, store, ["pk"], tombstone_horizon=50, only_expired=True)
    compact(spark, clone, ["pk"], tombstone_horizon=50)
    a = read_state(spark, store).select("op", "pk", "writetime", "v")
    b = read_state(spark, clone).select("op", "pk", "writetime", "v")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_incremental_compact_drops_fully_expired_bucket(spark, tmp_path):
    """A bucket whose every row is an expired tombstone disappears from
    the manifest (and its pointer no longer lists files)."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    only = spark.createDataFrame(
        [("DELETE", 1, 5, None, None, 0, 0)], SCHEMA
    )
    merge_into(spark, path, only, ["pk"], n_buckets=4)
    assert len(_manifest(path)["buckets"]) == 1
    compact(spark, path, ["pk"], tombstone_horizon=50, only_expired=True)
    m = _manifest(path)
    assert m["buckets"] == {} and m.get("stats", {}) == {}
    assert read_state(spark, path) is None


def test_point_read_routes_to_single_bucket(spark, store):
    got = point_read(spark, store, ["pk"], [3, 7, 12])
    rows = {r.pk: r for r in got.collect()}
    assert set(rows) == {3, 7, 12}
    assert rows[3].op == "DELETE" and rows[7].op == "DELETE"
    assert rows[12].op == "INSERT" and rows[12].v == "v12"
    # live-only view hides the tombstones
    assert {r.pk for r in active_view(got).collect()} == {12}
    # a key that never existed: no row at all (miss ≠ tombstone)
    assert point_read(spark, store, ["pk"], [9999]).count() == 0


def test_point_read_lists_only_routed_bucket(spark, store):
    """A single key's read plans over exactly one bucket directory —
    the whole point of hash routing (IO ∝ requested keys, not table)."""
    from pyspark.sql import functions as F

    one = point_read(spark, store, ["pk"], [12])
    dirs = {
        os.path.dirname(r[0])
        for r in one.select(F.input_file_name()).distinct().collect()
    }
    assert len(dirs) == 1  # exactly one __bucket directory listed
