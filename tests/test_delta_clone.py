"""delta_clone — Delta's SHALLOW CLONE: a new table referencing the
source snapshot's files by absolute path (zero bytes copied), DV
descriptors rebased to absolute form, export-continuation onto the
clone, and clone-side VACUUM never touching the source."""

import json
import os

import pyarrow as pa
import pytest

from cdc_apache_cassandra_spark.streaming import foreign_delta as fx
from cdc_apache_cassandra_spark.streaming.delta_log import (
    delta_clone,
    delta_export,
    delta_vacuum,
    read_delta,
)
from cdc_apache_cassandra_spark.streaming.materialize import merge_into

SCHEMA = (
    "op string, pk long, writetime long, v string, segment long, position long"
)

B0 = [("INSERT", i, 10, f"v{i}", 0, i) for i in range(8)]
B1 = [("UPDATE", 1, 20, "u1", 1, 0), ("DELETE", 3, 20, None, 1, 1)]
B2 = [("INSERT", 9, 30, "nine", 2, 0)]


def _rows(df):
    return sorted((r.pk, r.v) for r in df.collect())


def test_shallow_clone_reads_and_versions(spark, tmp_path):
    store = str(tmp_path / "store")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    os.makedirs(store)
    for b in (B0, B1):
        merge_into(spark, store, spark.createDataFrame(b, SCHEMA), ["pk"],
                   n_buckets=4)
        delta_export(spark, store, src)
    assert delta_clone(spark, src, dst) == 0
    assert _rows(read_delta(spark, dst)) == _rows(read_delta(spark, src))
    # the clone's commit: protocol copied, fresh table id, all adds
    # absolute into the SOURCE
    acts = [json.loads(x)
            for x in open(os.path.join(dst, "_delta_log",
                                       f"{0:020d}.json")) if x.strip()]
    next(a["metaData"] for a in acts if "metaData" in a)  # present
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(os.path.isabs(a["path"]) for a in adds)
    assert all(a["path"].startswith(os.path.abspath(src)) for a in adds)
    # cloning an EARLIER version serves that snapshot
    dst0 = str(tmp_path / "dst0")
    delta_clone(spark, src, dst0, version=0)
    assert _rows(read_delta(spark, dst0)) == _rows(
        read_delta(spark, src, version=0))
    # existing target refuses
    with pytest.raises(ValueError, match="already has a Delta log"):
        delta_clone(spark, src, dst)


def test_clone_then_export_continues_incrementally(spark, tmp_path):
    """Export onto a clone: the cloned adds keep their bucket tags and
    the memo carries over, so the next delta_export diffs against the
    CLONED state and converges to the store head."""
    store = str(tmp_path / "store")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    os.makedirs(store)
    for b in (B0, B1):
        merge_into(spark, store, spark.createDataFrame(b, SCHEMA), ["pk"],
                   n_buckets=4)
        delta_export(spark, store, src)
    delta_clone(spark, src, dst)
    merge_into(spark, store, spark.createDataFrame(B2, SCHEMA), ["pk"],
               n_buckets=4)
    v = delta_export(spark, store, dst)
    assert v == 1
    from cdc_apache_cassandra_spark.operators.lww import last_write_wins

    want = _rows(
        last_write_wins(
            spark.createDataFrame(B0 + B1 + B2, SCHEMA), ["pk"]
        ).filter("op <> 'DELETE'")
    )
    assert _rows(read_delta(spark, dst)) == want
    # the source is untouched by the clone's new commit
    assert len(_rows(read_delta(spark, src))) == 7


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    store = str(tmp_path / "store")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    os.makedirs(store)
    merge_into(spark, store, spark.createDataFrame(B0, SCHEMA), ["pk"],
               n_buckets=2)
    delta_export(spark, store, src)
    delta_clone(spark, src, dst)
    assert delta_vacuum(dst, retain_ms=0) == []
    assert _rows(read_delta(spark, dst)) == _rows(read_delta(spark, src))


def test_clone_rebases_dv_descriptors(spark, tmp_path):
    """A cloned table whose source carries 'u'-form deletion vectors
    reads the masked state correctly: descriptors convert to 'p'
    (absolute), because relative payloads resolve against the table
    root that just changed."""
    from cdc_apache_cassandra_spark.streaming.deletion_vectors import (
        write_dv_file,
    )

    src = str(tmp_path / "ftable")
    os.makedirs(src)
    data = pa.table({"pk": list(range(10)), "v": [10 * i for i in range(10)]})
    add0 = fx.write_data_file(src, "part-000.parquet", data,
                              stats_cols=["pk"])
    fx.write_commit(src, 0, [
        fx.protocol_action(3, 7, reader_features=["deletionVectors"],
                           writer_features=["deletionVectors"]),
        fx.metadata_action(
            [fx.field("pk", "long"), fx.field("v", "long")]),
        add0,
    ])
    dv = write_dv_file(None, [[2, 5]], table_root=src)[0]
    add1 = dict(add0["add"])
    add1["deletionVector"] = dv
    fx.write_commit(src, 1, [
        {"remove": {"path": add1["path"], "deletionTimestamp": 1,
                    "dataChange": True}},
        {"add": add1},
    ])
    dst = str(tmp_path / "dst")
    delta_clone(spark, src, dst)
    acts = [json.loads(x)
            for x in open(os.path.join(dst, "_delta_log",
                                       f"{0:020d}.json")) if x.strip()]
    dvs = [a["add"]["deletionVector"] for a in acts
           if "add" in a and a["add"].get("deletionVector")]
    assert dvs and all(d["storageType"] == "p" for d in dvs)
    got = sorted(r.pk for r in read_delta(spark, dst).collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
