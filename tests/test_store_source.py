"""cdc_store scan format + driver-side xxhash64 parity (SURVEY O2 as SQL).

Two safety-critical contracts, each pinned against the JVM:

1. functions/xxhash64_py.py must be BIT-EXACT with Catalyst's ``xxhash64``
   expression for every pushdown-supported type and for multi-column
   chains — a silent divergence would route point reads to the wrong
   bucket (= silently empty results, never an error).
2. The cdc_store DataSource must return exactly what the store's own
   helper views return, with and without pushdown pruning, on both store
   kinds (plain LWW; compound refused in 'active' mode).
"""

from __future__ import annotations

import datetime
import json
import os
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import EqualTo, In

from cdc_apache_cassandra_spark.functions.xxhash64_py import (
    spark_bucket,
    xxhash64_columns,
)
from cdc_apache_cassandra_spark.operators.lww import (
    compound_active_view,
    compound_reduce,
)
from cdc_apache_cassandra_spark.sources.store_source import (
    StoreScanReader,
    register,
)
from cdc_apache_cassandra_spark.streaming.materialize import (
    active_view,
    merge_into,
    point_read,
    read_state,
)

# ---------------------------------------------------------------------------
# 1. hash parity: every supported type, vs the JVM expression
# ---------------------------------------------------------------------------

_TYPE_CASES = [
    # (spark type, values incl. edge cases)
    (T.ByteType(), [0, 1, -1, 127, -128]),
    (T.ShortType(), [0, 257, -32768, 32767]),
    (T.IntegerType(), [0, 42, -1, 2**31 - 1, -(2**31)]),
    (T.LongType(), [0, 42, -1, 2**63 - 1, -(2**63)]),
    (T.BooleanType(), [True, False]),
    (T.FloatType(), [0.0, -0.0, 1.5, -3.25, 3.4e38]),
    (T.DoubleType(), [0.0, -0.0, 2.5, -1e300, 1e-300]),
    (
        T.StringType(),
        [
            "",
            "a",
            "abcd",
            "abcdefg",  # 4-byte + tail lanes
            "exactly-eight!!!"[:8],
            "this-string-is-at-least-thirty-two-bytes-long",  # 32B stripes
            "ünïcodé-ключ-鍵",  # multi-byte UTF-8
        ],
    ),
    (T.BinaryType(), [b"", b"\x00", b"\xff" * 7, bytes(range(64))]),
    (
        T.DateType(),
        [
            datetime.date(1970, 1, 1),
            datetime.date(1969, 12, 31),
            datetime.date(2024, 2, 29),
        ],
    ),
]


@pytest.mark.parametrize(
    "dtype,values", _TYPE_CASES, ids=[t.simpleString() for t, _ in _TYPE_CASES]
)
def test_xxhash64_parity_per_type(spark, dtype, values):
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType(), False),
            T.StructField("v", dtype, True),
        ]
    )
    df = spark.createDataFrame(list(enumerate(values)), schema=schema)
    got = {
        r["i"]: (r["v"], r["h"])
        for r in df.select("i", "v", F.xxhash64("v").alias("h")).collect()
    }
    for i in range(len(values)):
        v, h = got[i]  # v as SPARK round-tripped it (e.g. float32 width)
        v = bytes(v) if isinstance(v, bytearray) else v
        assert h == xxhash64_columns([v], [dtype]), (dtype, values[i], v)


def test_xxhash64_null_skipped(spark):
    """Nulls contribute nothing: hash(null, x) == hash(x) (Spark rule)."""
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame([(None, "k"), (7, None), (None, None)], schema)
    rows = df.select("a", "b", F.xxhash64("a", "b").alias("h")).collect()
    types = [T.LongType(), T.StringType()]
    for r in rows:
        assert r["h"] == xxhash64_columns([r["a"], r["b"]], types)
    # null-skip equivalence against the single-column chains
    assert xxhash64_columns([None, "k"], types) == xxhash64_columns(
        ["k"], [T.StringType()]
    )
    assert xxhash64_columns([7, None], types) == xxhash64_columns(
        [7], [T.LongType()]
    )


def test_xxhash64_multi_column_chain_parity(spark):
    """The running-hash-as-seed chain over mixed types, vs the JVM."""
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.IntegerType(), True),
            T.StructField("d", T.DoubleType(), True),
        ]
    )
    data = [
        (1, "x", 2, 3.5),
        (-9, "long-enough-to-hit-the-32-byte-stripe-path", 0, -0.0),
        (None, "mid-null", 5, 1.25),
        (2**62, None, None, None),
    ]
    df = spark.createDataFrame(data, schema)
    rows = df.select(
        "a", "b", "c", "d", F.xxhash64("a", "b", "c", "d").alias("h")
    ).collect()
    types = [t.dataType for t in schema.fields]
    for r in rows:
        assert r["h"] == xxhash64_columns([r[c] for c in "abcd"], types)


def test_spark_bucket_matches_bucket_expr(spark):
    """pmod(xxhash64, n) — the exact routing expression merge_into uses."""
    from cdc_apache_cassandra_spark.streaming.materialize import _bucket_expr

    df = spark.range(-50, 50).select(F.col("id").cast("long").alias("pk"))
    rows = df.select("pk", _bucket_expr(["pk"], 16).alias("b")).collect()
    for r in rows:
        assert r["b"] == spark_bucket([r["pk"]], [T.LongType()], 16)


# ---------------------------------------------------------------------------
# 2. scan correctness: cdc_store == helper views
# ---------------------------------------------------------------------------


def _lww_events(spark, n=200):
    return spark.range(0, n).select(
        F.col("id").alias("pk"),
        F.when(F.col("id") % 7 == 0, "DELETE").otherwise("INSERT").alias("op"),
        (F.col("id") * 1000).alias("writetime"),
        F.col("id").cast("long").alias("segment"),
        F.col("id").cast("long").alias("position"),
        F.concat(F.lit("name-"), F.col("id")).alias("c_name"),
    )


@pytest.fixture(scope="module")
def lww_store(spark):
    path = tempfile.mkdtemp(prefix="t_store_src_")
    merge_into(spark, path, _lww_events(spark), ["pk"], n_buckets=8)
    register(spark)
    return path


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_scan_state_equals_read_state(spark, lww_store):
    scan = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .load()
    )
    direct = read_state(spark, lww_store)
    assert scan.schema == direct.select(*scan.columns).schema
    assert _sorted_rows(scan) == _sorted_rows(direct.select(*scan.columns))


def test_scan_active_equals_active_view(spark, lww_store):
    scan = spark.read.format("cdc_store").option("path", lww_store).load()
    direct = active_view(read_state(spark, lww_store))
    assert _sorted_rows(scan) == _sorted_rows(direct.select(*scan.columns))


def test_schema_comes_from_manifest_not_footers(lww_store):
    m = json.load(open(os.path.join(lww_store, "_MANIFEST.json")))
    assert "schema" in m and m["kind"] == "lww"
    fields = [f["name"] for f in json.loads(m["schema"])["fields"]]
    assert fields == ["pk", "op", "writetime", "segment", "position", "c_name"]


def _reader(lww_store, spark, mode="state"):
    schema = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", mode)
        .load()
        .schema
    )
    return StoreScanReader({"path": lww_store, "mode": mode}, schema)


def test_equalto_pushdown_prunes_partitions(spark, lww_store):
    r = _reader(lww_store, spark)
    all_parts = len(r.partitions())
    unhandled = r.pushFilters([EqualTo(("pk",), 5)])
    # every filter is returned to Spark (pruning only narrows files)
    assert [type(f) for f in unhandled] == [EqualTo]
    expect = {str(spark_bucket([5], [T.LongType()], 8))}
    assert r.routed == expect
    routed = r.partitions()
    assert len(routed) < all_parts
    # partitions() CONSUMES the pushed state (per-action pruning — see
    # the scan-reuse limitation note): a follow-up plan with no
    # pushFilters call scans everything
    assert r.routed is None and len(r.partitions()) == all_parts


def test_equalto_pushdown_results_match_unpruned(spark, lww_store):
    scan = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .load()
        .filter(F.col("pk") == 5)
    )
    direct = read_state(spark, lww_store).filter(F.col("pk") == 5)
    assert _sorted_rows(scan) == _sorted_rows(direct.select(*scan.columns))


def test_in_pushdown_routes_and_matches(spark, lww_store):
    r = _reader(lww_store, spark)
    r.pushFilters([In(("pk",), (3, 5, 9, 300))])
    expect = {
        str(spark_bucket([k], [T.LongType()], 8)) for k in (3, 5, 9, 300)
    }
    assert r.routed == expect
    scan = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .load()
        .filter(F.col("pk").isin(3, 5, 9, 300))
    )
    assert sorted(row["pk"] for row in scan.collect()) == [3, 5, 9]


def test_tombstone_visible_in_state_hidden_in_active(spark, lww_store):
    # pk=7 is a DELETE winner: state scan shows the tombstone row,
    # active hides it — the tombstone-vs-miss contract
    state = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .load()
        .filter(F.col("pk") == 7)
        .collect()
    )
    assert len(state) == 1 and state[0]["op"] == "DELETE"
    act = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .load()
        .filter(F.col("pk") == 7)
        .collect()
    )
    assert act == []


def test_absent_key_yields_empty_relation(spark, lww_store):
    got = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .load()
        .filter(F.col("pk") == 10**9)
    )
    assert got.count() == 0
    assert got.columns[0] == "pk"  # well-formed schema on the empty scan


def test_non_key_filter_does_not_route(spark, lww_store):
    r = _reader(lww_store, spark)
    r.pushFilters([EqualTo(("c_name",), "name-5")])
    assert r.routed is None  # bucket key not pinned: no pruning


def test_scan_equals_point_read_for_literal_keys(spark, lww_store):
    """The declarative point read (filter pushdown) equals the helper
    point_read for the same keys — one routing semantics, two surfaces."""
    keys = [3, 7, 14, 999999]
    scan = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .load()
        .filter(F.col("pk").isin(keys))
    )
    helper = point_read(spark, lww_store, ["pk"], keys)
    assert _sorted_rows(scan) == _sorted_rows(helper.select(*scan.columns))


# ---------------------------------------------------------------------------
# 3. schema evolution through the scan
# ---------------------------------------------------------------------------


def test_evolved_schema_nulls_old_buckets(spark):
    path = tempfile.mkdtemp(prefix="t_store_evolve_")
    merge_into(spark, path, _lww_events(spark, 40), ["pk"], n_buckets=4)
    evolved = _lww_events(spark, 10).withColumn(
        "c_tier", F.lit("gold")
    ).withColumn("pk", F.col("pk") + 1000)
    merge_into(spark, path, evolved, ["pk"], n_buckets=4)
    register(spark)

    def scan():
        # fresh relation per query — the documented contract under the
        # Spark scan-reuse limitation (see the module docstring and
        # test_spark_reuses_pushdown_pruned_scan)
        return (
            spark.read.format("cdc_store")
            .option("path", path)
            .option("mode", "state")
            .load()
        )

    assert "c_tier" in scan().columns
    old = scan().filter(F.col("pk") < 1000)
    assert old.filter(F.col("c_tier").isNotNull()).count() == 0
    new = scan().filter(F.col("pk") >= 1000)
    assert new.filter(F.col("c_tier") == "gold").count() == new.count()
    direct = read_state(spark, path)
    s = scan()
    assert _sorted_rows(s) == _sorted_rows(direct.select(*s.columns))


# ---------------------------------------------------------------------------
# 4. multi-column bucket keys
# ---------------------------------------------------------------------------


def test_multi_column_bucket_routing(spark):
    path = tempfile.mkdtemp(prefix="t_store_multi_")
    df = spark.range(0, 100).select(
        (F.col("id") % 10).cast("long").alias("a"),
        F.concat(F.lit("k"), (F.col("id") / 10).cast("int")).alias("b"),
        F.lit("INSERT").alias("op"),
        F.col("id").alias("writetime"),
        F.lit(0).cast("long").alias("segment"),
        F.col("id").alias("position"),
    )
    merge_into(spark, path, df, ["a", "b"], n_buckets=8)
    register(spark)
    schema = (
        spark.read.format("cdc_store").option("path", path).load().schema
    )
    r = StoreScanReader({"path": path, "mode": "state"}, schema)
    total = len(r.partitions())
    # full key pinned -> routed
    r.pushFilters([EqualTo(("a",), 3), EqualTo(("b",), "k1")])
    assert r.routed == {
        str(spark_bucket([3, "k1"], [T.LongType(), T.StringType()], 8))
    }
    assert len(r.partitions()) <= total
    # half the key pinned -> NOT routed (hash needs the full key)
    r2 = StoreScanReader({"path": path, "mode": "state"}, schema)
    r2.pushFilters([EqualTo(("a",), 3)])
    assert r2.routed is None
    got = (
        spark.read.format("cdc_store")
        .option("path", path)
        .load()
        .filter((F.col("a") == 3) & (F.col("b") == "k1"))
        .collect()
    )
    assert len(got) == 1 and got[0]["writetime"] == 13


# ---------------------------------------------------------------------------
# 5. compound stores: 'active' refused, state + view is the blessed path
# ---------------------------------------------------------------------------


def _compound_events(spark):
    rows = [
        # pk_p, pk_c, ptype, op, writetime, s_mktsegment, v_totalprice
        Row(pk_p=1, pk_c=10, ptype="ROW", op="INSERT", writetime=100, s_mktsegment=None, v_totalprice=1.0),
        Row(pk_p=1, pk_c=11, ptype="ROW", op="INSERT", writetime=150, s_mktsegment=None, v_totalprice=2.0),
        # partition-range tombstone newer than pk_c=10 but older than a
        # later re-insert of pk_c=11: dominance is cross-row
        Row(pk_p=1, pk_c=None, ptype="PARTITION_KEY_ROW_DELETION", op="DELETE", writetime=200, s_mktsegment=None, v_totalprice=None),
        Row(pk_p=1, pk_c=11, ptype="ROW", op="INSERT", writetime=250, s_mktsegment=None, v_totalprice=3.0),
        Row(pk_p=2, pk_c=20, ptype="ROW", op="INSERT", writetime=100, s_mktsegment=None, v_totalprice=4.0),
        Row(pk_p=2, pk_c=None, ptype="STATIC", op="INSERT", writetime=120, s_mktsegment="AUTO", v_totalprice=None),
    ]
    return spark.createDataFrame(rows)


def test_compound_store_refuses_active_mode(spark):
    path = tempfile.mkdtemp(prefix="t_store_compound_")
    merge_into(
        spark,
        path,
        _compound_events(spark),
        pk_cols=["pk_p", "pk_c"],
        bucket_cols=["pk_p"],
        reducer=compound_reduce,
        kind="compound",
        n_buckets=4,
    )
    register(spark)
    with pytest.raises(Exception, match="kind='compound'"):
        spark.read.format("cdc_store").option("path", path).load().collect()
    # and the raw op filter WOULD have been wrong: pk_c=10 is dominated
    state = (
        spark.read.format("cdc_store")
        .option("path", path)
        .option("mode", "state")
        .load()
    )
    naive = state.filter(F.col("op") != "DELETE")
    assert naive.filter((F.col("pk_p") == 1) & (F.col("pk_c") == 10)).count() == 1
    # blessed path: state scan + compound_active_view == helper chain
    via_scan = compound_active_view(state)
    direct = compound_active_view(read_state(spark, path))
    assert _sorted_rows(via_scan.select(*direct.columns)) == _sorted_rows(direct)
    live = {(r["pk_p"], r["pk_c"]) for r in via_scan.collect()}
    assert live == {(1, 11), (2, 20)}  # pk_c=10 dominated by the range tombstone


def test_kind_marker_is_write_once(spark):
    path = tempfile.mkdtemp(prefix="t_store_kind_")
    ev = _compound_events(spark)
    merge_into(
        spark, path, ev, ["pk_p", "pk_c"], bucket_cols=["pk_p"],
        reducer=compound_reduce, kind="compound", n_buckets=4,
    )
    with pytest.raises(ValueError, match="kind"):
        merge_into(spark, path, ev, ["pk_p", "pk_c"], bucket_cols=["pk_p"])


def test_kind_inherits_for_custom_reducer_re_merge(spark):
    """Incremental re-merges with a custom reducer don't restate kind —
    it inherits; but the DEFAULT reducer (implied lww) into a compound
    store still raises (it would corrupt the state, not just the view)."""
    path = tempfile.mkdtemp(prefix="t_store_kind_inherit_")
    ev = _compound_events(spark)
    merge_into(
        spark, path, ev, ["pk_p", "pk_c"], bucket_cols=["pk_p"],
        reducer=compound_reduce, kind="compound", n_buckets=4,
    )
    # custom reducer, no kind: inherits, no raise
    merge_into(
        spark, path, ev, ["pk_p", "pk_c"], bucket_cols=["pk_p"],
        reducer=compound_reduce, n_buckets=4,
    )
    m = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert m["kind"] == "compound"
    # default reducer implies lww: refused on a compound store
    with pytest.raises(ValueError, match="implied by the default LWW"):
        merge_into(spark, path, ev, ["pk_p", "pk_c"], bucket_cols=["pk_p"])


def _strip_manifest(path, *fields):
    mf = os.path.join(path, "_MANIFEST.json")
    m = json.load(open(mf))
    for f in fields:
        m.pop(f, None)
    json.dump(m, open(mf, "w"))
    return m


def test_legacy_store_partial_merge_does_not_narrow_schema(spark):
    """A LEGACY store (no recorded schema) whose evolved column lives
    only in untouched buckets: a partial merge must NOT record a
    narrowed schema; the scan keeps unioning footers (column visible);
    compact() (full coverage) then records the true table schema."""
    from cdc_apache_cassandra_spark.streaming.materialize import compact

    path = tempfile.mkdtemp(prefix="t_store_legacy_")
    merge_into(spark, path, _lww_events(spark, 40), ["pk"], n_buckets=4)
    evolved = (
        _lww_events(spark, 10)
        .withColumn("c_tier", F.lit("gold"))
        .withColumn("pk", F.col("pk") + 1000)
    )
    merge_into(spark, path, evolved, ["pk"], n_buckets=4)
    _strip_manifest(path, "schema", "kind")  # simulate a pre-r6 manifest

    # partial merge touching one bucket, OLD (narrow) schema
    merge_into(
        spark, path, _lww_events(spark, 3).withColumn("pk", F.col("pk") + 5000),
        ["pk"], n_buckets=4,
    )
    m = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert "schema" not in m  # never recorded from partial coverage
    register(spark)
    scan = (
        spark.read.format("cdc_store")
        .option("path", path)
        .option("mode", "state")
        .load()
    )
    assert "c_tier" in scan.columns  # footer-union fallback still wide
    assert scan.filter(F.col("c_tier") == "gold").count() == 10

    compact(spark, path, ["pk"])  # full rewrite records the TRUE schema
    m2 = json.load(open(os.path.join(path, "_MANIFEST.json")))
    fields = [f["name"] for f in json.loads(m2["schema"])["fields"]]
    assert "c_tier" in fields
    scan2 = (
        spark.read.format("cdc_store")
        .option("path", path)
        .option("mode", "state")
        .load()
    )
    assert scan2.filter(F.col("c_tier") == "gold").count() == 10


def test_legacy_store_without_kind_refuses_active(spark):
    """A manifest without the kind marker is indistinguishable from a
    compound store — 'active' is refused until one merge records it."""
    path = tempfile.mkdtemp(prefix="t_store_nokin_")
    merge_into(spark, path, _lww_events(spark, 20), ["pk"], n_buckets=4)
    _strip_manifest(path, "kind")
    register(spark)
    with pytest.raises(Exception, match="kind=None"):
        spark.read.format("cdc_store").option("path", path).load().collect()
    # one merge records kind='lww' and active works again
    merge_into(spark, path, _lww_events(spark, 2), ["pk"], n_buckets=4)
    got = spark.read.format("cdc_store").option("path", path).load()
    assert got.count() > 0


def test_point_read_accepts_generator_keys(spark, lww_store):
    """Literal keys may be any iterable — materialized once (a generator
    must not be exhausted before routing)."""
    got = point_read(spark, lww_store, ["pk"], (k for k in [3, 7, 999]))
    assert sorted(r["pk"] for r in got.collect()) == [3, 7]


def test_point_read_unmapped_key_type_falls_back_to_jvm(spark):
    """A key type the Python hash port doesn't map (timestamp) routes
    through the JVM expression instead of crashing — same result, one
    metadata-sized Spark job."""
    path = tempfile.mkdtemp(prefix="t_store_tskey_")
    df = spark.range(0, 50).select(
        F.timestamp_seconds(F.col("id") * 3600).alias("pk"),
        F.lit("INSERT").alias("op"),
        F.col("id").alias("writetime"),
        F.lit(0).cast("long").alias("segment"),
        F.col("id").alias("position"),
    )
    merge_into(spark, path, df, ["pk"], n_buckets=4)
    keys = [datetime.datetime(1970, 1, 1, 3, 0, 0)]  # id=3's timestamp
    got = point_read(spark, path, ["pk"], keys)
    assert [r["writetime"] for r in got.collect()] == [3]


def test_custom_index_store_without_op_columns_routes_by_cell(spark):
    """The persisted-ANN-index shape (VERDICT r8 item 5): a custom-kind
    store whose rows carry NO op/writetime columns commits cleanly
    (bucket stats degrade to rows-only), buckets on a NON-pk column
    (bucket_cols=['cid'] co-locates each cell), and a probe's
    cid-IN filter routes the scan to only the probed cells' buckets."""
    register(spark)
    root = tempfile.mkdtemp(prefix="ann_index_store_")
    rows = [Row(vec_id=i, cid=i % 5, payload=f"m{i}") for i in range(50)]
    merge_into(
        spark, root, spark.createDataFrame(rows), ["vec_id"],
        n_buckets=8, bucket_cols=["cid"],
        reducer=lambda df: df.dropDuplicates(["vec_id"]), kind="ann_index",
    )
    # state scan sees everything; active mode must REFUSE (kind != lww)
    scan = (
        spark.read.format("cdc_store").option("path", root)
        .option("mode", "state").load()
    )
    assert scan.count() == 50
    with pytest.raises(Exception, match="ann_index|active"):
        spark.read.format("cdc_store").option("path", root).load().collect()
    # probe: IN over the bucket column routes to only those buckets
    r = _reader(root, spark)
    all_parts = len(r.partitions())
    r2 = _reader(root, spark)
    r2.pushFilters([In(("cid",), (1, 3))])
    expect = {str(spark_bucket([c], [T.LongType()], 8)) for c in (1, 3)}
    assert r2.routed == expect
    assert len(r2.partitions()) < all_parts
    got = (
        spark.read.format("cdc_store").option("path", root)
        .option("mode", "state").load()
        .filter(F.col("cid").isin(1, 3))
    )
    assert sorted(row["vec_id"] for row in got.collect()) == sorted(
        i for i in range(50) if i % 5 in (1, 3)
    )
    # a second incremental batch merges without disturbing semantics
    more = [Row(vec_id=100 + i, cid=i % 5, payload=f"n{i}") for i in range(10)]
    merge_into(
        spark, root, spark.createDataFrame(more), ["vec_id"],
        n_buckets=8, bucket_cols=["cid"],
        reducer=lambda df: df.dropDuplicates(["vec_id"]), kind="ann_index",
    )
    assert read_state(spark, root).count() == 60


# --- row-group stats pruning from pushed comparison predicates (r10) ---------


def test_range_pushdown_prunes_row_groups(tmp_path):
    """Pushed comparison predicates prune ROW GROUPS by footer stats,
    worker-side and conservatively (strict bounds treated inclusively;
    missing stats keep the group)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdc_apache_cassandra_spark.sources.store_source import (
        StoreScanReader,
    )
    from pyspark.sql.datasource import (
        GreaterThan,
        In,
        LessThanOrEqual,
    )

    # three row groups with disjoint writetime bands: [0..9], [10..19], [20..29]
    f = str(tmp_path / "rg.parquet")
    pq.write_table(
        pa.table({"pk": list(range(30)), "writetime": list(range(30))}),
        f,
        row_group_size=10,
    )
    reader = StoreScanReader.__new__(StoreScanReader)  # mechanics only
    reader.ranges = {}
    reader.routed = None
    reader.pushdown = True
    reader.manifest = {"n_buckets": 1}
    reader.spark_schema = T.StructType()
    # GreaterThan 12 AND <= 25 -> groups 1 and 2 (strict bound inclusive)
    out = StoreScanReader.pushFilters(
        reader,
        [GreaterThan(("writetime",), 12), LessThanOrEqual(("writetime",), 25)],
    )
    assert list(out)  # filters flow back to Spark
    assert reader.ranges == {"writetime": [12, 25]}
    pf = pq.ParquetFile(f)
    assert StoreScanReader._keep_row_groups(pf, reader.ranges) == [1, 2]
    # In-list collapses to [min, max]
    reader.ranges = {}
    StoreScanReader.pushFilters(reader, [In(("writetime",), (4, 7))])
    assert reader.ranges == {"writetime": [4, 7]}
    assert StoreScanReader._keep_row_groups(pf, reader.ranges) == [0]
    # interval past the data: every group pruned
    assert StoreScanReader._keep_row_groups(pf, {"writetime": [100, None]}) == []
    # unknown column: everything kept
    assert StoreScanReader._keep_row_groups(pf, {"absent": [0, 1]}) == [0, 1, 2]


def test_range_pushdown_scan_matches_unpruned(spark, tmp_path):
    """End-to-end: a writetime-range scan through cdc_store returns
    exactly what the unfiltered scan filtered after the fact returns —
    pruning is IO-only."""
    from cdc_apache_cassandra_spark.streaming.materialize import merge_into
    from cdc_apache_cassandra_spark.sources.store_source import (
        register as register_store,
    )

    root = str(tmp_path / "s")
    rows = [
        ("INSERT", k, 100 + k, f"v{k}", 0, k) for k in range(40)
    ]
    merge_into(
        spark, root,
        spark.createDataFrame(
            rows,
            "op string, pk long, writetime long, v string, "
            "segment long, position long",
        ),
        ["pk"], n_buckets=4,
    )
    register_store(spark)
    base = (
        spark.read.format("cdc_store").option("path", root)
        .option("mode", "state").load()
    )
    want = sorted(
        r.pk for r in base.collect() if 110 < r.writetime <= 125
    )
    got = (
        spark.read.format("cdc_store").option("path", root)
        .option("mode", "state").load()
        .filter((F.col("writetime") > 110) & (F.col("writetime") <= 125))
    )
    assert sorted(r.pk for r in got.collect()) == want


def test_spark_reuses_pushdown_pruned_scan(spark, lww_store):
    """PINS an upstream Spark 4.1 limitation (reproduced with a vanilla
    20-line python source, so it is not this reader's state): a
    FILTERLESS re-plan of the SAME loaded DataFrame reuses the most
    recent pushdown-PRUNED scan, under-counting. Every surface in this
    repo loads a fresh relation per query; users who must reuse a
    DataFrame across differently-filtered actions disable pruning with
    option("pushdown", "false") — pinned here too. If this test's first
    assertion ever FAILS, Spark fixed the replanning: delete the
    docstring warnings and this pin."""
    df = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .load()
    )
    total = df.count()
    assert df.filter(F.col("pk") == 3).count() == 1
    assert df.count() < total  # the upstream bug: stale pruned scan
    # fresh relation: correct
    assert (
        spark.read.format("cdc_store").option("path", lww_store)
        .option("mode", "state").load().count()
    ) == total
    # pushdown=false: reuse-safe (no pruning ever planned)
    df2 = (
        spark.read.format("cdc_store")
        .option("path", lww_store)
        .option("mode", "state")
        .option("pushdown", "false")
        .load()
    )
    assert df2.filter(F.col("pk") == 3).count() == 1
    assert df2.count() == total
