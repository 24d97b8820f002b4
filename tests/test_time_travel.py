"""Point-in-time CDC semantics (cdc_time_travel_queries.py): the snapshot
predicate must reach the scan, the as-of state must match a full replay
truncated at the cutoff, and the change feed must respect its window."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.plans.cdc_time_travel_queries import (
    _AS_OF,
    _FROM,
    _TO,
)
from tests.test_plan_shapes import plan_str

SF = "/root/testdata/sf0.001"


def q(name, spark):
    return QUERIES[name].fn(spark, SF)


def test_snapshot_max_writetime_at_cutoff(spark):
    df = q("cdc_snapshot_time_travel", spark)
    assert df.agg(F.max("writetime")).first()[0] <= _AS_OF


def test_snapshot_is_prefix_of_history(spark):
    """Every pk in the snapshot reflects its newest mutation ≤ cutoff: an
    update that happened after the cutoff must NOT be visible."""
    from cdc_apache_cassandra_spark.sources.event_source import (
        WRITETIME_BASE,
        mutation_events,
    )

    snap = {r.pk: r for r in q("cdc_snapshot_time_travel", spark).collect()}
    ev = mutation_events(spark, SF).filter(F.col("writetime") <= _AS_OF)
    expected_pks = {r.pk for r in ev.select("pk").distinct().collect()}
    assert set(snap) == expected_pks
    # a pk whose UPDATE (+5s) falls after the cutoff but whose INSERT is
    # before it must appear with the INSERT image
    boundary_pk = None
    for pk in sorted(snap):
        insert_wt = WRITETIME_BASE + pk * 1_000_000
        if pk % 3 == 0 and insert_wt <= _AS_OF < insert_wt + 5_000_000:
            boundary_pk = pk
            break
    if boundary_pk is not None:
        assert snap[boundary_pk].op == "INSERT"


def test_changes_between_window_and_ops(spark):
    rows = q("cdc_changes_between", spark).collect()
    assert rows
    for r in rows:
        assert _FROM < r.writetime <= _TO
        assert (r.op == "DELETE") == r.is_tombstone
        if r.is_tombstone:
            assert r.c_name is None
    # replica dedup: (pk, digest) unique
    keys = [(r.pk, r.digest) for r in rows]
    assert len(keys) == len(set(keys))


def test_snapshot_filter_pushed_to_scan(spark):
    """The as-of predicate must appear as a pushed filter on the parquet
    scan of the base table's derived stream (it prunes at the source —
    the whole point of time travel at scale)."""
    p = plan_str(q("cdc_snapshot_time_travel", spark))
    assert "Filter" in p  # predicate present pre-shuffle
    # the dedup aggregate must see the filtered stream, not filter after it
    assert p.index("Filter") < p.index("Exchange")


def test_scd2_current_versions_match_lww_state(spark):
    """The SCD2 materialization's open (is_current) versions must be
    exactly the last-write-wins converged state — two views of one
    history."""
    cur = {
        r.pk: (r.op, r.c_name, r.c_acctbal)
        for r in q("cdc_scd2_intervals", spark).collect()
        if r.is_current
    }
    lww = {
        r.pk: (r.op, r.c_name, r.c_acctbal)
        for r in q("cdc_lww_state", spark).collect()
    }
    assert cur == lww


def test_scd2_intervals_partition_key_timeline(spark):
    """Per key: intervals are contiguous (valid_to == next valid_from),
    non-overlapping, exactly one open version."""
    by_pk: dict[int, list] = {}
    for r in q("cdc_scd2_intervals", spark).collect():
        by_pk.setdefault(r.pk, []).append(r)
    for pk, rs in by_pk.items():
        rs.sort(key=lambda r: r.valid_from)
        opens = [r for r in rs if r.valid_to is None]
        assert len(opens) == 1, pk
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from, pk
