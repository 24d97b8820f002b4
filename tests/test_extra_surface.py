"""Invariant tests for the extra-surface queries (beyond the oracle gate):
BFS bounds, replay idempotency vs the single-pass state, quantized-ANN
shape invariants, MAD non-negativity, streak arithmetic."""

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans import QUERIES

from .conftest import SF_SMOKE


def _run(spark, name):
    return QUERIES[name].fn(spark, SF_SMOKE)


def test_bfs_hops_bounded_and_seeds_zero(spark):
    rows = _run(spark, "graph_bfs_hops").collect()
    assert rows
    assert all(0 <= r.hop <= 3 for r in rows)
    seeds = {
        r.p_partkey
        for r in spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .filter(F.col("p_size") == 50)
        .collect()
    }
    hop0 = {r.p_partkey for r in rows if r.hop == 0}
    assert hop0 == seeds


def test_idempotent_replay_equals_single_pass(spark):
    once = {tuple(r) for r in _run(spark, "cdc_lww_state").collect()}
    twice = {tuple(r) for r in _run(spark, "cdc_idempotent_replay").collect()}
    assert once == twice


def test_quantized_ann_rank_shape(spark):
    for name, score_col, ascending in (
        ("llm_ann_sq8_topk", "score", False),
        ("llm_ann_pq_adc", "adc", True),
    ):
        rows = _run(spark, name).collect()
        assert rows, name
        by_q = {}
        for r in rows:
            assert r.qid != r.nid
            by_q.setdefault(r.qid, []).append(r)
        for qid, group in by_q.items():
            rks = sorted(g.rk for g in group)
            assert rks == list(range(1, len(group) + 1)), (name, qid)
            ordered = sorted(group, key=lambda g: g.rk)
            scores = [g[score_col] for g in ordered]
            resorted = sorted(scores, reverse=not ascending)
            assert scores == resorted, (name, qid)


def test_mad_nonnegative_and_median_in_range(spark):
    rows = _run(spark, "stats_mad_value").collect()
    assert rows
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        assert r.mad_r >= 0
        lo, hi = bounds[r.event_type]
        assert lo <= r.median_r <= hi


def test_streaks_arithmetic(spark):
    rows = _run(spark, "events_streak_islands").collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_len <= r.n_active_days
        assert r.n_streaks >= 1
        # n_active_days partitions into n_streaks runs, the longest of
        # which is longest_len:
        assert r.longest_len + (r.n_streaks - 1) <= r.n_active_days


def test_unpivot_measures_equal_cardinality(spark):
    rows = _run(spark, "stats_unpivot_measure_profile").collect()
    assert len(rows) == 4
    counts = {r.measure: r.n_rows for r in rows}
    assert len(set(counts.values())) == 1  # every measure once per lineitem


def test_dedup_reduction_reconciles(spark):
    rows = _run(spark, "llm_dedup_reduction_report").collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_docs = docs.count()
    n_distinct = docs.select("text").distinct().count()
    assert sum(r.docs_before for r in rows) == n_docs
    assert sum(r.docs_after for r in rows) == n_distinct
    for r in rows:
        assert r.docs_after <= r.docs_before
        assert r.tokens_after <= r.tokens_before
