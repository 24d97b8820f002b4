"""Semantics + plan-shape tests for the text-stats / analytics batch
(llm_text_stats_queries.py, analytics_deep_queries.py). The DuckDB oracle
gate checks value parity; these pin the invariants and the physical plans
the scale mandate cares about."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans import QUERIES
from tests.test_plan_shapes import count_op, plan_str

SF = "/root/testdata/sf0.001"


def q(name, spark, sf_dir=SF):
    return QUERIES[name].fn(spark, sf_dir)


def test_tfidf_topk_bounded_and_ranked(spark):
    rows = q("llm_tfidf_top_terms", spark).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        assert len(rs) <= 3
        rs.sort(key=lambda r: r.rk)
        scores = [r.tfidf_r for r in rs]
        assert scores == sorted(scores, reverse=True), doc


def test_repetition_fractions_bounded(spark):
    df = q("llm_repetition_gopher", spark)
    bad = df.filter(
        (F.col("top_frac_r") <= 0)
        | (F.col("top_frac_r") > 1)
        | (F.col("dup_frac_r") < 0)
        | (F.col("dup_frac_r") >= 1)
        | (F.col("n_distinct") > F.col("n_tokens"))
    ).count()
    assert bad == 0


def test_stratified_sample_no_shuffle(spark):
    """Sampling is a narrow transform + broadcast rates join — a shuffle
    exchange in this plan means the 100 TB path regressed."""
    df = q("llm_stratified_sample", spark)
    p = plan_str(df)
    assert count_op(p, "Exchange") == 0
    assert "BroadcastExchange" in p
    # respect per-stratum rate: bucket always under the stratum's rate
    from cdc_apache_cassandra_spark.plans.llm_text_stats_queries import (
        _SAMPLE_RATES,
    )
    for r in df.collect():
        assert r.bucket < _SAMPLE_RATES[r.lang]


def test_ngram_adjacent_superset_of_blocked(spark):
    """The adjacent-bucket variant must find every pair the single-bucket
    blocking finds (recall strictly ≥)."""
    blocked = {
        (r.doc_a, r.doc_b)
        for r in q("llm_dedup_ngram_jaccard", spark, "/root/testdata/sf0.01").collect()
    }
    adjacent = {
        (r.doc_a, r.doc_b)
        for r in q(
            "llm_dedup_ngram_jaccard_adjacent", spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert blocked <= adjacent
    assert len(adjacent) >= len(blocked)


def test_q20_dominance_invariant(spark):
    """Every reported supplier must dominate ≥1 part; n_dominant_parts
    positive and bounded by the red-part count."""
    rows = q("tpch_q20ish_dominant_suppliers", spark).collect()
    assert rows, "q20 returned nothing at smoke SF"
    for r in rows:
        assert r.n_dominant_parts >= 1


def test_percentiles_monotone(spark):
    for r in q("stats_percentiles_by_flag", spark).collect():
        assert r.price_p25 <= r.price_p50 <= r.price_p75 <= r.price_p90


def test_corr_in_range(spark):
    for r in q("stats_corr_price_discount", spark).collect():
        assert -1.0 <= r.corr_price_discount_r <= 1.0


def test_ntile_deciles_partition_counts(spark):
    """NTILE(10) bucket sizes within each event_type differ by at most 1,
    and bucket value ranges are non-overlapping in order."""
    rows = q("events_ntile_value_deciles", spark).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.decile)
        sizes = [r.n_events for r in rs]
        assert max(sizes) - min(sizes) <= 1, et
        for a, b in zip(rs, rs[1:]):
            assert a.hi <= b.lo, et


def test_corr_single_shuffle(spark):
    """Component-sum corr is one aggregate: exactly one exchange."""
    p = plan_str(q("stats_corr_price_discount", spark))
    assert count_op(p, "Exchange") == 1


def test_chunking_covers_all_tokens(spark):
    """Every token index of every doc is covered by ≥1 chunk; chunk sizes
    are full except possibly the tail; stride respected."""
    from cdc_apache_cassandra_spark.plans.llm_text_stats_queries import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )
    from cdc_apache_cassandra_spark.sources.registry import load_table

    n_tokens = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
        )
        .collect()
    }
    chunks: dict[int, list] = {}
    for r in q("llm_chunk_documents", spark).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    assert set(chunks) == set(n_tokens)
    for doc, rs in chunks.items():
        rs.sort(key=lambda r: r.chunk_id)
        ids = [r.chunk_id for r in rs]
        assert ids == list(range(len(ids)))
        # coverage: last chunk must reach the last token
        last = rs[-1]
        assert last.chunk_id * _CHUNK_STRIDE + last.n_chunk_tokens == n_tokens[doc]
        for r in rs[:-1]:
            assert r.n_chunk_tokens == _CHUNK_SIZE


def test_pivot_fewer_exchanges(spark):
    """The conditional-aggregate pivot (product query) is a single
    exchange; the built-in `.pivot` twin needs two — same result, and the
    comparison is why the CASE-sum form is the fixed-column scale plan."""
    from cdc_apache_cassandra_spark.plans.analytics_deep_queries import (
        pivot_daily_type_counts_builtin,
    )

    p = plan_str(q("events_pivot_daily_type_counts", spark))
    assert count_op(p, "Exchange") == 1
    p2 = plan_str(pivot_daily_type_counts_builtin(spark, SF))
    assert count_op(p2, "Exchange") == 2
    got = q("events_pivot_daily_type_counts", spark).orderBy("day").collect()
    want = pivot_daily_type_counts_builtin(spark, SF).orderBy("day").collect()
    assert got == want


def test_q20_broadcasts_part_filter(spark):
    p = plan_str(q("tpch_q20ish_dominant_suppliers", spark))
    assert "BroadcastExchange" in p


def test_zscore_broadcasts_stats(spark):
    """The 5-row stats side must broadcast — a shuffle join against the
    full events stream would be the 100 TB mistake."""
    p = plan_str(q("events_anomaly_zscore", spark))
    assert "BroadcastExchange" in p


def test_heavy_hitters_window_runs_on_aggregate(spark):
    """The rank window's input is the (type,user) aggregate, never raw
    events: plan order must be Exchange->Aggregate before Window."""
    import re

    p = plan_str(q("events_heavy_hitters", spark))
    # formatted-plan node ids increase leaf -> root; the Window must sit
    # ABOVE (higher id than) every aggregate, i.e. consume the aggregate
    win_ids = [int(m) for m in re.findall(r"^\((\d+)\) Window", p, re.M)]
    agg_ids = [int(m) for m in re.findall(r"^\((\d+)\) HashAggregate", p, re.M)]
    assert win_ids and agg_ids
    assert min(win_ids) > max(agg_ids)


def test_lateral_decorrelates_to_window(spark):
    """The correlated LATERAL top-2 must decorrelate (WindowGroupLimit /
    Window + hash join) — a CartesianProduct or nested-loop join here
    would be the per-row-subquery disaster at scale."""
    p = plan_str(q("join_lateral_top2_orders", spark))
    assert "Window" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
