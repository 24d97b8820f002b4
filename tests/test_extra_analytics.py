"""Semantic invariants for the analytics_extra_queries surface (hash
parity lives in test_oracle_parity; these pin properties a hash can't
express)."""

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans import QUERIES

from .conftest import SF_SMOKE


def test_pagerank_ranks_bounded_and_conservative(spark):
    df = QUERIES["graph_pagerank_parts"].fn(spark, SF_SMOKE).cache()
    rows = df.collect()
    assert rows, "co-purchase graph must be non-empty at smoke SF"
    # damping floor: every rank >= 0.15e6; degree positive
    assert all(r.rank_scaled >= 150000 and r.deg > 0 for r in rows)
    # scaled-integer PageRank loses mass only to floor division: total rank
    # stays within [N * 0.15e6, N * init]
    n = len(rows)
    total = sum(r.rank_scaled for r in rows)
    assert n * 150000 <= total <= n * 1_000_000


def test_srp_buckets_bounded(spark):
    df = QUERIES["llm_ann_srp_anchor_lsh"].fn(spark, SF_SMOKE)
    stats = df.agg(
        F.countDistinct("bucket").alias("nb"),
        F.min("cos_sim_r").alias("mn"),
    ).collect()[0]
    assert stats.nb <= 256  # 8 anchor planes => at most 2^8 signatures
    assert stats.mn is None or stats.mn >= 0.35


def test_range_frame_includes_current_row(spark):
    df = QUERIES["window_range_90d_spend"].fn(spark, SF_SMOKE)
    # trailing-90d sum always covers at least the row's own price
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    bad = df.join(orders, "o_orderkey").filter(
        F.col("spend_90d") < F.col("o_totalprice") - 0.01
    )
    assert bad.count() == 0


def test_first_last_orders_consistency(spark):
    df = QUERIES["window_first_last_orders"].fn(spark, SF_SMOKE).cache()
    # second_price defined iff the customer has >= 2 orders
    assert df.filter((F.col("n_orders") >= 2) & F.col("second_price").isNull()).count() == 0
    assert df.filter((F.col("n_orders") < 2) & F.col("second_price").isNotNull()).count() == 0
    single = df.filter(F.col("n_orders") == 1)
    assert single.filter(F.col("first_price") != F.col("last_price")).count() == 0


def test_bigram_novelty_ratio_domain(spark):
    df = QUERIES["llm_bigram_novelty"].fn(spark, SF_SMOKE)
    bad = df.filter(
        (F.col("novelty_r") < 0)
        | (F.col("novelty_r") > 1)
        | (F.col("n_rare") > F.col("n_grams"))
    )
    assert bad.count() == 0


def test_builtin_hllpp_within_rsd_envelope(spark):
    """Spark's built-in HLL++ (approx_count_distinct) — the engine's own
    mergeable-sketch COUNT(DISTINCT) path — stays inside 3x the requested
    rsd of the exact distinct per event_type. Its sketch is
    engine-specific (DuckDB's differs by design), so this envelope is
    its pin; the ORACLE-gated sketch path is stats_approx_distinct_users
    (portable HLL device, bit-exact cross-engine)."""
    from cdc_apache_cassandra_spark.sources.registry import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    df = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rows = df.collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(
            3, 3 * 0.02 * r.exact_users
        ), r


def test_portable_hll_estimate_matches_gate_entry(spark):
    """stats_approx_distinct_users' approx column IS floor of the
    portable-sketch estimate the register-pinning entry computes — the
    two gate entries cannot drift apart."""
    a = {
        r.event_type: r.approx_users
        for r in QUERIES["stats_approx_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    b = {
        r.event_type: int(r.hll_estimate_r // 1)
        for r in QUERIES["stats_hll_portable_sketch"].fn(spark, SF_SMOKE).collect()
    }
    assert a == b
