"""Scale-path mechanisms that only show at cluster size, proven at test
size: salted joins/aggs preserve semantics, bucketed tables join without
a shuffle, partitioned layouts prune at the scan, and the native
streaming session_window operator runs with a watermark."""

import uuid

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.skew import salted_agg_sum, salted_join
from cdc_apache_cassandra_spark.sources.registry import load_table
from tests.test_plan_shapes import count_op, plan_str


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, ["o_custkey"]).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    salted = salted_join(orders, cust, ["o_custkey"], n_salts=4).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("decimal(18,2)").alias("q")
    )
    plain = li.groupBy("l_orderkey").agg(F.sum("q").alias("sum_q"))
    salted = salted_agg_sum(li, ["l_orderkey"], "q", n_salts=4).withColumnRenamed(
        "sum_q", "sum_q"
    )
    joined = plain.join(
        salted.withColumnRenamed("sum_q", "sum_q2"), "l_orderkey"
    )
    assert joined.filter("sum_q <> sum_q2").count() == 0
    assert salted.count() == plain.count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Bucketing both sides on the join key co-locates the join: ZERO
    exchanges in the plan — the 100 TB fact-fact join strategy."""
    db = f"bucket_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
            f"{db}.b_orders"
        )
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
            f"{db}.b_lineitem"
        )
        bo = spark.table(f"{db}.b_orders")
        bl = spark.table(f"{db}.b_lineitem")
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        p = plan_str(joined)
        assert count_op(p, "Exchange") == 0, p
        # and it's still correct
        assert joined.count() == li.count()
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_partitioned_layout_prunes_at_scan(spark, sf_dir, tmp_path):
    """Hive-style partitioning on a filter column: the scan lists only the
    matching partition directories (partition pruning)."""
    d = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").parquet(d)
    clicks = spark.read.parquet(d).filter(F.col("event_type") == "click")
    p = plan_str(clicks)
    assert "PartitionFilters" in p
    pf_line = p.split("PartitionFilters:")[1].split("\n")[0]
    assert "event_type" in pf_line
    want = ev.filter(F.col("event_type") == "click").count()
    assert clicks.count() == want


def test_streaming_session_window(spark, sf_dir, tmp_path):
    """Native session_window with watermark in a real streaming query —
    gap-based sessions close when the watermark passes (the engine-native
    analogue of the batch sessionization query)."""
    from cdc_apache_cassandra_spark.streaming.pipeline import run_to_memory

    d = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").select("user_id", "ts", "value").write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    run_to_memory(sess, name)
    got = spark.table(name)
    assert got.count() > 0
    # sessions are per-user disjoint intervals
    assert got.filter("n_events <= 0").count() == 0


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: a fact partitioned on the join key, joined to a selective
    dimension, must prune partitions at RUNTIME via a dynamicpruning
    subquery filter — the mechanism that keeps star joins from scanning
    100 TB when the dim filter eliminates most partitions."""
    d = str(tmp_path / "events_dpp")
    load_table(spark, sf_dir, "events").write.partitionBy(
        "event_type"
    ).parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 2.0)], ["event_type", "weight"]
    )
    joined = fact.join(dim, "event_type").filter(F.col("weight") > 1.5)
    p = plan_str(joined)
    assert "dynamicpruning" in p.lower()
    # correctness: only purchase rows survive
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert joined.count() == want
