"""operators/graphs.py — the one-exchange co-purchase edge build must
produce exactly the relation of the distinct + order-keyed self-join
form it replaced (pair lift / triangles / PageRank / BFS all consume
it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.graphs import (
    order_item_sets,
    order_pair_counts,
)


def _join_form(li):
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("v"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )


def test_pair_counts_match_self_join(spark):
    rows = [
        # order 1: duplicate lineitems for the same part (distinct must
        # collapse them), plus a 3-item basket
        (1, 10), (1, 10), (1, 20), (1, 30),
        # order 2: single-item basket -> contributes no pairs
        (2, 10),
        # order 3: repeats the (10, 20) pair -> w = 2
        (3, 20), (3, 10),
        # order 4: two items in descending key order
        (4, 99), (4, 5),
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    got = {(r.u, r.v): r.w for r in order_pair_counts(li).collect()}
    want = {(r.u, r.v): r.w for r in _join_form(li).collect()}
    assert got == want
    assert got[(10, 20)] == 2
    assert (5, 99) in got and (99, 5) not in got


def test_item_sets_distinct_per_order(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], ["l_orderkey", "l_partkey"]
    )
    sets = {
        r.l_orderkey: sorted(r.items)
        for r in order_item_sets(li).collect()
    }
    assert sets == {1: [10, 20]}
