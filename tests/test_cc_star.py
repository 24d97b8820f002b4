"""Alternating large-star/small-star connected components (VERDICT r11
item 6): label-identical to min-label propagation, with round counts
that grow with the LOG of the component size instead of its diameter —
the property that keeps chain-shaped components tractable at scale."""

import random

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.text_dedup import (
    connected_components,
    connected_components_star,
)


def _chain(spark, n):
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    return nodes, edges


def test_star_chain_logarithmic_rounds(spark):
    """A 256-node chain (diameter 255, min-label's worst case) must
    converge in O(log n) star rounds to ONE component labeled 0."""
    nodes, edges = _chain(spark, 256)
    labels, rounds = connected_components_star(nodes, edges)
    got = labels.agg(
        F.countDistinct("component"), F.max("component")
    ).first()
    assert (got[0], got[1]) == (1, 0)
    assert rounds <= 12, f"star rounds {rounds} not logarithmic"


def test_star_matches_min_label_on_random_graph(spark):
    """On a random sparse graph (many components, mixed shapes) star
    contraction and min-label propagation produce identical labels —
    the component MINIMUM, the id the oracle's transitive closure
    assigns."""
    random.seed(7)
    n = 300
    es = [(random.randrange(n), random.randrange(n)) for _ in range(220)]
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(es, "doc_a long, doc_b long")
    star, _ = connected_components_star(nodes, edges)
    ml = connected_components(nodes, edges)
    diff = (
        star.join(ml.withColumnRenamed("component", "c2"), "doc_id")
        .filter("component <> c2")
        .count()
    )
    assert diff == 0


def test_star_singletons_and_self_loops(spark):
    """Isolated nodes label themselves; self-loops are ignored."""
    nodes = spark.range(5).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(1, 1), (3, 4)], "doc_a long, doc_b long"
    )
    labels, _ = connected_components_star(nodes, edges)
    got = {r.doc_id: r.component for r in labels.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}
