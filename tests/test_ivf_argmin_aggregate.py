"""Pin the aggregate-form ivf_assign / ivf_probe_topn (r11 optimization)
against the original ranking-window forms: identical rows on fixtures
that include exact distance ties (duplicate centroids at different ids),
duplicate vectors, and n larger than the centroid count."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.vectors import (
    ivf_assign,
    ivf_probe_topn,
    squared_distance,
)


def _window_assign(vectors, centroids, vec_col="vec"):
    """The pre-r11 row_number form, verbatim (reference semantics)."""
    cent = F.broadcast(centroids.select(F.col("cid"), F.col("cvec")))
    scored = vectors.crossJoin(cent).withColumn(
        "dist2", squared_distance(F.col(vec_col), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "dist2", "cvec")
    )


def _window_probe(vectors, centroids, vec_col="vec", n=2):
    cent = F.broadcast(centroids.select(F.col("cid"), F.col("cvec")))
    scored = vectors.crossJoin(cent).withColumn(
        "dist2", squared_distance(F.col(vec_col), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n)
        .drop("dist2", "cvec")
    )


def _fixture(spark):
    vecs = [
        (1, [0.0, 0.0]),
        (2, [1.0, 1.0]),
        (3, [1.0, 1.0]),      # duplicate vector
        (4, [0.5, 0.5]),      # exactly equidistant from cents 10 and 30
        (5, [-3.0, 2.5]),
    ]
    cents = [
        (10, [0.0, 0.0]),
        (20, [2.0, 2.0]),
        (30, [1.0, 1.0]),     # cid 30 duplicates cid 40's position
        (40, [1.0, 1.0]),     # tie on dist2 -> cid break
    ]
    n = spark.createDataFrame(vecs, ["vec_id", "vec"]).select(
        "vec_id", F.col("vec").cast("array<double>").alias("vec")
    )
    c = spark.createDataFrame(cents, ["cid", "cvec"]).select(
        "cid", F.col("cvec").cast("array<double>").alias("cvec")
    )
    return n, c


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_assign_matches_window_form(spark):
    n, c = _fixture(spark)
    got, ref = ivf_assign(n, c, "vec"), _window_assign(n, c, "vec")
    assert got.columns == ref.columns
    assert _rows(got.select("vec_id", "cid")) == _rows(
        ref.select("vec_id", "cid")
    )
    assert _rows(got) == _rows(ref)


def test_probe_topn_matches_window_form(spark):
    n, c = _fixture(spark)
    for k in (1, 2, 3, 10):  # 10 > centroid count: both yield all 4
        got = ivf_probe_topn(n, c, "vec", k)
        ref = _window_probe(n, c, "vec", k)
        assert got.columns == ref.columns
        assert _rows(got) == _rows(ref), f"n={k}"
