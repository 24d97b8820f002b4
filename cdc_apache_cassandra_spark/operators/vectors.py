"""Vector operators over embedding columns (array<float>): cosine
similarity, sign-bit LSH bucketing, IVF coarse quantization.

The reference already carries vector columns (CQL `vector`, SURVEY §1.2,
AbstractNativeConverter.java:216-219) but has no similarity search; these
give the engine the ANN surface a training-data pipeline needs.

Scale design (100 TB):
- all folds are Catalyst higher-order functions (zip_with/aggregate) —
  JVM-side, no Python in the hot path.
- brute-force top-k broadcasts the (small) query set and streams the
  corpus: one pass, no N×N shuffle.
- sign-LSH buckets / IVF cells turn near-dup and ANN into equi-joins on
  bucket keys — the only shuffles, uniform by construction.
- IVF centroids here are a deterministic row sample (vec_id % stride); a
  production run would plug k-means centroids into the same assignment
  operator unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — identical summation order in DuckDB's
    oracle, so values match to the last bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def squared_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sign_lsh_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Random-hyperplane LSH degenerated to axis-aligned planes: bit i =
    sign(vec[i]). Deterministic, engine-portable; swap in seeded random
    hyperplanes (dot with fixed vectors) for production recall."""
    bucket = F.lit(0)
    for i in range(1, n_bits + 1):
        bucket = bucket + F.when(
            F.element_at(vec, i) >= 0, F.lit(1 << (i - 1))
        ).otherwise(F.lit(0))
    return bucket.cast("bigint")


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, vec_col: str = "vec"
) -> DataFrame:
    """Assign every vector to its nearest centroid (coarse quantization).

    centroids must be small (broadcast); tie-break on centroid id via
    row_number so the assignment is deterministic in any engine.
    Returns vectors + `cid` column.
    """
    from pyspark.sql import Window

    cent = F.broadcast(centroids.select(F.col("cid"), F.col("cvec")))
    scored = vectors.crossJoin(cent).withColumn(
        "dist2", squared_distance(F.col(vec_col), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "dist2", "cvec")
    )


def ivf_probe_topn(
    vectors: DataFrame, centroids: DataFrame, vec_col: str = "vec", n: int = 2
) -> DataFrame:
    """Multi-probe cell selection: keep each vector's ``n`` nearest cells
    (probe_rank 1..n). Same broadcast cross-score as `ivf_assign` — the
    corpus keeps ONE cell (its partition), only queries fan out to n cells,
    so index size is unchanged and query cost scales linearly in nprobe.
    """
    from pyspark.sql import Window

    cent = F.broadcast(centroids.select(F.col("cid"), F.col("cvec")))
    scored = vectors.crossJoin(cent).withColumn(
        "dist2", squared_distance(F.col(vec_col), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cid").asc())
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n)
        .drop("dist2", "cvec")
    )
