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
- IVF centroids: strided sample for the baseline queries, and
  :func:`kmeans_lite` (bounded Lloyd, oracle-exact) for the production
  path — both feed the same assignment operators.
- SRP hyperplanes: :func:`gaussian_planes` (seeded N(0,1)) inlined as
  literals; the axis-sign variant stays as the documented baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for order-free exact component sums (kmeans means):
#: floor(x * 2^46) is exact in doubles for |x| < 2^7, and 2^46 leaves
#: 38-digit decimal headroom for ~1e9-member cells
FIXED_POINT_SCALE = 2**46


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


def norm(a: Column) -> Column:
    """Euclidean norm — precompute once per VECTOR so a pair-verify
    stage does one dot product per pair instead of three."""
    return F.sqrt(dot(a, a))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Bit-identical to :func:`cosine` when ``na``/``nb`` are
    :func:`norm` of the same vectors: IEEE sqrt is exact-deterministic
    and the multiply/divide order is unchanged, so hoisting the norms
    out of the per-pair expression changes cost, not values."""
    return dot(a, b) / (na * nb)


def squared_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sign_lsh_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Random-hyperplane LSH degenerated to axis-aligned planes: bit i =
    sign(vec[i]). Deterministic, engine-portable; :func:`srp_bucket` is
    the production form (seeded Gaussian hyperplanes)."""
    bucket = F.lit(0)
    for i in range(1, n_bits + 1):
        bucket = bucket + F.when(
            F.element_at(vec, i) >= 0, F.lit(1 << (i - 1))
        ).otherwise(F.lit(0))
    return bucket.cast("bigint")


def gaussian_planes(dim: int, n_bits: int, seed: int = 7) -> list[list[float]]:
    """Seeded Gaussian hyperplanes for signed-random-projection LSH —
    the standard SRP construction (Charikar 2002): each bit is the sign
    of a dot product with an i.i.d. N(0,1) direction, so
    P[bit_a == bit_b] = 1 - angle(a,b)/π for ANY input distribution —
    unlike axis-sign planes, which degrade when mass concentrates on few
    coordinates. Deterministic by seed; planes are inlined as literals in
    both engines (driver-side constants, k·dim doubles)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    # float32 round-trip keeps the literals short and bit-identical when
    # re-parsed from SQL text by either engine
    return [
        [float(x) for x in rng.standard_normal(dim).astype("float32")]
        for _ in range(n_bits)
    ]


def _sql_double(x: float) -> str:
    """Shortest exact-round-trip SQL double literal (repr is guaranteed
    to round-trip the IEEE value; the D suffix pins DoubleType so the
    parser never routes through DecimalType)."""
    return repr(float(x)) + "D"


def srp_bucket_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """SQL text of the SRP bucket expression (see :func:`srp_bucket`).

    Built as ONE string parsed by the JVM in a single call: the Column
    form spends one py4j round trip per plane component (bands × bits ×
    dim ≈ thousands of ``lit`` calls), which measured ~4 s of DRIVER
    plan-construction time per banded-signature query — pure overhead
    the executor never sees (guide §5: driver work scales with nothing
    but itself). The parsed tree is the same sequential-fold
    aggregate/zip_with dot per plane, so execution and VALUES are
    unchanged (pinned by test_srp_bucket_sql_matches_column_form)."""
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ",".join(_sql_double(x) for x in plane) + ")"
        d = (
            f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << i} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def srp_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """SRP bucket id from inlined hyperplanes: bit i = [dot(vec, p_i) >= 0].
    One map-side expression per row — the bucket join downstream is the
    only shuffle (same 100-TB shape as sign_lsh_bucket).

    Keep the higher-order ``aggregate`` dot: an unrolled
    per-element-literal expression was measured 8x SLOWER end-to-end
    (a ~3000-node Catalyst tree per signature breaks whole-stage
    codegen and dominates plan build), while the HOF form stays one
    compact expression.

    Pass the vector column by NAME to build the expression as one
    SQL-text parse (:func:`srp_bucket_sql`) instead of thousands of
    py4j ``lit`` round trips — identical tree, ~100× less driver time;
    the Column form remains for callers holding a derived column."""
    if isinstance(vec, str):
        return F.expr(srp_bucket_sql(vec, planes))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def srp_band_signatures(
    vectors: DataFrame,
    planes: list[list[float]],
    bands: int,
    bits: int,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> DataFrame:
    """Banded SRP signature table ``(id, band, bucket)`` — ``bands``
    bands of ``bits`` Gaussian sign-bits each, one map-side explode per
    row (planes are inlined literals = broadcast; NO shuffle here). The
    band+bucket equi-join downstream is the only wide stage.

    The whole banded array is ONE SQL-text expression (see
    :func:`srp_bucket_sql`): the per-``lit`` py4j Column form cost ~4 s
    of driver plan time per query at 8 bands × 6 bits × 64 dims."""
    assert len(planes) >= bands * bits, "need bands*bits planes"
    band_arr = F.expr(
        "array("
        + ",".join(
            f"struct({j} AS band, "
            + srp_bucket_sql(vec_col, planes[j * bits : (j + 1) * bits])
            + " AS bucket)"
            for j in range(bands)
        )
        + ")"
    )
    return vectors.select(id_col, F.explode(band_arr).alias("bb")).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def ann_candidate_pairs(
    vectors: DataFrame,
    dim: int,
    bands: int = 8,
    bits: int = 6,
    seed: int = 11,
    planes: list[list[float]] | None = None,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> DataFrame:
    """THE DEFAULT ANN pair-candidate seam — banded SRP-LSH
    (OR-amplified: a pair is a candidate when ANY band's ``bits``-bit
    bucket collides), the production path for near-duplicate /
    similarity-pair generation. Returns ``(id_a, id_b, n_bands)`` with
    ``id_a < id_b``; callers verify candidates by exact cosine.

    Why this default: candidate mass per band is ~Σ_bucket |bucket|²
    with 2^bits buckets — at scale choose ``bits`` ≈ log2(N /
    target_bucket_size) so mass stays ~N·target (linear), while
    OR-amplification across ``bands`` recovers the recall a single
    band loses. The single-table anchor-plane shape
    (plans/analytics_extra_queries.py::llm_ann_srp_anchor_lsh) keeps
    candidate mass ~N²/2^bits over a FIXED bucket count — registered as
    a labeled comparison entry only, never this seam. For query→corpus
    top-k (rather than all-pairs), use :func:`ivf_probe_topn` /
    :func:`ivf_assign` (centroids broadcast, corpus partitioned by
    cell)."""
    if planes is None:
        planes = gaussian_planes(dim, bands * bits, seed=seed)
    sig = srp_band_signatures(vectors, planes, bands, bits, vec_col, id_col)
    a = sig.select(F.col(id_col).alias("id_a"), "band", "bucket")
    c = sig.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(c, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def kmeans_lite(
    vectors: DataFrame,
    dim: int,
    stride: int,
    iters: int = 2,
    vec_col: str = "vec",
) -> DataFrame:
    """Bounded Lloyd refinement ("k-means-lite") for IVF/semdedup
    centroids: init = the deterministic strided sample (vec_id % stride),
    then ``iters`` rounds of assign → recompute means.

    Determinism contract (the oracle mirrors every step bit-for-bit):
    - assignment tie-breaks on (dist2 ASC, cid ASC);
    - per-cell means are ORDER-FREE exact fixed-point sums: each
      component is floor-scaled to an integer (x -> floor(x * 2^46),
      exact in doubles for |x| < 2^7 since scaling by a power of two
      only shifts the exponent), summed as DECIMAL(38,0) (DuckDB:
      HUGEINT) — integer addition commutes, so ANY partitioning /
      combine order yields the identical sum — then converted to the
      mean by one double division sequence (s -> double, / n, / 2^46)
      both engines execute identically;
    - empty cells drop out identically in both engines.

    Scale: each round is one broadcast-centroid assignment (narrow map +
    argmin window) and one (cid, component) aggregation with map-side
    partial sums — per-cell state is k×dim integers, NEVER a membership
    array (the round-2 collect_list fold made a hot cell a single
    multi-GB row; fixed per the round-2 verdict). Returns (cid, cvec)
    like the strided sampler, so ivf_assign / ivf_probe_topn consume it
    unchanged."""
    cent = vectors.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cid"), F.col(vec_col).alias("cvec")
    )
    for _ in range(iters):
        asg = ivf_assign(vectors, cent, vec_col)
        cent = cell_means(asg, vec_col)
        # k×dim doubles: cut the iterative lineage per round (same
        # pattern as the PageRank loop) so downstream consumers don't
        # re-execute every previous assignment pass
        cent = cent.localCheckpoint(eager=True)
    return cent


def cell_means(asg: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Per-cell component means via order-free exact fixed-point sums
    (the kmeans Lloyd update). Each component is floor-scaled to an
    integer and summed as DECIMAL(38,0) — commutative, so any combine
    order yields the identical sum; one shared double-division sequence
    derives the mean. Per-cell state is dim integers, never a
    membership array. Returns (cid, cvec)."""
    comp = asg.select("cid", F.posexplode(vec_col).alias("pos", "x"))
    sums = comp.groupBy("cid", "pos").agg(
        F.sum(
            F.floor(F.col("x") * F.lit(float(FIXED_POINT_SCALE))).cast(
                "decimal(38,0)"
            )
        ).alias("s"),
        F.count("*").alias("n"),
    )
    mean = (
        F.col("s").cast("double") / F.col("n").cast("double")
    ) / F.lit(float(FIXED_POINT_SCALE))
    return (
        sums.select("cid", "pos", mean.alias("m"))
        .groupBy("cid")
        .agg(
            # dim-bounded regroup (struct sorts by leading `pos`) —
            # collect_list here holds `dim` scalars, not members
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda t: t["m"],
            ).alias("cvec")
        )
    )


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, vec_col: str = "vec"
) -> DataFrame:
    """Assign every vector to its nearest centroid (coarse quantization).

    centroids must be small (broadcast); tie-break on centroid id (the
    argmin struct compares (dist2, cid) lexicographically, identical to
    the former row_number's ORDER BY dist2 ASC, cid ASC) so the
    assignment is deterministic in any engine.
    Returns vectors + `cid` column.

    Argmin as an AGGREGATE, not a ranking window (r11, guide §2.3):
    min(struct(dist2, cid, ...)) partially aggregates map-side, so the
    exchange ships ONE row per vector instead of the full rows x k
    cross-scored stream (each row dragging the dim-sized vector through
    the shuffle and its sort). cid is unique within a vec_id group, so
    the comparison never reaches the payload fields — deterministic and
    bit-identical to the window form (pinned by
    tests/test_ivf_argmin_aggregate.py).
    """
    cent = F.broadcast(centroids.select(F.col("cid"), F.col("cvec")))
    scored = vectors.crossJoin(cent).withColumn(
        "dist2", squared_distance(F.col(vec_col), F.col("cvec"))
    )
    others = [c for c in vectors.columns if c != "vec_id"]
    m = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist2", "cid", *others)).alias("_m")
    )
    return m.select(
        "vec_id",
        *[F.col(f"_m.{c}").alias(c) for c in others],
        F.col("_m.cid").alias("cid"),
    )


def ivf_probe_topn(
    vectors: DataFrame, centroids: DataFrame, vec_col: str = "vec", n: int = 2
) -> DataFrame:
    """Multi-probe cell selection: keep each vector's ``n`` nearest cells
    (probe_rank 1..n). Same broadcast cross-score as `ivf_assign` — the
    corpus keeps ONE cell (its partition), only queries fan out to n cells,
    so index size is unchanged and query cost scales linearly in nprobe.

    Top-n as a sorted-slice AGGREGATE, not a ranking window (r11, guide
    §2.3): collect_list partially aggregates map-side, so the exchange
    ships one (vec_id, k-element (dist2, cid) list, payload) row per
    vector instead of rows x k full-width rows plus their sort.
    array_sort on the structs orders by (dist2 ASC, cid ASC) — exactly
    the former window's ORDER BY — and the payload columns ride through
    min(struct(...)) over identical per-group values (every cross-scored
    row of a vec_id carries the same vector), so the result is
    bit-identical to the window form (tests/test_ivf_argmin_aggregate.py).
    """
    cent = F.broadcast(centroids.select(F.col("cid"), F.col("cvec")))
    scored = vectors.crossJoin(cent).withColumn(
        "dist2", squared_distance(F.col(vec_col), F.col("cvec"))
    )
    others = [c for c in vectors.columns if c != "vec_id"]
    g = scored.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("dist2", "cid"))), 1, n
        ).alias("_top"),
        F.min(F.struct(*others)).alias("_row"),
    )
    ex = g.select(
        "vec_id",
        *[F.col(f"_row.{c}").alias(c) for c in others],
        F.posexplode("_top").alias("_pos", "_t"),
    )
    return ex.select(
        "vec_id",
        *others,
        F.col("_t.cid").alias("cid"),
        (F.col("_pos") + 1).cast("int").alias("probe_rank"),
    )
