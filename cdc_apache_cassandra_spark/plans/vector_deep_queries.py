"""Deeper vector/analytics surface: multi-probe IVF ANN (the recall knob
of the IVF scale path), rolling-window distinct users, and a cross-modal
quality-gated clustering pipeline (documents ⋈ embeddings).

Same determinism regime as fuzzy_dedup_queries.py: sequential-fold dot
products, total-order tie-breaks, ROUND as presentation only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.vectors import (
    as_double_vec,
    cosine,
    cosine_with_norms,
    norm,
    ivf_assign,
    ivf_probe_topn,
    squared_distance,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan

# --- IVF ANN with multi-probe (nprobe=2) ------------------------------------

_IVF_STRIDE = 50
_QUERY_STRIDE = 100
_NPROBE = 2
_TOPK = 5

_MULTIPROBE_SQL = f"""
WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % {_IVF_STRIDE} = 0),
scored AS (
  SELECT n.vec_id, n.v, cent.cid,
         list_sum(list_transform(range(1, len(n.v)+1),
             i -> (n.v[i] - cent.cv[i]) * (n.v[i] - cent.cv[i]))) AS dist2
  FROM n CROSS JOIN cent
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
  FROM scored
),
asg AS (SELECT vec_id, v, cid FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS qid, v AS qv, cid AS pcid FROM ranked
  WHERE rn <= {_NPROBE} AND vec_id % {_QUERY_STRIDE} = 0
),
pairs AS (
  SELECT p.qid, m.vec_id AS nid,
         list_dot_product(p.qv, m.v) /
         (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(m.v, m.v)))
         AS cos_sim
  FROM probes p JOIN asg m ON m.cid = p.pcid AND m.vec_id != p.qid
)
SELECT qid, nid, rk, CAST(ROUND(cos_sim, 6) AS DOUBLE) AS cos_sim_r
FROM (
  SELECT qid, nid, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
  FROM pairs
) WHERE rk <= {_TOPK}
"""


@register("llm_ann_ivf_multiprobe", sql=_MULTIPROBE_SQL)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe={p}: each query probes its {p} nearest cells while
    the corpus stays single-cell-partitioned — recall rises toward
    brute force at linear (not quadratic) extra cost, the standard IVF
    recall knob. A corpus vector lives in exactly one cell and probe
    cells are distinct, so no candidate dedup pass is needed."""
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("vec"))
    cent = n.filter(F.col("vec_id") % _IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    asg = ivf_assign(n, cent, "vec")
    probes = (
        ivf_probe_topn(
            n.filter(F.col("vec_id") % _QUERY_STRIDE == 0), cent, "vec", _NPROBE
        )
        .select(
            F.col("vec_id").alias("qid"),
            F.col("vec").alias("qv"),
            F.col("cid").alias("pcid"),
        )
    )
    m = asg.select(
        F.col("vec_id").alias("nid"), F.col("vec").alias("nv"), F.col("cid")
    )
    cs = cosine(F.col("qv"), F.col("nv"))
    pairs = (
        F.broadcast(probes)
        .join(m, F.col("cid") == F.col("pcid"))
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cs.alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("qid", "nid", "rk", F.round("cos_sim", 6).alias("cos_sim_r"))
    )


# --- rolling 7-day distinct users -------------------------------------------

_ROLLING_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
FROM days d JOIN du u
  ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
GROUP BY d.day
"""


@register("events_rolling_7d_distinct_users", sql=_ROLLING_SQL)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling weekly-active-users: EXACT distinct over a sliding 7-day
    window. Sliding distinct doesn't decompose into a window aggregate
    (distinct isn't subtractable), so the scalable exact form is: collapse
    to (day, user) once — the only corpus-sized shuffle — then a day×7
    range self-join over the TINY day-grain relation and a distinct count
    per anchor day. Approximate path at 100 TB: per-day HLL sketches
    merged over the window (same plan, sketch-valued)."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
        )
        .distinct()
    )
    days = du.select("day").distinct()
    return (
        days.alias("d")
        .join(
            du.alias("u"),
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )


# --- cross-modal: quality-gated embedding clustering ------------------------

_Q_MIN_CHARS = 50
_Q_MAX_CHARS = 400

_CROSS_SQL = f"""
WITH quality AS (
  SELECT doc_id, lang FROM documents
  WHERE n_chars BETWEEN {_Q_MIN_CHARS} AND {_Q_MAX_CHARS}
),
n AS (
  SELECT q.doc_id, q.lang, CAST(e.embedding AS DOUBLE[]) AS v
  FROM quality q JOIN embeddings e ON e.vec_id = q.doc_id
),
cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         FROM embeddings WHERE vec_id % {_IVF_STRIDE} = 0),
scored AS (
  SELECT n.doc_id, n.lang, cent.cid,
         list_sum(list_transform(range(1, len(n.v)+1),
             i -> (n.v[i] - cent.cv[i]) * (n.v[i] - cent.cv[i]))) AS dist2
  FROM n CROSS JOIN cent
),
asg AS (
  SELECT doc_id, lang, cid, dist2 FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY dist2 ASC, cid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT cid, lang, COUNT(*) AS n_docs,
       CAST(ROUND(MIN(dist2), 6) AS DOUBLE) AS min_dist2_r,
       CAST(ROUND(MAX(dist2), 6) AS DOUBLE) AS max_dist2_r
FROM asg GROUP BY cid, lang
"""


@register("llm_quality_filtered_clustering", sql=_CROSS_SQL)
def quality_filtered_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pipeline: quality-gate the TEXT table, join its ids to
    the EMBEDDING table (1:1 on doc_id=vec_id — the multimodal-column
    layout: modalities in separate aligned tables), cluster survivors to
    the nearest centroid, report per-(cell, lang) occupancy. The quality
    filter runs BEFORE the join and the join before the broadcast scoring,
    so the expensive vector math touches only surviving docs."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    quality = d.filter(
        F.col("n_chars").between(_Q_MIN_CHARS, _Q_MAX_CHARS)
    ).select("doc_id", "lang")
    vecs = quality.join(
        e, quality["doc_id"] == e["vec_id"]
    ).select("doc_id", "lang", as_double_vec(F.col("embedding")).alias("v"))
    cent = (
        e.filter(F.col("vec_id") % _IVF_STRIDE == 0)
        .select(F.col("vec_id").alias("cid"),
                as_double_vec(F.col("embedding")).alias("cvec"))
    )
    scored = vecs.crossJoin(F.broadcast(cent)).withColumn(
        "dist2", squared_distance(F.col("v"), F.col("cvec"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("dist2").asc(), F.col("cid").asc())
    asg = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "cid", "dist2")
    )
    return asg.groupBy("cid", "lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.min("dist2"), 6).alias("min_dist2_r"),
        F.round(F.max("dist2"), 6).alias("max_dist2_r"),
    )


# --- semantic dedup: per-cell cosine graph -> keeper selection --------------

_SEM_COS_MIN = 0.35

from cdc_apache_cassandra_spark.plans.kmeans_srp_queries import kmeans_cte
from cdc_apache_cassandra_spark.caching import persist_scoped

# ONE Lloyd round: most of the balance benefit, one fewer
# corpus assignment pass (bench: 2 rounds cost ~15% on the query)
_SEM_KM_CTES, _SEM_KCENT = kmeans_cte(_IVF_STRIDE, 1)

_SEMDEDUP_SQL = f"""
WITH RECURSIVE
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_SEM_KM_CTES},
cent AS (SELECT cid, cv FROM {_SEM_KCENT}),
scored AS (
  SELECT n.vec_id, n.v, cent.cid,
         list_sum(list_transform(range(1, len(n.v)+1),
             i -> (n.v[i] - cent.cv[i]) * (n.v[i] - cent.cv[i]))) AS dist2
  FROM n CROSS JOIN cent
),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= {_SEM_COS_MIN}
),
edges AS (
  SELECT va AS a, vb AS b FROM pairs
  UNION SELECT vb, va FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT x.vec_id, x.cid,
         LEAST(x.vec_id, COALESCE(MIN(r.b), x.vec_id)) AS component
  FROM asg x LEFT JOIN reach r ON r.a = x.vec_id
  GROUP BY x.vec_id, x.cid
)
SELECT vec_id, cid, component, (vec_id = component) AS is_keeper
FROM comp
"""


@register("llm_semdedup", sql=_SEMDEDUP_SQL)
def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: coarse-quantize the corpus (IVF
    cells), build the cosine-similarity graph WITHIN cells only (the
    candidate bound that keeps this o(n²): cells are the blocking key),
    connected-components it, keep the min-id representative per semantic
    cluster. Spark side: broadcast centroid assign → per-cell self-join →
    min-label propagation (operators.text_dedup.connected_components).
    Deletion rate = 1 − keepers/N. Cross-cell near-dups are the recall
    trade documented on the multi-probe query — same knob applies."""
    from cdc_apache_cassandra_spark.operators.text_dedup import (
        grouped_connected_components,
    )

    from cdc_apache_cassandra_spark.operators.vectors import kmeans_lite

    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("vec"))
    # k-means-lite centroids (2 Lloyd rounds) bound per-cell cardinality on
    # clustered corpora — the knob that keeps the per-cell cosine graph's
    # quadratic cost in check at 100 TB (SemDeDup's own recipe)
    cent = kmeans_lite(n, 64, _IVF_STRIDE, 1, "vec")
    # assignment feeds BOTH self-join sides and the node list — persist so
    # the broadcast-score-window pipeline runs once, not three times
    asg = ivf_assign(n, cent, "vec").transform(persist_scoped)  # vec_id, vec, cid
    # per-vector norms hoisted out of the per-pair cosine: one HOF dot
    # per PAIR instead of three (bit-identical — operators/vectors.
    # cosine_with_norms)
    a = asg.select(
        F.col("vec_id").alias("va"), F.col("vec").alias("xa"), "cid",
        norm(F.col("vec")).alias("_nna"),
    )
    b = asg.select(
        F.col("vec_id").alias("vb"), F.col("vec").alias("xb"), "cid",
        norm(F.col("vec")).alias("_nnb"),
    )
    cs = cosine_with_norms(
        F.col("xa"), F.col("xb"), F.col("_nna"), F.col("_nnb")
    )
    pairs = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .filter(cs >= _SEM_COS_MIN)
        .select("cid", "va", "vb")
    )
    nodes = asg.select("vec_id", "cid")
    # edges never span cells (the self-join IS keyed by cid), so the
    # global label-propagation fixpoint collapses to independent
    # per-cell union-find — one shuffle on the blocking key instead of
    # O(component diameter) join+checkpoint rounds (guide §2.4; measured
    # 9 rounds ≈ 4.1 s → one applyInPandas pass). Labels are identical:
    # component = min vec_id reachable, singletons absent → coalesce.
    labels = grouped_connected_components(
        pairs, "cid", "va", "vb", id_col="vec_id"
    )
    return nodes.join(labels, ["vec_id", "cid"], "left").select(
        "vec_id",
        "cid",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
        (F.col("vec_id") == F.coalesce(F.col("component"), F.col("vec_id"))).alias(
            "is_keeper"
        ),
    )


# --- cross-lingual duplicate mining (bitext candidates) ---------------------

_XL_LSH_BITS = 4
_XL_COS_MIN = 0.35

_XLINGUAL_SQL = f"""
WITH n AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, d.lang
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
b AS (
  SELECT vec_id, v, lang,
         list_sum(list_transform(range(1, {_XL_LSH_BITS + 1}),
             i -> CASE WHEN v[i] >= 0 THEN (1::BIGINT << (i-1)) ELSE 0::BIGINT END))
         AS bucket
  FROM n
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       a.lang AS lang_a, c.lang AS lang_b,
       CAST(ROUND(list_dot_product(a.v, c.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
            AS DOUBLE) AS cos_sim_r
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE a.lang <> c.lang
  AND list_dot_product(a.v, c.v) /
      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))
      >= {_XL_COS_MIN}
"""


@register("llm_crosslingual_pairs", sql=_XLINGUAL_SQL)
def crosslingual_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual near-duplicate mining — the bitext-candidate stage of
    a multilingual pretraining pipeline: same sign-LSH bucket equi-join as
    monolingual embedding dedup, but KEEP only pairs whose documents carry
    DIFFERENT language tags (high cosine + different lang ≈ translation
    pair). The lang tag rides the posting (one documents⋈embeddings join
    before bucketing), so the pair filter is free."""
    from cdc_apache_cassandra_spark.operators.vectors import sign_lsh_bucket

    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n = e.join(d, e["vec_id"] == d["doc_id"]).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v"), "lang"
    )
    # per-vector norm hoisted out of the per-pair cosine: one HOF dot
    # per PAIR instead of three — bit-identical (operators/vectors.
    # cosine_with_norms), same hoist the SRP verify stages carry
    bkt = n.select(
        "vec_id", "v", "lang",
        sign_lsh_bucket(F.col("v"), _XL_LSH_BITS).alias("bucket"),
        norm(F.col("v")).alias("_nn"),
    )
    a = bkt.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("lang").alias("lang_a"), "bucket",
        F.col("_nn").alias("_na"),
    )
    b = bkt.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("lang").alias("lang_b"), "bucket",
        F.col("_nn").alias("_nb"),
    )
    cs = cosine_with_norms(
        F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(F.col("lang_a") != F.col("lang_b"))
        .filter(cs >= _XL_COS_MIN)
        .select(
            "vec_a", "vec_b", "lang_a", "lang_b",
            F.round(cs, 6).alias("cos_sim_r"),
        )
    )


# --- embedding normalization audit ------------------------------------------

_NORM_TOL = 1e-5

_NORM_AUDIT_SQL = f"""
WITH n AS (
  SELECT vec_id,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm,
         len(embedding) AS dim
  FROM embeddings
)
SELECT COUNT(*) AS n_vecs,
       COUNT(DISTINCT dim) AS n_distinct_dims,
       CAST(SUM(CASE WHEN abs(nrm - 1.0) > {_NORM_TOL} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_unnormalized,
       CAST(ROUND(MIN(nrm), 9) AS DOUBLE) AS min_norm_r,
       CAST(ROUND(MAX(nrm), 9) AS DOUBLE) AS max_norm_r
FROM n
"""


@register("dq_embedding_norm_audit", sql=_NORM_AUDIT_SQL)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table DQ gate: every vector must be L2-normalized (the
    cosine pipelines assume it) and share one dimensionality — corrupt or
    truncated vectors show up as norm/dim violations before they poison
    similarity scores. One pass, sequential-fold norms (bit-identical in
    the oracle), count-only output."""
    e = load_table(spark, sf_dir, "embeddings")
    v = as_double_vec(F.col("embedding"))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    n = e.select(nrm.alias("nrm"), F.size("embedding").alias("dim"))
    return n.agg(
        F.count("*").alias("n_vecs"),
        F.countDistinct("dim").alias("n_distinct_dims"),
        F.sum(
            F.when(F.abs(F.col("nrm") - 1.0) > _NORM_TOL, 1).otherwise(0)
        ).alias("n_unnormalized"),
        F.round(F.min("nrm"), 9).alias("min_norm_r"),
        F.round(F.max("nrm"), 9).alias("max_norm_r"),
    )


# --- scalar-quantized (int8) ANN -------------------------------------------

_SQ8_TOPK = 5
_SQ8_QUERY_STRIDE = 100

_SQ8_SQL = f"""
WITH ex AS (
  SELECT vec_id, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding)+1)) AS u(i)
),
stats AS (
  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos
),
codes AS (
  SELECT e.vec_id, e.pos,
         LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
             CAST(FLOOR(((e.x - s.mn) * 255.0) / (s.mx - s.mn)) AS BIGINT))) AS code
  FROM ex e JOIN stats s USING (pos)
  WHERE s.mx > s.mn
),
qc AS (
  SELECT vec_id AS qid, pos, code AS qcode FROM codes
  WHERE vec_id % {_SQ8_QUERY_STRIDE} = 0
),
pairs AS (
  SELECT qc.qid, c.vec_id AS nid, CAST(SUM(qc.qcode * c.code) AS BIGINT) AS score
  FROM qc JOIN codes c USING (pos)
  WHERE qc.qid != c.vec_id
  GROUP BY qc.qid, c.vec_id
),
ranked AS (
  SELECT qid, nid, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rk
  FROM pairs
)
SELECT qid, nid, rk, score FROM ranked WHERE rk <= {_SQ8_TOPK}
"""


@register("llm_ann_sq8_topk", sql=_SQ8_SQL)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization ANN: per-dimension min/max learned from the
    corpus (one tiny aggregate), every vector compressed to int8 codes
    (4x smaller than f32 — at 100 TB that is the difference between
    spilling and staying in memory), ranking by exact INTEGER code dot
    products (order-independent, so the oracle agrees bit-for-bit).
    Corpus streams through once with the quantizer and the query codes
    broadcast; constant dimensions (mx == mn) are dropped on both sides."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = (
        e.select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("val").cast("double").alias("x"),
        )
    )
    stats = (
        ex.groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .filter(F.col("mx") > F.col("mn"))
    )
    code = F.least(
        F.lit(255).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor(
                ((F.col("x") - F.col("mn")) * F.lit(255.0))
                / (F.col("mx") - F.col("mn"))
            ).cast("bigint"),
        ),
    )
    codes = ex.join(F.broadcast(stats), "pos").select(
        "vec_id", "pos", code.alias("code")
    )
    # reassemble ordered code vectors: broadcast-query x corpus single pass
    arr = (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "code"))).alias("pc"))
        .select("vec_id", F.transform("pc", lambda s: s["code"]).alias("cvec"))
    )
    q = arr.filter(F.col("vec_id") % _SQ8_QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("cvec").alias("qvec")
    )
    intdot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("nvec"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(arr.select(F.col("vec_id").alias("nid"), F.col("cvec").alias("nvec")))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", intdot.alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SQ8_TOPK)
        .select("qid", "nid", "rk", "score")
    )


# --- product-quantization ANN with asymmetric-distance lookup --------------

_PQ_SUBDIMS = 8
_PQ_STRIDE = 50
_PQ_QSTRIDE = 100
_PQ_TOPK = 5

_PQ_SQL = f"""
WITH ex AS (
  SELECT vec_id, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding)+1)) AS u(i)
),
stats AS (
  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos
),
codes AS (
  SELECT e.vec_id, e.pos,
         CAST(FLOOR((e.pos - 1) / {_PQ_SUBDIMS}.0) AS BIGINT) AS sub,
         CASE WHEN s.mx > s.mn THEN
           LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
               CAST(FLOOR(((e.x - s.mn) * 255.0) / (s.mx - s.mn)) AS BIGINT)))
         ELSE CAST(0 AS BIGINT) END AS code
  FROM ex e JOIN stats s USING (pos)
),
cent AS (
  SELECT vec_id AS cid, pos, sub, code AS ccode FROM codes
  WHERE vec_id % {_PQ_STRIDE} = 0
),
cdist AS (
  SELECT c.vec_id, ct.cid, c.sub,
         CAST(SUM((c.code - ct.ccode) * (c.code - ct.ccode)) AS BIGINT) AS d2
  FROM codes c JOIN cent ct ON c.pos = ct.pos
  GROUP BY c.vec_id, ct.cid, c.sub
),
assign AS (
  SELECT vec_id, sub, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
  FROM cdist
),
amin AS (SELECT vec_id, sub, cid FROM assign WHERE rn = 1),
qdist AS (
  SELECT vec_id AS qid, cid, sub, d2 FROM cdist
  WHERE vec_id % {_PQ_QSTRIDE} = 0
),
score AS (
  SELECT q.qid, a.vec_id AS nid, CAST(SUM(q.d2) AS BIGINT) AS adc
  FROM amin a JOIN qdist q ON q.cid = a.cid AND q.sub = a.sub
  WHERE q.qid != a.vec_id
  GROUP BY q.qid, a.vec_id
),
ranked AS (
  SELECT qid, nid, adc,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
  FROM score
)
SELECT qid, nid, rk, adc FROM ranked WHERE rk <= {_PQ_TOPK}
"""


#: WIDE-FORM PQ pipeline (r12, guide §2.3/§2.4). The r11 shape kept every
#: (vector, pos) pair as a ROW: cdist expanded |codes| x |centroids| rows
#: PER POSITION (5.1M rows at sf0.1) into a 640k-group hash aggregate,
#: and the recall ground truth expanded |codes| x |queries| per position
#: again — the family's plans carried 34-98 Exchange nodes. Here a
#: vector is ONE row carrying its 64 int8 codes as an array; the 40-row
#: centroid codebook and the 20-query ADC tables ride a single-row
#: broadcast; distances/argmins are integer array HOFs inside one
#: codegen stage. Same integer math, same tie-breaks (centroids sorted
#: by cid, strict < keeps the FIRST = smallest cid, exactly the oracle's
#: ROW_NUMBER ORDER BY d2, cid), bit-identical results.
_PQ_D2M = """
    transform(ccodes, c ->
      transform(sequence(0, {nsub}), s ->
        aggregate(
          zip_with(slice(codes, s * {sd} + 1, {sd}),
                   slice(c,     s * {sd} + 1, {sd}),
                   (a, b) -> (a - b) * (a - b)),
          0L, (acc, x) -> acc + x)))
"""

#: argmin over the centroid axis of an [n_cent][n_sub] bigint matrix for
#: one subspace s (0-based): first index attaining the minimum = the
#: smallest cid, because ccodes/cids are sorted by cid.
_PQ_ARGMIN_SUB = """
    aggregate(sequence(0, size(cids) - 1),
              named_struct('d', 9223372036854775807L, 'i', -1),
              (acc, c) -> IF(element_at(element_at(d2m, c + 1), {s} + 1) < acc.d,
                             named_struct('d', element_at(element_at(d2m, c + 1), {s} + 1),
                                          'i', c),
                             acc),
              acc -> acc.i)
"""


def _pq_build(spark: SparkSession, sf_dir: str) -> dict:
    """Shared PQ pipeline stages, wide form: per-vector code arrays
    (persisted), and per-vector subspace assignments / coarse cell /
    query ADC tables computed as array HOFs against the broadcast
    codebook (persisted). Used by the ADC top-k queries and the recall
    evaluations; ``cdist``/``amin``/``qdist`` row forms are derived
    views kept for consumers that want the relational shape."""
    nsub = 64 // _PQ_SUBDIMS  # 8 subspaces over 64 dims
    # spread feeds BOTH branches: the stats aggregate AND the per-vector
    # HOF pipeline below (a single-row-group scan would run the whole
    # codebook-distance computation on ONE task)
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    ex = (
        e
        .select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("val").cast("double").alias("x"),
        )
    )
    stats = ex.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    # per-position min/max as two 64-wide arrays on ONE broadcast row
    statsw = (
        stats.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn", "mx"))
            ).alias("s")
        )
        .select(
            F.expr("transform(s, x -> x.mn)").alias("mns"),
            F.expr("transform(s, x -> x.mx)").alias("mxs"),
        )
    )
    # quantize each vector in place: the SAME double expression the r11
    # row form (and the DuckDB oracle) evaluates, per element
    quant = """
        transform(embedding, (v, i) ->
          CASE WHEN element_at(mxs, i + 1) > element_at(mns, i + 1) THEN
            LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
              CAST(FLOOR(((CAST(v AS DOUBLE) - element_at(mns, i + 1)) * 255.0D)
                   / (element_at(mxs, i + 1) - element_at(mns, i + 1))) AS BIGINT)))
          ELSE CAST(0 AS BIGINT) END)
    """
    codesv = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(statsw))
        .select("vec_id", F.expr(quant).alias("codes"))
        .transform(persist_scoped)
    )
    # codebook: the strided donors as (cids, ccodes) arrays on one
    # broadcast row, sorted by cid (the argmin tie-break relies on it)
    centw = (
        codesv.filter(F.col("vec_id") % _PQ_STRIDE == 0)
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("vec_id", "codes"))
            ).alias("cs")
        )
        .select(
            F.expr("transform(cs, x -> x.vec_id)").alias("cids"),
            F.expr("transform(cs, x -> x.codes)").alias("ccodes"),
        )
    )
    d2m = _PQ_D2M.format(nsub=nsub - 1, sd=_PQ_SUBDIMS)
    amin_idx = (
        "transform(sequence(0, %d), s -> %s)"
        % (nsub - 1, _PQ_ARGMIN_SUB.format(s="s"))
    )
    cell_idx = """
        aggregate(sequence(0, size(cids) - 1),
                  named_struct('d', 9223372036854775807L, 'i', -1),
                  (acc, c) -> IF(aggregate(element_at(d2m, c + 1), 0L,
                                           (a, x) -> a + x) < acc.d,
                                 named_struct('d', aggregate(element_at(d2m, c + 1),
                                                             0L, (a, x) -> a + x),
                                              'i', c),
                                 acc),
                  acc -> acc.i)
    """
    # per-vector: d2 matrix vs every centroid, subspace assignments
    # (as dense codebook indices), coarse cell, and — for query vectors
    # only — the full ADC lookup matrix. ONE codegen stage over the
    # persisted codes; persisted because every consumer below reads it.
    pv = (
        codesv.crossJoin(F.broadcast(centw))
        .select("vec_id", "cids", F.expr(d2m).alias("d2m"))
        .select(
            "vec_id",
            "cids",
            F.expr(amin_idx).alias("aidx"),
            F.expr(cell_idx).alias("cidx"),
            F.when(F.col("vec_id") % _PQ_QSTRIDE == 0, F.col("d2m")).alias(
                "qd2"
            ),
        )
        .transform(persist_scoped)
    )
    # relational views (row forms) for consumers/tests that want them
    amin = pv.select(
        "vec_id",
        F.posexplode(
            F.expr("transform(aidx, i -> element_at(cids, i + 1))")
        ).alias("sub0", "cid"),
    ).select("vec_id", F.col("sub0").cast("bigint").alias("sub"), "cid")
    qdist = (
        pv.filter(F.col("qd2").isNotNull())
        .select(
            F.col("vec_id").alias("qid"),
            "cids",
            F.posexplode("qd2").alias("ci", "row"),
        )
        .select(
            "qid",
            F.expr("element_at(cids, ci + 1)").alias("cid"),
            F.posexplode("row").alias("sub0", "d2"),
        )
        .select(
            "qid", "cid", F.col("sub0").cast("bigint").alias("sub"), "d2"
        )
    )
    cdist = (
        codesv.crossJoin(F.broadcast(centw))
        .select("vec_id", "cids", F.expr(d2m).alias("d2m"))
        .select("vec_id", "cids", F.posexplode("d2m").alias("ci", "row"))
        .select(
            "vec_id",
            F.expr("element_at(cids, ci + 1)").alias("cid"),
            F.posexplode("row").alias("sub0", "d2"),
        )
        .select(
            "vec_id", "cid", F.col("sub0").cast("bigint").alias("sub"), "d2"
        )
    )
    return {
        "codesv": codesv,
        "pv": pv,
        "cdist": cdist,
        "amin": amin,
        "qdist": qdist,
    }


#: ADC of one corpus row against one query's lookup matrix: sum over
#: subspaces of the query's distance to the corpus vector's assigned
#: centroid in that subspace — a pure LUT gather, no join keys shuffled.
_PQ_ADC = """
    aggregate(sequence(0, size(aidx) - 1), 0L,
              (acc, s) -> acc + element_at(
                  element_at(qd2, element_at(aidx, s + 1) + 1), s + 1))
"""


def _pq_topk(parts: dict) -> DataFrame:
    pv = parts["pv"]
    qlut = pv.filter(F.col("qd2").isNotNull()).select(
        F.col("vec_id").alias("qid"), "qd2"
    )
    score = (
        pv.select("vec_id", "aidx")
        .crossJoin(F.broadcast(qlut))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.expr(_PQ_ADC).cast("bigint").alias("adc"),
        )
    )
    w_rank = Window.partitionBy("qid").orderBy("adc", "nid")
    return (
        score.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select("qid", "nid", "rk", "adc")
    )


def _pq_exact5(parts: dict) -> DataFrame:
    """Exact code-space top-5 (the recall ground truth): full 64-dim
    squared code distance of every corpus vector against every query,
    one integer HOF per (corpus, query) pair over the broadcast query
    codes — the r11 form expanded this per POSITION into a
    |codes| x |queries| hash aggregate."""
    codesv = parts["codesv"]
    qcw = codesv.filter(F.col("vec_id") % _PQ_QSTRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes")
    )
    exactd = (
        codesv.crossJoin(F.broadcast(qcw))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.expr(
                "aggregate(zip_with(codes, qcodes, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            )
            .cast("bigint")
            .alias("d2"),
        )
    )
    w = Window.partitionBy("qid").orderBy("d2", "nid")
    return (
        exactd.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select("qid", "nid")
    )


@register("llm_ann_pq_adc", sql=_PQ_SQL)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization over int8 codes: 64 dims split into 8
    subspaces, per-subspace codebook learned from strided corpus donors,
    each vector encoded as 8 centroid ids (8 bytes — 32x smaller than
    f32), queries ranked by asymmetric distance (query-to-centroid lookup
    table summed across subspaces). EVERY distance is an integer sum of
    squared int8-code deltas, so no float-order drift exists anywhere and
    the oracle matches exactly. At 100 TB the amin table (vec_id, 8
    codes) is the only thing scanned per query — the classic PQ memory
    win; the ADC table is queries x centroids, broadcast-sized."""
    return _pq_topk(_pq_build(spark, sf_dir))


# --- PQ recall vs exact code-space ground truth ------------------------------

_PQ_CODES_CTES = _PQ_SQL.split("qdist AS (")[0].rstrip().rstrip(",")
# _PQ_CODES_CTES reuses the WITH chain through `amin`; the recall query
# re-derives qdist/score inline below.

_PQ_RECALL_SQL = f"""
{_PQ_CODES_CTES},
qdist AS (
  SELECT vec_id AS qid, cid, sub, d2 FROM cdist
  WHERE vec_id % {_PQ_QSTRIDE} = 0
),
score AS (
  SELECT q.qid, a.vec_id AS nid, CAST(SUM(q.d2) AS BIGINT) AS adc
  FROM amin a JOIN qdist q ON q.cid = a.cid AND q.sub = a.sub
  WHERE q.qid != a.vec_id
  GROUP BY q.qid, a.vec_id
),
pq5 AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
    FROM score
  ) WHERE rk <= {_PQ_TOPK}
),
exactd AS (
  SELECT qc.vec_id AS qid, c.vec_id AS nid,
         CAST(SUM((qc.code - c.code) * (qc.code - c.code)) AS BIGINT) AS d2
  FROM codes qc JOIN codes c ON qc.pos = c.pos
  WHERE qc.vec_id % {_PQ_QSTRIDE} = 0 AND c.vec_id != qc.vec_id
  GROUP BY qc.vec_id, c.vec_id
),
exact5 AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
    FROM exactd
  ) WHERE rk <= {_PQ_TOPK}
)
SELECT e.qid,
       CAST(SUM(CASE WHEN p.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / {_PQ_TOPK} AS recall_at_5
FROM exact5 e LEFT JOIN pq5 p ON p.qid = e.qid AND p.nid = e.nid
GROUP BY e.qid
"""


@register("llm_ann_pq_recall", sql=_PQ_RECALL_SQL)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of PQ-ADC against the exact top-5 in the SAME int8 code
    space (full 64-dim squared distance) — isolates the loss introduced
    by the 8-byte PQ compression from quantization loss, the number an
    ANN tuning loop watches when picking subspace count/codebook size.
    Both rankings are integer-exact, so recall is deterministic."""
    parts = _pq_build(spark, sf_dir)
    pq5 = _pq_topk(parts).select("qid", "nid")
    exact5 = _pq_exact5(parts)
    hits = pq5.select("qid", "nid", F.lit(1).alias("hit"))
    return (
        exact5.join(hits, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.lit(_PQ_TOPK)
            ).alias("recall_at_5")
        )
    )


# --- SQ8 recall vs exact float cosine ground truth ---------------------------

_SQ8_BODY = _SQ8_SQL.strip().rsplit("SELECT qid, nid, rk, score", 1)[0].strip()

_SQ8_RECALL_SQL = f"""
{_SQ8_BODY},
sq5 AS (SELECT qid, nid FROM ranked WHERE rk <= {_SQ8_TOPK}),
nn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qq AS (SELECT vec_id AS qid, v AS qv FROM nn
       WHERE vec_id % {_SQ8_QUERY_STRIDE} = 0),
brute AS (
  SELECT qid, nid FROM (
    SELECT qq.qid, m.vec_id AS nid,
           ROW_NUMBER() OVER (PARTITION BY qq.qid ORDER BY
               list_dot_product(qq.qv, m.v) /
               (sqrt(list_dot_product(qq.qv, qq.qv)) *
                sqrt(list_dot_product(m.v, m.v))) DESC, m.vec_id) AS rk
    FROM qq JOIN nn m ON m.vec_id != qq.qid
  ) WHERE rk <= {_SQ8_TOPK}
)
SELECT b.qid,
       CAST(SUM(CASE WHEN s.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / {_SQ8_TOPK} AS recall_at_5
FROM brute b LEFT JOIN sq5 s ON s.qid = b.qid AND s.nid = b.nid
GROUP BY b.qid
"""


@register("llm_ann_sq8_recall", sql=_SQ8_RECALL_SQL)
def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of int8 scalar quantization against the TRUE float cosine
    top-5 — unlike the PQ audit (code-space vs code-space) this crosses
    the quantization boundary, measuring what 8-bit compression costs in
    end-metric terms. Completes the recall matrix: LSH, IVF, PQ, SQ8,
    each audited against its ground truth."""
    from cdc_apache_cassandra_spark.plans.llm_queries import ann_cosine_topk

    exact5 = ann_cosine_topk(spark, sf_dir).select("qid", "nid")
    sq5 = ann_sq8_topk(spark, sf_dir).select(
        "qid", "nid", F.lit(1).alias("hit")
    )
    return (
        exact5.join(sq5, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.lit(_SQ8_TOPK)
            ).alias("recall_at_5")
        )
    )


# --- IVF + PQ composite (the FAISS IVFPQ shape), all-integer ----------------

_IVFPQ_SQL = f"""
{_PQ_CODES_CTES},
coarse AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY total_d2, cid) AS rn
    FROM (
      SELECT vec_id, cid, CAST(SUM(d2) AS BIGINT) AS total_d2
      FROM cdist GROUP BY vec_id, cid
    )
  ) WHERE rn = 1
),
qdist AS (
  SELECT vec_id AS qid, cid, sub, d2 FROM cdist
  WHERE vec_id % {_PQ_QSTRIDE} = 0
),
score AS (
  SELECT q.qid, a.vec_id AS nid, CAST(SUM(q.d2) AS BIGINT) AS adc
  FROM amin a
  JOIN coarse cn ON cn.vec_id = a.vec_id
  JOIN coarse cq ON cq.cell = cn.cell
  JOIN qdist q ON q.cid = a.cid AND q.sub = a.sub AND q.qid = cq.vec_id
  WHERE q.qid != a.vec_id
  GROUP BY q.qid, a.vec_id
),
ranked AS (
  SELECT qid, nid, adc,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
  FROM score
)
SELECT r.qid, r.nid, r.rk, r.adc, cq.cell
FROM ranked r JOIN coarse cq ON cq.vec_id = r.qid
WHERE r.rk <= {_PQ_TOPK}
"""


@register("llm_ann_ivfpq_topk", sql=_IVFPQ_SQL)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the FAISS-style IVFPQ index as one plan: a
    COARSE quantizer (each vector's nearest codebook donor by total
    code-space distance, reusing the already-persisted cdist table)
    partitions the corpus into cells; each query then ADC-ranks ONLY its
    own cell's members. Every distance in both layers is an integer sum
    of squared int8-code deltas, so the composite stays bit-exact under
    the oracle. At 100 TB this is the memory-AND-compute shape: the
    coarse cell bounds candidates per query (vs PQ's full-corpus ADC
    sweep), and the scanned artifact per candidate is 8 bytes of codes.
    nprobe=1; more probes = relax the cell equality to a top-n cell
    join, same plan."""
    return _ivfpq_topk(_pq_build(spark, sf_dir))


def _ivfpq_topk(parts: dict) -> DataFrame:
    pv = parts["pv"]
    cell = F.expr("element_at(cids, cidx + 1)")
    qlut = pv.filter(F.col("qd2").isNotNull()).select(
        F.col("vec_id").alias("qid"), cell.alias("qcell"), "qd2"
    )
    score = (
        pv.select("vec_id", "aidx", cell.alias("cell"))
        .crossJoin(F.broadcast(qlut))
        .filter(
            (F.col("qcell") == F.col("cell"))
            & (F.col("qid") != F.col("vec_id"))
        )
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.expr(_PQ_ADC).cast("bigint").alias("adc"),
            F.col("qcell").alias("cell"),
        )
    )
    w_rank = Window.partitionBy("qid").orderBy("adc", "nid")
    return (
        score.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select("qid", "nid", "rk", "adc", "cell")
    )


_IVFPQ_RECALL_SQL = f"""
{_PQ_CODES_CTES},
coarse AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY total_d2, cid) AS rn
    FROM (
      SELECT vec_id, cid, CAST(SUM(d2) AS BIGINT) AS total_d2
      FROM cdist GROUP BY vec_id, cid
    )
  ) WHERE rn = 1
),
qdist AS (
  SELECT vec_id AS qid, cid, sub, d2 FROM cdist
  WHERE vec_id % {_PQ_QSTRIDE} = 0
),
score AS (
  SELECT q.qid, a.vec_id AS nid, CAST(SUM(q.d2) AS BIGINT) AS adc
  FROM amin a
  JOIN coarse cn ON cn.vec_id = a.vec_id
  JOIN coarse cq ON cq.cell = cn.cell
  JOIN qdist q ON q.cid = a.cid AND q.sub = a.sub AND q.qid = cq.vec_id
  WHERE q.qid != a.vec_id
  GROUP BY q.qid, a.vec_id
),
ivfpq5 AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
    FROM score
  ) WHERE rk <= {_PQ_TOPK}
),
exactd AS (
  SELECT qc.vec_id AS qid, c.vec_id AS nid,
         CAST(SUM((qc.code - c.code) * (qc.code - c.code)) AS BIGINT) AS d2
  FROM codes qc JOIN codes c ON qc.pos = c.pos
  WHERE qc.vec_id % {_PQ_QSTRIDE} = 0 AND c.vec_id != qc.vec_id
  GROUP BY qc.vec_id, c.vec_id
),
exact5 AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
    FROM exactd
  ) WHERE rk <= {_PQ_TOPK}
)
SELECT e.qid,
       CAST(SUM(CASE WHEN p.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / {_PQ_TOPK} AS recall_at_5
FROM exact5 e LEFT JOIN ivfpq5 p ON p.qid = e.qid AND p.nid = e.nid
GROUP BY e.qid
"""


@register("llm_ann_ivfpq_recall", sql=_IVFPQ_RECALL_SQL)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF+PQ composite against the exact code-space
    top-5 — measured against the SAME ground truth as llm_ann_pq_recall,
    so the per-query delta isolates the effect of the nprobe=1 cell
    restriction on top of PQ compression. Note the delta is NOT
    sign-definite: the restriction usually loses neighbors that fall in
    other cells, but it can also evict ADC false positives and RAISE
    recall@5 (observed on this corpus) — which is why the audit reports
    per-query numbers instead of assuming monotone loss. Integer-exact
    both sides."""
    parts = _pq_build(spark, sf_dir)
    # share THIS call's persisted parts with the approximate side instead
    # of re-running _pq_build inside ann_ivfpq_topk (the second build's
    # persists only dedup through CacheManager plan matching — sharing
    # the dict guarantees one fill and halves plan construction)
    ivfpq5 = _ivfpq_topk(parts).select("qid", "nid", F.lit(1).alias("hit"))
    exact5 = _pq_exact5(parts)
    return (
        exact5.join(ivfpq5, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.lit(_PQ_TOPK)
            ).alias("recall_at_5")
        )
    )
