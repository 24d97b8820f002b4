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
    ivf_assign,
    ivf_probe_topn,
    squared_distance,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table

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
    e = load_table(spark, sf_dir, "embeddings")
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
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
FROM days d JOIN du u
  ON u.day <= d.day AND u.day >= d.day - 6
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
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
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
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
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

_SEMDEDUP_SQL = f"""
WITH RECURSIVE
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % {_IVF_STRIDE} = 0),
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
        connected_components,
    )

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("vec"))
    cent = n.filter(F.col("vec_id") % _IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    # assignment feeds BOTH self-join sides and the node list — persist so
    # the broadcast-score-window pipeline runs once, not three times
    asg = ivf_assign(n, cent, "vec").persist()  # vec_id, vec, cid
    a = asg.select(
        F.col("vec_id").alias("va"), F.col("vec").alias("xa"), "cid"
    )
    b = asg.select(
        F.col("vec_id").alias("vb"), F.col("vec").alias("xb"), "cid"
    )
    cs = cosine(F.col("xa"), F.col("xb"))
    pairs = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .filter(cs >= _SEM_COS_MIN)
        .select("va", "vb")
    )
    nodes = asg.select("vec_id", "cid")
    labels = connected_components(
        nodes.select("vec_id"), pairs, "vec_id", "va", "vb"
    )
    return nodes.join(labels, "vec_id").select(
        "vec_id",
        "cid",
        "component",
        (F.col("vec_id") == F.col("component")).alias("is_keeper"),
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

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n = e.join(d, e["vec_id"] == d["doc_id"]).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v"), "lang"
    )
    bkt = n.select(
        "vec_id", "v", "lang", sign_lsh_bucket(F.col("v"), _XL_LSH_BITS).alias("bucket")
    )
    a = bkt.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("lang").alias("lang_a"), "bucket",
    )
    b = bkt.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("lang").alias("lang_b"), "bucket",
    )
    cs = cosine(F.col("va"), F.col("vb"))
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
       SUM(CASE WHEN abs(nrm - 1.0) > {_NORM_TOL} THEN 1 ELSE 0 END)
         AS n_unnormalized,
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
