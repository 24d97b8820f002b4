"""Fuzzy dedup + similarity search over ``documents`` / ``embeddings``
(SURVEY §7.2 step 9; BASELINE.json north star).

Five operators, each the Spark-first shape that survives 100 TB:

- MinHash+LSH:  shingle -> k minhashes -> band -> bucket equi-join ->
                exact-Jaccard verify on candidates only.
- SimHash:      linear signature + collision groups (no pair join).
- n-gram Jaccard: exact pairwise verify inside bounded blocks.
- Embedding near-dup: sign-LSH bucket equi-join + cosine threshold.
- IVF ANN:      coarse-quantize once, probe one cell per query.

Oracles compute the identical md5-based hashes in DuckDB, so value hashes
match exactly (see functions/hashing.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.text_dedup import (
    minhash_lsh_candidates,
    simhash32_sql,
    token_hash32_expr,
    tokens_expr,
    word_shingles,
)
from cdc_apache_cassandra_spark.operators.vectors import (
    as_double_vec,
    cosine,
    cosine_with_norms,
    norm,
    ivf_assign,
    sign_lsh_bucket,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan
from cdc_apache_cassandra_spark.caching import persist_scoped

# --- MinHash + LSH near-dup pipeline ---------------------------------------

_MINHASH_K = 12
_BANDS = 4
_ROWS_PER_BAND = 3
_JACCARD_MIN = 0.5

_MINHASH_PRIME = 2**31 - 1

#: shared CTE chain: documents -> shingles -> signatures -> LSH bands ->
#: candidates -> verified (n_inter/n_a/n_b); reused by the pair query and
#: the connected-components clustering oracle.
_MINHASH_CTES = rf"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tokens)-1),
             i -> array_to_string(list_slice(tokens, i, i+2), ' '))) AS shingles
  FROM toks WHERE len(tokens) >= 3
),
hs AS (
  SELECT doc_id, shingles,
         list_transform(shingles,
             g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS shash
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(range(0, {_MINHASH_K}),
             s -> list_min(list_transform(shash,
                  h -> ((2*s+1)*h + 12345*s + 678) % {_MINHASH_PRIME}))) AS minhash
  FROM hs
),
bands AS (
  SELECT doc_id, b.band_id,
         md5(CAST(b.band_id AS VARCHAR) || '|' ||
             array_to_string(list_transform(list_slice(minhash,
                 b.band_id*{_ROWS_PER_BAND}+1,
                 b.band_id*{_ROWS_PER_BAND}+{_ROWS_PER_BAND}),
                 x -> CAST(x AS VARCHAR)), ',')) AS band_key
  FROM sig, (SELECT unnest(range(0, {_BANDS})) AS band_id) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id
),
verified AS (
  SELECT cand.doc_a, cand.doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS n_inter,
         len(sa.shingles) AS n_a, len(sb.shingles) AS n_b
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
)"""

_MINHASH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b,
       CAST(ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS DOUBLE)
       AS jaccard_r
FROM verified
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= {_JACCARD_MIN}
"""


@register("llm_dedup_minhash_lsh", sql=_MINHASH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash({k})+LSH({b}x{r}) candidate generation, exact-Jaccard
    verified. The only shuffles: the band-bucket equi-join and the two
    candidate->shingle joins — each keyed on high-cardinality hashes, so
    no skew; verification touches |candidates| pairs, never n²."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= 3)
    )
    # The shingle table feeds the signature build AND both sides of the
    # verify join — persist it so the tokenize+shingle work runs once.
    # (In a production dedup run the signature table is a materialized
    # artifact; here the cache is bounded by the distinct-shingle corpus.)
    sh = toks.select(
        "doc_id", word_shingles(F.col("tokens"), 3).alias("shingles")
    ).transform(persist_scoped)
    cand = minhash_lsh_candidates(
        sh, "doc_id", "shingles", _MINHASH_K, _BANDS, _ROWS_PER_BAND
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        verified.filter(jac >= _JACCARD_MIN)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard_r"))
    )


# --- near-dup clusters: connected components over verified pairs -----------

_CLUSTERS_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
pairs AS (
  SELECT doc_a, doc_b FROM verified
  WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= {_JACCARD_MIN}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS component
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, component, (doc_id = component) AS is_keeper
FROM comp
"""


@register("llm_dedup_clusters", sql=_CLUSTERS_SQL)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment — the final dedup stage: connected
    components over the verified near-dup graph; component id = min doc
    in the component; keep exactly the keeper per cluster. Spark runs
    alternating large-star/small-star contraction (rounds ~ LOG of the
    component size — r12: min-label propagation's round count is the
    component DIAMETER, the shape a chain-like cluster at 100 TB turns
    into a non-converging loop; locally the two are within noise and
    label-identical, pinned by tests/test_cc_star.py); the oracle
    computes the exact transitive closure recursively. Both are exact,
    so they agree at any SF."""
    from cdc_apache_cassandra_spark.operators.text_dedup import (
        connected_components_star,
    )

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    nodes = load_table(spark, sf_dir, "documents").select("doc_id")
    labels, _ = connected_components_star(
        nodes, pairs, "doc_id", "doc_a", "doc_b"
    )
    return labels.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("is_keeper"),
    )


# --- SimHash signatures + exact-collision groups ---------------------------

_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
hs AS (
  SELECT doc_id,
         list_transform(tokens,
             t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hashes
  FROM toks
),
sig AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), b -> CASE WHEN
             list_sum(list_transform(hashes, h -> 2*((h >> b) & 1) - 1)) > 0
             THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
  FROM hs
)
SELECT doc_id, simhash,
       COUNT(*) OVER (PARTITION BY simhash) AS n_colliding
FROM sig
"""


@register("llm_dedup_simhash", sql=_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc + collision-group size, via the AGGREGATE
    formulation: explode distinct tokens, hash each once, take 32 flat
    per-bit vote sums, recombine — plain explode -> hash-aggregate with no
    nested lambda codegen (same values as operators.text_dedup.simhash32_sql,
    which remains the executable spec). Shuffles: the doc_id aggregate and
    the signature window."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tokens"),
    )
    h = toks.select("doc_id", F.explode("tokens").alias("t")).select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    simhash = None
    for b in range(32):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = bit if simhash is None else simhash + bit
    sig = votes.select("doc_id", simhash.alias("simhash"))
    w = Window.partitionBy("simhash")
    return sig.select(
        "doc_id", "simhash", F.count("*").over(w).alias("n_colliding")
    )


# --- n-gram Jaccard inside length blocks -----------------------------------

_NGRAM_JACCARD_MIN = 0.3

_NGRAM_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
sh AS (
  SELECT doc_id, lang, len(tokens) // 20 AS len_bucket,
         list_distinct(list_transform(range(1, len(tokens)),
             i -> array_to_string(list_slice(tokens, i, i+1), ' '))) AS grams
  FROM toks WHERE len(tokens) >= 2
)
, pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.grams, b.grams)) AS n_inter,
         len(a.grams) AS n_a, len(b.grams) AS n_b
  FROM sh a JOIN sh b
    ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS DOUBLE)
       AS jaccard_r
FROM pairs
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= {_NGRAM_JACCARD_MIN}
"""


@register("llm_dedup_ngram_jaccard", sql=_NGRAM_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard inside (lang, token-count/20) blocks —
    candidates via a PREFIX-FILTERED inverted index (AllPairs: each doc
    indexes only its |A| - ceil(t*|A|) + 1 corpus-rarest grams; any pair
    with J >= t must collide inside those prefixes, so recall is
    lossless — same device as llm_dedup_ngram_jaccard_adjacent), then an
    exact full-set intersection verify on candidates only. Indexing ALL
    grams was measured 2.5M collision rows at sf0.1 (block^2 mass on
    stop-bigrams) vs ~0.2M prefix collisions. Shuffle keys are
    (lang, bucket, gram) — high-cardinality, no skew at 100 TB."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "lang", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= 2)
    )
    # gram arrays feed the prefix index AND both verify sides — persist
    # so tokenize+shingle runs once (bounded by the document table)
    sh = toks.select(
        "doc_id",
        "lang",
        F.floor(F.size("tokens") / 20).alias("len_bucket"),
        word_shingles(F.col("tokens"), 2).alias("grams"),
    ).transform(persist_scoped)
    g = sh.select(
        "doc_id",
        "lang",
        "len_bucket",
        F.size("grams").alias("n"),
        F.explode("grams").alias("gram"),
    )
    # corpus df per (lang, gram) as a COUNT WINDOW over the exploded
    # grams — one exchange feeding WindowExec directly, instead of the
    # aggregate + join back onto the same rows (same exchange key, but
    # an extra hash aggregate and a sort-merge join on the gram stream)
    df_w = F.count("*").over(Window.partitionBy("lang", "gram"))
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "gram")
    )
    idx = (
        g.withColumn("df", df_w)
        .withColumn("rk", rk)
        .filter(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(_NGRAM_JACCARD_MIN) * F.col("n")) + 1
        )
        .select("doc_id", "lang", "len_bucket", "gram")
        .transform(persist_scoped)  # both self-join sides consume it
    )
    a = idx.select(F.col("doc_id").alias("doc_a"), "lang", "len_bucket", "gram")
    b = idx.select(F.col("doc_id").alias("doc_b"), "lang", "len_bucket", "gram")
    cand = (
        a.join(b, ["lang", "len_bucket", "gram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("g_b"))
    ver = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("g_a", "g_b")).alias("n_inter"),
            F.size("g_a").alias("n_a"),
            F.size("g_b").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        ver.filter(jac >= _NGRAM_JACCARD_MIN)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard_r"))
    )


# --- Embedding near-dup: sign-LSH bucket + cosine threshold ----------------

_COS_NEAR_MIN = 0.35
_LSH_BITS = 4

_EMB_NEAR_SQL = f"""
WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
  SELECT vec_id, v,
         list_sum(list_transform(range(1, {_LSH_BITS + 1}),
             i -> CASE WHEN v[i] >= 0 THEN (1::BIGINT << (i-1)) ELSE 0::BIGINT END))
         AS bucket
  FROM n
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       CAST(ROUND(list_dot_product(a.v, c.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
            AS DOUBLE) AS cos_sim_r
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE list_dot_product(a.v, c.v) /
      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))
      >= {_COS_NEAR_MIN}
"""


@register("llm_dedup_embedding_cosine", sql=_EMB_NEAR_SQL)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: sign-bit LSH bucket equi-join (the only
    shuffle), cosine computed on in-bucket pairs only. Bucket count is
    CONFIG, not structure: at scale set bits ≈ log2(N/target_bucket_size)
    so candidate mass stays ~N·target (the gate runs 2^{bits} buckets at
    test N). The production all-pairs seam with recall amplification is
    operators/vectors.ann_candidate_pairs (banded SRP,
    llm_ann_srp_banded); this axis-sign single-band entry is the
    documented baseline the banded recall audit compares against."""
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    bkt = n.select(
        "vec_id", "v", sign_lsh_bucket(F.col("v"), _LSH_BITS).alias("bucket")
    )
    # norms hoisted per vector: one HOF dot per pair, not three
    a = bkt.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket",
        norm(F.col("v")).alias("_nna"),
    )
    b = bkt.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket",
        norm(F.col("v")).alias("_nnb"),
    )
    cs = cosine_with_norms(
        F.col("va"), F.col("vb"), F.col("_nna"), F.col("_nnb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cs >= _COS_NEAR_MIN)
        .select("vec_a", "vec_b", F.round(cs, 6).alias("cos_sim_r"))
    )


# --- IVF ANN: coarse quantization + single-cell probe ----------------------

_IVF_STRIDE = 50  # centroid sample: vec_id % stride == 0
_QUERY_STRIDE = 100
_TOPK = 5

_IVF_SQL = f"""
WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
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
q AS (SELECT vec_id AS qid, v AS qv, cid AS qcid FROM asg
      WHERE vec_id % {_QUERY_STRIDE} = 0),
pairs AS (
  SELECT q.qid, m.vec_id AS nid,
         list_dot_product(q.qv, m.v) /
         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(m.v, m.v)))
         AS cos_sim
  FROM q JOIN asg m ON m.cid = q.qcid AND m.vec_id != q.qid
)
SELECT qid, nid, rk, CAST(ROUND(cos_sim, 6) AS DOUBLE) AS cos_sim_r
FROM (
  SELECT qid, nid, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
  FROM pairs
) WHERE rk <= {_TOPK}
"""


@register("llm_ann_ivf_topk", sql=_IVF_SQL)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic centroid sample (vec_id % {stride}),
    broadcast-assign every vector to its nearest cell (one corpus pass),
    then each query probes ONLY its own cell — the scale path next to the
    brute-force baseline (llm_ann_cosine_topk). nprobe=1 here; more
    probes = union more cells, same plan."""
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("vec"))
    cent = n.filter(F.col("vec_id") % _IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    asg = ivf_assign(n, cent, "vec")  # vec_id, vec, cid
    q = asg.filter(F.col("vec_id") % _QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv"), F.col("cid").alias("qcid")
    )
    m = asg.select(
        F.col("vec_id").alias("nid"), F.col("vec").alias("nv"), F.col("cid")
    )
    cs = cosine(F.col("qv"), F.col("nv"))
    pairs = (
        F.broadcast(q)
        .join(m, F.col("cid") == F.col("qcid"))
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cs.alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("qid", "nid", "rk", F.round("cos_sim", 6).alias("cos_sim_r"))
    )


# --- containment near-dup: asymmetric subset detection ----------------------

_CONTAINMENT_MIN = 0.7

_CONTAINMENT_SQL = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b,
       CAST(ROUND(CAST(n_inter AS DOUBLE) / LEAST(n_a, n_b), 6) AS DOUBLE)
         AS containment_r,
       (n_a <= n_b) AS a_is_smaller
FROM verified
WHERE CAST(n_inter AS DOUBLE) / LEAST(n_a, n_b) >= {_CONTAINMENT_MIN}
"""


@register("llm_dedup_containment", sql=_CONTAINMENT_SQL)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment similarity (|A∩B| / min|A|,|B|) over the SAME LSH
    candidate pairs as llm_dedup_minhash_lsh: catches subset duplication
    (a doc quoted inside a larger one) that symmetric Jaccard under-scores
    — the n_a ≪ n_b pair has small Jaccard but containment ≈ 1. Zero new
    index cost: candidates, shingles, and the verify join are shared with
    the Jaccard pipeline; only the final scoring expression differs."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= 3)
    )
    sh = toks.select(
        "doc_id", word_shingles(F.col("tokens"), 3).alias("shingles")
    ).transform(persist_scoped)
    cand = minhash_lsh_candidates(
        sh, "doc_id", "shingles", _MINHASH_K, _BANDS, _ROWS_PER_BAND
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
    )
    cont = F.col("n_inter").cast("double") / F.least("n_a", "n_b")
    return (
        verified.filter(cont >= _CONTAINMENT_MIN)
        .select(
            "doc_a",
            "doc_b",
            F.round(cont, 6).alias("containment_r"),
            (F.col("n_a") <= F.col("n_b")).alias("a_is_smaller"),
        )
    )


# --- LSH recall evaluation vs exhaustive ground truth -----------------------

_EVAL_MAX_DOC = 200  # exhaustive pairwise ground truth on doc_id < N

_LSH_EVAL_SQL = f"""
WITH {_MINHASH_CTES},
lsh_pairs AS (
  SELECT doc_a, doc_b FROM verified
  WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= {_JACCARD_MIN}
    AND doc_a < {_EVAL_MAX_DOC} AND doc_b < {_EVAL_MAX_DOC}
),
sample AS (SELECT * FROM sh WHERE doc_id < {_EVAL_MAX_DOC}),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sample a JOIN sample b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= {_JACCARD_MIN}
),
cm AS (
  SELECT
    (SELECT COUNT(*) FROM truth t
      WHERE EXISTS (SELECT 1 FROM lsh_pairs l
                    WHERE l.doc_a = t.doc_a AND l.doc_b = t.doc_b)) AS tp,
    (SELECT COUNT(*) FROM lsh_pairs l
      WHERE NOT EXISTS (SELECT 1 FROM truth t
                        WHERE t.doc_a = l.doc_a AND t.doc_b = l.doc_b)) AS fp,
    (SELECT COUNT(*) FROM truth t
      WHERE NOT EXISTS (SELECT 1 FROM lsh_pairs l
                        WHERE l.doc_a = t.doc_a AND l.doc_b = t.doc_b)) AS fn
)
SELECT tp, fp, fn,
       CAST(ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS DOUBLE) AS recall_r
FROM cm
"""


@register("llm_lsh_recall_eval", sql=_LSH_EVAL_SQL)
def lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality audit: MinHash-LSH's verified pairs vs the EXHAUSTIVE
    pairwise-Jaccard ground truth on a bounded doc sample — the recall
    measurement that justifies the banding parameters (b×r trades recall
    for candidate volume). FP should be 0 (pairs are exact-verified);
    FN counts truths whose bands never collided. Ground truth is O(k²)
    on the SAMPLE only — the audit pattern that scales (sample the
    ground truth, never the corpus)."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= 3)
    )
    sh = toks.select(
        "doc_id", word_shingles(F.col("tokens"), 3).alias("shingles")
    ).transform(persist_scoped)
    cand = minhash_lsh_candidates(
        sh, "doc_id", "shingles", _MINHASH_K, _BANDS, _ROWS_PER_BAND
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    lsh_pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .filter(jac >= _JACCARD_MIN)
        .filter(
            (F.col("doc_a") < _EVAL_MAX_DOC) & (F.col("doc_b") < _EVAL_MAX_DOC)
        )
        .select("doc_a", "doc_b")
    )
    sample = sh.filter(F.col("doc_id") < _EVAL_MAX_DOC)
    a = sample.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sample.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .filter(jac >= _JACCARD_MIN)
        .select("doc_a", "doc_b")
    )
    # the whole confusion matrix in ONE job: full-outer join on the pair
    # key with presence flags, then three conditional sums — previously
    # three separate count actions (semi + two antis), each re-running
    # the join even over the persisted sides
    cm = (
        truth.withColumn("_t", F.lit(1))
        .join(
            lsh_pairs.withColumn("_l", F.lit(1)),
            ["doc_a", "doc_b"],
            "full_outer",
        )
        .agg(
            F.sum(
                F.when(F.col("_t").isNotNull() & F.col("_l").isNotNull(), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(F.col("_t").isNull() & F.col("_l").isNotNull(), 1)
                .otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(F.col("_t").isNotNull() & F.col("_l").isNull(), 1)
                .otherwise(0)
            ).alias("fn"),
        )
        .first()
    )
    tp = int(cm["tp"] or 0)
    fp = int(cm["fp"] or 0)
    fn = int(cm["fn"] or 0)
    recall = round(tp / (tp + fn), 6) if (tp + fn) else None
    return spark.createDataFrame(
        [(tp, fp, fn, recall)], "tp long, fp long, fn long, recall_r double"
    )


# --- MinHash calibration: signature estimate vs exact Jaccard ---------------

_CALIB_SQL = rf"""
WITH {_MINHASH_CTES}
SELECT v.doc_a, v.doc_b,
       CAST(len(list_filter(range(1, {_MINHASH_K} + 1),
                i -> sa.minhash[i] = sb.minhash[i])) AS BIGINT) AS n_sig_match,
       CAST(ROUND(CAST(len(list_filter(range(1, {_MINHASH_K} + 1),
                i -> sa.minhash[i] = sb.minhash[i])) AS DOUBLE)
            / {_MINHASH_K}.0e0, 6) AS DOUBLE) AS jaccard_est_r,
       CAST(ROUND(CAST(v.n_inter AS DOUBLE)
            / (v.n_a + v.n_b - v.n_inter), 6) AS DOUBLE) AS jaccard_true_r,
       CAST(ROUND(ABS(CAST(len(list_filter(range(1, {_MINHASH_K} + 1),
                i -> sa.minhash[i] = sb.minhash[i])) AS DOUBLE)
            / {_MINHASH_K}.0e0
            - CAST(v.n_inter AS DOUBLE) / (v.n_a + v.n_b - v.n_inter)), 6)
            AS DOUBLE) AS abs_err_r
FROM verified v
JOIN sig sa ON sa.doc_id = v.doc_a
JOIN sig sb ON sb.doc_id = v.doc_b
"""


@register("llm_minhash_calibration", sql=_CALIB_SQL)
def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch CALIBRATION audit: for every LSH candidate pair, the
    signature-agreement Jaccard estimate (matching positions / k) next
    to the exact verified Jaccard and their absolute error — the
    quantity that justifies (k, bands, rows) choices before a 100-TB
    run. Estimates are exact multiples of 1/k and the error is one
    deterministic double subtraction, so the audit itself is
    hash-checked. Cost: candidate-bounded (signatures are k integers;
    the two signature joins touch |candidates| rows)."""
    from cdc_apache_cassandra_spark.operators.text_dedup import (
        minhash_signature_rows,
    )

    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= 3)
    )
    sh = toks.select(
        "doc_id", word_shingles(F.col("tokens"), 3).alias("shingles")
    ).transform(persist_scoped)
    # flat-aggregate signature (value-identical to minhash_signature,
    # no nested-lambda codegen), persisted: both signature join sides
    # consume it
    sig = minhash_signature_rows(sh, "doc_id", "shingles", _MINHASH_K).transform(
        persist_scoped
    )
    cand = minhash_lsh_candidates(
        sh, "doc_id", "shingles", _MINHASH_K, _BANDS, _ROWS_PER_BAND
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    ga = sig.select(F.col("doc_id").alias("doc_a"), F.col("minhash").alias("sig_a"))
    gb = sig.select(F.col("doc_id").alias("doc_b"), F.col("minhash").alias("sig_b"))
    n_match = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    ).cast("long")
    est = n_match.cast("double") / float(_MINHASH_K)
    # group the joins by key: both doc_a lookups back-to-back, then both
    # doc_b lookups — the alternating order re-shuffled the candidate
    # stream twice (doc_a, doc_b, doc_a again, doc_b again); inner joins
    # commute, so this is pure plan shape
    joined = (
        cand.join(sa, "doc_a").join(ga, "doc_a").join(sb, "doc_b").join(gb, "doc_b")
    )
    true_j = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / (
        F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    )
    return joined.select(
        "doc_a",
        "doc_b",
        n_match.alias("n_sig_match"),
        F.round(est, 6).alias("jaccard_est_r"),
        F.round(true_j, 6).alias("jaccard_true_r"),
        F.round(F.abs(est - true_j), 6).alias("abs_err_r"),
    )
