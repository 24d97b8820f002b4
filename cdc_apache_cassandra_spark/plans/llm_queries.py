"""LLM-data-pipeline operators over ``documents`` / ``embeddings``
(BASELINE.json north star; SURVEY §7.2 step 9).

First wave: exact dedup, token counting, quality scoring, fingerprinting,
language-ID heuristic, brute-force cosine top-k. Fuzzy dedup (MinHash-LSH,
SimHash, n-gram Jaccard) lives in plans/fuzzy_dedup_queries.py.

All expressions are Catalyst built-ins (no Python UDFs) — at 100 TB these
run inside whole-stage codegen; the only shuffles are the group-bys on
content hashes (maximal-cardinality keys, skew-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan

# --- exact dedup by content hash -------------------------------------------

_EXACT_DEDUP_SQL = """
WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents)
SELECT content_hash,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper_doc_id
FROM hashed
GROUP BY content_hash
"""


@register("llm_dedup_exact", sql=_EXACT_DEDUP_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(content) groups; keeper = min doc_id per group.
    One shuffle on the hash; at 100 TB hash first, shuffle only the
    (hash, id) pairs — never the text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


# --- token counting --------------------------------------------------------

_TOKENS_SQL = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars_actual
FROM documents
WHERE length(trim(text)) > 0
"""


@register("llm_token_count", sql=_TOKENS_SQL)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + char length per doc (empty docs excluded so
    split semantics can't diverge between engines)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
            F.length("text").alias("n_chars_actual"),
        )
    )


# --- quality scoring -------------------------------------------------------

_QUALITY_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang, source,
         length(text) AS n_chars_actual,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')) AS n_punct
  FROM documents
  WHERE length(trim(text)) > 0
)
SELECT doc_id, lang, source, n_tokens,
       CAST(n_chars_actual AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(n_punct AS DOUBLE) / n_chars_actual AS punct_ratio,
       (n_tokens >= 5 AND CAST(n_chars_actual AS DOUBLE) / n_tokens <= 12.0) AS quality_pass
FROM scored
"""


@register("llm_quality_score", sql=_QUALITY_SQL)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: avg token length, punctuation ratio, and a
    pass/fail gate — the filter stage of a pretraining pipeline."""
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            F.length("text").alias("n_chars_actual"),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
            (
                F.length("text")
                - F.length(
                    F.replace(
                        F.replace(
                            F.replace(F.col("text"), F.lit("."), F.lit("")),
                            F.lit(","),
                            F.lit(""),
                        ),
                        F.lit("!"),
                        F.lit(""),
                    )
                )
            ).alias("n_punct"),
        )
    )
    avg_tok = F.col("n_chars_actual").cast("double") / F.col("n_tokens")
    return base.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        avg_tok.alias("avg_token_len"),
        (F.col("n_punct").cast("double") / F.col("n_chars_actual")).alias("punct_ratio"),
        ((F.col("n_tokens") >= 5) & (avg_tok <= 12.0)).alias("quality_pass"),
    )


# --- document fingerprint --------------------------------------------------

_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS fingerprint
FROM documents
"""


@register("llm_fingerprint", sql=_FINGERPRINT_SQL)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: lowercase, strip non-alnum, md5 —
    catches near-exact duplicates that differ only in punctuation/case."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""))
        ).alias("fingerprint"),
    )


# --- language-ID heuristic -------------------------------------------------

_LANGID_SQL = r"""
WITH feats AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is'))) AS en_hits
  FROM documents
  WHERE length(trim(text)) > 0
)
SELECT doc_id, lang AS lang_label,
       (CAST(en_hits AS DOUBLE) / n_tokens >= 0.1) AS pred_en,
       en_hits, n_tokens
FROM feats
"""


@register("llm_langid_stopword", sql=_LANGID_SQL)
def langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID: fraction of tokens that are English
    stopwords >= 0.1 => predict English. Pure array expressions."""
    d = load_table(spark, sf_dir, "documents")
    stopwords = ["the", "a", "of", "and", "to", "in", "is"]
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    en_hits = F.size(
        F.filter(toks, lambda t: t.isin(stopwords))
    )
    base = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.col("lang").alias("lang_label"),
            F.size(toks).alias("n_tokens"),
            en_hits.alias("en_hits"),
        )
    )
    return base.select(
        "doc_id",
        "lang_label",
        ((F.col("en_hits").cast("double") / F.col("n_tokens")) >= 0.1).alias("pred_en"),
        "en_hits",
        "n_tokens",
    )


# --- brute-force cosine top-k ANN ------------------------------------------

_COSINE_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 0),
pairs AS (
  SELECT q.qid, e.vec_id AS nid,
         list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
         (sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))) *
          sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos_sim
  FROM q CROSS JOIN embeddings e
  WHERE q.qid != e.vec_id
),
ranked AS (
  SELECT qid, nid, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
  FROM pairs
)
SELECT qid, nid, rk, CAST(ROUND(cos_sim, 6) AS DOUBLE) AS cos_sim_r
FROM ranked WHERE rk <= 5
"""


@register("llm_ann_cosine_topk", sql=_COSINE_SQL)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a 1% query sample: the exact baseline
    every ANN variant is judged against. Query side is broadcast (tiny);
    the corpus streams through — no N×N shuffle. Dot products are
    sequential double folds so both engines compute identical sums."""
    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    withd = e.select("vec_id", dvec.alias("vec"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = withd.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(withd.select(F.col("vec_id").alias("nid"), F.col("vec").alias("nvec")))
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            (
                dot(F.col("qvec"), F.col("nvec"))
                / (
                    F.sqrt(dot(F.col("qvec"), F.col("qvec")))
                    * F.sqrt(dot(F.col("nvec"), F.col("nvec")))
                )
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "nid", "rk", F.round(F.col("cos_sim"), 6).alias("cos_sim_r"))
    )
