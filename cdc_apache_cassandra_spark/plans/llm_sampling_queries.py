"""Training-data assembly operators: deterministic train/test split,
domain mixing weights, and budgeted sequence packing — the sampling
stage between dedup/quality filtering and tokenization in a pretraining
pipeline. All hash-deterministic (md5-based) so reruns, retries, and the
DuckDB oracle agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table

# --- deterministic train/validation/test split ------------------------------

_SPLIT_SQL = """
WITH h AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'validation'
            ELSE 'test' END AS split
FROM h
"""


@register("llm_train_test_split", sql=_SPLIT_SQL)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split by a salted content-id hash: stable under reruns and
    data growth (a doc's split never changes), skew-free, and portable —
    never rand(), which differs per task retry. Narrow per-row transform,
    no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "validation")
        .otherwise("test")
        .alias("split"),
    )


# --- domain mixing weights --------------------------------------------------

#: target language shares for the training mix (uniform-ish demo targets;
#: production passes its own dict).
_TARGET_SHARES = {"en": 0.40, "zh": 0.15, "es": 0.15, "fr": 0.15, "de": 0.15}

_TARGET_VALUES = ", ".join(f"('{k}', {v})" for k, v in _TARGET_SHARES.items())

_MIX_SQL = f"""
WITH target(lang, target_share) AS (VALUES {_TARGET_VALUES}),
actual AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents)
           AS actual_share
  FROM documents GROUP BY lang
)
SELECT a.lang, a.n_docs,
       CAST(ROUND(a.actual_share, 6) AS DOUBLE) AS actual_share_r,
       CAST(t.target_share AS DOUBLE) AS target_share,
       CAST(ROUND(CAST(t.target_share AS DOUBLE) / a.actual_share, 6) AS DOUBLE)
         AS sample_weight_r
FROM actual a JOIN target t ON t.lang = a.lang
"""


@register("llm_domain_mix_weights", sql=_MIX_SQL)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain sampling weights to hit a target mixture: weight =
    target_share / actual_share (>1 ⇒ upsample). The weight table is
    tiny (one row per domain) and broadcast into the downstream sampler;
    computing it is one aggregate over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    target = spark.createDataFrame(
        list(_TARGET_SHARES.items()), ["lang", "target_share"]
    )
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    # corpus total = sum of the per-lang counts (every row is in exactly
    # one group), cross-joined back as a lazy broadcast scalar — no
    # blocking .count() job at plan time, one DAG, same exact integer
    tot = counts.agg(F.sum("n_docs").alias("_total"))
    actual = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.col("_total").cast("double")
        ).alias("actual_share"),
    )
    return actual.join(F.broadcast(target), "lang").select(
        "lang",
        "n_docs",
        F.round("actual_share", 6).alias("actual_share_r"),
        "target_share",
        F.round(F.col("target_share") / F.col("actual_share"), 6).alias(
            "sample_weight_r"
        ),
    )


# --- budgeted sequence packing ----------------------------------------------

_PACK_CAP = 512  # tokens per packed sequence (demo-sized)

_PACK_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents WHERE length(trim(text)) > 0
),
packed AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST((cum_tokens - n_tokens) // {_PACK_CAP} AS BIGINT) AS pack_id,
       CAST(cum_tokens - n_tokens
         - ((cum_tokens - n_tokens) // {_PACK_CAP}) * {_PACK_CAP} AS BIGINT)
         AS pack_offset
FROM packed
"""


@register("llm_pack_sequences", sql=_PACK_SQL)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted sequence packing: within each source (doc_id order), docs
    are laid into {cap}-token packs by cumulative offset — pack_id =
    floor(start_offset / cap). Deterministic and one-pass (a running-sum
    window per source); unlike greedy first-fit it is embarrassingly
    parallel and oracle-portable, at the cost of packs that may straddle
    a doc boundary (the downstream tokenizer truncates/continues — the
    standard concat-then-chunk pretraining layout)."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / _PACK_CAP).alias("pack_id"),
        (start - F.floor(start / _PACK_CAP) * _PACK_CAP).alias("pack_offset"),
    )


# --- end-to-end pipeline composition ----------------------------------------

_E2E_CAP = 256  # pack budget (tokens)
_E2E_TRAIN_PCT = 95

_E2E_SQL = rf"""
WITH base AS (
  SELECT doc_id, text, md5(text) AS content_hash,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents WHERE length(trim(text)) > 0
),
quality AS (
  SELECT * FROM base
  WHERE n_tokens >= 5 AND CAST(n_chars AS DOUBLE) / n_tokens <= 12.0
),
dedup AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY content_hash) AS keeper
    FROM quality
  ) WHERE doc_id = keeper
),
split AS (
  SELECT doc_id, n_tokens,
         CASE WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 100 < {_E2E_TRAIN_PCT}
              THEN 'train' ELSE 'val' END AS split
  FROM dedup
),
packed AS (
  SELECT doc_id, split, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM split
)
SELECT split,
       CAST(start // {_E2E_CAP} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY split, start // {_E2E_CAP}
"""


@register("llm_pipeline_end_to_end", sql=_E2E_SQL)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE composed DAG — quality
    filter (llm_quality_score gate) -> exact dedup (keeper = min doc_id
    per content hash) -> deterministic {train}%/. hash split -> budgeted
    {cap}-token packing — reported as per-pack manifests. This is the
    composition test: every stage is the same operator that passes the
    gate standalone, chained without materialization barriers, so
    Catalyst fuses the filter+hash projection into one scan, and the
    only shuffles are the dedup window (content_hash), the split-ordered
    packing window, and the final pack rollup. At 100 TB each stage
    stays narrow-column (hashes + counts; text read once, never
    shuffled)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.length("text").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    quality = base.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("n_chars").cast("double") / F.col("n_tokens") <= 12.0)
    )
    dedup = (
        quality.withColumn(
            "keeper", F.min("doc_id").over(Window.partitionBy("content_hash"))
        )
        .filter(F.col("doc_id") == F.col("keeper"))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = dedup.select(
        "doc_id",
        "n_tokens",
        F.when(bucket < _E2E_TRAIN_PCT, "train").otherwise("val").alias("split"),
    )
    w = (
        Window.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    packed = split.select("doc_id", "split", "n_tokens", start)
    return (
        packed.groupBy(
            "split",
            F.floor(F.col("start") / _E2E_CAP).cast("long").alias("pack_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


pipeline_end_to_end.__doc__ = (
    pipeline_end_to_end.__doc__
    .replace("{train}", str(_E2E_TRAIN_PCT))
    .replace("{cap}", str(_E2E_CAP))
)
