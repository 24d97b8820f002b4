r"""Text-corpus statistics for the training-data pipeline: TF-IDF term
weighting, Gopher-style token-repetition stats, deterministic stratified
sampling, and the full-recall variant of blocked n-gram Jaccard dedup
(adjacent length buckets — closes the recall gap of single-bucket
blocking on near-dups that straddle a bucket edge).

All hash-deterministic / rational-arithmetic (no log, no float sums), so
the DuckDB oracles agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.text_dedup import (
    tokens_expr,
    word_shingles,
)
from cdc_apache_cassandra_spark.operators.ranking import attach_global_order
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan
from cdc_apache_cassandra_spark.caching import persist_scoped

# --- TF-IDF top terms per document ------------------------------------------

_TFIDF_TOPK = 3

# rational idf (N/df as a double ratio) instead of log(N/df): same ranking
# (log is monotone), zero cross-engine log-ulp risk.
_TFIDF_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)
           AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, rk,
       CAST(ROUND(score, 6) AS DOUBLE) AS tfidf_r
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token) AS rk
  FROM scored
) WHERE rk <= {_TFIDF_TOPK}
"""


@register("llm_tfidf_top_terms", sql=_TFIDF_SQL)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document. idf kept rational (N/df) — log
    is monotone so the ranking is identical, and a ratio of exact counts
    is bit-reproducible where cross-engine log() is not. Plan: explode →
    two hash aggregates (doc,token) and (token) — the df table is tiny
    relative to the corpus (vocabulary-sized) and joins back on the
    high-cardinality token key; top-k is a bounded per-doc window."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    tf.transform(persist_scoped)  # feeds df-build AND the score join
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    # doc count as a LAZY broadcast scalar instead of a blocking
    # distinct().count() job (a full doc_id shuffle) at plan time —
    # one DAG, same exact integer promoted to double in the same place
    nd = tf.agg(F.countDistinct("doc_id").alias("_n_docs"))
    score = (
        F.col("tf").cast("double")
        * F.col("_n_docs")
        / F.col("df").cast("double")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "token", "tf", "df", score.alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TFIDF_TOPK)
        .select(
            "doc_id", "token", "tf", "df", "rk",
            F.round("score", 6).alias("tfidf_r"),
        )
    )


# --- Gopher-style repetition statistics -------------------------------------

_REP_TOP_FRAC = 0.2
_REP_DUP_FRAC = 0.3

_REPETITION_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
tc AS (
  SELECT doc_id, token, COUNT(*) AS cnt FROM toks GROUP BY doc_id, token
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY cnt DESC, token) AS rn
  FROM tc
),
agg AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct FROM tc
  GROUP BY doc_id
)
SELECT a.doc_id, a.n_tokens, a.n_distinct, r.token AS top_token,
       r.cnt AS top_cnt,
       CAST(ROUND(CAST(r.cnt AS DOUBLE) / a.n_tokens, 6) AS DOUBLE)
         AS top_frac_r,
       CAST(ROUND(CAST(a.n_tokens - a.n_distinct AS DOUBLE) / a.n_tokens, 6)
            AS DOUBLE) AS dup_frac_r,
       (CAST(r.cnt AS DOUBLE) / a.n_tokens > {_REP_TOP_FRAC}
        OR CAST(a.n_tokens - a.n_distinct AS DOUBLE) / a.n_tokens
           > {_REP_DUP_FRAC}) AS is_repetitive
FROM agg a JOIN ranked r ON r.doc_id = a.doc_id AND r.rn = 1
"""


@register("llm_repetition_gopher", sql=_REPETITION_SQL)
def repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition screen at token granularity: most-frequent-
    token mass fraction and duplicate-token fraction per document, with
    the filter verdict. One explode → (doc,token) count; both the per-doc
    totals and the arg-max reuse that single aggregate (persisted) — no
    second corpus scan. Per-doc state is bounded by vocabulary, so the
    plan is stable at any document count."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    tc = toks.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    tc.transform(persist_scoped)  # feeds totals AND top-token selection
    agg = tc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"), F.count("*").alias("n_distinct")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), "token")
    top = (
        tc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", F.col("token").alias("top_token"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    top_frac = F.col("top_cnt").cast("double") / F.col("n_tokens")
    dup_frac = (F.col("n_tokens") - F.col("n_distinct")).cast("double") / F.col(
        "n_tokens"
    )
    return agg.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_token",
        "top_cnt",
        F.round(top_frac, 6).alias("top_frac_r"),
        F.round(dup_frac, 6).alias("dup_frac_r"),
        ((top_frac > _REP_TOP_FRAC) | (dup_frac > _REP_DUP_FRAC)).alias(
            "is_repetitive"
        ),
    )


# --- deterministic stratified sampling --------------------------------------

#: per-language keep rates (percent) — downsample the dominant language,
#: keep the tail. Production passes its own dict (e.g. from
#: llm_domain_mix_weights).
_SAMPLE_RATES = {"en": 30, "de": 80, "zh": 80, "fr": 80, "es": 80}

_RATE_VALUES = ", ".join(f"('{k}', {v})" for k, v in _SAMPLE_RATES.items())

_STRAT_SQL = f"""
WITH rates(lang, rate) AS (VALUES {_RATE_VALUES}),
h AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 100 AS bucket
  FROM documents
)
SELECT h.doc_id, h.lang, h.source, h.bucket
FROM h JOIN rates ON rates.lang = h.lang
WHERE h.bucket < rates.rate
"""


@register("llm_stratified_sample", sql=_STRAT_SQL)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum downsampling by salted content hash: a doc's verdict
    never changes across reruns/retries (never rand()), rates come from a
    broadcast one-row-per-stratum table, and the filter is a narrow
    per-row transform — no shuffle at all, which is the whole point at
    100 TB (sampling must not cost a sort). Deliberately NOT spread_scan:
    the md5 filter is too narrow to pay for a round-robin exchange, and
    the zero-Exchange plan is this query's declared scale property
    (pinned by test_stratified_sample_no_shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        list(_SAMPLE_RATES.items()), ["lang", "rate"]
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 100
    )
    return (
        d.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "source", "bucket")
    )


# --- n-gram Jaccard, adjacent-bucket (full-recall) variant ------------------

_NGRAM_JACCARD_MIN = 0.3

_NGRAM_ADJ_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
sh AS (
  SELECT doc_id, lang, len(tokens) // 20 AS len_bucket,
         list_distinct(list_transform(range(1, len(tokens)),
             i -> array_to_string(list_slice(tokens, i, i+1), ' '))) AS grams
  FROM toks WHERE len(tokens) >= 2
),
g AS (
  SELECT doc_id, lang, len_bucket, len(grams) AS n, unnest(grams) AS gram
  FROM sh
),
df AS (SELECT lang, gram, COUNT(*) AS df FROM g GROUP BY 1, 2),
ranked AS (
  SELECT g.*, ROW_NUMBER() OVER (
      PARTITION BY g.doc_id ORDER BY df.df, g.gram) AS rk
  FROM g JOIN df ON df.lang = g.lang AND df.gram = g.gram
),
idx AS (
  SELECT * FROM ranked
  WHERE rk <= n - CEIL({_NGRAM_JACCARD_MIN} * n) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM idx a JOIN idx b
    ON a.lang = b.lang AND a.gram = b.gram AND a.doc_id < b.doc_id
   AND abs(a.len_bucket - b.len_bucket) <= 1
),
ver AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.grams, sb.grams)) AS n_inter,
         len(sa.grams) AS n_a, len(sb.grams) AS n_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS DOUBLE)
       AS jaccard_r
FROM ver
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= {_NGRAM_JACCARD_MIN}
"""


@register("llm_dedup_ngram_jaccard_adjacent", sql=_NGRAM_ADJ_SQL)
def dedup_ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-recall n-gram Jaccard via PREFIX FILTERING (AllPairs, Bayardo
    et al. 2007) — the r3-verdict fix for unbounded candidate mass: each
    doc indexes only its |A| - ceil(t*|A|) + 1 globally-RAREST grams
    (global order = (corpus df, gram)); any pair with Jaccard >= t shares
    >= t*max(|A|,|B|) grams, so their rare-prefixes MUST intersect —
    recall-lossless by construction (measured: identical pairs to the
    naive all-pairs formulation at sf0.1), unlike a hard df-threshold,
    which loses 80% of true pairs on this Zipf-heavy corpus. Candidates
    are then verified with the exact full-set intersection. The +/-1
    length-bucket adjacency stays exhaustive (J >= t bounds the length
    ratio).

    Scale: df build + per-doc rank are linear (one agg + one doc-key
    window); candidate join mass drops ~5x here (3.85M vs 19M rows at
    sf0.1) and shifts onto RARE grams — the Zipf-head grams whose df^2
    dominates at 100 TB are exactly the ones prefixes exclude. Verify
    cost ~ |candidates|, never N^2."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "lang", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= 2)
    )
    sh = toks.select(
        "doc_id",
        "lang",
        F.floor(F.size("tokens") / 20).alias("len_bucket"),
        word_shingles(F.col("tokens"), 2).alias("grams"),
    ).transform(persist_scoped)  # feeds the index build AND the verify join
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
    w_doc = Window.partitionBy("doc_id").orderBy("df", "gram")
    idx = (
        g.withColumn("df", df_w)
        .withColumn("rk", F.row_number().over(w_doc))
        .filter(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(_NGRAM_JACCARD_MIN) * F.col("n")) + 1
        )
        .select("doc_id", "lang", "len_bucket", "gram")
        .transform(persist_scoped)
    )
    a = idx.select(
        F.col("doc_id").alias("doc_a"), "lang", "gram",
        F.col("len_bucket").alias("bucket_a"),
    )
    b = idx.select(
        F.col("doc_id").alias("doc_b"), "lang", "gram",
        F.col("len_bucket").alias("bucket_b"),
    )
    cand = (
        a.join(b, ["lang", "gram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.abs(F.col("bucket_a") - F.col("bucket_b")) <= 1)
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    ver = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("grams_a", "grams_b")).alias("n_inter"),
            F.size("grams_a").alias("n_a"),
            F.size("grams_b").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        ver.filter(jac >= _NGRAM_JACCARD_MIN)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard_r"))
    )


# --- sliding-window document chunking ---------------------------------------

_CHUNK_SIZE = 16
_CHUNK_STRIDE = 8

_CHUNK_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
spans AS (
  SELECT doc_id, tokens,
         GREATEST(CAST(FLOOR((len(tokens) - {_CHUNK_SIZE + 1}) / {_CHUNK_STRIDE}.0)
                       AS BIGINT), -1) + 1 AS n_extra
  FROM toks
),
chunks AS (
  SELECT doc_id, c.chunk_id,
         list_slice(tokens, c.chunk_id * {_CHUNK_STRIDE} + 1,
                    c.chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}) AS chunk_tokens
  FROM spans, (SELECT unnest(range(0, 1000)) AS chunk_id) c
  WHERE c.chunk_id <= n_extra
)
SELECT doc_id, chunk_id, len(chunk_tokens) AS n_chunk_tokens,
       array_to_string(chunk_tokens, ' ') AS chunk_text
FROM chunks
"""


@register("llm_chunk_documents", sql=_CHUNK_SQL)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking ({size}-token windows, stride {stride}) —
    the context-window prep stage before embedding/tokenization. Chunk
    spans come from a JVM-side `sequence` + `slice` (whole-stage codegen,
    no Python in the hot path); output rows ≈ n_tokens/stride per doc.
    Narrow transform + explode: zero shuffles at any SF."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
    )
    # number of chunks beyond the first: floor((n - size - 1)/stride) + 1,
    # clamped at 0 (short docs still yield their single partial chunk)
    n_extra = (
        F.greatest(
            F.floor(
                (F.size("tokens") - F.lit(_CHUNK_SIZE + 1))
                / F.lit(float(_CHUNK_STRIDE))
            ).cast("bigint"),
            F.lit(-1).cast("bigint"),
        )
        + 1
    )
    spans = toks.select(
        "doc_id", "tokens", F.sequence(F.lit(0).cast("bigint"), n_extra).alias("ids")
    )
    chunk = F.slice(
        F.col("tokens"),
        (F.col("chunk_id") * _CHUNK_STRIDE + 1).cast("int"),
        _CHUNK_SIZE,
    )
    return (
        spans.select("doc_id", F.explode("ids").alias("chunk_id"), "tokens")
        .select(
            "doc_id",
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


# --- rare-token ratio quality signal ----------------------------------------

_RARE_DF_MAX = 5

_RARE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
),
per_doc AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN df.df <= {_RARE_DF_MAX} THEN tf.tf ELSE 0 END)
           AS BIGINT) AS n_rare
  FROM tf JOIN df USING (token)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, n_rare,
       CAST(ROUND(CAST(n_rare AS DOUBLE) / n_tokens, 6) AS DOUBLE)
         AS rare_frac_r
FROM per_doc
"""


@register("llm_rare_token_ratio", sql=_RARE_SQL)
def rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token mass fraction per document (df ≤ {k} corpus-wide) — a
    cheap perplexity proxy: gibberish/OCR noise scores high, boilerplate
    scores low. Same two hash aggregates as TF-IDF (the df side is
    vocabulary-sized), exact-count ratio — no log, no float sums."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    tf.transform(persist_scoped)  # feeds df-build AND the per-doc rollup
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    per_doc = (
        tf.join(df, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.when(F.col("df") <= _RARE_DF_MAX, F.col("tf")).otherwise(0)
            ).alias("n_rare"),
        )
    )
    frac = F.col("n_rare").cast("double") / F.col("n_tokens")
    return per_doc.select(
        "doc_id", "n_tokens", "n_rare", F.round(frac, 6).alias("rare_frac_r")
    )


# --- fixed-budget per-stratum sampling --------------------------------------

_FIXED_K = 40

_FIXED_K_SQL = f"""
SELECT doc_id, lang, rk FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5('pick:' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rk
  FROM documents
) WHERE rk <= {_FIXED_K}
"""


@register("llm_fixed_k_sample", sql=_FIXED_K_SQL)
def fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget sampling: exactly min(k, |stratum|) docs per language,
    chosen by salted-hash order — deterministic (reruns pick the same
    docs), uniform (hash order ≈ random order), and budget-exact where
    rate-based sampling (llm_stratified_sample) only hits the rate in
    expectation. One bounded rank window per stratum; at 100 TB with a
    huge stratum, pre-filter by a generous hash-rate cut before ranking
    so the sort touches ~k log k candidates, not the stratum."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("pick:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _FIXED_K)
    )


# --- per-language length distribution ---------------------------------------

_LEN_SQL = r"""
SELECT lang,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       CAST(ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS DOUBLE)
         AS median_chars,
       CAST(ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4) AS DOUBLE)
         AS p90_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
"""


@register("llm_length_distribution", sql=_LEN_SQL)
def length_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length profile (count, min/median/p90/max, total
    chars) — the corpus-composition report that drives mixing and
    truncation decisions. Exact integer extremes and sums, exact sorted
    percentiles; one combinable aggregate per language."""
    d = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.round(F.percentile(x, 0.5), 4).alias("median_chars"),
        F.round(F.percentile(x, 0.9), 4).alias("p90_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


# --- incremental dedup: new batch vs existing LSH index ---------------------

_INCR_SPLIT = 250  # doc_id < split = indexed corpus; >= split = incoming
_INCR_JACCARD_MIN = 0.5


def _incremental_sql() -> str:
    from cdc_apache_cassandra_spark.plans.fuzzy_dedup_queries import (
        _MINHASH_CTES,
    )

    # reuse the shared signature/band CTE chain; the symmetric cand /
    # verified tail CTEs it also defines go unused here
    return f"""
WITH {_MINHASH_CTES},
cand2 AS (
  SELECT DISTINCT x.doc_id AS matched_doc, i.doc_id AS new_doc
  FROM bands x JOIN bands i
    ON x.band_id = i.band_id AND x.band_key = i.band_key
   AND x.doc_id < {_INCR_SPLIT} AND i.doc_id >= {_INCR_SPLIT}
),
ver2 AS (
  SELECT c.new_doc, c.matched_doc,
         len(list_intersect(si.shingles, sx.shingles)) AS n_inter,
         len(si.shingles) AS n_i, len(sx.shingles) AS n_x
  FROM cand2 c
  JOIN sh si ON si.doc_id = c.new_doc
  JOIN sh sx ON sx.doc_id = c.matched_doc
)
SELECT new_doc, matched_doc,
       CAST(ROUND(CAST(n_inter AS DOUBLE) / (n_i + n_x - n_inter), 6) AS DOUBLE)
         AS jaccard_r
FROM ver2
WHERE CAST(n_inter AS DOUBLE) / (n_i + n_x - n_inter) >= {_INCR_JACCARD_MIN}
"""


@register("llm_dedup_incremental", sql=_incremental_sql())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: ONLY the incoming batch is banded and
    joined against the EXISTING corpus's LSH band index — the production
    shape (the index is a materialized table keyed by band_key; each new
    batch probes it; never corpus × corpus again), verified by exact
    Jaccard on the candidate pairs. The asymmetric band join's cost
    scales with |incoming| × collision rate; at 100 TB the stored index
    is bucketed by band_key so the probe is shuffle-free on the index
    side. Intra-batch duplicates are the symmetric query's job."""
    from cdc_apache_cassandra_spark.operators.text_dedup import (
        lsh_band_rows,
        minhash_signature_rows,
        tokens_expr,
        word_shingles,
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

    def bands_of(side):
        # flat-aggregate signature: value-identical to the array-form
        # minhash_signature without its nested-lambda codegen cost
        sig = minhash_signature_rows(side, "doc_id", "shingles", 12).select(
            "doc_id", F.col("minhash").alias("sig")
        )
        return lsh_band_rows(sig, "doc_id", "sig", 4, 3)

    idx_bands = bands_of(sh.filter(F.col("doc_id") < _INCR_SPLIT)).select(
        F.col("doc_id").alias("matched_doc"), "band_id", "band_key"
    )
    inc_bands = bands_of(sh.filter(F.col("doc_id") >= _INCR_SPLIT)).select(
        F.col("doc_id").alias("new_doc"), "band_id", "band_key"
    )
    cand = (
        inc_bands.join(idx_bands, ["band_id", "band_key"])
        .select("new_doc", "matched_doc")
        .distinct()
    )
    si = sh.select(F.col("doc_id").alias("new_doc"), F.col("shingles").alias("sh_i"))
    sx = sh.select(
        F.col("doc_id").alias("matched_doc"), F.col("shingles").alias("sh_x")
    )
    ver = (
        cand.join(si, "new_doc")
        .join(sx, "matched_doc")
        .select(
            "new_doc",
            "matched_doc",
            F.size(F.array_intersect("sh_i", "sh_x")).alias("n_inter"),
            F.size("sh_i").alias("n_i"),
            F.size("sh_x").alias("n_x"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_i") + F.col("n_x") - F.col("n_inter")
    )
    return (
        ver.filter(jac >= _INCR_JACCARD_MIN)
        .select("new_doc", "matched_doc", F.round(jac, 6).alias("jaccard_r"))
    )


# --- blocklist screening -----------------------------------------------------

#: category -> trigger words (demo blocklist over the synthetic vocab;
#: production swaps in its own list, same plan).
_BLOCKLIST = {
    "infra": ("spark", "table", "shuffle"),
    "ops": ("batch", "merge", "scan"),
}

_BLOCK_VALUES = ", ".join(
    f"('{w}', '{cat}')" for cat, ws in _BLOCKLIST.items() for w in ws
)

_BLOCKLIST_SQL = rf"""
WITH bl(word, category) AS (VALUES {_BLOCK_VALUES}),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
hits AS (
  SELECT t.doc_id, bl.category, COUNT(*) AS n_hits
  FROM toks t JOIN bl ON bl.word = t.token
  GROUP BY t.doc_id, bl.category
)
SELECT doc_id, category, n_hits, (n_hits >= 3) AS flagged
FROM hits
"""


@register("llm_blocklist_screen", sql=_BLOCKLIST_SQL)
def blocklist_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category blocklist screening: per-(doc, category) trigger-word hit
    counts with a flag threshold — the safety-filter stage shape. The
    blocklist is a broadcast table joined on the exploded token (never a
    per-row regex alternation over thousands of patterns — the join scales
    with list size, the regex does not)."""
    d = load_table(spark, sf_dir, "documents")
    bl = spark.createDataFrame(
        [(w, cat) for cat, ws in _BLOCKLIST.items() for w in ws],
        ["word", "category"],
    )
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    hits = (
        toks.join(F.broadcast(bl), toks["token"] == bl["word"])
        .groupBy("doc_id", "category")
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.select(
        "doc_id", "category", "n_hits", (F.col("n_hits") >= 3).alias("flagged")
    )


# --- language-ID evaluation: confusion counts + precision/recall ------------

_EVAL_SQL = r"""
WITH feats AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is'))) AS en_hits
  FROM documents WHERE length(trim(text)) > 0
),
pred AS (
  SELECT doc_id, (lang = 'en') AS is_en,
         (CAST(en_hits AS DOUBLE) / n_tokens >= 0.1) AS pred_en
  FROM feats
),
cm AS (
  SELECT CAST(SUM(CASE WHEN is_en AND pred_en THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN NOT is_en AND pred_en THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN is_en AND NOT pred_en THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN NOT is_en AND NOT pred_en THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM pred
)
SELECT tp, fp, fn, tn,
       CAST(ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS DOUBLE) AS precision_r,
       CAST(ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS DOUBLE) AS recall_r,
       CAST(ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS DOUBLE)
         AS f1_r
FROM cm
"""


@register("llm_langid_eval", sql=_EVAL_SQL)
def langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation for the stopword language-ID heuristic:
    confusion counts against the gold lang label, plus precision / recall
    / F1 as exact-count rationals (F1 in its 2TP/(2TP+FP+FN) closed form
    — one division, no float chaining). The whole evaluation is one
    conditional aggregate over the per-doc predictions; this is the
    filter-quality report a pipeline publishes next to every heuristic
    gate."""
    d = load_table(spark, sf_dir, "documents")
    stop = ["the", "a", "of", "and", "to", "in", "is"]
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    en_hits = F.size(F.filter(toks, lambda t: t.isin(stop)))
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    pred = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            (F.col("lang") == "en").alias("is_en"),
            (en_hits.cast("double") / n_tokens >= 0.1).alias("pred_en"),
        )
    )
    cm = pred.agg(
        F.sum(F.when(F.col("is_en") & F.col("pred_en"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_en") & F.col("pred_en"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_en") & ~F.col("pred_en"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("is_en") & ~F.col("pred_en"), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cm.select(
        "tp", "fp", "fn", "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision_r"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall_r"),
        F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 6).alias("f1_r"),
    )


# --- vocabulary growth curve (Heaps' law) -----------------------------------

_VOCAB_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
),
first_occ AS (
  SELECT token, MIN(doc_id) AS first_doc FROM tf GROUP BY token
),
new_per_doc AS (
  SELECT first_doc AS doc_id, COUNT(*) AS new_tokens
  FROM first_occ GROUP BY first_doc
),
per_doc AS (
  SELECT t.doc_id, SUM(t.tf) AS n_tokens,
         COALESCE(MAX(n.new_tokens), 0) AS new_tokens
  FROM tf t LEFT JOIN new_per_doc n ON n.doc_id = t.doc_id
  GROUP BY t.doc_id
)
SELECT doc_id,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens,
       CAST(SUM(new_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM per_doc
"""


@register("llm_vocab_growth", sql=_VOCAB_SQL)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law observable): cumulative token
    count vs cumulative DISTINCT vocabulary in doc_id ingestion order.
    The trick that distributes: a token contributes to the vocabulary at
    its MIN(doc_id) first occurrence — one aggregate — so the curve is
    two INTEGER running sums over the doc-grain relation, never a
    cumulative set union. The curve's flattening is the diminishing-
    returns signal corpus collectors act on. The running sums use the
    two-pass range-partitioned operator (operators/ranking.py) — integer
    addition is order-free, so partition-local sums + broadcast offsets
    are bit-identical to the single-partition window at any scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    tf.transform(persist_scoped)  # feeds first-occurrence AND per-doc totals
    first_occ = tf.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = first_occ.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count("*").alias("new_tokens"))
    per_doc = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"))
        .join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("new_tokens"), F.lit(0)).alias("new_tokens"),
        )
    )
    cum = attach_global_order(
        per_doc,
        [F.col("doc_id").asc()],
        rank_col="_rn",
        running_sums={"cum_tokens": "n_tokens", "cum_vocab": "new_tokens"},
    )
    return cum.select("doc_id", "cum_tokens", "cum_vocab")


# --- Zipf rank-frequency profile --------------------------------------------

_ZIPF_TOPK = 50

_ZIPF_SQL = rf"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
freq AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token)
SELECT token, n, rk, rk * n AS rank_freq_product
FROM (
  SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk
  FROM freq
) WHERE rk <= {_ZIPF_TOPK}
"""


@register("llm_zipf_profile", sql=_ZIPF_SQL)
def zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile: top-{k} tokens with rank·frequency —
    near-constant under Zipf's law, so drift in this product is the
    cheapest corpus-composition change detector (a crawl gone wrong bends
    the head of the curve first). One corpus-sized hash aggregate; the
    rank window runs on the vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token")
        )
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), "token")
    return (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ZIPF_TOPK)
        .select(
            "token", "n", "rk", (F.col("rk") * F.col("n")).alias("rank_freq_product")
        )
    )
