"""Substring-level dedup + corpus-LM text analysis over ``documents``.

Third-wave LLM-pipeline operators (SURVEY §7.2 step 9; BASELINE.json
north star), complementing the doc-level dedup family in
plans/fuzzy_dedup_queries.py:

- ``llm_substring_span_dedup`` — EXACT-SUBSTRING dedup in the shape of
  Lee et al., "Deduplicating Training Data Makes Language Models Better"
  (ACL 2022): find maximal duplicated token spans (>= K contiguous
  tokens occurring more than once in the corpus) per document, via
  shingle-hash inverted index + gaps-and-islands merge — no suffix
  array needed for the span *report* (the suffix array buys exact
  character offsets; shingle islands give the same span coverage at a
  fixed K with two shuffles).
- ``llm_boilerplate_coverage`` — C4-style boilerplate screen: the
  corpus-wide most-frequent 3-grams form the boilerplate set; documents
  dominated by them are flagged (C4 dropped boilerplate lines; over
  single-line synthetic docs the unit is the n-gram).
- ``llm_unigram_surprisal`` — CCNet-style language-model quality
  ranking (Wenzek et al. 2020): per-token surprisal from a corpus
  unigram LM. Uses an EXACT integer log2 (``length(bin(count))``) so
  both engines agree bit-for-bit — cross-engine ``ln()`` ULP drift is
  the documented hazard this codebase avoids (see llm_tfidf_top_terms).

Scale design (100 TB): every stage is explode -> hash -> shuffle on a
maximal-cardinality key (gram md5 / token), then integer window/group
math. Shingle text never shuffles (md5 first); the only broadcast is
the vocabulary / top-K boilerplate set (bounded: vocab or K rows).
Determinism: all-integer aggregation, one double division per output
row at the end (registry rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.ranking import attach_global_order
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan

_K = 8  # duplicated-span shingle width (tokens)

_SPAN_SQL = rf"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents
  WHERE length(trim(text)) > 0
    AND len(string_split_regex(trim(text), '\s+')) >= {_K}
),
sh AS (
  SELECT doc_id, len(tokens) AS n_tokens, p.p AS pos,
         md5(array_to_string(list_slice(tokens, p.p + 1, p.p + {_K}), ' '))
           AS gram
  FROM docs, (SELECT unnest(range(0, (SELECT MAX(len(tokens)) FROM docs))) AS p) p
  WHERE p.p <= len(tokens) - {_K}
),
dup AS (
  SELECT * FROM (
    SELECT sh.*, COUNT(*) OVER (PARTITION BY gram) AS gram_count FROM sh
  ) WHERE gram_count > 1
),
marked AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos - lag(pos) OVER w > {_K} THEN 1 ELSE 0 END AS brk
  FROM dup
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
islands AS (
  SELECT doc_id, n_tokens, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, n_tokens, span_id,
         MIN(pos) AS s, MAX(pos) + {_K} - 1 AS e
  FROM islands GROUP BY 1, 2, 3
)
SELECT doc_id,
       n_tokens,
       COUNT(*) AS n_spans,
       CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
       CAST(CAST(SUM(e - s + 1) AS BIGINT) AS DOUBLE) / n_tokens AS dup_ratio
FROM spans
GROUP BY doc_id, n_tokens
"""


@register("llm_substring_span_dedup", sql=_SPAN_SQL)
def substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-token-span report per document (ExactSubstr
    shape, K={K} tokens).

    Plan: tokenize -> shingle positions -> md5(gram) [text never
    shuffles] -> corpus gram counts (shuffle 1: by gram) -> keep
    duplicated positions -> per-doc gaps-and-islands merge (shuffle 2:
    by doc_id) -> span stats. Output: docs carrying at least one
    duplicated span, with span count, covered tokens, coverage ratio.
    All counts integer; the single double division is the last step.
    """
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    docs = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", toks.alias("tokens"))
        .filter(F.size("tokens") >= _K)
    )
    sh = docs.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tokens) - {_K}),"
                f" p -> md5(array_join(slice(tokens, p + 1, {_K}), ' ')))"
            )
        ).alias("pos", "gram"),
    )
    dup = (
        sh.withColumn(
            "gram_count", F.count("*").over(Window.partitionBy("gram"))
        )
        .filter(F.col("gram_count") > 1)
        .drop("gram", "gram_count")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    marked = dup.withColumn(
        "brk",
        F.when(
            F.lag("pos").over(w_doc).isNull()
            | (F.col("pos") - F.lag("pos").over(w_doc) > _K),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("span_id", F.sum("brk").over(w_doc))
    spans = islands.groupBy("doc_id", "n_tokens", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + _K - 1).alias("e")
    )
    span_len = F.col("e") - F.col("s") + 1
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(span_len).alias("dup_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_spans",
            "dup_tokens",
            (
                F.col("dup_tokens").cast("double") / F.col("n_tokens")
            ).alias("dup_ratio"),
        )
    )


substring_span_dedup.__doc__ = substring_span_dedup.__doc__.replace(
    "{K}", str(_K)
)

_NB = 3  # boilerplate gram width
_TOPK = 50  # boilerplate set size

_BOILER_SQL = rf"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents
  WHERE length(trim(text)) > 0
    AND len(string_split_regex(trim(text), '\s+')) >= {_NB}
),
sh AS (
  SELECT doc_id, len(tokens) - {_NB} + 1 AS n_grams,
         md5(array_to_string(list_slice(tokens, p.p + 1, p.p + {_NB}), ' '))
           AS gram
  FROM docs, (SELECT unnest(range(0, (SELECT MAX(len(tokens)) FROM docs))) AS p) p
  WHERE p.p <= len(tokens) - {_NB}
),
df AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS doc_freq FROM sh GROUP BY gram
),
boiler AS (
  SELECT gram FROM (
    SELECT gram,
           ROW_NUMBER() OVER (ORDER BY doc_freq DESC, gram) AS rk
    FROM df
  ) WHERE rk <= {_TOPK}
)
SELECT s.doc_id,
       CAST(MIN(s.n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS boiler_hits,
       CAST(CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS DOUBLE) / MIN(s.n_grams) AS boiler_ratio,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         * 2 < MIN(s.n_grams) AS keep
FROM sh s LEFT JOIN boiler b USING (gram)
GROUP BY s.doc_id
"""


@register("llm_boilerplate_coverage", sql=_BOILER_SQL)
def boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate screen: fraction of each document's 3-gram
    positions covered by the corpus's top-{TOPK} most-document-frequent
    3-grams; keep = covered < 50% (integer comparison ``2*hits <
    n_grams`` — no float threshold).

    Scale shape: gram doc-frequency is one shuffle on md5(gram); the
    top-K set is {TOPK} rows -> broadcast hash join back onto the gram
    stream (Catalyst broadcasts the aggregated side automatically; the
    rank window runs over the ALREADY-AGGREGATED gram table, and at
    100 TB becomes a TopK partial per partition + tiny final sort, not
    a full-corpus sort).
    """
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    docs = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", toks.alias("tokens"))
        .filter(F.size("tokens") >= _NB)
    )
    sh = docs.select(
        "doc_id",
        (F.size("tokens") - _NB + 1).alias("n_grams"),
        F.explode(
            F.expr(
                f"transform(sequence(0, size(tokens) - {_NB}),"
                f" p -> md5(array_join(slice(tokens, p + 1, {_NB}), ' ')))"
            )
        ).alias("gram"),
    )
    df_tbl = sh.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    boiler = (
        df_tbl.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("doc_freq"), F.asc("gram"))
            ),
        )
        .filter(F.col("rk") <= _TOPK)
        .select("gram", F.lit(1).alias("is_boiler"))
    )
    joined = sh.join(F.broadcast(boiler), "gram", "left")
    hits = F.sum(
        F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0)
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.min("n_grams").cast("long").alias("n_grams"),
            hits.alias("boiler_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "boiler_hits",
            (
                F.col("boiler_hits").cast("double") / F.col("n_grams")
            ).alias("boiler_ratio"),
            (F.col("boiler_hits") * 2 < F.col("n_grams")).alias("keep"),
        )
    )


boilerplate_coverage.__doc__ = boilerplate_coverage.__doc__.replace(
    "{TOPK}", str(_TOPK)
)

_SURPRISAL_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
bits AS (
  SELECT v.w,
         length(bin(t.n)) - length(bin(v.c)) AS surprisal_bits
  FROM vocab v, total t
)
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(b.surprisal_bits) AS BIGINT) AS total_bits,
       CAST(CAST(SUM(b.surprisal_bits) AS BIGINT) AS DOUBLE) / COUNT(*)
         AS mean_bits
FROM tok JOIN bits b ON tok.w = b.w
GROUP BY tok.doc_id
"""


@register("llm_unigram_surprisal", sql=_SURPRISAL_SQL)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM document scoring (the CCNet quality-ranking
    shape): per-token surprisal ~= log2(N / count(w)), computed as the
    EXACT integer ``length(bin(N)) - length(bin(c))`` so both engines
    agree bit-for-bit (floor-log2 via binary-string length; no
    cross-engine ln() ULP risk). Per-doc mean surprisal ranks documents
    like CCNet's LM perplexity buckets: low = head (common words),
    high = tail.

    Scale shape: vocabulary aggregation is one shuffle on the token;
    the vocab+bits table is vocabulary-sized -> broadcast join back
    onto the token stream; per-doc rollup shuffles on doc_id. Integer
    sums; single double division per row.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.explode(toks).alias("w"))
    )
    vocab = tok.groupBy("w").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    bits = (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "w",
            (
                F.length(F.bin(F.col("n"))) - F.length(F.bin(F.col("c")))
            ).alias("surprisal_bits"),
        )
    )
    return (
        tok.join(F.broadcast(bits), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("surprisal_bits").alias("total_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "total_bits",
            (
                F.col("total_bits").cast("double") / F.col("n_tokens")
            ).alias("mean_bits"),
        )
    )


_DSIR_TARGET_LANG = "en"
_DSIR_KEEP_PCT = 20  # select top 20% by importance

_DSIR_SQL = rf"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
corpus AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cc FROM tok GROUP BY w
),
target AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
  WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY w
),
norms AS (
  SELECT (SELECT CAST(SUM(cc) AS BIGINT) FROM corpus) AS nc,
         (SELECT CAST(COALESCE(SUM(ct), 0) + 1 AS BIGINT) FROM target) AS nt
),
bits AS (
  SELECT c.w,
         (length(bin(COALESCE(t.ct, 0) + 1)) - length(bin(c.cc + 1))) AS dw
  FROM corpus c LEFT JOIN target t USING (w)
),
scored AS (
  SELECT tok.doc_id, MIN(tok.lang) AS lang,
         COUNT(*) AS n_tokens,
         CAST(SUM(b.dw) AS BIGINT)
           + COUNT(*) * (length(bin(MIN(n.nc))) - length(bin(MIN(n.nt))))
           AS logratio_bits
  FROM tok JOIN bits b ON tok.w = b.w CROSS JOIN norms n
  GROUP BY tok.doc_id
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY logratio_bits DESC, doc_id) AS rk,
         COUNT(*) OVER () AS n_docs
  FROM scored
)
SELECT doc_id, lang, n_tokens, logratio_bits,
       CAST(logratio_bits AS DOUBLE) / n_tokens AS mean_bits_per_token,
       rk <= n_docs * {_DSIR_KEEP_PCT} // 100 AS selected
FROM ranked
"""


@register("llm_dsir_importance_sample", sql=_DSIR_SQL)
def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the unigram log-likelihood ratio between a TARGET distribution (the
    '{lang}' slice stands in for the high-quality target corpus) and the
    raw-corpus distribution, then keep the top {pct}%.

    log p_t(w) - log p_c(w) is computed in EXACT integer log2 via
    binary-string length with add-one smoothing (unseen-in-target words
    get bitlen(1)=1), so both engines agree bit-for-bit — same device as
    llm_unigram_surprisal. Deterministic resample: rank by (score desc,
    doc_id), keep floor(N * {pct}%) docs — hash-free and reproducible.

    Scale shape: two vocab aggregations (shuffle on token), vocab-sized
    broadcast of the bits table onto the token stream, per-doc rollup on
    doc_id; the selection rank runs over the doc-level aggregate (TopK
    partial + tiny final sort at 100 TB, not a corpus sort).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "lang", F.explode(toks).alias("w"))
    )
    corpus = tok.groupBy("w").agg(F.count("*").alias("cc"))
    target = (
        tok.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("w")
        .agg(F.count("*").alias("ct"))
    )
    norms = corpus.agg(F.sum("cc").alias("nc")).crossJoin(
        target.agg((F.coalesce(F.sum("ct"), F.lit(0)) + 1).alias("nt"))
    )
    bits = (
        corpus.join(target, "w", "left")
        .select(
            "w",
            (
                F.length(F.bin(F.coalesce(F.col("ct"), F.lit(0)) + 1))
                - F.length(F.bin(F.col("cc") + 1))
            ).alias("dw"),
        )
    )
    const_bits = F.length(F.bin(F.col("nc"))) - F.length(F.bin(F.col("nt")))
    scored = (
        tok.join(F.broadcast(bits), "w")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            F.sum("dw").alias("sum_dw"),
        )
        .crossJoin(F.broadcast(norms))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("sum_dw") + F.col("n_tokens") * const_bits).alias(
                "logratio_bits"
            ),
        )
    )
    # doc cardinality grows with the corpus: two-pass range-partitioned
    # global rank (operators/ranking.py), not a single-partition sort.
    # persist_input measured SLOWER here (1.21s vs 0.87s at sf0.1): the
    # boundary-sampling pass reuses the scorer's shuffle outputs, so
    # only the post-exchange tail recomputes — cheaper than caching
    ranked = attach_global_order(
        scored,
        [F.desc("logratio_bits"), F.asc("doc_id")],
        rank_col="rk",
        total_col="n_docs",
    )
    return ranked.select(
        "doc_id",
        "lang",
        "n_tokens",
        "logratio_bits",
        (
            F.col("logratio_bits").cast("double") / F.col("n_tokens")
        ).alias("mean_bits_per_token"),
        (
            F.col("rk") <= F.floor(F.col("n_docs") * _DSIR_KEEP_PCT / 100)
        ).alias("selected"),
    )


dsir_importance_sample.__doc__ = (
    dsir_importance_sample.__doc__
    .replace("{lang}", _DSIR_TARGET_LANG)
    .replace("{pct}", str(_DSIR_KEEP_PCT))
)


_DC_K = 4  # decontamination gram width
_DC_MOD = 100  # every MOD-th doc is the stand-in benchmark set

_DC_SPAN_SQL = rf"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents
  WHERE length(trim(text)) > 0
    AND len(string_split_regex(trim(text), '\s+')) >= {_DC_K}
),
sh AS (
  SELECT doc_id, len(tokens) AS n_tokens, p.p AS pos,
         md5(array_to_string(list_slice(tokens, p.p + 1, p.p + {_DC_K}), ' '))
           AS gram
  FROM docs, (SELECT unnest(range(0, (SELECT MAX(len(tokens)) FROM docs))) AS p) p
  WHERE p.p <= len(tokens) - {_DC_K}
),
bench AS (
  SELECT DISTINCT gram FROM sh WHERE doc_id % {_DC_MOD} = 0
),
hit AS (
  SELECT s.doc_id, s.n_tokens, s.pos
  FROM sh s JOIN bench b USING (gram)
  WHERE s.doc_id % {_DC_MOD} <> 0
),
marked AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos - lag(pos) OVER w > {_DC_K} THEN 1 ELSE 0 END AS brk
  FROM hit
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
islands AS (
  SELECT doc_id, n_tokens, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, n_tokens, span_id,
         MIN(pos) AS s, MAX(pos) + {_DC_K} - 1 AS e
  FROM islands GROUP BY 1, 2, 3
)
SELECT doc_id, n_tokens,
       COUNT(*) AS n_spans,
       CAST(SUM(e - s + 1) AS BIGINT) AS contam_tokens,
       CAST(CAST(SUM(e - s + 1) AS BIGINT) AS DOUBLE) / n_tokens
         AS contam_ratio
FROM spans
GROUP BY doc_id, n_tokens
"""


@register("llm_decontamination_spans", sql=_DC_SPAN_SQL)
def decontamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level benchmark decontamination: where llm_decontamination
    flags whole documents sharing any {K}-gram with the eval set, this
    reports the contaminated token SPANS (contiguous runs of shared
    {K}-grams, merged gaps-and-islands) so a pipeline can excise the
    overlap instead of dropping the document — the span-surgery variant
    used when contamination is incidental (quoted benchmark questions
    inside otherwise-good pages).

    Scale shape: the benchmark gram set is eval-corpus-sized ->
    broadcast onto the positional gram stream (one explode, text never
    shuffles past md5); islands merge is one doc-keyed window. Same
    machinery as llm_substring_span_dedup, different reference set.
    """
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    docs = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", toks.alias("tokens"))
        .filter(F.size("tokens") >= _DC_K)
    )
    sh = docs.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tokens) - {_DC_K}),"
                f" p -> md5(array_join(slice(tokens, p + 1, {_DC_K}), ' ')))"
            )
        ).alias("pos", "gram"),
    )
    bench = (
        sh.filter(F.col("doc_id") % _DC_MOD == 0).select("gram").distinct()
    )
    hit = (
        sh.filter(F.col("doc_id") % _DC_MOD != 0)
        .join(F.broadcast(bench), "gram")
        .select("doc_id", "n_tokens", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    marked = hit.withColumn(
        "brk",
        F.when(
            F.lag("pos").over(w_doc).isNull()
            | (F.col("pos") - F.lag("pos").over(w_doc) > _DC_K),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("span_id", F.sum("brk").over(w_doc))
    spans = islands.groupBy("doc_id", "n_tokens", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + _DC_K - 1).alias("e")
    )
    span_len = F.col("e") - F.col("s") + 1
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(span_len).alias("contam_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_spans",
            "contam_tokens",
            (
                F.col("contam_tokens").cast("double") / F.col("n_tokens")
            ).alias("contam_ratio"),
        )
    )


decontamination_spans.__doc__ = decontamination_spans.__doc__.replace(
    "{K}", str(_DC_K)
)
