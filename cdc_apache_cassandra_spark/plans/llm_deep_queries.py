"""Second-wave text/JSON operators: BPE-ish regex tokenization, winnowing
rolling-hash fingerprints, and the JSON output mode (F13) — rounding out
the reference's converter surface and the training-pipeline text stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.operators.text_dedup import (
    tokens_expr,
    word_shingles,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.event_source import (
    events_cte,
    mutation_events,
)
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan

# --- BPE-ish regex tokenization --------------------------------------------

#: GPT-2-style pre-tokenizer simplified to an engine-portable alternation
#: (no lookarounds — identical in Java regex and RE2): words | numbers |
#: single punctuation.
_BPE_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RX}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{_BPE_RX}'))) AS n_unique_tokens
FROM documents
WHERE length(trim(text)) > 0
"""


@register("llm_token_count_bpe", sql=_BPE_SQL)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token counting with a BPE-style pre-tokenizer regex —
    the second counting mode next to whitespace (llm_token_count). Pure
    regexp_extract_all: JVM-side, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RX), 0)
    return (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.size(toks).alias("n_bpe_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        )
    )


# --- Winnowing rolling-hash fingerprints -----------------------------------

_KGRAM = 5  # char k-gram length
_WINDOW = 4  # winnowing window (k-grams per window)

_WINNOW_SQL = f"""
WITH norm AS (
  SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, length(t) - {_KGRAM} + 2),
             i -> ('0x' || substr(md5(substr(t, i, {_KGRAM})), 1, 8))::BIGINT)
         AS h
  FROM norm WHERE length(t) >= {_KGRAM + _WINDOW - 1}
),
winnowed AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - {_WINDOW} + 2),
             j -> list_min(list_slice(h, j, j + {_WINDOW} - 1)))) AS fps
  FROM grams
)
SELECT doc_id, len(fps) AS n_fingerprints,
       list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM winnowed
"""


@register("llm_fingerprint_winnow", sql=_WINNOW_SQL)
def fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): rolling char
    5-gram hashes, minimum per 4-gram window, distinct minima = the
    fingerprint set. Guarantees a shared fingerprint for any shared run
    of >= k+w-1 chars — the plagiarism/near-dup detector that works at
    substring (not whole-doc) granularity. Narrow per-row transform; the
    fingerprint summary here is linear, and an exploded (fp -> doc)
    posting table is one explode away."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    t = F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""))
    norm = d.select("doc_id", t.alias("t")).filter(
        F.length("t") >= _KGRAM + _WINDOW - 1
    )
    grams = norm.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.length("t") - _KGRAM + 1),
            lambda i: F.conv(
                F.substring(F.md5(F.col("t").substr(i, F.lit(_KGRAM))), 1, 8),
                16,
                10,
            ).cast("long"),
        ).alias("h"),
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("h") - _WINDOW + 1),
            lambda j: F.array_min(F.slice(F.col("h"), j, _WINDOW)),
        )
    )
    return grams.select(
        "doc_id",
        F.size(fps).alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )


# --- Gopher-style multi-rule quality gate -----------------------------------

_GOPHER_SQL = r"""
WITH feats AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS mean_word_len,
         CAST(length(text) - length(regexp_replace(text, '[#*]', '', 'g'))
              AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS symbol_ratio,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
              t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS stop_ratio
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id, n_words,
       CAST(ROUND(mean_word_len, 6) AS DOUBLE) AS mean_word_len_r,
       (n_words BETWEEN 5 AND 10000) AS rule_word_count,
       (mean_word_len >= 2 AND mean_word_len <= 12) AS rule_word_len,
       (symbol_ratio <= 0.1) AS rule_symbols,
       (stop_ratio >= 0.01) AS rule_stopwords,
       ((n_words BETWEEN 5 AND 10000)
        AND mean_word_len >= 2 AND mean_word_len <= 12
        AND symbol_ratio <= 0.1 AND stop_ratio >= 0.01) AS passes_all
FROM feats
"""


@register("llm_quality_gopher_rules", sql=_GOPHER_SQL)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/shape quality rules (word-count range,
    mean word length band, symbol-to-word ratio, stopword floor) with a
    combined gate — one narrow projection, every rule a reusable boolean
    column for downstream slicing."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    mean_wl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    symbol_ratio = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), "[#*]", ""))
    ).cast("double") / n_words
    stopwords = ["the", "a", "of", "and", "to", "in", "is"]
    stop_ratio = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t.isin(stopwords),
        )
    ).cast("double") / n_words
    r_wc = n_words.between(5, 10000)
    r_wl = (mean_wl >= 2) & (mean_wl <= 12)
    r_sym = symbol_ratio <= 0.1
    r_stop = stop_ratio >= 0.01
    return d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len_r"),
        r_wc.alias("rule_word_count"),
        r_wl.alias("rule_word_len"),
        r_sym.alias("rule_symbols"),
        r_stop.alias("rule_stopwords"),
        (r_wc & r_wl & r_sym & r_stop).alias("passes_all"),
    )


# --- benchmark decontamination ----------------------------------------------

#: "benchmark" = every 100th doc stands in for an eval set (scales with SF).
_CONTAM_BENCH_MOD = 100
_CONTAM_NGRAM = 4

_CONTAM_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(tokens)-{_CONTAM_NGRAM - 2}),
             i -> array_to_string(list_slice(tokens, i, i+{_CONTAM_NGRAM - 1}), ' '))))
           AS gram
  FROM toks WHERE len(tokens) >= {_CONTAM_NGRAM}
),
bench AS (SELECT DISTINCT gram FROM grams
          WHERE doc_id % {_CONTAM_BENCH_MOD} = 0),
hits AS (
  SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared_grams
  FROM grams g JOIN bench b ON b.gram = g.gram
  WHERE g.doc_id % {_CONTAM_BENCH_MOD} != 0
  GROUP BY g.doc_id
)
SELECT doc_id, n_shared_grams FROM hits
"""


@register("llm_decontamination", sql=_CONTAM_SQL)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 4-gram
    with the eval set (every 100th doc as the stand-in benchmark). The
    benchmark gram set is small -> broadcast join against the exploded
    training grams; at 100 TB this is the standard contaminated-document
    sweep (one pass, no n^2)."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    toks = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
        .filter(F.size("tokens") >= _CONTAM_NGRAM)
    )
    grams = toks.select(
        "doc_id",
        F.explode(word_shingles(F.col("tokens"), _CONTAM_NGRAM)).alias("gram"),
    )
    is_bench = F.col("doc_id") % _CONTAM_BENCH_MOD == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    return (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
    )


# --- F13: JSON output mode --------------------------------------------------

_JSON_SQL = f"""
WITH {events_cte()},
deduped AS (
  SELECT DISTINCT pk, op, writetime, digest, c_name, c_mktsegment
  FROM events_stream
)
SELECT pk, (op = 'DELETE') AS is_tombstone,
       CASE WHEN op = 'DELETE' THEN NULL
            ELSE to_json(struct_pack(
                pk := pk, op := op, writetime := writetime,
                c_name := c_name, c_mktsegment := c_mktsegment))
       END AS record_json
FROM deduped
"""


@register("cdc_records_json", sql=_JSON_SQL)
def cdc_records_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON output converter (F13, NativeJsonConverter.java:72-130): the
    data-topic record rendered as a JSON string; tombstones stay NULL
    (JSON-only mode). ignoreNullFields=false keeps explicit nulls like
    Jackson does; doubles excluded (engine float-formatting differs —
    the struct mode carries them)."""
    ev = dedup_mutations(mutation_events(spark, sf_dir)).select(
        "pk", "op", "writetime", "digest", "c_name", "c_mktsegment"
    )
    record = F.to_json(
        F.struct("pk", "op", "writetime", "c_name", "c_mktsegment"),
        {"ignoreNullFields": "false"},
    )
    return ev.select(
        "pk",
        (F.col("op") == "DELETE").alias("is_tombstone"),
        F.when(F.col("op") == "DELETE", F.lit(None).cast("string"))
        .otherwise(record)
        .alias("record_json"),
    )
