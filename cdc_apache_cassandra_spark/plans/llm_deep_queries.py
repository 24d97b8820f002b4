"""Second-wave text/JSON operators: BPE-ish regex tokenization, winnowing
rolling-hash fingerprints, and the JSON output mode (F13) — rounding out
the reference's converter surface and the training-pipeline text stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.event_source import (
    events_cte,
    mutation_events,
)
from cdc_apache_cassandra_spark.sources.registry import load_table

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
    d = load_table(spark, sf_dir, "documents")
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
