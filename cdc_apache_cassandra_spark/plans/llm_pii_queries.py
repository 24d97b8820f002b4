"""PII detection / redaction and URL-domain filtering — the privacy and
provenance screens every large-scale training-data pipeline runs before
anything else touches the corpus (C4 kept a line-level blocklist filter;
CCNet/Gopher-style pipelines strip emails/phones/IPs before dedup so
redaction doesn't split exact-dup clusters).

Determinism strategy: the test corpus has no natural PII, so these
queries PLANT it deterministically from the ``customer`` table (a
TPC-H-style ``NN-NNN-NNN-NNNN`` phone, an email, and an IPv4 are all
derived from ``c_custkey`` arithmetic) and mix in raw ``documents``
text as the negative class. Both engines build the same
corpus in SQL, so hit counts AND redacted-text hashes must match
bit-for-bit.

Regex subset: character classes, bounded quantifiers and ``\\b`` only —
semantics identical between Java regex (Spark) and RE2 (DuckDB); no
lookaround (RE2 has none). Patterns are passed via the Python column API
(``F.lit``/``F.regexp_replace``), never through SQL string literals, so
Spark's SQL-level backslash escaping can't bite.

Scale shape: detection/redaction are pure per-row projections inside
whole-stage codegen (no Python, no shuffle until the final small
aggregation); the domain filter is a broadcast semi-join against a
nation-sized blocklist — at 100 TB each stays a single map-side pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b\d{2}-\d{3}-\d{3}-\d{4}\b"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# DuckDB-side copies (standard SQL strings keep backslashes literal)
_SQL_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_SQL_PHONE = "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b"
_SQL_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-PII rows from customer + clean rows from documents.

    planted: 'Contact <name> at <email> or call <phone> from <ip>.'
    Exactly one email, one phone, one IPv4 per planted row; clean rows
    are the word-salad documents (no digits/@ => zero hits expected).
    """
    c = load_table(spark, sf_dir, "customer")
    planted = c.select(
        F.col("c_custkey").alias("pii_id"),
        F.lit("planted").alias("part"),
        (F.col("c_nationkey") % 5).cast("long").alias("seg"),
        F.concat(
            F.lit("Contact "),
            F.col("c_name"),
            F.lit(" at customer."),
            F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
            F.lit("@example.com or call "),
            (F.col("c_custkey") % 90 + 10).cast("string"),
            F.lit("-"),
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.col("c_custkey") * 3) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
            F.lit(" from "),
            (F.col("c_custkey") % 223 + 1).cast("string"),
            F.lit("."),
            (F.col("c_custkey") % 251).cast("string"),
            F.lit("."),
            ((F.col("c_custkey") * 7) % 249).cast("string"),
            F.lit("."),
            (F.col("c_custkey") % 100 + 1).cast("string"),
            F.lit("."),
        ).alias("text"),
    )
    d = load_table(spark, sf_dir, "documents")
    clean = d.select(
        (F.col("doc_id") + 10_000_000).alias("pii_id"),
        F.lit("clean").alias("part"),
        (F.col("doc_id") % 5).cast("long").alias("seg"),
        F.col("text"),
    )
    return planted.unionByName(clean)


_PII_CORPUS_SQL = f"""
  SELECT c_custkey AS pii_id, 'planted' AS part,
         CAST(c_nationkey % 5 AS BIGINT) AS seg,
         'Contact ' || c_name || ' at customer.' ||
         lpad(CAST(c_custkey AS VARCHAR), 9, '0') ||
         '@example.com or call ' ||
         CAST(c_custkey % 90 + 10 AS VARCHAR) || '-' ||
         lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST((c_custkey * 3) % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') || ' from ' ||
         CAST(c_custkey % 223 + 1 AS VARCHAR) || '.' ||
         CAST(c_custkey % 251 AS VARCHAR) || '.' ||
         CAST((c_custkey * 7) % 249 AS VARCHAR) || '.' ||
         CAST(c_custkey % 100 + 1 AS VARCHAR) || '.' AS text
  FROM customer
  UNION ALL
  SELECT doc_id + 10000000 AS pii_id, 'clean' AS part,
         CAST(doc_id % 5 AS BIGINT) AS seg, text
  FROM documents
"""

_PII_DETECT_SQL = f"""
WITH corpus AS ({_PII_CORPUS_SQL})
SELECT part, seg,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_SQL_EMAIL}'))) AS BIGINT)
           AS n_emails,
       CAST(SUM(len(regexp_extract_all(text, '{_SQL_PHONE}'))) AS BIGINT)
           AS n_phones,
       CAST(SUM(len(regexp_extract_all(text, '{_SQL_IPV4}'))) AS BIGINT)
           AS n_ips,
       CAST(SUM(CASE WHEN regexp_matches(text, '{_SQL_EMAIL}')
                       OR regexp_matches(text, '{_SQL_PHONE}')
                       OR regexp_matches(text, '{_SQL_IPV4}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM corpus
GROUP BY part, seg
"""


@register("llm_pii_detect", sql=_PII_DETECT_SQL)
def pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(part, segment) PII hit counts: emails, phones, IPv4s, and
    docs flagged by any pattern. Planted rows must contribute exactly
    one of each; clean rows exactly zero — the aggregate IS the
    calibration audit. Single map-side regex pass + one small shuffle."""
    corpus = _pii_corpus(spark, sf_dir)
    n_hits = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
    ).cast("long")
    flagged = (
        F.col("text").rlike(EMAIL_PAT)
        | F.col("text").rlike(PHONE_PAT)
        | F.col("text").rlike(IPV4_PAT)
    )
    return (
        corpus.select(
            "part",
            "seg",
            n_hits(EMAIL_PAT).alias("e"),
            n_hits(PHONE_PAT).alias("p"),
            n_hits(IPV4_PAT).alias("i"),
            flagged.cast("int").alias("fl"),
        )
        .groupBy("part", "seg")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("e").cast("bigint").alias("n_emails"),
            F.sum("p").cast("bigint").alias("n_phones"),
            F.sum("i").cast("bigint").alias("n_ips"),
            F.sum("fl").cast("bigint").alias("n_flagged"),
        )
    )


_PII_REDACT_SQL = f"""
WITH corpus AS ({_PII_CORPUS_SQL}),
red AS (
  SELECT pii_id, part,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{_SQL_EMAIL}', '[EMAIL]', 'g'),
             '{_SQL_PHONE}', '[PHONE]', 'g'),
           '{_SQL_IPV4}', '[IP]', 'g') AS redacted,
         length(text) AS n_before
  FROM corpus
  WHERE part = 'planted'
)
SELECT pii_id,
       md5(redacted) AS redacted_hash,
       CAST(n_before - length(redacted) AS BIGINT) AS chars_removed,
       NOT (regexp_matches(redacted, '{_SQL_EMAIL}')
            OR regexp_matches(redacted, '{_SQL_PHONE}')
            OR regexp_matches(redacted, '{_SQL_IPV4}')) AS fully_clean
FROM red
"""


@register("llm_pii_redact", sql=_PII_REDACT_SQL)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact all three PII classes with typed markers and prove the
    result byte-identical across engines via md5 of the redacted text.
    ``fully_clean`` asserts redaction is a fixed point (markers don't
    re-match). Pure projection — no shuffle at all."""
    corpus = _pii_corpus(spark, sf_dir).filter(F.col("part") == "planted")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_PAT, "[EMAIL]"),
            PHONE_PAT,
            "[PHONE]",
        ),
        IPV4_PAT,
        "[IP]",
    )
    out = corpus.select(
        "pii_id",
        redacted.alias("redacted"),
        F.length("text").alias("n_before"),
    )
    return out.select(
        "pii_id",
        F.md5("redacted").alias("redacted_hash"),
        (F.col("n_before") - F.length("redacted"))
        .cast("bigint")
        .alias("chars_removed"),
        (
            ~(
                F.col("redacted").rlike(EMAIL_PAT)
                | F.col("redacted").rlike(PHONE_PAT)
                | F.col("redacted").rlike(IPV4_PAT)
            )
        ).alias("fully_clean"),
    )


# --- URL/domain blocklist filter -------------------------------------------

_URL_CORPUS_SQL = """
  SELECT s_suppkey AS url_id,
         'https://www.' ||
         replace(lower(trim(n.n_name)), ' ', '-') ||
         '.example/part/' || CAST(s.s_suppkey AS VARCHAR) ||
         '?ref=' || CAST(s.s_nationkey AS VARCHAR) AS url
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
"""

_DOMAIN_FILTER_SQL = f"""
WITH urls AS ({_URL_CORPUS_SQL}),
blocked AS (
  SELECT 'www.' || replace(lower(trim(n_name)), ' ', '-') || '.example'
             AS bad_domain
  FROM nation WHERE n_nationkey % 5 = 0
),
extracted AS (
  SELECT url_id,
         regexp_extract(url, 'https?://([^/]+)/', 1) AS domain
  FROM urls
)
SELECT e.domain,
       COUNT(*) AS n_urls,
       CAST(MAX(CASE WHEN b.bad_domain IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS is_blocked
FROM extracted e LEFT JOIN blocked b ON e.domain = b.bad_domain
GROUP BY e.domain
"""


@register("llm_url_domain_filter", sql=_DOMAIN_FILTER_SQL)
def url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain extraction + blocklist screen (the C4 badlist pattern):
    regexp host extraction, then a BROADCAST left join against the
    nation-derived blocklist — the blocklist is always tiny relative to
    the corpus, so at 100 TB this is a map-side lookup, never a shuffle
    of the URL side."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    domain_of = lambda col: F.concat(  # noqa: E731
        F.lit("www."),
        F.replace(F.lower(F.trim(col)), F.lit(" "), F.lit("-")),
        F.lit(".example"),
    )
    urls = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_suppkey").alias("url_id"),
            F.concat(
                F.lit("https://"),
                domain_of(F.col("n_name")),
                F.lit("/part/"),
                F.col("s_suppkey").cast("string"),
                F.lit("?ref="),
                F.col("s_nationkey").cast("string"),
            ).alias("url"),
        )
    )
    blocked = n.filter(F.col("n_nationkey") % 5 == 0).select(
        domain_of(F.col("n_name")).alias("bad_domain")
    )
    extracted = urls.select(
        "url_id",
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("domain"),
    )
    return (
        extracted.join(
            F.broadcast(blocked),
            extracted.domain == blocked.bad_domain,
            "left",
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.max(
                F.when(F.col("bad_domain").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("is_blocked"),
        )
    )
