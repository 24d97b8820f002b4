"""Python UDTF + SQL surface registration (Spark 4 table functions).

The reference has no user-function language (SURVEY §2.9) — its extension
point is pluggable Java converters. The new engine's user extension
surface is Spark's: SQL over registered views, pandas UDFs, and (Spark 4)
Python UDTFs for one-row → many-rows transforms that need imperative
logic.

``ChunkDocs`` is the UDTF twin of the JVM-side sliding-window chunker
(plans/llm_text_stats_queries.py::chunk_documents). The JVM form is the
production path (whole-stage codegen, no Python); the UDTF exists for
user-defined chunkers that CAN'T be expressed as sequence+slice (format-
aware splitting, tokenizer-boundary snapping) and is pinned against the
JVM twin in tests so both agree on the common case.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: bigint, n_chunk_tokens: int, chunk_text: string")
class ChunkDocs:
    """Sliding-window token chunker: windows of ``size`` every ``stride``
    tokens; short docs yield their single partial chunk. Mirrors the
    n_extra = max(floor((n - size - 1)/stride), -1) + 1 span rule of the
    JVM chunker exactly — INCLUDING engine tokenizer semantics: Spark's
    `trim` strips spaces only (not tabs) and `split(.., '\\s+')` keeps a
    leading empty token when the text starts with a separator, so this
    uses space-strip + re.split, not Python's strip()/split() (hypothesis
    caught the '\\t' divergence)."""

    def eval(self, text: str, size: int, stride: int):
        import re

        if text is None:
            return
        trimmed = text.strip(" ")  # F.trim semantics: spaces only
        if not trimmed:
            return
        toks = re.split(r"\s+", trimmed)  # may keep a leading '' like Spark
        n = len(toks)
        n_chunks = max((n - size - 1) // stride, -1) + 2  # incl. chunk 0
        for i in range(n_chunks):
            window = toks[i * stride : i * stride + size]
            yield i, len(window), " ".join(window)


def register_sql_surface(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> None:
    """Make the engine usable from plain ``spark.sql``: one temp view per
    corpus table (registered through sources.registry.load_table so the
    events timestamp normalization applies) plus the UDTFs."""
    from cdc_apache_cassandra_spark.sources.registry import TABLES, load_table

    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.udtf.register("chunk_docs", ChunkDocs)
