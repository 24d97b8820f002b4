"""Python UDTF surface (Spark 4): the user-extension chunker must agree
with the JVM-side production chunker, and the SQL surface registration
must make the corpus queryable from plain spark.sql."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.functions.udtf_surface import (
    ChunkDocs,
    register_sql_surface,
)
from cdc_apache_cassandra_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_udtf_chunker_matches_jvm_chunker(spark):
    """LATERAL-join UDTF chunking ≡ the sequence+slice JVM plan for the
    same (size, stride) — pins the Python extension path to the
    production semantics."""
    from cdc_apache_cassandra_spark.plans.llm_text_stats_queries import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    register_sql_surface(spark, SF, tables=("documents",))
    got = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text
        FROM documents d,
             LATERAL chunk_docs(d.text, {_CHUNK_SIZE}, {_CHUNK_STRIDE}) c
        WHERE length(trim(d.text)) > 0
        """
    )
    want = QUERIES["llm_chunk_documents"].fn(spark, SF)
    assert Counter(map(tuple, got.collect())) == Counter(
        map(tuple, want.collect())
    )


def test_udtf_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [("a b",), ("   ",), ("x",)], ["text"]
    ).select(F.col("text"))
    df.createOrReplaceTempView("tiny_docs")
    spark.udtf.register("chunk_docs", ChunkDocs)
    rows = spark.sql(
        "SELECT t.text, c.* FROM tiny_docs t, LATERAL chunk_docs(t.text, 4, 2) c"
    ).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, []).append(r)
    assert "   " not in by_text  # empty doc yields nothing
    assert len(by_text["a b"]) == 1 and by_text["a b"][0].n_chunk_tokens == 2
    assert len(by_text["x"]) == 1 and by_text["x"][0].chunk_text == "x"


def test_sql_surface_end_to_end(spark):
    """A reference user's ad-hoc SQL works against the registered views."""
    register_sql_surface(spark, SF)
    row = spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY n DESC, c.c_mktsegment LIMIT 1
        """
    ).first()
    assert row.n > 0
    # events view must carry the µs-normalized timestamp type
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"
