"""Fuzzy text-dedup operators: shingling, MinHash signatures, LSH banding,
SimHash — the scale path for near-duplicate detection over ``documents``.

Reference parity note: the reference pipeline has only EXACT dedup (md5 of
the serialized mutation, MutationCache.java:39-46); these operators
generalize A1/A3 to near-duplicate text as a training-data pipeline needs
(BASELINE.json north star). All hashing builds on md5 so the DuckDB oracle
computes bit-identical values (see functions/hashing.py rationale).

Scale design (100 TB):
- shingling/minhash are per-row narrow transforms — whole-stage codegen,
  no shuffle, no Python.
- LSH banding explodes each doc into B band rows, then ONE shuffle on
  (band_id, band_key); bucket sizes are bounded by collision probability,
  so the follow-up candidate self-join is skew-safe.
- verified Jaccard runs only on candidate pairs (|candidates| << n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams: ['a','b','c','d'] with n=3 ->
    ['a b c', 'b c d']. Caller must guard size(tokens) >= n."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))
    )


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """k-permutation MinHash: seed s in [0,k), hash = md5(s || ':' || g),
    signature element = lexicographic min. md5's uniformity makes the
    string-min equivalent to a numeric min-hash; DuckDB computes the exact
    same strings."""
    seeds = F.sequence(F.lit(0), F.lit(k - 1))
    return F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(
                shingles, lambda g: F.md5(F.concat(s.cast("string"), F.lit(":"), g))
            )
        ),
    )


def lsh_band_rows(
    df: DataFrame, id_col: str, sig_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Explode a signature into (id, band_id, band_key) rows. band_key is
    md5 over the band's slice of the signature, so equal keys <=> equal
    band slices."""
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    exploded = df.select(
        F.col(id_col), F.explode(band_ids).alias("band_id"), F.col(sig_col)
    )
    band_key = F.md5(
        F.concat(
            F.col("band_id").cast("string"),
            F.lit("|"),
            F.array_join(
                F.slice(
                    F.col(sig_col), F.col("band_id") * rows_per_band + 1, rows_per_band
                ),
                ",",
            ),
        )
    )
    return exploded.select(id_col, "band_id", band_key.alias("band_key"))


def candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any LSH bucket. The join key
    (band_id, band_key) is high-cardinality — shuffle is uniform."""
    a = bands_df.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_key"
    )
    b = bands_df.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_key"
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard over two DISTINCT-element arrays, as double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))
    return inter / union.cast("double")


def simhash32_sql(hashes_col: str) -> str:
    """Spark-SQL expression string computing the 32-bit SimHash of an
    array<bigint> column of uint32 token hashes: bit b is set iff
    sum over tokens of (2*bit_b(hash)-1) > 0.

    Built as a SQL lambda because the shift amount is itself a lambda
    variable (the Python shiftright wrapper only takes an int)."""
    return f"""
    aggregate(
      transform(sequence(0, 31), b ->
        CASE WHEN aggregate({hashes_col}, 0L,
                            (acc, h) -> acc + 2 * (shiftright(h, b) % 2) - 1) > 0
             THEN shiftleft(1L, b) ELSE 0L END),
      0L, (acc, x) -> acc + x)
    """


def token_hash32_expr(tokens: Column) -> Column:
    """array<string> -> array<bigint>: first 8 md5 hex chars as uint32."""
    return F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
