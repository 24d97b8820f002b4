"""Portable-HLL sketch tests: pure-Python register parity, estimate
accuracy, and streaming mergeability (MAX-merged registers across
micro-batches == the batch sketch)."""

from __future__ import annotations

import hashlib
import uuid

import pandas as pd
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.functions.hashing import (
    hll_finalize,
    hll_registers,
)
from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _py_registers(values) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, w = h % 64, h // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_pure_python(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    expected = {
        et: _py_registers(g["user_id"])
        for et, g in ev.groupby("event_type")
    }
    regs = hll_registers(
        load_table(spark, SF, "events"), ["event_type"], "user_id"
    ).collect()
    got: dict[str, dict[int, int]] = {}
    for r in regs:
        got.setdefault(r.event_type, {})[r.bucket] = r.m
    assert got == expected


def test_rho_exact_at_bitlength_boundary(spark):
    """Regression: the register update must compute w = h >> 6 with
    INTEGER arithmetic. The old `(h - bucket) / HLL_M` ran as DOUBLE
    division, and for h >= 2^59 the 54-bit quotient rounds — at
    bit-length boundaries rho flips (h = (2^54-1)*64 + 7: exact w =
    2^54-1 -> rho 1; rounded w = 2^54 -> rho 0)."""
    from cdc_apache_cassandra_spark.functions.hashing import hll_bucket_rho

    boundary = (2**54 - 1) * 64 + 7
    df = spark.range(1).select(F.lit(boundary).alias("h"))
    # drive the bucket/rho arithmetic directly on a pinned h (bypass md5)
    h = F.col("h")
    bucket = h % 64
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    row = df.select(bucket.alias("b"), rho.alias("r")).collect()[0]
    assert row.b == 7
    assert row.r == 1  # double division would give 0
    # and the production expression agrees with pure python on real values
    vals = spark.createDataFrame(
        [(str(i),) for i in range(200)], ["v"]
    )
    b_col, r_col = hll_bucket_rho(F.col("v"))
    got = {
        (r.b, r.r)
        for r in vals.select(b_col.alias("b"), r_col.alias("r")).collect()
    }
    import hashlib

    want = set()
    for i in range(200):
        hh = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        ww = hh // 64
        want.add((hh % 64, 55 if ww == 0 else 55 - ww.bit_length()))
    assert got == want


def test_estimate_within_hll_error_bound(spark):
    """m=64 => standard error ~1.04/sqrt(64) = 13%; allow 3 sigma."""
    rows = QUERIES["stats_hll_portable_sketch"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        rel = abs(r.hll_estimate_r - r.exact_users) / r.exact_users
        assert rel < 0.4, (r.event_type, r.hll_estimate_r, r.exact_users)


def test_streaming_sketch_equals_batch(spark, tmp_path):
    """The register aggregate run as a streaming COMPLETE-mode query over
    4 micro-batches produces exactly the batch registers — MAX-merge is
    what makes the sketch valid under any partitioning/batching."""
    ev = load_table(spark, SF, "events")
    d = str(tmp_path / "events_stream")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    regs_stream = hll_registers(stream, ["event_type"], "user_id")
    name = f"hll_regs_{uuid.uuid4().hex[:8]}"
    q = (
        regs_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.event_type, r.bucket): r.m for r in spark.table(name).collect()
    }
    want = {
        (r.event_type, r.bucket): r.m
        for r in hll_registers(ev, ["event_type"], "user_id").collect()
    }
    assert got == want

    # finalization over the streamed registers matches the batch estimate
    est_stream = {
        r.event_type: (r.harmonic_scaled, r.hll_estimate_r)
        for r in hll_finalize(spark.table(name), ["event_type"]).collect()
    }
    est_batch = {
        r.event_type: (r.harmonic_scaled, r.hll_estimate_r)
        for r in QUERIES["stats_hll_portable_sketch"].fn(spark, SF).collect()
    }
    assert est_stream == est_batch


def test_e2e_pipeline_invariants(spark):
    """Pack manifests: budget respected at pack starts, token totals
    conserved vs the post-filter post-dedup doc set."""
    rows = QUERIES["llm_pipeline_end_to_end"].fn(spark, SF).collect()
    assert rows
    by_split: dict[str, list] = {}
    for r in rows:
        assert r.n_docs >= 1
        assert r.first_doc <= r.last_doc
        by_split.setdefault(r.split, []).append(r)
    assert set(by_split) <= {"train", "val"}
    assert "train" in by_split
    for split, rs in by_split.items():
        rs.sort(key=lambda r: r.pack_id)
        # pack ids contiguous from 0, and doc ranges non-overlapping
        assert rs[0].pack_id == 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur.pack_id == prev.pack_id + 1
            assert prev.last_doc < cur.first_doc
    # conservation: sum of pack tokens == deduped quality docs' tokens
    d = load_table(spark, SF, "documents")
    base = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.md5("text").alias("h"),
        F.length("text").alias("nc"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("nt"),
    )
    qual = base.filter(
        (F.col("nt") >= 5) & (F.col("nc").cast("double") / F.col("nt") <= 12.0)
    )
    kept = (
        qual.groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.first("nt").alias("nt"))
        .agg(F.sum("nt"))
        .collect()[0][0]
    )
    assert sum(r.pack_tokens for r in rows) == kept
