"""Benchmark runner (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall seconds.

Each query is materialized via a count-style action that forces full
execution without collecting results to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.caching import release_plan_caches
from cdc_apache_cassandra_spark.session import get_spark


#: Session-noise calibration (VERDICT r9 item 2): a FIXED pure-CPU
#: whole-stage-codegen reduce over spark.range — no disk, no store, no
#: data shuffle — timed at loop start and loop end. Its only variable is
#: how much CPU this session actually gets, so cross-round verdicts can
#: separate machine/session drift (calibration moved too) from plan
#: regressions (calibration flat, query slower) mechanically.
#: CAL_NOMINAL_SEC pins the workload's best-of-3 on the r10 reference
#: session; factor = measured/nominal (>1 ⇒ this session is slower, and
#: *_cal numbers divide the raw seconds by it).
CAL_ROWS = 4_000_000_000
CAL_NOMINAL_SEC = 2.26


def _calibrate(spark) -> float:
    """Best-of-3 seconds for the fixed CPU workload (min, not mean:
    the probe asks 'how fast CAN this session go right now' — the same
    basis as the solo numbers it normalizes)."""
    times = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, CAL_ROWS, 1, 32).selectExpr(
            "sum(xxhash64(id, xxhash64(id, xxhash64(id))) & 1048575) as s"
        ).collect()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main():
    # SPARK_GRAFT_SECTIONS: comma list of {queries, slices, store, solo}
    # (default all) — lets a drift investigation time ONE section solo
    # on an idle machine without paying the full loop (r7 item 4).
    # Tokens are stripped and validated: a typo or stray space must
    # fail loudly, not silently drop a section from the payload.
    _KNOWN_SECTIONS = {"queries", "slices", "store", "solo"}
    sections = {
        t.strip()
        for t in os.environ.get(
            "SPARK_GRAFT_SECTIONS", "queries,slices,store,solo"
        ).split(",")
        if t.strip()
    }
    unknown = sections - _KNOWN_SECTIONS
    if unknown:
        raise SystemExit(
            f"SPARK_GRAFT_SECTIONS: unknown section(s) {sorted(unknown)}; "
            f"valid: {sorted(_KNOWN_SECTIONS)}"
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("cdc-bench")
    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not first-touch JIT: a scalar job, plus one scan+explode over
    # each heavy table family (documents tokenization dominated the first
    # text query by ~3x before this).
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    from cdc_apache_cassandra_spark.sources.registry import load_table
    load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    ).groupBy("t").count().write.format("noop").mode("overwrite").save()
    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count().write \
        .format("noop").mode("overwrite").save()
    load_table(spark, sf_dir, "events").groupBy("event_type").count().write \
        .format("noop").mode("overwrite").save()
    load_table(spark, sf_dir, "embeddings").selectExpr(
        "aggregate(transform(embedding, x -> cast(x as double)), 0D, (a, x) -> a + x) as s"
    ).agg({"s": "sum"}).collect()

    cal_start = _calibrate(spark)

    # SPARK_GRAFT_BENCH_REPS: per-query best-of-N (JVM/JIT noise at small
    # SFs swings single cold measurements multi-x — a 6 s aggregate has
    # been observed at 67 s on a cold code path; the second rep is
    # codegen-warm and measures the plan). Default 2.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    # End-to-end engine gates (streaming queries, 12-commit Delta
    # lifecycles): their wall time is structural overhead (engine
    # startup, serial commits), not codegen warm-up, so a second rep
    # measures nothing new at 2x the cost — single rep, and the solo
    # block below still gives them best-of-3 when they land in the
    # top-N.
    single_rep = {
        "cdc_streaming_end_to_end",
        "cdc_compound_streaming_end_to_end",
        "cdc_delta_checkpoint_state",
        "cdc_delta_change_feed",
    }
    per_query: dict[str, float] = {}
    t_all = time.time()
    errors: dict[str, str] = {}
    for name, q in QUERIES.items() if "queries" in sections else ():
        times = []
        try:
            for _ in range(1 if name in single_rep else reps):
                t0 = time.time()
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
                # intra-query persists (signature/posting tables) are scoped
                # to their query; release them so later queries aren't
                # measured under accumulated cache memory pressure
                release_plan_caches()
        except Exception as exc:  # record and keep benching the rest
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            release_plan_caches()
            continue
        per_query[name] = round(min(times), 3)
    # headline value = sum of per-query best-of-N times (NOT loop wall,
    # which scales with reps); loop wall reported separately. The metric
    # key names this semantics explicitly (renamed in round 2 — r1 called
    # it total_wall_seconds_all_queries while already summing best-of-N).
    total = round(sum(per_query.values()), 3)
    loop_wall = round(time.time() - t_all, 3)

    # CDC pipeline throughput — comparable to BASELINE.md's envelope
    # (reference demo: 20k events; CQL lookup p50 2 ms on 1-10 threads).
    # Full slice: dedup -> read-after-event join -> keyed records.
    from cdc_apache_cassandra_spark.plans import registry  # noqa: F401
    from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
    from cdc_apache_cassandra_spark.operators.lookup import (
        key_value_records,
        read_after_event,
    )
    from cdc_apache_cassandra_spark.sources.event_source import (
        VALUE_COLS,
        mutation_events,
    )
    from cdc_apache_cassandra_spark.sources.registry import load_table

    slices: dict[str, float | int] = {}

    def best_of(action, n=reps):
        # same policy as per-query timing: the warm rep measures the
        # pipeline, not end-of-session JVM/GC state
        times = []
        for _ in range(n):
            t0 = time.time()
            action()
            times.append(time.time() - t0)
        return min(times)

    if "slices" in sections:
        # n_events/snap are consumed only by this section — computing
        # them outside it would charge a Spark count job to every
        # sections-scoped run (the cost the knob exists to avoid)
        n_events = mutation_events(spark, sf_dir).count()
        snap = load_table(spark, sf_dir, "customer").withColumnRenamed(
            "c_custkey", "pk"
        )
        recs = key_value_records(
            read_after_event(
                dedup_mutations(mutation_events(spark, sf_dir)),
                snap, ["pk"], list(VALUE_COLS),
            ),
            ["pk"], list(VALUE_COLS),
        )
        cdc_sec = best_of(
            lambda: recs.write.format("noop").mode("overwrite").save()
        )

        # Compound-PK CDC slice: partition/row classification + three-
        # branch read-after-event (full-PK / static proj / tombstone).
        from cdc_apache_cassandra_spark.sources.compound_event_source import (
            compound_events,
        )

        n_compound = compound_events(spark, sf_dir).count()
        compound_sec = best_of(
            lambda: QUERIES["cdc_compound_read_after_event"]
            .fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

        # Wire-codec slice: Avro encode -> decode roundtrip through the
        # vectorized mapInArrow batch codec (the active default; every
        # event crosses this boundary twice between agent and connector).
        # noop write forces full evaluation — mapInArrow can't be pruned.
        from pyspark.sql import types as TY
        from cdc_apache_cassandra_spark.sources.wire_format import (
            from_wire_records,
            to_wire_records,
        )

        key_schema = TY.StructType([TY.StructField("pk", TY.LongType())])
        value_schema = TY.StructType(
            [snap.schema[c] for c in VALUE_COLS]
        )
        wire_rt = from_wire_records(
            to_wire_records(
                mutation_events(spark, sf_dir), ["pk"], list(VALUE_COLS),
                codec="avro",
            ),
            key_schema,
            value_schema,
            codec="avro",
        )
        wire_sec = best_of(
            lambda: wire_rt.write.format("noop").mode("overwrite").save()
        )
        slices.update(
            cdc_events=n_events,
            cdc_pipeline_sec=round(cdc_sec, 3),
            cdc_events_per_sec=round(n_events / cdc_sec, 1),
            cdc_compound_events=n_compound,
            cdc_compound_pipeline_sec=round(compound_sec, 3),
            cdc_compound_events_per_sec=round(n_compound / compound_sec, 1),
            wire_avro_roundtrip_sec=round(wire_sec, 3),
            wire_avro_events_per_sec=round(n_events / wire_sec, 1),
        )

    bucket_store = None
    if "store" in sections:
        # Bucket-store scale proof (round-3 verdict item): drive the
        # merge-on-write table through micro-batch commits at n_buckets=256
        # and report bytes-rewritten-per-commit vs table size. Batches are
        # sliced by the same key hash the store buckets on, so each commit
        # names its touched-bucket set exactly — the recorded
        # rewrite_fraction must track touched/total buckets, proving
        # per-commit IO is proportional to touched buckets, not table size.
        import glob
        import shutil
        import tempfile

        from cdc_apache_cassandra_spark.streaming.materialize import (
            LocalManifestStore,
            merge_into,
            version_dir,
        )

        NB, SLICES = 256, 8
        ev = mutation_events(spark, sf_dir)
        sliced = ev.withColumn("__slice", F.pmod(F.xxhash64("pk"), F.lit(NB)))

        def run_store_cycle() -> dict:
            """One full fill → incremental-commit → delta-export → checkpoint
            cycle in fresh temp dirs. Run SPARK_GRAFT_STORE_REPS times (r7
            verdict item 4: loop-tail drift on these numbers needs a
            solo-equivalent best-of-N basis to be actionable)."""
            bs_dir = tempfile.mkdtemp(prefix="bucket_store_bench_")
            try:
                store = LocalManifestStore()

                def table_bytes(manifest):
                    return sum(
                        os.path.getsize(f)
                        for b, v in manifest["buckets"].items()
                        for f in glob.glob(
                            os.path.join(
                                bs_dir, version_dir(manifest, v), f"__bucket={b}", "*"
                            )
                        )
                    )

                t0 = time.time()
                per_slice = NB // SLICES
                for i in range(SLICES):  # fill: 8 commits cover all buckets
                    batch = sliced.filter(
                        (F.col("__slice") >= i * per_slice)
                        & (F.col("__slice") < (i + 1) * per_slice)
                    ).drop("__slice")
                    merge_into(spark, bs_dir, batch, ["pk"], n_buckets=NB)
                fill_sec = time.time() - t0
                m_full = store.load(bs_dir)[0]
                t_full = table_bytes(m_full)

                # incremental phase: one narrow commit (8 of 256 buckets)
                upd = (
                    sliced.filter(F.col("__slice") < 8)
                    .drop("__slice")
                    .withColumn("writetime", F.col("writetime") + F.lit(10**9))
                )
                t0 = time.time()
                merge_into(spark, bs_dir, upd, ["pk"], n_buckets=NB)
                inc_sec = time.time() - t0
                m_inc = store.load(bs_dir)[0]
                touched = [
                    b
                    for b in m_inc["buckets"]
                    if m_inc["buckets"][b] != m_full["buckets"][b]
                ]
                rewritten = sum(
                    os.path.getsize(f)
                    for b in touched
                    for f in glob.glob(
                        os.path.join(
                            bs_dir,
                            version_dir(m_inc, m_inc["version"]),
                            f"__bucket={b}",
                            "*",
                        )
                    )
                )
                # delta interop: full publish after fill, then the incremental
                # export of the narrow commit — its add/remove count must track
                # touched buckets, and its wall cost is the external-feed price
                from cdc_apache_cassandra_spark.streaming.delta_log import (
                    delta_export,
                    delta_log_replay,
                    write_checkpoint,
                )

                dt_dir = tempfile.mkdtemp(prefix="delta_export_bench_")
                try:
                    t0 = time.time()
                    delta_export(spark, bs_dir, dt_dir)  # full first publish
                    full_export_sec = time.time() - t0
                    n_files_full = len(delta_log_replay(dt_dir)[1])
                    upd2 = (
                        sliced.filter(F.col("__slice") < 8)
                        .drop("__slice")
                        .withColumn(
                            "writetime", F.col("writetime") + F.lit(2 * 10**9)
                        )
                    )
                    merge_into(spark, bs_dir, upd2, ["pk"], n_buckets=NB)
                    t0 = time.time()
                    delta_export(spark, bs_dir, dt_dir)
                    inc_export_sec = time.time() - t0
                    # checkpoint cost at this bucket count: write compacts the
                    # whole log into one parquet (one row per live file) and
                    # restore replays it — both metadata-sized, the numbers that
                    # bound a foreign reader's open cost on a long-lived export
                    t0 = time.time()
                    write_checkpoint(dt_dir)
                    cp_write_sec = time.time() - t0
                    t0 = time.time()
                    n_files_cp = len(delta_log_replay(dt_dir)[1])
                    cp_replay_sec = time.time() - t0
                    delta_export_stats = {
                        "full_export_sec": round(full_export_sec, 3),
                        "data_files": n_files_full,
                        "incremental_export_sec": round(inc_export_sec, 3),
                        "checkpoint_write_sec": round(cp_write_sec, 3),
                        "checkpoint_replay_sec": round(cp_replay_sec, 3),
                        "checkpoint_files": n_files_cp,
                    }
                    # delete-heavy cycle (VERDICT r9 item 6): sparse
                    # tombstones exported with deletion_vectors=True —
                    # the adds re-point EXISTING parquet files at
                    # roaring-bitmap DVs, so write IO is the DV blobs,
                    # not the touched buckets' parquet
                    # (rewrite_equivalent_bytes = what a rewrite would
                    # have written for the same commit)
                    from cdc_apache_cassandra_spark.streaming.delta_log import (
                        _replay as _dl_replay,
                    )

                    dels = (
                        sliced.filter(
                            (F.col("__slice") < 8)
                            & (F.pmod(F.col("pk"), F.lit(13)) == 0)
                        )
                        .drop("__slice")
                        .withColumn(
                            "writetime", F.col("writetime") + F.lit(3 * 10**9)
                        )
                        .withColumn("op", F.lit("DELETE"))
                    )
                    merge_into(spark, bs_dir, dels, ["pk"], n_buckets=NB)
                    t0 = time.time()
                    delta_export(spark, bs_dir, dt_dir, deletion_vectors=True)
                    dv_export_sec = time.time() - t0
                    s_after = _dl_replay(dt_dir)
                    dv_adds = [
                        a
                        for a in s_after.files.values()
                        if a.get("deletionVector")
                    ]
                    dv_bytes = sum(
                        os.path.getsize(f)
                        for f in glob.glob(
                            os.path.join(dt_dir, "deletion_vector_*.bin")
                        )
                    )
                    delta_export_stats["dv_delete_cycle"] = {
                        "export_sec": round(dv_export_sec, 3),
                        "dv_buckets": len(dv_adds),
                        "dv_bytes_written": dv_bytes,
                        "rewrite_equivalent_bytes": sum(
                            int(a["size"]) for a in dv_adds
                        ),
                    }
                finally:
                    shutil.rmtree(dt_dir, ignore_errors=True)

                return {
                    "n_buckets": NB,
                    "fill_commits": SLICES,
                    "fill_sec": round(fill_sec, 3),
                    "table_bytes": t_full,
                    "incremental_commit_sec": round(inc_sec, 3),
                    "touched_buckets": len(touched),
                    "bytes_rewritten": rewritten,
                    "rewrite_fraction": round(rewritten / t_full, 4),
                    "touched_fraction": round(len(touched) / NB, 4),
                    "delta_export": delta_export_stats,
                }
            finally:
                shutil.rmtree(bs_dir, ignore_errors=True)

        store_reps = max(1, int(os.environ.get("SPARK_GRAFT_STORE_REPS", "3")))
        cycles = [run_store_cycle() for _ in range(store_reps)]
        # best-of-N on every timing; structural facts from the first cycle
        bucket_store = dict(cycles[0])
        bucket_store["delta_export"] = dict(cycles[0]["delta_export"])
        for c in cycles[1:]:
            for k in ("fill_sec", "incremental_commit_sec"):
                bucket_store[k] = min(bucket_store[k], c[k])
            for k in (
                "full_export_sec",
                "incremental_export_sec",
                "checkpoint_write_sec",
                "checkpoint_replay_sec",
            ):
                bucket_store["delta_export"][k] = min(
                    bucket_store["delta_export"][k], c["delta_export"][k]
                )
        bucket_store["reps"] = store_reps

    # Solo best-of-3 for the most expensive queries (r4 verdict item 7):
    # cross-round regression checks compare THESE numbers, not the tail
    # ratios of the main loop, whose single-digit-percent swings are
    # JVM/GC noise. Flag a regression only when solo-vs-solo moves >1.5x.
    solo: dict[str, dict] = {}
    if "solo" in sections and os.environ.get("SPARK_GRAFT_SOLO", "1") != "0":
        # 12 (was 10): llm_bpe_train_merges ranked 11th and was the one
        # query r5's drift analysis wanted solo-tracked across rounds
        top_n = int(os.environ.get("SPARK_GRAFT_SOLO_TOP", "12"))
        top = sorted(per_query, key=per_query.get, reverse=True)[:top_n]
        # forced watch entries (r6 item 7, r7 item 5, r8 item 7):
        # loop-tail drifters under observation get a solo number
        # regardless of rank
        watch = [
            "llm_substring_span_dedup",
            "cdc_compound_delta_export_state",
            "cdc_change_feed_range_split",
            # r9 verdict watch entries + r10-new features (baselines)
            "cdc_delta_change_feed_stream",
            "llm_semdedup",
            "cdc_delta_export_dv_state",
            "cdc_delta_v2_checkpoint_import",
            "cdc_delta_partitioned_import",
            # r10 verdict item 3: the multimodal pure-Python decode
            # family drifted in-loop with NO code change — the most
            # contention-sensitive queries in the loop need solo
            # numbers so drift vs regression is decidable
            "multimodal_jpeg_decode",
            "multimodal_jsonl_gz_shard",
            "multimodal_mp3_frame_scan",
            # r11-new feature baselines
            "cdc_delta_mapped_export_state",
            "cdc_delta_export_cdf",
            "cdc_delta_cdf_stream",
        ]
        # SPARK_GRAFT_SOLO_QUERIES: explicit roster additions — with
        # SECTIONS=solo (no query loop ran) per_query is empty and the
        # rank-based roster has nothing to rank, so the watch list and
        # this env var ARE the roster in that mode.
        watch += [
            t.strip()
            for t in os.environ.get("SPARK_GRAFT_SOLO_QUERIES", "").split(",")
            if t.strip()
        ]
        for watched in watch:
            if watched in QUERIES and watched not in top:
                top.append(watched)
        for name in top:
            times = []
            for _ in range(3):
                t0 = time.time()
                QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.time() - t0)
                release_plan_caches()
            times.sort()
            solo[name] = {
                "best": round(times[0], 3),
                "median": round(times[len(times) // 2], 3),
            }

    cal_end = _calibrate(spark)
    # factor > 1 = this session runs the fixed CPU probe slower than the
    # pinned nominal; *_cal = raw / factor — what the number WOULD be on
    # the nominal session. Mean of start/end: the loop's queries ran
    # somewhere between the two load states.
    cal_factor = round(((cal_start + cal_end) / 2) / CAL_NOMINAL_SEC, 3)
    for entry in solo.values():
        entry["best_cal"] = round(entry["best"] / cal_factor, 3)
        entry["median_cal"] = round(entry["median"] / cal_factor, 3)

    payload = {
        "metric": "sum_best_of_n_seconds",
        "value": total,
        "value_cal": round(total / cal_factor, 3),
        "unit": "sec",
        "calibration": {
            "start_sec": cal_start,
            "end_sec": cal_end,
            "nominal_sec": CAL_NOMINAL_SEC,
            "factor": cal_factor,
            "rows": CAL_ROWS,
        },
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **slices,
        "reps": reps,
        "loop_wall_seconds": loop_wall,
    }
    if bucket_store is not None:
        payload["bucket_store"] = bucket_store
    if solo:
        payload["solo"] = solo
    if errors:
        payload["errors"] = errors
    line = json.dumps(payload)
    # Durable copy next to the script: the driver's stdout capture has
    # truncated this (long) line in past rounds (BENCH_r6/r7 "parsed":
    # null) — the file is the parseable artifact of record either way.
    # BENCH_LAST.json is overwritten per run, so full-payload runs ALSO
    # append to BENCH_HISTORY.jsonl (code-review r11: the per-round
    # driver captures BENCH_r{8,9,10}.json arrived truncated/unparsed,
    # and overwriting BENCH_LAST erased the calibration record the
    # cross-round comparisons cite — the append-only log keeps every
    # run adjudicable). Quick section-subset iteration runs (SECTIONS
    # set) skip the history to keep it one-entry-per-real-run.
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(repo, "BENCH_LAST.json"), "w") as f:
            f.write(line + "\n")
        if (
            sections == {"queries", "slices", "store", "solo"}
            and os.environ.get("SPARK_GRAFT_SOLO", "1") != "0"
        ):
            with open(os.path.join(repo, "BENCH_HISTORY.jsonl"), "a") as f:
                f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the line
    print(line)


if __name__ == "__main__":
    main()
