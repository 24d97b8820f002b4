"""Phase-profile the merge_into/delta_export commit loop (guide §1).

Runs the cdc_delta_checkpoint_state shape (12 sliced merge+export
commits) with wall timers around each phase of merge_into and
delta_export, monkeypatched in, so the optimization round knows where
the seconds actually go before touching anything.

Usage: python tools/profile_commit_loop.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, float] = defaultdict(float)
COUNTS: dict[str, int] = defaultdict(int)


class timer:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.time()

    def __exit__(self, *a):
        PHASES[self.name] += time.time() - self.t0
        COUNTS[self.name] += 1


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from cdc_apache_cassandra_spark.session import get_spark
    from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
    from cdc_apache_cassandra_spark.sources.event_source import (
        VALUE_COLS,
        mutation_events,
    )
    import cdc_apache_cassandra_spark.streaming.materialize as mat
    import cdc_apache_cassandra_spark.streaming.delta_log as dl

    # --- instrument merge_into phases -----------------------------------
    orig_bucket_stats = mat._bucket_stats

    def bucket_stats_timed(spark, base, ver_dir):
        with timer("merge.bucket_stats_job"):
            return orig_bucket_stats(spark, base, ver_dir)

    mat._bucket_stats = bucket_stats_timed

    orig_merge = mat.merge_into

    def merge_timed(*a, **k):
        with timer("merge_into.total"):
            return orig_merge(*a, **k)

    mat.merge_into = merge_timed

    # instrument the touched-collect and the write inside merge_into by
    # wrapping DataFrame methods is invasive; instead patch the module's
    # F reference level functions? Simplest: time distinct-collect via a
    # wrapper on DataFrame.collect is global — acceptable for a profile.
    from pyspark.sql.classic.dataframe import DataFrame

    orig_collect = DataFrame.collect

    def collect_timed(self):
        with timer("DataFrame.collect(all)"):
            return orig_collect(self)

    DataFrame.collect = collect_timed

    from pyspark.sql import Observation

    orig_get = Observation.get

    def get_timed(self):
        with timer("Observation.get"):
            return orig_get.fget(self)

    Observation.get = property(get_timed)

    orig_export = dl.delta_export

    def export_timed(*a, **k):
        with timer("delta_export.total"):
            return orig_export(*a, **k)

    dl.delta_export = export_timed

    orig_replay = dl._replay

    def replay_timed(*a, **k):
        with timer("delta._replay"):
            return orig_replay(*a, **k)

    dl._replay = replay_timed

    orig_stats_json = dl._file_stats_json

    def stats_json_timed(p):
        with timer("delta._file_stats_json"):
            return orig_stats_json(p)

    dl._file_stats_json = stats_json_timed

    import pyspark.sql.readwriter as rw

    orig_parquet_write = rw.DataFrameWriter.parquet

    def parquet_timed(self, path, **k):
        with timer("write.parquet(all)"):
            return orig_parquet_write(self, path, **k)

    rw.DataFrameWriter.parquet = parquet_timed

    spark = get_spark("profile-commit-loop")
    # warm-up identical to bench
    spark.range(1000).selectExpr("sum(id)").collect()
    from cdc_apache_cassandra_spark.sources.registry import load_table

    load_table(spark, sf_dir, "events").groupBy("event_type").count().write \
        .format("noop").mode("overwrite").save()

    import tempfile

    t_all = time.time()
    with timer("dedup+persist"):
        ev = dedup_mutations(mutation_events(spark, sf_dir)).persist()
        ev.count()
    root = tempfile.mkdtemp(prefix="profile_ckpt_")
    store = f"{root}/store"
    table = f"{root}/table"
    os.makedirs(store)
    for i in range(12):
        mat.merge_into(
            spark, store,
            ev.filter(F.pmod(F.col("position"), F.lit(12)) == i),
            ["pk"], n_buckets=8,
        )
        dl.delta_export(spark, store, table)
    with timer("delta_log_cleanup"):
        dl.delta_log_cleanup(table)
    with timer("final_read_noop"):
        dl.read_delta(spark, table).select(
            "pk", "op", "writetime", *VALUE_COLS
        ).write.format("noop").mode("overwrite").save()
    total = time.time() - t_all

    print(f"\nTOTAL {total:.2f}s")
    for k in sorted(PHASES, key=PHASES.get, reverse=True):
        print(f"{PHASES[k]:8.2f}s  n={COUNTS[k]:4d}  {k}")


if __name__ == "__main__":
    main()
