"""Stress reproducer for the multi-writer prune/stale-read race
(VERDICT r11 item 1). Runs N rounds of the 4-thread contended
merge_into_retrying race from tests/test_manifest_http.py in ONE Spark
session, printing the full traceback of the first escape. Optional env:

  RACE_ROUNDS    how many rounds (default 30)
  RACE_WRITERS   threads per round (default 4)
  RACE_DELAY     seconds to sleep between manifest load and the bucket
                 read inside merge_into (widens the plan-time hole)
"""
import os
import sys
import threading
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_apache_cassandra_spark import session as sess_mod
from cdc_apache_cassandra_spark.streaming import materialize as M
from cdc_apache_cassandra_spark.streaming.object_store import (
    ConditionalPutServer,
    HttpManifestStore,
)

SCHEMA = (
    "op string, pk long, writetime long, v string, w string, "
    "segment long, position long"
)
BASE = [("INSERT", i, 10, f"v{i}", "x", 0, i) for i in range(8)]

ROUNDS = int(os.environ.get("RACE_ROUNDS", "30"))
WRITERS = int(os.environ.get("RACE_WRITERS", "4"))
DELAY = float(os.environ.get("RACE_DELAY", "0"))

if DELAY:
    _orig = M._read_bucket_files

    def _slow(spark, path, manifest, paths):
        import time

        time.sleep(DELAY)
        return _orig(spark, path, manifest, paths)

    M._read_bucket_files = _slow


def main():
    spark = sess_mod.get_spark()
    srv = ConditionalPutServer()
    url = srv.start()
    import tempfile

    for rnd in range(ROUNDS):
        tmp = tempfile.mkdtemp(prefix="race_")
        path = os.path.join(tmp, f"store{rnd}")
        os.makedirs(path)
        store = HttpManifestStore(url)
        M.merge_into(
            spark, path, spark.createDataFrame(BASE, SCHEMA), ["pk"],
            n_buckets=2, store=store,
        )
        batches = [
            [("UPDATE", i, 20 + w, f"w{w}", "x", w, i) for i in range(w, 8, WRITERS)]
            for w in range(WRITERS)
        ]
        errors = []

        def writer(w):
            try:
                M.merge_into_retrying(
                    spark, path, spark.createDataFrame(batches[w], SCHEMA),
                    ["pk"], n_buckets=2, store=HttpManifestStore(url),
                    max_attempts=10,
                )
            except Exception:
                errors.append((w, traceback.format_exc()))

        threads = [
            threading.Thread(target=writer, args=(w,)) for w in range(WRITERS)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            print(f"=== ROUND {rnd}: {len(errors)} escapes ===")
            for w, tb in errors:
                print(f"--- writer {w} ---\n{tb}")
            srv.stop()
            sys.exit(1)
        # verify convergence
        manifest, _ = store.load(path)
        df = M.read_state(spark, path, store=store)
        got = {
            r.pk: (r.v, r.writetime)
            for r in df.collect()
            if r.op != "DELETE"
        }
        for pk in range(8):
            w = pk % WRITERS
            assert got[pk] == (f"w{w}", 20 + w), (rnd, pk, got[pk])
        print(f"round {rnd}: ok (version={manifest['version']})")
    srv.stop()
    print("ALL GREEN")


if __name__ == "__main__":
    main()
