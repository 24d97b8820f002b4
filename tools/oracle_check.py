"""Self-check harness REPLAYING the driver's correctness gate: run every
registered query in Spark AND its DuckDB oracle on the same parquet tables,
compare row count, column names, and order-insensitive values with the
driver's own canonicalization semantics (pandas lexsort → stringify →
compare). Replaying the driver exactly matters because it is stricter than a
value-level compare in two observed ways (round-1 post-mortem):

  * pandas ``sort_values`` raises on unhashable cells (numpy arrays from
    array-typed columns) — the driver records these as ``err`` rows, so we
    must too, not silently canonicalize them away.
  * stringified values are dtype-visible: DuckDB returns HUGEINT for any
    integer SUM, which lands in pandas as float64, and ``str(2.0) != str(2)``
    — a hash mismatch the old tuple-canonical compare (str() both sides via
    repr) masked.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from cdc_apache_cassandra_spark.caching import release_plan_caches
from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.session import get_spark
from cdc_apache_cassandra_spark.sources.registry import TABLES


def driver_canon(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Replicate the driver's canonicalization: order columns by name,
    lexsort rows on all columns (exceptions propagate — the driver records
    them as ``err``), then stringify every cell for comparison.

    Stringification is what makes the gate dtype-visible for numerics
    (``str(2.0) != str(2)``) while remaining unit-insensitive for datetimes
    (datetime64[us] vs [ns] both print the same) — matching the observed
    round-1 pass/fail pattern exactly.
    """
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last")
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)]


def check(spark, con, name, sf_dir) -> tuple[bool, str]:
    q = QUERIES[name]
    t0 = time.time()
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    spdf = sdf.toPandas()
    t_spark = time.time() - t0
    if q.sql is None:
        return True, f"rows-only ({len(spdf)} rows, {t_spark:.1f}s)"
    t0 = time.time()
    res = con.sql(q.sql)
    dcols = res.columns
    dpdf = res.df()
    t_duck = time.time() - t0
    if sorted(scols) != sorted(dcols):
        return False, f"COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}"
    if len(spdf) != len(dpdf):
        return False, f"ROWCOUNT MISMATCH spark={len(spdf)} duck={len(dpdf)}"
    try:
        cs = driver_canon(spdf)
        cd = driver_canon(dpdf)
    except Exception as e:  # the driver records canonicalization crashes as err
        return False, f"DRIVER-ERR {type(e).__name__}: {e}"
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"VALUE MISMATCH ({len([1 for a,b in zip(cs,cd) if a!=b])} rows) e.g. {diff}"
    return True, f"OK ({len(spdf)} rows, spark {t_spark:.1f}s, duck {t_duck:.1f}s)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    for name in names:
        ok, msg = check(spark, con, name, sf_dir)
        print(f"{'PASS' if ok else 'FAIL'}  {name:45s} {msg}")
        release_plan_caches()  # drop intra-query scoped persists
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
