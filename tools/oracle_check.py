"""Self-check harness mimicking the driver's correctness gate: run every
registered query in Spark AND its DuckDB oracle on the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.session import get_spark
from cdc_apache_cassandra_spark.sources.registry import TABLES


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact shortest repr — bit-exact comparison
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def check(spark, con, name, sf_dir) -> tuple[bool, str]:
    q = QUERIES[name]
    t0 = time.time()
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    if q.sql is None:
        return True, f"rows-only ({len(srows)} rows, {t_spark:.1f}s)"
    t0 = time.time()
    res = con.sql(q.sql)
    dcols = res.columns
    drows = res.fetchall()
    t_duck = time.time() - t0
    if sorted(scols) != sorted(dcols):
        return False, f"COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}"
    cs, cd = _canon(srows, scols), _canon(drows, dcols)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"VALUE MISMATCH ({len([1 for a,b in zip(cs,cd) if a!=b])} rows) e.g. {diff}"
    return True, f"OK ({len(srows)} rows, spark {t_spark:.1f}s, duck {t_duck:.1f}s)"


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
        spark.catalog.clearCache()  # drop intra-query persists
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
