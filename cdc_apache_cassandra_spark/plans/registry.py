"""Registry mapping query name -> (Spark callable, DuckDB oracle SQL).

Contract (driver): callable(spark, sf_dir) -> DataFrame; oracle SQL runs on
DuckDB views named after the parquet tables. Column NAMES and value
semantics must match exactly — the driver sorts columns by name and hashes
values. Determinism rules used throughout:

- money/quantity aggregates: exact DECIMAL(18,2) arithmetic, final cast to
  DOUBLE (identical nearest-double in both engines; no float-order drift).
- ratios: double division of deterministically-derived operands.
- hashes: md5 only (both engines agree); never engine-native hash().
- timestamps: session timezone pinned UTC (see session.tune).
- NO windowed float accumulation (engines disagree on window-SUM
  internals): accumulate integers/decimals exactly and derive the float
  once per row instead.
- values that can round to zero from below: add `+ 0.0` after ROUND —
  DuckDB's ROUND preserves IEEE −0.0, Spark's BigDecimal round yields
  +0.0, and the hash comparison sees two different doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cdc_apache_cassandra_spark.caching import release_plan_caches
from cdc_apache_cassandra_spark.session import tune


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible; driver does rows-only check


QUERIES: dict[str, Query] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            # ~30 queries persist_scoped() an intra-query intermediate
            # (posting lists, signature tables, iterative frontiers). A
            # query fn has no post-action hook to unpersist, so evict
            # here: each build releases the PREVIOUS query's tracked
            # caches, bounding cache growth across a whole sweep to one
            # query's worth — WITHOUT touching caches the caller created
            # (the old blanket clearCache did). Callers that own the
            # action can release sooner via caching.release_plan_caches.
            release_plan_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = f"query_{name}"
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = Query(name, wrapped, sql)
        return wrapped

    return deco
