"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC pipeline (dedup -> last-write-wins
materialization) at sf0.001; ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions,
registered in ``cdc_apache_cassandra_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_apache_cassandra_spark.plans import QUERIES  # noqa: E402

FLAGSHIP = "cdc_lww_state"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged per-key CDC state (replica dedup + LWW) at sf0.001."""
    return QUERIES[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
