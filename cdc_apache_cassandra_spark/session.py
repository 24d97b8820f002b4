"""SparkSession construction and per-query runtime tuning.

Two contexts:

1. Our own tests/bench build the session via :func:`get_spark`.
2. The driver passes us ITS session — so every query function calls
   :func:`tune` to set the *runtime-settable* confs it depends on
   (session timezone for oracle parity, AQE, shuffle parallelism).

Scale note: shuffle partitions default to the local core count for the
local[32] test rig; on a real cluster AQE coalescing makes the initial
number mostly a ceiling — we set it generously and let AQE shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs every query depends on. Session timezone MUST be
#: UTC so naive parquet timestamps compare equal to DuckDB's UTC-naive ones.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python DataSource filter pushdown (cdc_store bucket pruning): without
    # this conf Spark REFUSES any DataSourceReader implementing pushFilters
    # (AnalysisException DATA_SOURCE_PUSHDOWN_DISABLED). Runtime-settable.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-provided session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    # Small scale factors don't need 200 reducers; AQE coalesces anyway but
    # a sane starting point avoids tiny-partition overhead at sf<=0.1.
    spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    return spark


def get_spark(app_name: str = "cdc-spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(cpus))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
