"""Table registry over the driver-generated parquet corpus (TESTDATA.md).

Spark reads parquet with predicate pushdown + column pruning; at 100 TB the
same calls work against a partitioned table directory — nothing here is
sf-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor (TPC-H
#: fixes region=5 and nation=25 rows regardless of SF).
BROADCASTABLE = frozenset({"region", "nation"})


#: analyzed-relation cache: a DataFrame is an immutable plan, so reusing
#: it across queries skips the per-call parquet footer/schema read (64
#: queries x 1-3 tables adds up at bench granularity). Keyed by session
#: so an externally-provided (driver) session gets its own entries.
_RELATION_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (id(spark), sf_dir, name)
    if key not in _RELATION_CACHE:
        if name == "events":
            _RELATION_CACHE[key] = _load_events(spark, sf_dir)
        else:
            _RELATION_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _RELATION_CACHE[key]


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to µs TimestampType whatever the parquet layout:
    TIMESTAMP(NANOS) (older corpus generations; Spark rejects it unless
    read as long, then integer-truncated ns->µs exactly like DuckDB) or
    TIMESTAMP(MICROS)/NTZ (current generations; plain cast, values are
    already wall-clock µs and the session timezone is pinned UTC)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # integer div: no double rounding at ns magnitude
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


#: Minimum rows a spread slice should hold (env-overridable). VERDICT
#: r11 item 2: spreading to defaultParallelism unconditionally
#:  anti-scaled on toy inputs — at 32 cores, 32 slices of ~47 docs each
#: cost more task scheduling than they bought, and several spread
#: queries ran faster at 8 cores. The r12 width probes (32-core, solo
#: best-of-3, see OPTIMIZATION_r12.md) found the optimum tracks ROWS
#: PER SLICE, not a core ratio: the documents sites (5000 rows) were
#: fastest near 16 slices at 32 cores AND near 8 at 8 cores — ~300
#: rows per slice amortizes the per-task overhead of these decode/
#: fingerprint pipelines, while the embeddings sites (2000 rows,
#: heavier per row) tolerate 7-20 slices within noise. Bytes were
#: measured and rejected as the signal: the multimodal sites spread a
#: doc_id-only projection whose payload is synthesized per row, so
#: input bytes say nothing about the work.
_SPREAD_ROWS_PER_SLICE = int(
    __import__("os").environ.get("SPARK_GRAFT_SPREAD_ROWS", "300")
)


def _parquet_file_rows(path: str) -> int:
    """Footer row count of one parquet file — metadata-only driver read,
    memoized per path (the registry's corpus files are immutable)."""
    global _FILE_ROWS
    try:
        return _FILE_ROWS[path]
    except KeyError:
        pass
    import pyarrow.parquet as pq

    local = path[7:] if path.startswith("file://") else (
        path[5:] if path.startswith("file:") else path
    )
    n = pq.ParquetFile(local).metadata.num_rows
    _FILE_ROWS[path] = n
    return n


_FILE_ROWS: dict[str, int] = {}


def spread_scan(df: DataFrame) -> DataFrame:
    """Parallelize a compute-heavy NARROW pipeline over an
    under-partitioned scan (guide §2.5 input skew: a single-row-group
    parquet file plans as ONE scan task — parquet readers assign a row
    group to the split holding its start offset, so no
    maxPartitionBytes setting can split it — serializing every per-row
    transform and partial aggregate upstream of the first exchange).

    Round-robin repartition when the planned scan has fewer partitions
    than the session's default parallelism; a NO-OP at real scale,
    where many files/row groups already parallelize the scan (the
    partition check is plan metadata, no job). The width is
    DATA-RELATIVE (VERDICT r11 item 2): ceil(rows /
    :data:`_SPREAD_ROWS_PER_SLICE`) capped at defaultParallelism, with
    row counts from the scan files' parquet footers (metadata-only,
    memoized) — so toy inputs stop over-spreading at high core counts
    while a genuinely large single-file input still fans out to every
    core. Opt-in per query: the exchange ships the input once, so it
    only pays where the per-row work upstream of the first exchange
    dominates the input's byte size — measured per call site."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if cur >= n:
        return df
    width = n
    try:
        rows = sum(
            _parquet_file_rows(f)
            for f in df.inputFiles()
            if f.endswith(".parquet")
        )
        if rows:
            width = min(n, -(-rows // _SPREAD_ROWS_PER_SLICE))
    except Exception:
        pass  # non-parquet or unlistable input: keep the full width
    if width <= cur:
        return df
    return df.repartition(width)
