"""Format surface: the engine's tables round-trip through every batch
format Spark ships (parquet / csv / json / orc) with values intact —
the S8/S9 backfill path isn't parquet-specific."""

import pytest
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.sources.registry import load_table

from .conftest import SF_SMOKE

FORMATS = ("parquet", "csv", "json", "orc")


@pytest.mark.parametrize("fmt", FORMATS)
def test_customer_round_trips(spark, tmp_path, fmt):
    src = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / f"customer_{fmt}")
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)

    reader = spark.read
    if fmt in ("csv", "json"):
        # text formats need the schema pinned (csv would infer strings)
        reader = reader.schema(src.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.format(fmt).load(path)

    assert back.count() == src.count()
    agg = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal"),
        F.countDistinct("c_mktsegment").alias("segs"),
    ).collect()[0]
    assert tuple(agg(back)) == tuple(agg(src))
