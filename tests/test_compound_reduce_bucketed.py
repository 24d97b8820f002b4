"""compound_reduce_bucketed must be value-identical to compound_reduce
(the r11 single-exchange merge plan), including under exact duplicate
rows (redelivered events in old ∪ batch) and cluster-null edge cases."""

import pytest
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.lww import (
    compound_reduce,
    compound_reduce_bucketed,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=repr,
    )


@pytest.fixture()
def events(spark):
    data = [
        # (pk_p, pk_c, ptype, op, writetime, s_mktsegment, v)
        (1, 10, "ROW_LEVEL_MODIFICATION", "INSERT", 100, None, 1.0),
        (1, 10, "ROW_LEVEL_MODIFICATION", "UPDATE", 200, None, 2.0),
        (1, 11, "ROW_LEVEL_MODIFICATION", "INSERT", 150, None, 3.0),
        (1, None, "PARTITION_KEY_ROW_DELETION", "DELETE", 120, None, None),
        (1, None, "PARTITION_LEVEL_MODIFICATION", "UPDATE", 180, "SEG_A", None),
        (2, 20, "ROW_LEVEL_MODIFICATION", "INSERT", 90, "SEG_B", 4.0),
        (2, None, "PARTITION_KEY_ROW_DELETION", "DELETE", 300, None, None),
        # exact duplicate pair (a redelivered winner): both branches may
        # pick either physical copy; output must carry the value ONCE
        (3, 30, "ROW_LEVEL_MODIFICATION", "INSERT", 500, "SEG_C", 5.0),
        (3, 30, "ROW_LEVEL_MODIFICATION", "INSERT", 500, "SEG_C", 5.0),
    ]
    df = spark.createDataFrame(
        data, "pk_p int, pk_c int, ptype string, op string, "
        "writetime long, s_mktsegment string, v_totalprice double"
    )
    return df.withColumn(
        "__bucket", F.pmod(F.xxhash64("pk_p"), F.lit(4)).cast("int")
    )


def test_value_identical_to_compound_reduce(spark, events):
    base = compound_reduce(events)
    bucketed = compound_reduce_bucketed(
        events.repartition(4, F.col("__bucket"))
    )
    assert _rows(bucketed) == _rows(base)


def test_single_exchange_plan(spark, events):
    pre = events.repartition(4, F.col("__bucket"))
    out = compound_reduce_bucketed(pre)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    # the pre-repartition is the ONLY exchange: windows and the closing
    # dropDuplicates reduce in place on hash(__bucket)
    assert plan.count("Exchange") == 1, plan


def test_merge_into_bucketed_matches_unbucketed(spark, events, tmp_path):
    from cdc_apache_cassandra_spark.streaming.materialize import (
        merge_into,
        read_state,
    )

    ev = events.drop("__bucket")
    halves = [ev.filter(F.pmod(F.col("pk_p"), F.lit(2)) == i) for i in (0, 1)]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for half in halves:
        merge_into(
            spark, a, half, ["pk_p", "pk_c"], n_buckets=4,
            bucket_cols=["pk_p"], reducer=compound_reduce, kind="compound",
        )
        merge_into(
            spark, b, half, ["pk_p", "pk_c"], n_buckets=4,
            bucket_cols=["pk_p"], reducer=compound_reduce_bucketed,
            kind="compound", reducer_bucketed=True,
        )
    assert _rows(read_state(spark, a)) == _rows(read_state(spark, b))
