"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(the driver re-runs the same comparison at sf0.01)."""

import duckdb
import pytest

from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.sources.registry import TABLES
from tools.oracle_check import check

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, duck, name):
    ok, msg = check(spark, duck, name, SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
