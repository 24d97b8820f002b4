import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_apache_cassandra_spark.session import get_spark
from cdc_apache_cassandra_spark.streaming.protoshim import ensure_protobuf

# Must run BEFORE the first SparkSession: Python workers inherit the
# JVM's environment, so the vendored protobuf wire-format shim has to be
# on PYTHONPATH when the JVM starts for transformWithState workers to
# find it (no-op where the real protobuf wheel is installed).
PROTOBUF_MODE = ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdc-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
