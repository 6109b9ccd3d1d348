from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # modest parallelism for test latency; operators never depend on this
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from binaryvectordb_spark.session import get_spark
    s = get_spark("bvdb-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_harness import duck_con
    con = duck_con(SF_SMOKE)
    yield con
    con.close()
