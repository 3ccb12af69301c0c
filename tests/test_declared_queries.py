"""Every declared query runs in Spark and (when an oracle exists) must match
DuckDB exactly at sf0.001 — the same comparison the driver applies at sf0.01.
"""

import os

import pytest

from rudder_server_spark.plans.registry import load_all
from tests.oracle import compare, duck_connect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query(name, spark, duck):
    qd = REGISTRY[name]
    df = qd.spark_fn(spark, SF_DIR)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only smoke (approximate operators)
        return
    # rudder oracles embed the sf0.01 fixture path; retarget to the test SF
    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    sql = qd.oracle.replace("rudder_events_sf0.01.parquet", f"rudder_events_{sf_name}.parquet")
    ok, msg = compare(df, duck, sql)
    assert ok, f"{name}: {msg}"
