"""Oracle output-type lint (VERDICT r2 next-round #2).

The driver hashes both engines' results including output types; DuckDB
HUGEINT (int128, from un-cast SUM over integers) and TIMESTAMP WITH TIME
ZONE (from to_timestamp) can never hash-match Spark's BIGINT / TIMESTAMP,
so an oracle emitting either is a guaranteed driver failure even when all
values agree — the exact defect behind every r1/r2 hash failure.

This lint DESCRIBEs every registered oracle (no Spark session needed, runs
in seconds) and fails on any banned output type, so the bug class cannot
re-enter the registry.
"""

import os

import pytest

from rudder_server_spark.plans.registry import load_all
from tests.oracle import banned_type_columns, duck_connect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()
ORACLES = {n: qd.oracle for n, qd in REGISTRY.items() if qd.oracle is not None}


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_hashable_types(name, duck):
    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    sql = ORACLES[name].replace(
        "rudder_events_sf0.01.parquet", f"rudder_events_{sf_name}.parquet"
    )
    banned = banned_type_columns(duck, sql)
    assert not banned, (
        f"{name}: oracle emits driver-unhashable DuckDB types {banned}; "
        "CAST integer aggregates to BIGINT and use TZ-free timestamp "
        "construction (make_timestamp), not to_timestamp()"
    )
