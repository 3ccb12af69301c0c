"""Warehouse destination validations preflight — mirrors
warehouse/validations/steps.go (per-destination step lists),
validate.go:132-168 (first-failure-stops, {success,error,steps} shape),
and the loadTable column-limit gate."""

from rudder_server_spark.sources.validations import (
    VERIFYING_CONNECTIONS,
    VERIFYING_CREATE_AND_ALTER_TABLE,
    VERIFYING_CREATE_SCHEMA,
    VERIFYING_FETCH_SCHEMA,
    VERIFYING_LOAD_TABLE,
    VERIFYING_OBJECT_STORAGE,
    steps_to_validate,
    validate_destination,
)


def test_step_lists_per_destination_family():
    # steps_test.go table cases
    full = [s["name"] for s in steps_to_validate("POSTGRES")]
    assert full == [
        VERIFYING_OBJECT_STORAGE, VERIFYING_CONNECTIONS,
        VERIFYING_CREATE_SCHEMA, VERIFYING_CREATE_AND_ALTER_TABLE,
        VERIFYING_FETCH_SCHEMA, VERIFYING_LOAD_TABLE,
    ]
    assert [s["name"] for s in steps_to_validate("GCS_DATALAKE")] == [
        VERIFYING_OBJECT_STORAGE
    ]
    assert [s["name"] for s in steps_to_validate("S3_DATALAKE")] == [
        VERIFYING_OBJECT_STORAGE
    ]
    assert [s["name"] for s in steps_to_validate("S3_DATALAKE", use_glue=True)] == [
        VERIFYING_OBJECT_STORAGE, VERIFYING_CREATE_SCHEMA,
        VERIFYING_CREATE_AND_ALTER_TABLE, VERIFYING_FETCH_SCHEMA,
    ]
    # snowpipe-streaming: warehouse steps only, no object storage / load
    assert [s["name"] for s in steps_to_validate("SNOWPIPE_STREAMING")] == [
        VERIFYING_CONNECTIONS, VERIFYING_CREATE_SCHEMA,
        VERIFYING_CREATE_AND_ALTER_TABLE, VERIFYING_FETCH_SCHEMA,
    ]
    # ids are 1-based positions
    assert [s["id"] for s in steps_to_validate("POSTGRES")] == [1, 2, 3, 4, 5, 6]


def test_successful_preflight_all_steps_green(spark, tmp_path):
    res = validate_destination(spark, "POSTGRES", str(tmp_path / "stg"))
    assert res["success"] is True and res["error"] == ""
    assert all(s["success"] for s in res["steps"])
    assert len(res["steps"]) == 6


def test_datalake_preflight_runs_only_object_storage(spark, tmp_path):
    res = validate_destination(spark, "AZURE_DATALAKE", str(tmp_path / "stg"))
    assert res["success"] is True
    assert [s["name"] for s in res["steps"]] == [VERIFYING_OBJECT_STORAGE]


def test_unknown_destination_fails_connections_and_stops(spark, tmp_path):
    res = validate_destination(spark, "NOT_A_WAREHOUSE", str(tmp_path / "stg"))
    assert res["success"] is False
    assert "no warehouse manager" in res["error"]
    by_name = {s["name"]: s for s in res["steps"]}
    # object storage ran and passed; connections failed; later steps un-run
    assert by_name[VERIFYING_OBJECT_STORAGE]["success"] is True
    assert by_name[VERIFYING_CONNECTIONS]["success"] is False
    assert by_name[VERIFYING_CREATE_SCHEMA]["success"] is False
    assert by_name[VERIFYING_CREATE_SCHEMA]["error"] == ""


def test_column_limit_failure_at_load_step(spark, tmp_path):
    res = validate_destination(
        spark, "POSTGRES", str(tmp_path / "stg"), column_limit_override=2
    )
    # schema is id+val+val_alter = 3 columns > 2 -> loadTable step fails
    assert res["success"] is False
    assert "schema limit exceeded" in res["error"]
    by_name = {s["name"]: s for s in res["steps"]}
    assert by_name[VERIFYING_FETCH_SCHEMA]["success"] is True
    assert by_name[VERIFYING_LOAD_TABLE]["success"] is False
