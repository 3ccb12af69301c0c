"""Warehouse index-length constraints (operators/constraints.py) — parity
pins mirroring reference warehouse/constraints/constraint_test.go plus the
slave-worker discard routing (worker.go:404-446, worker_job.go:577-615)."""

import pyspark.sql.functions as F  # noqa: F401

from rudder_server_spark.operators.constraints import (
    INDEX_CONSTRAINTS,
    apply_index_constraints,
)

# the exact lengths constraint_test.go uses: violating 299+298=597 > 512,
# non-violating 149+149=298 <= 512
VIOL_TYPE = "x" * 299
VIOL_VALUE = "y" * 298
OK_TYPE = "u" * 149
OK_VALUE = "w" * 149


def _merge_rules(spark, rows):
    return spark.createDataFrame(
        rows,
        "merge_property_1_type string, merge_property_1_value string, "
        "merge_property_2_type string, merge_property_2_value string, "
        "received_at string",
    )


def test_unsupported_destination_passes_through(spark):
    # constraint_test.go "Unsupported destination type" (RS)
    df = _merge_rules(spark, [(VIOL_TYPE, VIOL_VALUE, None, None, "t0")])
    loaded, discards = apply_index_constraints(
        df, "RS", "rudder_identity_merge_rules"
    )
    assert discards.count() == 0
    assert loaded.first()["merge_property_1_value"] == VIOL_VALUE


def test_bq_violates_index_constraint(spark):
    # constraint_test.go "Violates index constraint"
    df = _merge_rules(spark, [(VIOL_TYPE, VIOL_VALUE, None, None, "t0")])
    loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    d = discards.collect()
    assert len(d) == 1
    assert d[0]["column_name"] == "merge_property_1_value"
    assert d[0]["column_value"] == VIOL_VALUE
    assert d[0]["table_name"] == "rudder_identity_merge_rules"
    assert "should be less than 512" in d[0]["reason"]
    assert d[0]["row_id"].startswith("rudder-discards-")
    got = loaded.first()["merge_property_1_value"]
    assert got.startswith("rudder-discards-") and got != VIOL_VALUE
    # the row itself survives into the load table (worker.go keeps it)
    assert loaded.count() == 1


def test_bq_does_not_violate(spark):
    # constraint_test.go "Does not violates index constraint"
    df = _merge_rules(spark, [(OK_TYPE, OK_VALUE, None, None, "t0")])
    loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    assert discards.count() == 0
    assert loaded.first()["merge_property_1_value"] == OK_VALUE


def test_boundary_is_strictly_greater(spark):
    # violates() uses `> limit`: exactly 512 bytes passes
    df = _merge_rules(
        spark,
        [("a" * 256, "b" * 256, None, None, "t0"),
         ("a" * 256, "b" * 257, None, None, "t0")],
    )
    _loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    d = discards.collect()
    assert len(d) == 1 and d[0]["column_value"] == "b" * 257


def test_byte_length_not_char_length(spark):
    # Go len() counts UTF-8 BYTES: 200 three-byte chars (600 B) violate
    # even though char length (200) is far under the cap
    df = _merge_rules(spark, [("", "€" * 200, None, None, "t0")])
    _loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    assert discards.count() == 1


def test_property2_constraint_and_both_columns(spark):
    df = _merge_rules(
        spark, [(VIOL_TYPE, VIOL_VALUE, VIOL_TYPE, VIOL_VALUE, "t0")]
    )
    loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    cols = sorted(r["column_name"] for r in discards.collect())
    assert cols == ["merge_property_1_value", "merge_property_2_value"]
    row = loaded.first()
    assert row["merge_property_1_value"].startswith("rudder-discards-")
    assert row["merge_property_2_value"].startswith("rudder-discards-")


def test_snowflake_uppercase_identifiers(spark):
    df = spark.createDataFrame(
        [(VIOL_TYPE, VIOL_VALUE)],
        "MERGE_PROPERTY_1_TYPE string, MERGE_PROPERTY_1_VALUE string",
    )
    _loaded, discards = apply_index_constraints(
        df, "SNOWFLAKE", "RUDDER_IDENTITY_MERGE_RULES"
    )
    d = discards.collect()
    assert len(d) == 1 and d[0]["column_name"] == "MERGE_PROPERTY_1_VALUE"


def test_non_string_schema_columns_skipped(spark):
    # violates():108-110 — only string-typed index columns count; with
    # the type column declared int in the upload schema, 298 bytes of
    # value alone stays under the cap
    df = _merge_rules(spark, [(VIOL_TYPE, VIOL_VALUE, None, None, "t0")])
    _loaded, discards = apply_index_constraints(
        df,
        "BQ",
        "rudder_identity_merge_rules",
        schema={"merge_property_1_type": "int", "merge_property_1_value": "string"},
    )
    assert discards.count() == 0


def test_other_tables_untouched(spark):
    df = _merge_rules(spark, [(VIOL_TYPE, VIOL_VALUE, None, None, "t0")])
    loaded, discards = apply_index_constraints(df, "BQ", "identifies")
    assert discards.count() == 0
    assert loaded.first()["merge_property_1_value"] == VIOL_VALUE


def test_null_and_missing_columns_contribute_zero(spark):
    # NULL type + 400-byte value = 400 <= 512: no violation; and a frame
    # missing the prop-2 columns entirely only checks prop 1
    df = spark.createDataFrame(
        [(None, "v" * 400)],
        "merge_property_1_type string, merge_property_1_value string",
    )
    _loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    assert discards.count() == 0


def test_deterministic_identifier(spark):
    # documented divergence: identifier VALUE is md5-derived, stable
    # across evaluations (the reference's is random per call)
    df = _merge_rules(spark, [(VIOL_TYPE, VIOL_VALUE, None, None, "t0")])
    loaded, _ = apply_index_constraints(df, "BQ", "rudder_identity_merge_rules")
    a = loaded.first()["merge_property_1_value"]
    b = loaded.first()["merge_property_1_value"]
    assert a == b


def test_registry_shape_mirrors_reference():
    # constraint.go:39-74: two constraints per destination, limit 512
    for dest in ("BQ", "SNOWFLAKE"):
        ics = INDEX_CONSTRAINTS[dest]
        assert len(ics) == 2
        assert all(ic.limit == 512 for ic in ics)
        assert all(len(ic.index_columns) == 2 for ic in ics)


def test_received_at_fallback_now_when_absent(spark):
    # worker_job.go:586-589 — handleDiscardTypes falls back to now() when
    # the row has no received_at; discard rows are never NULL-timestamped
    df = spark.createDataFrame(
        [(VIOL_TYPE, VIOL_VALUE)],
        "merge_property_1_type string, merge_property_1_value string",
    )
    _loaded, discards = apply_index_constraints(
        df, "BQ", "rudder_identity_merge_rules"
    )
    d = discards.collect()
    assert len(d) == 1 and d[0]["received_at"] is not None


def test_received_at_lookup_is_case_insensitive(spark):
    # the Snowflake path carries uppercase identifiers — RECEIVED_AT must
    # resolve through the same case-insensitive map as the index columns
    df = spark.createDataFrame(
        [(VIOL_TYPE, VIOL_VALUE, "2024-01-01 00:00:00")],
        "MERGE_PROPERTY_1_TYPE string, MERGE_PROPERTY_1_VALUE string, "
        "RECEIVED_AT string",
    )
    _loaded, discards = apply_index_constraints(
        df, "SNOWFLAKE", "RUDDER_IDENTITY_MERGE_RULES"
    )
    d = discards.collect()
    assert len(d) == 1 and d[0]["received_at"] == "2024-01-01 00:00:00"
