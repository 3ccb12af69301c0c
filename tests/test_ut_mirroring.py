"""UT mirroring sanity-comparison contracts — mirrors the reference's
processor/types EqualDetailed semantics (types.go:266-312,451-480) and the
processor.go mirroring block's stat classes (:3225-3400)."""

from rudder_server_spark.operators.ut_mirroring import (
    ut_mirror_compare,
    ut_mirror_stats,
)


def _resp(spark, rows):
    return spark.createDataFrame(
        rows,
        "transformation_id string, message_id string, output_json string, "
        "status_code int, error string",
    )


def test_strict_lax_and_missing(spark):
    primary = _resp(
        spark,
        [
            ("t1", "m1", '{"a":1,"ts":"2024-01-30T10:00:00Z"}', 200, ""),
            ("t1", "m2", '{"a":2,"ts":"2024-01-30T10:00:00Z"}', 200, ""),
            ("t1", "m3", '{"a":3}', 200, ""),
            ("t1", "m4", '{"a":4}', 200, ""),
        ],
    )
    mirror = _resp(
        spark,
        [
            # m1 identical -> strict
            ("t1", "m1", '{"a":1,"ts":"2024-01-30T10:00:00Z"}', 200, ""),
            # m2 datetime shifted, both match the pattern -> lax only
            ("t1", "m2", '{"a":2,"ts":"2024-01-30T11:22:33Z"}', 200, ""),
            # m3 value differs -> different
            ("t1", "m3", '{"a":99}', 200, ""),
            # m4 missing from mirror
        ],
    )
    got = {
        r["message_id"]: r
        for r in ut_mirror_compare(primary, mirror).collect()
    }
    assert got["m1"]["strict_eq"] and got["m1"]["lax_eq"]
    assert not got["m2"]["strict_eq"] and got["m2"]["lax_eq"]
    assert not got["m3"]["strict_eq"] and not got["m3"]["lax_eq"]
    assert got["m4"]["in_primary"] and not got["m4"]["in_mirror"]
    assert not got["m4"]["strict_eq"] and not got["m4"]["lax_eq"]


def test_datetime_forgiven_at_depth_and_status_not_forgiven(spark):
    # responseValuesEqual recurses: a datetime INSIDE a nested object is
    # still forgiven; statusCode/error differences never are
    primary = _resp(
        spark,
        [
            ("t1", "m1", '{"ctx":{"seen":"2024-01-30T10:00:00.123Z"}}', 200, ""),
            ("t1", "m2", '{"a":1}', 200, ""),
            ("t1", "m3", '{"a":1}', 400, "boom"),
        ],
    )
    mirror = _resp(
        spark,
        [
            ("t1", "m1", '{"ctx":{"seen":"2024-02-02 01:02:03"}}', 200, ""),
            ("t1", "m2", '{"a":1}', 500, ""),
            ("t1", "m3", '{"a":1}', 400, "different error"),
        ],
    )
    got = {
        r["message_id"]: r
        for r in ut_mirror_compare(primary, mirror).collect()
    }
    # the pattern allows space-separated and offset-less forms (types.go)
    assert not got["m1"]["strict_eq"] and got["m1"]["lax_eq"]
    assert not got["m2"]["lax_eq"]
    assert not got["m3"]["lax_eq"]


def test_stats_rollup_and_filtered_short_circuit(spark):
    primary = _resp(
        spark,
        [
            ("t1", "m1", '{"a":1}', 200, ""),
            ("t1", "m2", '{"a":2,"ts":"2024-01-30T10:00:00Z"}', 200, ""),
            ("t1", "m3", '{"a":3,"b":7}', 200, ""),
            ("t2", "m4", '{"a":4}', 200, ""),
            ("t3", "m5", '{"a":5}', 200, ""),
        ],
    )
    mirror = _resp(
        spark,
        [
            ("t1", "m1", '{"a":1}', 200, ""),
            ("t1", "m2", '{"a":2,"ts":"2024-01-31T00:00:00Z"}', 200, ""),
            ("t1", "m3", '{"a":30,"b":8}', 200, ""),
            ("t2", "m4", '{"a":4}', 200, ""),
            ("t3", "m5", '{"a":999}', 200, ""),
        ],
    )
    filtered = spark.createDataFrame([("t3",)], "transformation_id string")
    cmp = ut_mirror_compare(primary, mirror)
    got = {
        r["transformation_id"]: r
        for r in ut_mirror_stats(cmp, filtered=filtered).collect()
    }
    t1 = got["t1"]
    assert t1["n_events"] == 3 and t1["n_equal_strict"] == 1
    assert t1["n_datetime_forgiven"] == 1 and t1["n_different"] == 1
    assert t1["verdict"] == "different"
    # m3 disagrees on BOTH a and b -> per-field digest, sorted
    assert t1["mismatch_fields"] == "a:1,b:1"
    t2 = got["t2"]
    assert t2["verdict"] == "equal" and t2["mismatch_fields"] == ""
    # the lax-only batch verdict when nothing differs
    assert got["t3"]["verdict"] == "mirror_filtered"
    assert got["t3"]["n_different"] == 0 and got["t3"]["mismatch_fields"] == ""


def test_stats_datetime_forgiven_verdict(spark):
    primary = _resp(
        spark, [("t1", "m1", '{"ts":"2024-01-30T10:00:00Z"}', 200, "")]
    )
    mirror = _resp(
        spark, [("t1", "m1", '{"ts":"2024-01-30T12:00:00Z"}', 200, "")]
    )
    row = ut_mirror_stats(ut_mirror_compare(primary, mirror)).head()
    assert row["verdict"] == "equal_datetime_forgiven"
    assert row["n_datetime_forgiven"] == 1 and row["mismatch_fields"] == ""
