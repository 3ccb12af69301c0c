"""Tests for the user-transformation UDF surface (P12) and tracking-plan
validation (P14).
"""

import json

import pyspark.sql.functions as F

from rudder_server_spark.functions.user_transform import (
    apply_user_transform,
    register_transform,
)
from rudder_server_spark.operators.trackingplan import validate_tracking_plan


def _events(spark):
    rows = [
        ("m1", json.dumps({"type": "track", "properties": {"price": 10.0}})),
        ("m2", json.dumps({"type": "track", "properties": {"price": -1.0}})),
        ("m3", json.dumps({"type": "track", "properties": {}})),
        ("m4", None),
    ]
    return spark.createDataFrame(rows, "message_id string, payload string")


def test_user_transform_ok_drop_fail(spark):
    def fn(ev):
        if ev is None:
            raise ValueError("no payload")
        price = ev.get("properties", {}).get("price")
        if price is None:
            return None  # drop
        if price < 0:
            raise ValueError("negative price")
        ev["properties"]["price_cents"] = int(price * 100)
        return ev

    ok, failed = apply_user_transform(_events(spark), fn)
    ok_rows = {r["message_id"]: json.loads(r["payload"]) for r in ok.collect()}
    assert set(ok_rows) == {"m1"}
    assert ok_rows["m1"]["properties"]["price_cents"] == 1000

    f = {r["message_id"]: r["error"] for r in failed.collect()}
    assert set(f) == {"m2", "m4"}
    assert "negative price" in f["m2"]
    # m3 dropped silently (None), not failed


def test_user_transform_registry(spark):
    register_transform("noop-ws1", lambda ev: ev)
    ok, failed = apply_user_transform(_events(spark).limit(2), "noop-ws1")
    assert ok.count() == 2 and failed.count() == 0


def test_tracking_plan_validation(spark):
    rows = [
        ("m1", "Order Completed", json.dumps({"properties": {"price": 5.0}})),
        ("m2", "Order Completed", json.dumps({"properties": {"price": "abc"}})),
        ("m3", "Mystery Event", json.dumps({"properties": {}})),
    ]
    df = spark.createDataFrame(rows, "message_id string, event_name string, payload string")
    plan = {
        "required": ["properties.price"],
        "types": {"properties.price": "number"},
        "allowed_events": ["Order Completed", "Product Viewed"],
    }
    out = {r["message_id"]: list(r["violation_errors"])
           for r in validate_tracking_plan(df, plan).collect()}
    assert out["m1"] == []
    assert out["m2"] == ["type mismatch: properties.price must be number"]
    assert out["m3"] == [
        "missing required property: properties.price",
        "event not in tracking plan: Mystery Event",
    ]

    kept = validate_tracking_plan(df, plan, drop_invalid=True)
    assert [r["message_id"] for r in kept.collect()] == ["m1"]


def test_hydrate_sources_gated_and_isolated(spark):
    """P15 (src_hydration_stage.go:51-180): only hydration-enabled
    sources' events reach the hydrator; other sources pass through
    byte-identical; a hydrator exception fails that event only (the
    reference's hydration-failure report), and fail_on_error escalates."""
    import json

    import pytest

    from rudder_server_spark.functions.user_transform import hydrate_sources

    rows = [
        ("m1", "src-h", json.dumps({"type": "track", "v": 1})),
        ("m2", "src-h", json.dumps({"type": "track", "boom": True})),
        ("m3", "src-plain", json.dumps({"type": "track", "v": 3})),
    ]
    df = spark.createDataFrame(rows, "message_id string, source_id string, payload string")

    def hydrator(ev):
        if ev.get("boom"):
            raise ValueError("upstream 500")
        ev["context"] = {"hydrated": True}
        return ev

    out, failed = hydrate_sources(df, {"src-h"}, hydrator)
    got = {r["message_id"]: json.loads(r["payload"]) for r in out.collect()}
    assert got["m1"]["context"] == {"hydrated": True}
    assert "context" not in got["m3"]  # passthrough untouched
    assert "m2" not in got
    f = failed.collect()
    assert len(f) == 1 and f[0]["message_id"] == "m2" and "upstream 500" in f[0]["error"]

    with pytest.raises(RuntimeError, match="upstream 500"):
        hydrate_sources(df, {"src-h"}, hydrator, fail_on_error=True)

    # no hydration sources: pure passthrough, empty failed frame
    out2, failed2 = hydrate_sources(df, set(), hydrator)
    assert out2.count() == 3 and failed2.count() == 0
