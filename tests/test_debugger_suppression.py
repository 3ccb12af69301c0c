"""Tests: live-events debugger buffer/upload and the suppression store.

Mirrors services/debugger/destination/eventDeliveryStatusUploader_test.go
(enabled-gate, grouping, version tag), cache/internal/memory semantics
(size cap, TTL, latest-wins) and enterprise/suppress-user/syncer_test.go +
suppression-backup-service/exporter (fold, cancel, export/restore, token).
"""

import datetime

from pyspark.sql import functions as F

from rudder_server_spark.operators.debugger import (
    delivery_status_upload,
    live_events_buffer,
)
from rudder_server_spark.sources import suppression_store as SS

NOW = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _statuses(spark):
    rows = []
    for i in range(10):
        rows.append(
            (
                f"dst-{i % 2}",
                f"msg-{i:03d}",
                "failed" if i % 3 == 0 else "succeeded",
                i % 3,
                "429" if i % 3 == 0 else "200",
                NOW - datetime.timedelta(minutes=i),
            )
        )
    # one stale event beyond the 3h TTL for an enabled key
    rows.append(("dst-0", "msg-old", "failed", 1, "500", NOW - datetime.timedelta(hours=5)))
    return spark.createDataFrame(
        rows,
        "destination_id string, message_id string, job_state string,"
        " attempt_num int, error_code string, sent_at timestamp",
    )


def test_buffer_gates_caps_and_expires(spark):
    enabled = spark.createDataFrame([("dst-0",)], "destination_id string")
    buf = live_events_buffer(_statuses(spark), enabled, size=3, now=NOW).collect()
    # only the enabled destination, only the newest 3, stale row expired
    assert {r["destination_id"] for r in buf} == {"dst-0"}
    assert sorted(r["message_id"] for r in buf) == ["msg-000", "msg-002", "msg-004"]
    ranks = {r["message_id"]: r["rank"] for r in buf}
    assert ranks["msg-000"] == 1  # newest first


def test_buffer_uses_window_group_limit(spark):
    """The per-key cap must plan as WindowGroupLimit (no global sort of
    the corpus) — the bounded-key live-tail at 100 TB."""
    enabled = spark.createDataFrame([("dst-0",), ("dst-1",)], "destination_id string")
    buf = live_events_buffer(_statuses(spark), enabled, size=3, now=NOW)
    plan = buf._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_delivery_status_upload_contract(spark):
    import json

    enabled = spark.createDataFrame([("dst-0",), ("dst-1",)], "destination_id string")
    buf = live_events_buffer(_statuses(spark), enabled, size=2, now=NOW)
    up = {r["destination_id"]: r for r in delivery_status_upload(buf).collect()}
    assert set(up) == {"dst-0", "dst-1"}
    assert all(r["version"] == "v2" for r in up.values())
    sts = json.loads(up["dst-0"]["statuses"])
    assert [s["message_id"] for s in sts] == ["msg-000", "msg-002"]  # newest first
    assert up["dst-0"]["n_buffered"] == 2


# ------------------------------------------------------------- suppression

def _updates(spark):
    t = lambda m: NOW + datetime.timedelta(minutes=m)  # noqa: E731
    rows = [
        # u1 suppressed, then canceled later -> inactive
        ("w1", "u1", ["s1"], False, t(0)),
        ("w1", "u1", ["s1"], True, t(5)),
        # u2 suppressed on all sources (empty list)
        ("w1", "u2", [], False, t(1)),
        # u3: cancel arrives BEFORE a newer re-add -> active with new sources
        ("w1", "u3", ["s1"], True, t(2)),
        ("w1", "u3", ["s2"], False, t(3)),
        # same-instant cancel + re-add resolves to canceled (conservative)
        ("w2", "u4", ["s1"], False, t(4)),
        ("w2", "u4", ["s1"], True, t(4)),
    ]
    return spark.createDataFrame(
        rows,
        "workspace_id string, user_id string, source_ids array<string>,"
        " canceled boolean, created_at timestamp",
    )


def test_fold_suppressions(spark):
    state = {
        (r["workspace_id"], r["user_id"]): r["source_ids"]
        for r in SS.fold_suppressions(_updates(spark)).collect()
    }
    assert state == {("w1", "u2"): [], ("w1", "u3"): ["s2"]}


def test_sync_add_is_incremental_and_idempotent(spark):
    ups = _updates(spark)
    first = ups.where(F.col("created_at") <= F.lit(NOW + datetime.timedelta(minutes=2)))
    rest = ups.where(F.col("created_at") > F.lit(NOW + datetime.timedelta(minutes=2)))
    inc = SS.sync_add(SS.fold_suppressions(first), rest)
    full = SS.fold_suppressions(ups)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # replaying the same page is a no-op (badger-upsert parity)
    again = SS.sync_add(inc, rest)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, full.collect()))


def test_export_restore_roundtrip(spark, tmp_path):
    state = SS.fold_suppressions(_updates(spark))
    token = SS.export_suppressions(state, str(tmp_path))
    assert token == str(NOW + datetime.timedelta(minutes=3))
    restored, rtoken = SS.restore_suppressions(spark, str(tmp_path))
    assert rtoken == token
    a = sorted((r["workspace_id"], r["user_id"]) for r in restored.collect())
    b = sorted((r["workspace_id"], r["user_id"]) for r in state.collect())
    assert a == b


# -------------------------------------------- gjson-parity property test

def test_redis_hmset_gjson_parity_property(spark):
    """Differential fuzz: redis_kv_shape's HMSET rows must equal the Go
    reference semantics (EventToKeyValue, kvstoremanager.go:52-61 —
    fields[k] = gjson v.Str: the string content for JSON strings, ''
    for numbers/bools/null/containers) over random field objects."""
    import json

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from rudder_server_spark.operators.kv_destinations import redis_kv_shape

    val = st.one_of(
        st.text(alphabet="abc é\"\\", max_size=6),
        st.integers(-10**6, 10**6),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.booleans(),
        st.none(),
        st.lists(st.integers(0, 3), max_size=2),
        st.dictionaries(st.sampled_from(["x", "y"]), st.integers(0, 3), max_size=2),
    )
    fields = st.dictionaries(
        st.text(alphabet="abcdef_", min_size=1, max_size=6), val,
        min_size=1, max_size=5,
    )

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(fields)
    def check(f):
        doc = json.dumps({"message": {"key": "k", "fields": f}})
        got = {
            r["field"]: r["value"]
            for r in redis_kv_shape(_fr(doc)).collect()
        }
        want = {k: (v if isinstance(v, str) else "") for k, v in f.items()}
        assert got == want, (got, want, doc)

    _fr = lambda d: spark.createDataFrame([(d,)], "json_data string")  # noqa: E731
    check()
