"""Contract tests: streammanager shapes (kinesis/lambda/eventbridge), the
Redis KV destination shape, and the warehouse upload archiver.

Mirrors the reference's manager tests:
  - services/streammanager/kinesis/kinesis_suite_test.go (partition-key
    precedence, empty-payload 400),
  - services/streammanager/lambda/lambdamanager_test.go (invalid payload,
    default invocationType, clientContext),
  - services/streammanager/eventbridge/eventbridgemanager_test.go
    (required-entry-field failures),
  - services/kvstoremanager/kvstoremanager.go:52-79 (EventToKeyValue gjson
    .Str semantics, HSET-compatible detection),
  - warehouse/archive/archiver_test.go (eligibility, idempotent flag).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from rudder_server_spark.operators import kv_destinations as KV
from rudder_server_spark.operators import wh_archive as WA
from rudder_server_spark.sources import streammanager as SM


def _frame(spark, docs):
    return spark.createDataFrame([(d,) for d in docs], "json_data string")


# ------------------------------------------------------------------ kinesis

def test_kinesis_partition_key_precedence(spark):
    docs = [
        '{"message":{"messageId":"m-1","a":1},"userId":"u-1"}',
        '{"message":{"a":2},"userId":"u-2"}',  # no messageId -> userId
        '{"message":{"messageId":"","a":3},"userId":"u-3"}',  # empty -> userId
    ]
    out = SM.kinesis_shape(
        _frame(spark, docs), {"stream": "s1", "useMessageID": True}
    ).collect()
    assert [r["partition_key"] for r in out] == ["m-1", "u-2", "u-3"]
    assert all(r["stream"] == "s1" and r["error"] is None for r in out)
    # without useMessageID the messageId is ignored (kinesismanager.go:89-95)
    out2 = SM.kinesis_shape(_frame(spark, docs[:1]), {"stream": "s1"}).collect()
    assert out2[0]["partition_key"] == "u-1"


def test_kinesis_error_rows(spark):
    out = SM.kinesis_shape(
        _frame(spark, ['{"userId":"u-1"}']), {"stream": "s1"}
    ).collect()
    assert out[0]["error"] == "Empty Payload" and out[0]["data"] is None
    out2 = SM.kinesis_shape(_frame(spark, ['{"message":{"a":1}}']), {}).collect()
    assert out2[0]["error"] == "stream is required for Kinesis"


def test_kinesis_data_is_message_subtree(spark):
    import json

    out = SM.kinesis_shape(
        _frame(spark, ['{"message":{"a":1,"b":"x"},"userId":"u"}']),
        {"stream": "s"},
    ).collect()[0]
    assert json.loads(bytes(out["data"]).decode()) == {"a": 1, "b": "x"}


# ------------------------------------------------------------------- lambda

def test_lambda_shape_contract(spark):
    docs = ['{"payload":"evt-1"}', '{"payload":""}', "{}"]
    out = SM.lambda_shape(
        _frame(spark, docs), {"lambda": "fn", "clientContext": "ctx"}
    ).collect()
    assert out[0]["function_name"] == "fn"
    assert out[0]["invocation_type"] == "Event"  # default (lambdamanager.go:67-69)
    assert out[0]["client_context"] == "ctx"
    assert out[0]["invoke_payload"] == "evt-1"
    assert out[1]["error"] == "Invalid payload"
    assert out[2]["error"] == "Invalid payload"
    dry = SM.lambda_shape(
        _frame(spark, docs[:1]), {"lambda": "fn", "invocationType": "RequestResponse"}
    ).collect()[0]
    assert dry["invocation_type"] == "RequestResponse"
    nofn = SM.lambda_shape(_frame(spark, docs[:1]), {}).collect()[0]
    assert nofn["error"] == "lambda function is required"


# -------------------------------------------------------------- eventbridge

def test_eventbridge_required_fields(spark):
    full = (
        '{"detail":"{\\"k\\":1}","detailType":"dt","source":"src",'
        '"eventBusName":"bus","resources":["r1","r2"]}'
    )
    out = SM.eventbridge_shape(_frame(spark, [full])).collect()[0]
    assert out["error"] is None
    assert out["detail_type"] == "dt" and out["source"] == "src"
    assert out["event_bus_name"] == "bus" and out["resources"] == ["r1", "r2"]

    for missing, msg in [
        ('{"detailType":"dt","source":"s"}', "Detail is required for EventBridge"),
        ('{"detail":"d","source":"s"}', "DetailType is required for EventBridge"),
        ('{"detail":"d","detailType":"dt"}', "Source is required for EventBridge"),
    ]:
        r = SM.eventbridge_shape(_frame(spark, [missing])).collect()[0]
        assert r["error"] == msg


# ----------------------------------------------------------- producer seam

def test_publish_stream_seam(spark):
    shaped = SM.kinesis_shape(
        _frame(spark, ['{"message":{"a":1},"userId":"u"}', '{"userId":"u2"}']),
        {"stream": "s"},
    )
    got = {}

    def producer(df):
        got["cols"] = df.columns
        got["rows"] = df.count()

    failed = SM.publish_stream(shaped, SM.KINESIS_CONTRACT, producer=producer)
    assert got["cols"] == SM.KINESIS_CONTRACT and got["rows"] == 1
    assert failed.count() == 1
    with pytest.raises(NotImplementedError):
        SM.publish_stream(shaped, SM.KINESIS_CONTRACT)


# ----------------------------------------------------------------- redis KV

def test_redis_hmset_gjson_string_semantics(spark):
    # EventToKeyValue: fields map keeps v.Str — "" for numbers/null/bools/
    # containers (kvstoremanager.go:52-61)
    doc = (
        '{"message":{"key":"user:1","fields":'
        '{"email":"a@b.c","age":25,"plan":null,"vip":true,"nested":{"x":1}}}}'
    )
    out = KV.redis_kv_shape(_frame(spark, [doc])).collect()
    vals = {r["field"]: r["value"] for r in out}
    assert vals == {"email": "a@b.c", "age": "", "plan": "", "vip": "", "nested": ""}
    assert all(r["op"] == "HMSET" and r["key"] == "user:1" and r["error"] is None for r in out)


def test_redis_hset_compatible_event(spark):
    doc = '{"message":{"hash":"h:u1","key":"k1","value":"v1","fields":{"x":"y"}}}'
    out = KV.redis_kv_shape(_frame(spark, [doc])).collect()
    # HSET wins over HMSET when hash/key/value all present (customdestinationmanager.go:141-144)
    assert len(out) == 1
    r = out[0]
    assert (r["op"], r["key"], r["field"], r["value"]) == ("HSET", "h:u1", "k1", "v1")


def test_redis_setjson_mode_and_errors(spark):
    # ShouldSendDataAsJSON gates on useJSONModule (redis.go:253-261);
    # the JSONSet args are (message.key, message.path, message.value)
    # straight off the document (extractJSONSetArgs, redis.go:226-236)
    doc = '{"message":{"key":"k9","path":"traits.plan","value":{"a":"b"}}}'
    out = KV.redis_kv_shape(
        _frame(spark, [doc]), {"useJSONModule": True}
    ).collect()[0]
    assert out["op"] == "SETJSON" and out["key"] == "k9"
    assert out["field"] == "traits.plan" and out["value"] == '{"a":"b"}'
    assert out["error"] is None
    # empty path -> root insert (field NULL)
    root = KV.redis_kv_shape(
        _frame(spark, ['{"message":{"key":"k1","value":7}}']),
        {"useJSONModule": True},
    ).collect()[0]
    assert root["field"] is None and root["value"] == "7"
    # no key -> error row, kept-with-status
    nokey = KV.redis_kv_shape(
        _frame(spark, ['{"message":{"value":1}}']), {"useJSONModule": True}
    ).collect()[0]
    assert nokey["error"] == "key is required"
    # no key / no fields -> error row, kept-with-status
    bad = KV.redis_kv_shape(_frame(spark, ['{"message":{"other":1}}'])).collect()
    assert len(bad) == 1 and bad[0]["error"] is not None and bad[0]["op"] is None


def test_redis_hset_presence_not_nonnull(spark):
    # IsHSETCompatibleEvent uses gjson Exists(): message.value:null is
    # PRESENT and extracts as "" (kvstoremanager.go:64-79) — must route to
    # HSET(""), not fall through to HMSET
    doc = '{"message":{"hash":"h1","key":"k1","value":null,"fields":{"a":"b"}}}'
    out = KV.redis_kv_shape(_frame(spark, [doc])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["op"], r["key"], r["field"], r["value"]) == ("HSET", "h1", "k1", "")
    assert r["error"] is None
    # absent value key -> NOT HSET-compatible -> HMSET of fields
    doc2 = '{"message":{"hash":"h1","key":"k1","fields":{"a":"b"}}}'
    out2 = KV.redis_kv_shape(_frame(spark, [doc2])).collect()
    assert [r["op"] for r in out2] == ["HMSET"]


def test_kv_final_state_last_write_wins(spark):
    df = spark.createDataFrame(
        [
            (1, '{"message":{"key":"u1","fields":{"plan":"free"}}}'),
            (2, '{"message":{"key":"u1","fields":{"plan":"pro"}}}'),
        ],
        "job_id long, json_data string",
    )
    shaped = KV.redis_kv_shape(df)
    state = {(r["key"], r["field"]): r["value"] for r in KV.kv_final_state(shaped).collect()}
    assert state == {("u1", "plan"): "pro"}


def test_send_kv_seam(spark):
    shaped = KV.redis_kv_shape(
        _frame(spark, ['{"message":{"key":"u1","fields":{"a":"b"}}}', "{}"])
    )
    seen = {}

    def writer(df):
        seen["n"] = df.count()
        seen["cols"] = df.columns

    failed = KV.send_kv(shaped, writer=writer)
    assert seen == {"n": 1, "cols": ["op", "key", "field", "value"]}
    assert failed.count() == 1
    with pytest.raises(NotImplementedError):
        KV.send_kv(shaped)


# ---------------------------------------------------------------- archiver

NOW = datetime.datetime(2024, 3, 1)


def _wh_frames(spark):
    uploads = spark.createDataFrame(
        [
            # upload_id, source, dest, status, created_at, workspace, metadata
            ("u1", "s1", "d1", "exported_data", datetime.datetime(2024, 1, 1), "w1", "{}"),
            ("u2", "s1", "d1", "exported_data", datetime.datetime(2024, 2, 28), "w1", "{}"),  # too new
            ("u3", "s1", "d2", "exporting", datetime.datetime(2024, 1, 1), "w1", "{}"),  # wrong status
            ("u4", "s2", "d1", "exported_data", datetime.datetime(2024, 1, 1), "w1",
             '{"archivedStagingAndLoadFiles":true}'),  # already archived
            ("u5", "s2", "d2", "exported_data", datetime.datetime(2024, 1, 1), "", "{}"),  # empty ws
            ("u6", "s3", "d1", "exported_data", datetime.datetime(2024, 1, 1), "w-degraded", "{}"),
        ],
        "upload_id string, source_id string, destination_id string, status string,"
        " created_at timestamp, workspace_id string, metadata string",
    )
    staging = spark.createDataFrame(
        [(i, u) for u, n in [("u1", 3), ("u2", 2), ("u4", 1)] for i in range(n)],
        "id long, upload_id string",
    )
    load = spark.createDataFrame(
        [(i, u) for u, n in [("u1", 5), ("u2", 1)] for i in range(n)],
        "id long, upload_id string",
    )
    return uploads, staging, load


def test_archive_eligibility_and_stats(spark):
    uploads, staging, load = _wh_frames(spark)
    res = WA.archive_uploads(
        uploads, staging, load, NOW, days=7, skip_workspaces=("w-degraded",)
    )
    assert [r["upload_id"] for r in res["selected"].collect()] == ["u1"]
    stats = res["stats"].collect()[0]
    assert stats["archived_staging_files"] == 3 and stats["archived_load_files"] == 5
    # hot tables lose exactly u1's rows
    assert res["staging"].count() == 3 and res["load"].count() == 1
    assert res["dump"].count() == 3


def test_archive_flag_makes_rerun_noop(spark, tmp_path):
    uploads, staging, load = _wh_frames(spark)
    res = WA.archive_uploads(
        uploads, staging, load, NOW, days=7,
        skip_workspaces=("w-degraded",), dump_dir=str(tmp_path / "dump"),
    )
    meta = {
        r["upload_id"]: r["metadata"] for r in res["uploads"].collect()
    }
    assert '"archivedStagingAndLoadFiles":true' in meta["u1"]
    assert meta["u2"] == "{}"
    # the dump landed partitioned by upload_id, sorted by id
    dumped = spark.read.parquet(str(tmp_path / "dump"))
    assert dumped.count() == 3
    assert {r["upload_id"] for r in dumped.select("upload_id").collect()} == {"u1"}
    # idempotence: re-running over the updated tables selects nothing
    res2 = WA.archive_uploads(
        res["uploads"], res["staging"], res["load"], NOW, days=7,
        skip_workspaces=("w-degraded",),
    )
    assert res2["selected"].count() == 0
    assert res2["staging"].count() == res["staging"].count()


def test_expire_uploads_retention(spark):
    uploads, _, _ = _wh_frames(spark)
    # 7-day retention deletes old exported uploads regardless of the flag
    left = WA.expire_uploads(uploads, NOW, retention_days=7, skip_workspaces=("w-degraded",))
    assert sorted(r["upload_id"] for r in left.collect()) == ["u2", "u3", "u5", "u6"]


# --------------------------------------------------- remaining stream managers

def test_firehose_shape(spark):
    docs = [
        '{"message":{"a":1},"deliveryStreamMapTo":"ds-1"}',
        '{"deliveryStreamMapTo":"ds-1"}',
        '{"message":{"a":1},"deliveryStreamMapTo":""}',
        '{"message":{"a":1}}',
    ]
    out = SM.firehose_shape(_frame(spark, docs)).collect()
    assert out[0]["delivery_stream"] == "ds-1" and out[0]["error"] is None
    import json
    assert json.loads(bytes(out[0]["data"]).decode()) == {"a": 1}
    assert out[1]["error"] == "message from payload not found"
    assert out[2]["error"] == "Delivery Stream not found"
    assert out[3]["error"] == "Delivery Stream not found"


def test_wunderkind_shape(spark):
    out = SM.wunderkind_shape(
        _frame(spark, ['{"payload":"p1"}', '{"payload":""}']),
        {"WUNDERKIND_LAMBDA": "wk-fn"},
    ).collect()
    # invocation type is PINNED RequestResponse (wunderkind_utils.go:4)
    assert out[0]["function_name"] == "wk-fn"
    assert out[0]["invocation_type"] == "RequestResponse"
    assert out[0]["invoke_payload"] == "p1"
    assert out[1]["error"] == "Invalid payload"
    noenv = SM.wunderkind_shape(_frame(spark, ['{"payload":"p"}'])).collect()[0]
    assert noenv["error"] == "wunderkind lambda is required"


def test_personalize_shape_dispatch(spark):
    docs = [
        '{"choice":"PutUsers","payload":"{\\"datasetArn\\":\\"d\\"}"}',
        '{"choice":"PutEvents","payload":"{\\"trackingId\\":\\"t-1\\"}"}',
        '{"choice":"PutItems"}',  # listed choice, missing payload -> 400
        '{"trackingId":"t-2","eventList":[]}',  # default: whole doc, PutEvents
    ]
    out = SM.personalize_shape(_frame(spark, docs)).collect()
    assert out[0]["api"] == "PutUsers" and out[0]["tracking_id"] is None
    assert out[1]["api"] == "PutEvents" and out[1]["tracking_id"] == "t-1"
    assert out[2]["error"] == "Could not unmarshal jsonData"
    assert out[3]["api"] == "PutEvents" and out[3]["tracking_id"] == "t-2"
    assert '"eventList"' in out[3]["request"]


def test_bqstream_shape_explodes_records(spark):
    docs = [
        '{"datasetId":"d1","tableId":"t1","properties":{"k":1}}',
        '{"datasetId":"d1","tableId":"t1","properties":[{"k":1},{"k":2}]}',
        '{"tableId":"t1","properties":{"k":1}}',
        '{"datasetId":"d1","tableId":"t1"}',
    ]
    out = SM.bqstream_shape(_frame(spark, docs)).collect()
    assert len(out) == 5  # 1 + 2 + 1 error + 1 error
    ok = [r for r in out if r["error"] is None]
    assert len(ok) == 3 and all(r["dataset_id"] == "d1" for r in ok)
    import json
    recs = sorted(json.loads(r["record"])["k"] for r in ok)
    assert recs == [1, 1, 2]
    errs = sorted(r["error"] for r in out if r["error"])
    assert errs == ["datasetId and tableId are required", "error in unmarshalling data"]


def test_googlesheets_shape_rows(spark):
    single = (
        '{"message":{"0":{"attributeKey":"Product","attributeValue":"Realme C3"},'
        '"1":{"attributeKey":"Value","attributeValue":5900}}}'
    )
    batched = (
        '{"batch":[{"message":{"0":{"attributeKey":"A","attributeValue":"x"}}},'
        '{"message":{"0":{"attributeKey":"A","attributeValue":"y"}}}]}'
    )
    out = SM.googlesheets_shape(_frame(spark, [single])).collect()
    cells = {r["position"]: r for r in out}
    assert cells[0]["attribute_key"] == "Product" and cells[0]["value_str"] == "Realme C3"
    assert cells[0]["value_num"] is None
    # numeric attributeValue keeps number type (gjson.Number branch)
    assert cells[1]["value_num"] == 5900.0
    bout = SM.googlesheets_shape(_frame(spark, [batched])).collect()
    got = sorted((r["batch_index"], r["value_str"]) for r in bout)
    assert got == [(0, "x"), (1, "y")]


def test_gcf_shape(spark):
    out = SM.gcf_shape(
        _frame(spark, ['{"a":1}']), {"googleCloudFunctionUrl": "https://fn"}
    ).collect()[0]
    assert out["function_url"] == "https://fn"
    assert bytes(out["body"]).decode() == '{"a":1}'
    bad = SM.gcf_shape(_frame(spark, ['{"a":1}'])).collect()[0]
    assert bad["error"] == "googleCloudFunctionUrl is required"


# ------------------------------------------------------------ edge hardening

def test_wrap_stream_event_identity_fallbacks(spark):
    df = spark.createDataFrame(
        [
            ('{"userId":"u1","anonymousId":"a1"}',),
            ('{"userId":"","anonymousId":"a2"}',),  # empty -> anonymousId
            ('{"type":"merge"}',),  # neither -> ""
        ],
        "payload string",
    )
    out = SM.wrap_stream_event(df).collect()
    import json
    uids = [json.loads(r["json_data"])["userId"] for r in out]
    assert uids == ["u1", "a2", ""]
    # message rides as the raw payload subtree
    assert json.loads(out[2]["json_data"])["message"] == {"type": "merge"}


def test_redis_empty_fields_object_is_error_row(spark):
    out = KV.redis_kv_shape(
        _frame(spark, ['{"message":{"key":"u1","fields":{}}}'])
    ).collect()
    assert len(out) == 1 and out[0]["op"] is None and out[0]["error"] is not None


def test_googlesheets_non_numeric_position_errors(spark):
    doc = '{"message":{"x":{"attributeKey":"A","attributeValue":"v"}}}'
    out = SM.googlesheets_shape(_frame(spark, [doc])).collect()
    assert len(out) == 1
    assert out[0]["position"] is None
    assert out[0]["error"] == "non-numeric message position"


def test_archive_dump_sorted_within_partitions(spark, tmp_path):
    """The reference's dump pages ORDER BY id (archiver.go:148-160) — pin
    that each written file is id-sorted."""
    import pyarrow.parquet as pq
    import glob as _glob

    uploads, staging, load = _wh_frames(spark)
    WA.archive_uploads(
        uploads, staging, load, NOW, days=7,
        skip_workspaces=("w-degraded",), dump_dir=str(tmp_path / "d"),
    )
    files = _glob.glob(str(tmp_path / "d" / "**" / "*.parquet"), recursive=True)
    assert files
    for f in files:
        ids = pq.read_table(f).column("id").to_pylist()
        assert ids == sorted(ids)


def test_stream_sink_foreachbatch_roundtrip(spark):
    """stream_sink generalizes kafka_sink to every manager: shape, publish
    error-free contract rows through the seam, route failures to on_error."""
    sent, errs = [], []

    def producer(df):
        sent.extend(df.collect())

    def on_error(df, epoch_id):
        errs.append((epoch_id, df.count()))

    sink = SM.stream_sink(
        SM.kinesis_shape, SM.KINESIS_CONTRACT, producer,
        dest_config={"stream": "s1", "useMessageID": True}, on_error=on_error,
    )
    batch = _frame(
        spark,
        ['{"message":{"messageId":"m1","a":1},"userId":"u1"}', '{"userId":"u2"}'],
    )
    sink(batch, epoch_id=7)
    assert len(sent) == 1 and sent[0]["partition_key"] == "m1"
    assert errs == [(7, 1)]
    # config-less manager (eventbridge) works through the same factory
    sent.clear(); errs.clear()
    sink2 = SM.stream_sink(
        SM.eventbridge_shape, SM.EVENTBRIDGE_CONTRACT, producer, on_error=on_error
    )
    sink2(_frame(spark, ['{"detail":"d","detailType":"t","source":"s"}']), 1)
    assert len(sent) == 1 and errs == [(1, 0)]
    # empty batch short-circuits without touching the producer
    sink2(_frame(spark, []).limit(0), 2)
    assert len(sent) == 1


# -------------------------------------------------- routed-document pruning

def test_routed_document_fields_whitelist_validates(spark):
    """A misspelled fields whitelist entry must fail fast (ADVICE r11):
    silently dropping it would NULL every read of that field and quietly
    move the consuming shape's 400 cohort."""
    src = spark.createDataFrame(
        [('{"type":"track","userId":"u"}', "track")],
        "payload string, event_type string",
    )
    # valid subset builds and carries exactly the whitelisted fields
    out = SM.routed_stream_document(
        src, as_struct=True, fields=frozenset({"message", "detailType"})
    )
    assert set(out.schema["json_data"].dataType.fieldNames()) == {
        "message", "detailType",
    }
    with pytest.raises(ValueError, match="detailtype"):
        SM.routed_stream_document(
            src, as_struct=True, fields=frozenset({"message", "detailtype"})
        )
