"""S9 Kafka message shaping — mirrors the reference's kafka_test.go table
cases (topic precedence, multi-topic routing, userId fallback, schemaId
passthrough, missing-topic failure, retl timestamp fix-up). No broker in
this environment: the shaped DataFrame IS the testable contract; delivery
is df.write.format("kafka") with kafka_sink_options (documented)."""

import json

from rudder_server_spark.sources.kafka import kafka_shape, kafka_sink_options


def _df(spark, payloads):
    return spark.createDataFrame([(i, json.dumps(p)) for i, p in enumerate(payloads)],
                                 "i long, payload string")


def _shaped(spark, payloads, cfg=None):
    out = kafka_shape(_df(spark, payloads), cfg).orderBy("i").collect()
    return [r.asDict() for r in out]


def test_topic_resolution_precedence(spark):
    cfg = {
        "topic": "default-topic",
        "enableMultiTopic": True,
        "eventTypeToTopicMap": [{"from": "IDENTIFY", "to": "id-topic"}],
        "eventToTopicMap": [{"from": "Order Completed", "to": "order-topic"}],
    }
    rows = _shaped(spark, [
        # 1. integrations override beats everything (any canonical casing)
        {"type": "identify", "userId": "u1",
         "integrations": {"Kafka": {"topic": "override-topic"}}},
        # 2. multi-topic by event type
        {"type": "identify", "userId": "u2"},
        # 2b. multi-topic by track event name
        {"type": "track", "event": "Order Completed", "userId": "u3"},
        # 3. default topic fallback (track name not mapped)
        {"type": "track", "event": "Unmapped", "userId": "u4"},
    ], cfg)
    assert [r["topic"] for r in rows] == [
        "override-topic", "id-topic", "order-topic", "default-topic"
    ]
    assert all(r["error"] is None for r in rows)


def test_missing_topic_fails_event(spark):
    rows = _shaped(spark, [{"type": "track", "event": "X", "userId": "u1"}], {})
    assert rows[0]["topic"] is None and rows[0]["value"] is None
    assert rows[0]["error"] == "topic is required for Kafka destination"


def test_value_shape_userid_fallback_and_schemaid(spark):
    cfg = {"topic": "t"}
    rows = _shaped(spark, [
        {"type": "track", "event": "E", "userId": "u9", "properties": {"a": 1}},
        {"type": "track", "event": "E", "userId": "", "anonymousId": "anon-7",
         "integrations": {"KAFKA": {"schemaId": "s-1"}}},
    ], cfg)
    v0 = json.loads(bytes(rows[0]["value"]).decode())
    assert v0["topic"] == "t" and v0["userId"] == "u9"
    assert v0["message"]["properties"] == {"a": 1}  # nested JSON intact
    assert "schemaId" not in v0
    v1 = json.loads(bytes(rows[1]["value"]).decode())
    assert v1["userId"] == "anon-7"  # empty userId -> anonymousId (kafka.go:37-42)
    assert v1["schemaId"] == "s-1"
    assert bytes(rows[1]["key"]).decode() == "anon-7"


def test_retl_timestamp_fixup(spark):
    cfg = {"topic": "t"}
    rows = _shaped(spark, [
        # channel=sources identify: context.timestamp wins the priority list
        {"type": "identify", "channel": "sources", "userId": "u1",
         "context": {"timestamp": "2024-01-01T00:00:00Z"},
         "timestamp": "1999-01-01T00:00:00Z"},
        # track: properties.timestamp first
        {"type": "track", "event": "E", "channel": "sources", "userId": "u2",
         "properties": {"timestamp": "2024-02-02T00:00:00Z"}},
        # mappedToDestination set -> untouched
        {"type": "identify", "channel": "sources", "userId": "u3",
         "context": {"mappedToDestination": "true", "timestamp": "2024-03-03T00:00:00Z"},
         "timestamp": "1999-01-01T00:00:00Z"},
        # non-sources channel -> untouched
        {"type": "identify", "channel": "web", "userId": "u4",
         "context": {"timestamp": "2024-04-04T00:00:00Z"},
         "timestamp": "1999-01-01T00:00:00Z"},
    ], cfg)
    msgs = [json.loads(bytes(r["value"]).decode())["message"] for r in rows]
    assert msgs[0]["timestamp"] == "2024-01-01T00:00:00Z"
    assert msgs[1]["timestamp"] == "2024-02-02T00:00:00Z"
    assert msgs[2]["timestamp"] == "1999-01-01T00:00:00Z"
    assert msgs[3]["timestamp"] == "1999-01-01T00:00:00Z"
    # replace-in-place, not duplicate-append (utils.go:87-97 rebuilds the
    # map): a FIRST-key reader like get_json_object must see the new value
    raw0 = json.loads(bytes(rows[0]["value"]).decode(), object_pairs_hook=list)
    msg_keys = [k for k, _ in dict(raw0)["message"]] if False else [
        k for k, _ in [kv for kv in raw0 if kv[0] == "message"][0][1]
    ]
    assert msg_keys.count("timestamp") == 1


def test_retl_timestamp_preserves_json_type(spark):
    # utils.go copies the raw looked-up value: a numeric
    # properties.timestamp stays a number after the fix-up
    cfg = {"topic": "t"}
    rows = _shaped(spark, [
        {"type": "track", "event": "E", "channel": "sources", "userId": "u1",
         "properties": {"timestamp": 1700000000}, "timestamp": "old"},
    ], cfg)
    msg = json.loads(bytes(rows[0]["value"]).decode())["message"]
    assert msg["timestamp"] == 1700000000 and isinstance(msg["timestamp"], int)


def test_sink_options():
    opts = kafka_sink_options("broker:9092", {"kafka.security.protocol": "SSL"})
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["kafka.security.protocol"] == "SSL"


def test_pubsub_topic_precedence_and_attributes(spark):
    from rudder_server_spark.sources.kafka import pubsub_shape

    cfg = {
        "eventToTopicMap": [
            {"from": "Order Completed", "to": "order-topic"},
            {"from": "track", "to": "track-topic"},
            {"from": "*", "to": "all-topic"},
        ],
        "eventToAttributesMap": [
            {"from": "Order Completed", "to": "price"},
            {"from": "Order Completed", "to": "context.traits.email"},
            {"from": "*", "to": "plan"},
        ],
    }
    payloads = [
        # name match wins; price found under properties, email under context.traits
        {"type": "track", "event": "Order Completed", "userId": "u1",
         "properties": {"price": 12.5}, "context": {"traits": {"email": "a@x.com"}}},
        # no name match -> type match
        {"type": "track", "event": "Other", "userId": "u2"},
        # no name/type match -> wildcard topic + wildcard attributes
        {"type": "identify", "userId": "u3", "traits": {"plan": "pro"}},
        # no type -> failed
        {"event": "X", "userId": "u4"},
    ]
    rows = [r.asDict() for r in pubsub_shape(_df(spark, payloads), cfg).orderBy("i").collect()]
    assert [r["topic"] for r in rows] == ["order-topic", "track-topic", "all-topic", None]
    assert rows[3]["error"] == "type is required for event"

    a0 = json.loads(rows[0]["attributes"])
    assert a0 == {"price": "12.5", "email": "a@x.com"}  # last path segment keys
    assert json.loads(rows[2]["attributes"]) == {"plan": "pro"}
    v0 = json.loads(bytes(rows[0]["value"]).decode())
    assert v0["topicId"] == "order-topic" and v0["userId"] == "u1"
    assert v0["message"]["properties"]["price"] == 12.5


def test_pubsub_no_topic_map_fails(spark):
    from rudder_server_spark.sources.kafka import pubsub_shape

    rows = [
        r.asDict()
        for r in pubsub_shape(_df(spark, [{"type": "track", "event": "E"}]), {}).collect()
    ]
    assert rows[0]["error"] == "No topic set for this event"
    assert rows[0]["value"] is None


def test_publish_kafka_producer_contract(spark):
    """The injectable-producer seam (VERDICT r2 #7): publish_kafka hands
    the producer exactly the Spark-Kafka sink frame — error-free rows,
    columns (key binary, value binary, topic string) — with the full
    option map; shaping failures are returned, never sent."""
    from rudder_server_spark.sources.kafka import (
        kafka_shape,
        kafka_sink_options,
        publish_kafka,
    )

    shaped = kafka_shape(
        _df(spark, [{"type": "track", "event": "E", "userId": "u1"},
                    {"type": "track", "event": "E2", "userId": "u2"}]),
        {"topic": None, "enableMultiTopic": True,
         "eventToTopicMap": [{"from": "E", "to": "t-e"}]},
    )
    captured = {}

    def fake_producer(df, opts):
        captured["rows"] = [r.asDict() for r in df.orderBy("topic").collect()]
        captured["opts"] = opts
        captured["dtypes"] = dict(df.dtypes)

    failed = publish_kafka(
        shaped, kafka_sink_options("b:9092", {"kafka.acks": "all"}),
        producer=fake_producer,
    )
    assert captured["dtypes"] == {"key": "binary", "value": "binary", "topic": "string"}
    assert captured["opts"] == {"kafka.bootstrap.servers": "b:9092", "kafka.acks": "all"}
    assert len(captured["rows"]) == 1  # E2 has no topic -> not sent
    row = captured["rows"][0]
    assert row["topic"] == "t-e" and bytes(row["key"]).decode() == "u1"
    assert json.loads(bytes(row["value"]).decode())["userId"] == "u1"
    assert [r["i"] for r in failed.collect()] == [1]


def test_kafka_sink_foreachbatch_seam(spark):
    """Streaming S9 path: kafka_sink shapes the micro-batch, publishes
    through the seam, and routes shaping failures to on_error."""
    from rudder_server_spark.sources.kafka import kafka_sink

    sent, errs = [], []
    sink = kafka_sink(
        {"kafka.bootstrap.servers": "b:9092"},
        {"topic": "dflt"},
        producer=lambda df, opts: sent.extend(r.asDict() for r in df.collect()),
        on_error=lambda df, epoch: errs.extend((epoch, r["i"]) for r in df.collect()),
    )
    batch = _df(spark, [{"type": "track", "event": "X", "userId": "u9"}])
    sink(batch, epoch_id=7)
    assert len(sent) == 1 and sent[0]["topic"] == "dflt"
    assert errs == []  # default topic resolves everything
    # empty batch: producer not called
    n_before = len(sent)
    sink(batch.where("i < 0"), epoch_id=8)
    assert len(sent) == n_before
