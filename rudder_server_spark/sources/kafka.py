"""S9: event → Kafka message shaping (reference embedded kafka transformer,
processor/internal/transformer/destination_transformer/embedded/kafka/kafka.go).

The reference shapes each event into ``{message, userId, topic[, schemaId]}``
with per-event topic resolution (kafka.go:77-117):

  1. the event's ``integrations.{KAFKA|kafka|Kafka}.topic`` override
  2. multi-topic config (``enableMultiTopic``): identify/screen/page/group/
     alias route by ``eventTypeToTopicMap[type]``; track routes by
     ``eventToTopicMap[event]``
  3. the destination's default ``topic``
  4. none of the above → failed event ("topic is required")

plus the retl timestamp fix-up (embedded/utils.go:73-99): events from
``channel == "sources"`` without ``context.mappedToDestination`` get
``timestamp`` re-stamped from the first non-empty of a per-type field list.

Spark-first: ONE narrow projection producing exactly the columns Spark's
Kafka sink contract consumes — ``key`` (binary), ``value`` (binary JSON),
``topic`` — so delivery is literally ``shaped.write.format("kafka")
.option("kafka.bootstrap.servers", ...).save()``. No broker exists in this
environment, so that final call is left to deployment; the shaping (the
testable computation) is complete here. Rows that fail topic resolution
carry ``error`` instead (keep-with-status, like F7), for the proc_error
path. Everything is built-in column expressions — codegen'd, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# per-type timestamp source priority for retl events (embedded/utils.go:13-17)
_RETL_TS_FIELDS = {
    "identify": ["context.timestamp", "context.traits.timestamp", "traits.timestamp",
                 "timestamp", "originalTimestamp"],
    "track": ["properties.timestamp", "timestamp", "originalTimestamp"],
}


def _topic_map_expr(mapping: list | None, key: Column, lower_keys: bool) -> Column:
    """Config [{from,to}] list → chained lookup column (GetTopicMap,
    embedded/utils.go:20-50: blank 'from' entries skipped; first match wins
    via map semantics — later duplicates overwrite like Go's map build)."""
    entries: dict[str, str] = {}
    for m in mapping or []:
        frm, to = str(m.get("from", "")).strip(), m.get("to")
        if not frm or not isinstance(to, str):
            continue
        entries[frm.lower() if lower_keys else frm] = to
    if not entries:
        return F.lit(None).cast("string")
    pairs = [x for k, v in entries.items() for x in (F.lit(k), F.lit(v))]
    return F.element_at(F.create_map(*pairs), F.lower(key) if lower_keys else key)


def _nonempty(c: Column) -> Column:
    return F.when(c.isNotNull() & (c != ""), c)


def _json_str(c: Column) -> Column:
    """JSON-encode a string column (proper escaping; null → 'null') —
    to_json only takes containers, so encode through a 1-element array and
    strip the brackets."""
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - F.lit(2))


def kafka_shape(
    df: DataFrame,
    dest_config: dict | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Shape an event frame into Kafka sink rows.

    ``dest_config`` mirrors the destination config consumed by kafka.go:
    ``{"topic": str, "enableMultiTopic": bool, "eventTypeToTopicMap":
    [{"from","to"}...], "eventToTopicMap": [...]}`` (one destination per
    call — the reference transforms per-destination batches too).

    Returns the input plus ``key`` (userId else anonymousId, binary),
    ``value`` (the shaped ``{message, userId, topic[, schemaId]}`` JSON,
    binary), ``topic`` and ``error`` (null on success).
    """
    cfg = dest_config or {}
    p = F.col(payload_col)
    get = lambda path: F.get_json_object(p, f"$.{path}")  # noqa: E731

    # integrations.{KAFKA|kafka|Kafka} override (canonicalNames, kafka.go:14)
    intr_topic = F.coalesce(
        *[_nonempty(get(f"integrations.{k}.topic")) for k in ("KAFKA", "kafka", "Kafka")]
    )
    schema_id = F.coalesce(
        *[_nonempty(get(f"integrations.{k}.schemaId")) for k in ("KAFKA", "kafka", "Kafka")]
    )

    etype = get("type")
    ename = get("event")
    multi_topic = F.lit(None).cast("string")
    if cfg.get("enableMultiTopic"):
        by_type = _topic_map_expr(cfg.get("eventTypeToTopicMap"), etype, lower_keys=True)
        by_event = _topic_map_expr(cfg.get("eventToTopicMap"), ename, lower_keys=False)
        multi_topic = F.when(
            etype.isin("identify", "screen", "page", "group", "alias"), by_type
        ).when(etype == "track", F.when(_nonempty(ename).isNotNull(), by_event))

    default_topic = (
        F.lit(cfg["topic"]) if isinstance(cfg.get("topic"), str) and cfg["topic"] else F.lit(None)
    ).cast("string")
    topic = F.coalesce(intr_topic, multi_topic, default_topic)

    # userId: message userId when non-empty, else anonymousId (kafka.go:37-42)
    user_id = F.coalesce(_nonempty(get("userId")), get("anonymousId"))

    # retl timestamp fix-up (UpdateTimestampFieldForRETLEvent,
    # destination_transformer/embedded/utils.go:73-99): only for
    # channel == "sources" without context.mappedToDestination. The
    # reference copies the event into a NEW map and sets
    # newEventMessage["timestamp"] = v — a replace-in-place of the key with
    # the RAW looked-up value (numbers stay numbers), skipping nil/"".
    # Modeled with variants so the value's JSON type survives; a plain
    # append of a duplicate "timestamp" member would be wrong — Spark's
    # get_json_object reads the FIRST duplicate key, so downstream
    # path-readers would keep seeing the stale value.
    is_retl = (get("channel") == "sources") & _nonempty(
        get("context.mappedToDestination")
    ).isNull()
    pv = F.parse_json(p)

    def _vget(path):
        # MapLookup semantics: skip absent, JSON-null, and "" values
        v = F.try_variant_get(pv, f"$.{path}", "variant")
        raw = F.to_json(v)
        return F.when((raw != '""') & (raw != "null"), v)

    retl_ts = None
    for t, fields in _RETL_TS_FIELDS.items():
        picked = F.coalesce(*[_vget(f) for f in fields])
        cond = is_retl & (etype == t)
        retl_ts = F.when(cond, picked) if retl_ts is None else retl_ts.when(cond, picked)

    # shaped value: the original message JSON with the optional timestamp
    # override replaced in place, wrapped with userId/topic/schemaId.
    # Non-retl events ride as the raw JSON subtree (no reserialization);
    # retl events rebuild the top-level object exactly like the
    # reference's maps.Copy + json.Marshal round-trip does.
    msg_map = F.from_json(p, "map<string,variant>")
    patched = F.to_json(
        F.map_concat(
            F.map_filter(msg_map, lambda k, _: k != F.lit("timestamp")),
            F.create_map(F.lit("timestamp"), retl_ts),
        )
    )
    patched_msg = F.when(retl_ts.isNotNull(), patched).otherwise(p)

    value = F.concat(
        F.lit('{"message":'),
        patched_msg,
        F.lit(',"userId":'),
        _json_str(user_id),
        F.lit(',"topic":'),
        _json_str(topic),
        F.when(schema_id.isNotNull(), F.concat(F.lit(',"schemaId":'), _json_str(schema_id)))
        .otherwise(F.lit("")),
        F.lit("}"),
    )

    return df.select(
        "*",
        user_id.cast("string").cast("binary").alias("key"),
        F.when(topic.isNotNull(), value.cast("binary")).alias("value"),
        topic.alias("topic"),
        F.when(topic.isNull(), F.lit("topic is required for Kafka destination")).alias(
            "error"
        ),
    )


def pubsub_shape(
    df: DataFrame,
    dest_config: dict | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """S9 PubSub message shaping (embedded/pubsub/pubsub.go).

    Topic resolution (getTopic, pubsub.go:92-117): ONE lowercased
    ``eventToTopicMap`` tried against the event name, then the event type,
    then the ``"*"`` wildcard; no match → failed event. Attributes
    (pubsub.go:119-164): the configured ``eventToAttributesMap`` picks a
    path list by the same name/type/``*`` precedence; each path is looked
    up at the message root and then under properties/traits/context.traits
    (sourceKeys), stringified, and keyed by its last path segment.

    Returns the input plus ``topic``, ``attributes`` (JSON object string),
    ``value`` (the shaped ``{userId, message, topicId, attributes}`` JSON,
    binary) and ``error``. Spark ships no PubSub sink: delivery is a
    foreachBatch publisher in deployment; the shaped frame is the contract.
    """
    cfg = dest_config or {}
    p = F.col(payload_col)
    get = lambda path: F.get_json_object(p, f"$.{path}")  # noqa: E731

    etype = get("type")
    ename = get("event")
    tmap = cfg.get("eventToTopicMap")
    by_name = _topic_map_expr(tmap, ename, lower_keys=True)
    by_type = _topic_map_expr(tmap, etype, lower_keys=True)
    wildcard = next(
        (
            F.lit(m["to"])
            for m in (tmap or [])
            if str(m.get("from", "")).strip() == "*" and isinstance(m.get("to"), str)
        ),
        F.lit(None).cast("string"),
    )
    topic = F.when(
        _nonempty(etype).isNotNull(),
        F.coalesce(
            F.when(_nonempty(ename).isNotNull(), _nonempty(by_name)),
            _nonempty(by_type),
            _nonempty(wildcard),
        ),
    )
    error = F.when(_nonempty(etype).isNull(), F.lit("type is required for event")).when(
        topic.isNull(), F.lit("No topic set for this event")
    )

    # attributes: config maps lowercased from-key -> [attribute paths]
    attrs_map: dict[str, list] = {}
    for m in cfg.get("eventToAttributesMap") or []:
        frm, to = str(m.get("from", "")).strip(), m.get("to")
        if frm and isinstance(to, str):
            attrs_map.setdefault(frm.lower(), []).append(to)

    def attrs_expr(paths: list) -> Column:
        entries = []
        for path in paths:
            # root lookup, then under each sourceKey (pubsub.go:17,150-163)
            val = F.coalesce(
                get(path),
                get(f"properties.{path}"),
                get(f"traits.{path}"),
                get(f"context.traits.{path}"),
            )
            key = path.split(".")[-1]
            entries.append(F.struct(F.lit(key).alias("key"), val.alias("value")))
        found = F.filter(F.array(*entries), lambda s: s.getField("value").isNotNull())
        return F.to_json(F.map_from_entries(found))

    attributes = F.lit("{}")
    if attrs_map:
        # precedence: event-name key, then event-type key, then "*"
        star = attrs_expr(attrs_map["*"]) if "*" in attrs_map else F.lit("{}")
        attributes = star
        by_type_cases = [
            (F.lower(etype) == k, attrs_expr(v)) for k, v in attrs_map.items() if k != "*"
        ]
        for cond, expr in by_type_cases:
            attributes = F.when(cond, expr).otherwise(attributes)
        for k, v in attrs_map.items():
            if k != "*":
                attributes = F.when(F.lower(ename) == k, attrs_expr(v)).otherwise(attributes)

    user_id = F.coalesce(_nonempty(get("userId")), get("anonymousId"), F.lit(""))

    value = F.concat(
        F.lit('{"userId":'),
        _json_str(user_id),
        F.lit(',"message":'),
        p,
        F.lit(',"topicId":'),
        _json_str(topic),
        F.lit(',"attributes":'),
        attributes,
        F.lit("}"),
    )
    return df.select(
        "*",
        topic.alias("topic"),
        attributes.alias("attributes"),
        F.when(error.isNull(), value.cast("binary")).alias("value"),
        error.alias("error"),
    )


def kafka_sink_options(bootstrap_servers: str, extra: dict | None = None) -> dict:
    """The write-side wiring: ``kafka_shape(df).where("error IS NULL")
    .select("key","value","topic").write.format("kafka")`` with these
    options delivers shaped messages; Structured Streaming uses the same
    sink via ``writeStream`` for S9's streaming path."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    opts.update(extra or {})
    return opts


def publish_kafka(
    shaped: DataFrame,
    options: dict,
    producer=None,
) -> DataFrame:
    """Deliver shaped rows to the Kafka sink; return the failed rows.

    The delivery seam mirrors the router's injectable ``deliver``
    (streaming/pipeline.py router_sink): ``producer(df, options)`` gets
    exactly the Spark-Kafka sink contract — the error-free rows projected
    to ``key`` (binary), ``value`` (binary), ``topic`` (string) — and
    defaults to the real ``df.write.format("kafka")`` call (reference
    embedded kafka producer, router/…/kafka). Tests inject a recording
    producer, proving the topic/key/value contract without a broker.

    Rows whose shaping failed (``error`` non-null — no resolvable topic)
    are NOT sent and come back to the caller for the proc_error path,
    like the reference's failed-event batch response.
    """
    ok = shaped.where(F.col("error").isNull()).select("key", "value", "topic")
    if producer is None:

        def producer(df: DataFrame, opts: dict) -> None:
            df.write.format("kafka").options(**opts).save()

    producer(ok, dict(options))
    return shaped.where(F.col("error").isNotNull())


def kafka_sink(
    options: dict,
    dest_config: dict | None = None,
    producer=None,
    on_error=None,
):
    """foreachBatch Kafka sink for the S9 streaming path: shape each
    micro-batch and publish it through the (injectable) producer;
    shaping failures go to ``on_error(df, epoch_id)`` when provided
    (the streaming proc_error analogue), else are dropped with the
    reference's failed-event semantics left to the caller's DLQ."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        failed = publish_kafka(
            kafka_shape(batch_df, dest_config), options, producer=producer
        )
        if on_error is not None:
            on_error(failed, epoch_id)

    return write_batch
