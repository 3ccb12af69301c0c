"""Webhook source adapters (reference S2).

Non-Rudder webhook payloads become rudder events via a per-source-type
mapping (gateway/webhook/webhook.go, webhookTransformer.go:35-60 — the
reference calls a remote transformer per source type). Spark-first: the
registry holds per-source DataFrame→DataFrame mapping functions built from
column expressions (`from_json` + `select`), so each adapter is a narrow
codegen'd projection; one raw webhook row may emit N events (UDTF shape →
`explode`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

Adapter = Callable[[DataFrame], DataFrame]

_ADAPTERS: dict[str, Adapter] = {}


def register_webhook_adapter(source_type: str, fn: Adapter) -> None:
    _ADAPTERS[source_type] = fn


def adapt_webhook(df: DataFrame, source_type: str) -> DataFrame:
    """Apply the registered adapter for ``source_type`` to raw webhook rows
    (columns: ``body`` JSON string + transport metadata)."""
    return _ADAPTERS[source_type](df)


def _generic_adapter(df: DataFrame) -> DataFrame:
    """Default mapping: one webhook body → one 'track' event named by
    ``$.event`` (fallback 'webhook_event'), body preserved as properties."""
    return df.select(
        F.expr("uuid()").alias("message_id"),
        F.get_json_object("body", "$.userId").alias("user_id"),
        F.get_json_object("body", "$.anonymousId").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(
            F.get_json_object("body", "$.event"), F.lit("webhook_event")
        ).alias("event_name"),
        F.col("received_at"),
        F.col("received_at").alias("sent_at"),
        F.col("received_at").alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                F.from_json("body", "map<string,string>").alias("properties"),
            )
        ).alias("payload"),
    )


def _batch_adapter(df: DataFrame) -> DataFrame:
    """UDTF shape: a webhook body carrying ``{"events": [...]}`` explodes to
    one event per element (the S2 one-payload→N-events case)."""
    exploded = df.select(
        F.col("received_at"),
        F.explode(
            F.from_json("body", "struct<events: array<string>>").getField("events")
        ).alias("body"),
    )
    return _generic_adapter(exploded)


register_webhook_adapter("generic", _generic_adapter)
register_webhook_adapter("generic_batch", _batch_adapter)


# ---------------------------------------------------------------------------
# Native Python UDTF form of the batch adapter (§2.12 UDTF surface). The
# explode/from_json `_batch_adapter` above stays the hot path — it runs
# entirely in JVM codegen — but source adapters that need IMPERATIVE parsing
# (malformed vendor payloads, conditional event synthesis, per-element
# error routing) get this extension point: a real table function usable
# from SQL via `LATERAL explode_webhook_batch(body)`.
#
# The class is self-contained (imports inside eval) so cloudpickle ships it
# whole to workers regardless of the driver's sys.path.
try:
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_name string, user_id string, event_json string")
    class ExplodeWebhookBatch:
        """One row per event in a ``{"events": [...]}`` webhook batch body;
        undecodable bodies yield nothing, undecodable elements are skipped
        (per-element failure isolation — the UDTF advantage over the
        all-or-nothing from_json cast)."""

        def eval(self, body: str):
            import json as _json

            try:
                events = _json.loads(body).get("events", [])
            except Exception:
                return
            if not isinstance(events, list):
                return
            for el in events:
                try:
                    e = _json.loads(el) if isinstance(el, str) else el
                    if not isinstance(e, dict):
                        continue
                except Exception:
                    continue
                yield (
                    e.get("event"),
                    e.get("userId"),
                    _json.dumps(e, sort_keys=True),
                )

    def register_batch_udtf(spark) -> None:
        """Make the UDTF callable from SQL as ``explode_webhook_batch``."""
        spark.udtf.register("explode_webhook_batch", ExplodeWebhookBatch)

except ImportError:  # pragma: no cover — pyspark < 3.5 has no native UDTF
    ExplodeWebhookBatch = None

    def register_batch_udtf(spark) -> None:
        raise NotImplementedError("native Python UDTFs need pyspark >= 3.5")


def _envelope_adapter(df: DataFrame) -> DataFrame:
    """'data-envelope' family (Stripe-style `{"type": t, "created": epoch,
    "data": {...}}`): event named by the envelope type, timestamp from the
    epoch seconds, the inner object as properties — all codegen'd."""
    ts = F.coalesce(
        F.to_timestamp(F.from_unixtime(F.get_json_object("body", "$.created"))),
        F.col("received_at"),
    )
    return df.select(
        F.expr("uuid()").alias("message_id"),
        F.get_json_object("body", "$.data.userId").alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(
            F.get_json_object("body", "$.type"), F.lit("webhook_event")
        ).alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                F.from_json(
                    F.get_json_object("body", "$.data"), "map<string,string>"
                ).alias("properties"),
            )
        ).alias("payload"),
    )


def _form_adapter(df: DataFrame) -> DataFrame:
    """form-encoded family (`k=v&k2=v2` bodies): parsed with str_to_map —
    no JSON at all; event name from the `event` field."""
    kv = F.str_to_map(F.col("body"), F.lit("&"), F.lit("="))
    return df.select(
        F.expr("uuid()").alias("message_id"),
        kv.getItem("userId").alias("user_id"),
        kv.getItem("anonymousId").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(kv.getItem("event"), F.lit("webhook_event")).alias("event_name"),
        F.col("received_at"),
        F.col("received_at").alias("sent_at"),
        F.col("received_at").alias("original_timestamp"),
        F.to_json(
            F.struct(F.lit("track").alias("type"), kv.alias("properties"))
        ).alias("payload"),
    )


register_webhook_adapter("data_envelope", _envelope_adapter)
register_webhook_adapter("form", _form_adapter)


# ---------------------------------------------------------------------------
# Real vendor payload shapes. The reference routes these through per-source
# remote transformations (gateway/webhook/webhookTransformer.go:35-60 — the
# transformer service owns the vendor mapping); here each vendor mapping is
# a native codegen'd projection over the documented public webhook format.


def _shopify_order_adapter(df: DataFrame) -> DataFrame:
    """Shopify ``orders/create`` webhook → one 'Order Created' track event:
    user from ``customer.id`` (anonymous from ``cart_token``), revenue /
    currency / order_id from the order envelope, ``line_items`` carried as
    a typed products array. Timestamps from the order's ``created_at``
    (ISO-8601 with offset)."""
    b = F.col("body")
    ts = F.coalesce(F.to_timestamp(F.get_json_object(b, "$.created_at")), F.col("received_at"))
    products = F.transform(
        F.from_json(
            F.get_json_object(b, "$.line_items"),
            "array<struct<product_id string, sku string, title string,"
            " price string, quantity int>>",
        ),
        lambda li: F.struct(
            li.getField("product_id").alias("product_id"),
            li.getField("sku").alias("sku"),
            li.getField("title").alias("name"),
            li.getField("price").cast("double").alias("price"),
            li.getField("quantity").alias("quantity"),
        ),
    )
    return df.select(
        F.expr("uuid()").alias("message_id"),
        F.get_json_object(b, "$.customer.id").alias("user_id"),
        F.get_json_object(b, "$.cart_token").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.lit("Order Created").alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                F.lit("Order Created").alias("event"),
                F.struct(
                    F.get_json_object(b, "$.id").alias("order_id"),
                    F.get_json_object(b, "$.total_price").cast("double").alias("revenue"),
                    F.get_json_object(b, "$.currency").alias("currency"),
                    products.alias("products"),
                ).alias("properties"),
            )
        ).alias("payload"),
    )


def _stripe_event_adapter(df: DataFrame) -> DataFrame:
    """Stripe event envelope (``{id, type, created, data: {object}}``) →
    one track event named by ``type``; user from the object's
    ``customer``, amounts in minor units converted to major. The envelope
    ``id`` IS the message id — Stripe redelivers with the same id, so the
    exact-dedup filter (F1) upstream makes redelivery idempotent."""
    b = F.col("body")
    obj = lambda p: F.get_json_object(b, f"$.data.object.{p}")  # noqa: E731
    ts = F.coalesce(
        F.to_timestamp(F.from_unixtime(F.get_json_object(b, "$.created"))),
        F.col("received_at"),
    )
    return df.select(
        F.get_json_object(b, "$.id").alias("message_id"),
        obj("customer").alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(F.get_json_object(b, "$.type"), F.lit("stripe_event")).alias(
            "event_name"
        ),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                F.get_json_object(b, "$.type").alias("event"),
                F.struct(
                    obj("id").alias("charge_id"),
                    (obj("amount").cast("double") / 100.0).alias("amount"),
                    obj("currency").alias("currency"),
                    obj("status").alias("status"),
                ).alias("properties"),
            )
        ).alias("payload"),
    )


def _github_push_adapter(df: DataFrame) -> DataFrame:
    """GitHub push webhook → one 'Commit Pushed' event PER COMMIT (the
    S2 one-payload→N-events UDTF shape, as a pure explode): user from
    ``pusher.name``, repo/ref/sha/message as properties, event time from
    each commit's ``timestamp``."""
    b = F.col("body")
    commits = F.from_json(
        F.get_json_object(b, "$.commits"),
        "array<struct<id string, message string, timestamp string,"
        " author struct<name string, email string>>>",
    )
    rows = df.select(
        F.col("received_at"),
        F.get_json_object(b, "$.repository.full_name").alias("_repo"),
        F.get_json_object(b, "$.ref").alias("_ref"),
        F.get_json_object(b, "$.pusher.name").alias("_pusher"),
        F.explode(commits).alias("_c"),
    )
    ts = F.coalesce(F.to_timestamp(F.col("_c.timestamp")), F.col("received_at"))
    return rows.select(
        F.col("_c.id").alias("message_id"),  # commit sha: natural dedup key
        F.col("_pusher").alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.lit("Commit Pushed").alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                F.lit("Commit Pushed").alias("event"),
                F.struct(
                    F.col("_repo").alias("repository"),
                    F.col("_ref").alias("ref"),
                    F.col("_c.id").alias("sha"),
                    F.col("_c.message").alias("message"),
                    F.col("_c.author.email").alias("author_email"),
                ).alias("properties"),
            )
        ).alias("payload"),
    )


def _mailchimp_subscribe_adapter(df: DataFrame) -> DataFrame:
    """Mailchimp list webhook (form-encoded ``type=subscribe&
    data[email]=...&data[list_id]=...``) → an identify-shaped event keyed
    by the subscriber email; str_to_map parsing, no JSON anywhere."""
    kv = F.str_to_map(F.col("body"), F.lit("&"), F.lit("="))
    email = kv.getItem("data[email]")
    return df.select(
        F.expr("uuid()").alias("message_id"),
        email.alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("identify").alias("event_type"),
        F.coalesce(kv.getItem("type"), F.lit("subscribe")).alias("event_name"),
        F.col("received_at"),
        F.col("received_at").alias("sent_at"),
        F.col("received_at").alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("identify").alias("type"),
                F.struct(
                    email.alias("email"),
                    kv.getItem("data[list_id]").alias("list_id"),
                    kv.getItem("data[merges][FNAME]").alias("first_name"),
                ).alias("traits"),
            )
        ).alias("payload"),
    )


def _sendgrid_events_adapter(df: DataFrame) -> DataFrame:
    """SendGrid event webhook: the body is a TOP-LEVEL JSON ARRAY of event
    objects (the batch-POST family, but with no wrapper key) — one track
    per element, named by the element's ``event``. ``sg_event_id`` is the
    vendor's redelivery-stable id → the message id, so upstream F1 dedup
    makes retries idempotent; event time from the element's unix
    ``timestamp``."""
    els = F.from_json(
        F.col("body"),
        "array<struct<email string, timestamp long, event string,"
        " sg_event_id string, sg_message_id string, category string,"
        " url string, reason string>>",
    )
    rows = df.select(F.col("received_at"), F.explode(els).alias("_e"))
    e = F.col("_e")
    ts = F.coalesce(
        F.to_timestamp(F.from_unixtime(e.getField("timestamp"))),
        F.col("received_at"),
    )
    return rows.select(
        F.coalesce(e.getField("sg_event_id"), F.expr("uuid()")).alias("message_id"),
        e.getField("email").alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(e.getField("event"), F.lit("sendgrid_event")).alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                e.getField("event").alias("event"),
                F.struct(
                    e.getField("sg_message_id").alias("message_id"),
                    e.getField("category").alias("category"),
                    e.getField("url").alias("url"),
                    e.getField("reason").alias("reason"),
                ).alias("properties"),
            )
        ).alias("payload"),
    )


def _intercom_notification_adapter(df: DataFrame) -> DataFrame:
    """Intercom notification envelope ``{type: "notification_event",
    topic: "user.created" | "conversation.user.replied" | ..., data:
    {item: {...}}}`` — TOPIC-ROUTED mapping: user topics become identify
    events carrying the item's user traits; every other topic a track
    named by the topic. User from ``data.item.id`` (email fallback)."""
    b = F.col("body")
    item = lambda pth: F.get_json_object(b, f"$.data.item.{pth}")  # noqa: E731
    topic = F.coalesce(F.get_json_object(b, "$.topic"), F.lit("unknown"))
    is_user = topic.startswith("user.")
    ts = F.coalesce(
        F.to_timestamp(F.from_unixtime(F.get_json_object(b, "$.created_at"))),
        F.col("received_at"),
    )
    identify_payload = F.to_json(
        F.struct(
            F.lit("identify").alias("type"),
            F.struct(
                item("email").alias("email"),
                item("name").alias("name"),
                item("phone").alias("phone"),
            ).alias("traits"),
        )
    )
    track_payload = F.to_json(
        F.struct(
            F.lit("track").alias("type"),
            topic.alias("event"),
            F.struct(
                item("id").alias("item_id"),
                F.get_json_object(b, "$.data.item.conversation_message.body").alias(
                    "body"
                ),
            ).alias("properties"),
        )
    )
    return df.select(
        F.coalesce(F.get_json_object(b, "$.id"), F.expr("uuid()")).alias(
            "message_id"
        ),
        F.coalesce(item("id"), item("email")).alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.when(is_user, "identify").otherwise("track").alias("event_type"),
        topic.alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.when(is_user, identify_payload).otherwise(track_payload).alias("payload"),
    )


def _iterable_event_adapter(df: DataFrame) -> DataFrame:
    """Iterable system webhook ``{eventName, email, userId, dataFields:
    {...}}`` — the DYNAMIC-properties family: dataFields has no fixed
    schema, so its raw JSON subtree rides into the payload verbatim
    (parsed downstream by P5 flattening/schema discovery, like the
    reference's transformer passes properties through untyped)."""
    b = F.col("body")
    ts = F.coalesce(
        F.to_timestamp(
            F.from_unixtime(F.get_json_object(b, "$.dataFields.createdAt"))
        ),
        F.col("received_at"),
    )
    # get_json_object returns the UNQUOTED text for scalar subtrees
    # (dataFields:"abc" → abc), which would splice as malformed JSON —
    # only object/array subtrees ride through verbatim; scalars and
    # missing dataFields fall back to {} (the transformer likewise only
    # forwards object dataFields as properties).
    raw_fields = F.get_json_object(b, "$.dataFields")
    data_fields = F.when(
        F.substring(raw_fields, 1, 1).isin("{", "["), raw_fields
    ).otherwise(F.lit("{}"))
    return df.select(
        F.expr("uuid()").alias("message_id"),
        F.coalesce(
            F.get_json_object(b, "$.userId"), F.get_json_object(b, "$.email")
        ).alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(F.get_json_object(b, "$.eventName"), F.lit("iterable_event")).alias(
            "event_name"
        ),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        # properties spliced as RAW JSON text — concat, not re-parse: the
        # dynamic dataFields keep their exact vendor value text. The
        # type/event prefix renders through to_json(struct(...)) (JSON
        # string escaping for free), then the closing brace swaps for the
        # spliced subtree.
        F.concat(
            F.regexp_replace(
                F.to_json(
                    F.struct(
                        F.lit("track").alias("type"),
                        F.coalesce(
                            F.get_json_object(b, "$.eventName"),
                            F.lit("iterable_event"),
                        ).alias("event"),
                    )
                ),
                r"\}$",
                "",
            ),
            F.lit(',"properties":'),
            data_fields,
            F.lit("}"),
        ).alias("payload"),
    )


def _customerio_reporting_adapter(df: DataFrame) -> DataFrame:
    """Customer.io reporting webhook ``{event_id, object_type, metric,
    timestamp, data: {customer_id, identifiers, recipient, ...}}`` → one
    track event named ``<object_type>_<metric>`` (email_opened,
    sms_clicked, ...). ``event_id`` is the message id — Customer.io
    redelivers with the same id, so upstream exact-dedup (F1) makes
    redelivery idempotent, same contract as the Stripe adapter."""
    b = F.col("body")
    ts = F.coalesce(
        F.to_timestamp(F.from_unixtime(F.get_json_object(b, "$.timestamp"))),
        F.col("received_at"),
    )
    name = F.concat_ws(
        "_",
        F.coalesce(F.get_json_object(b, "$.object_type"), F.lit("event")),
        F.coalesce(F.get_json_object(b, "$.metric"), F.lit("triggered")),
    )
    return df.select(
        F.coalesce(F.get_json_object(b, "$.event_id"), F.expr("uuid()")).alias(
            "message_id"
        ),
        F.coalesce(
            F.get_json_object(b, "$.data.customer_id"),
            F.get_json_object(b, "$.data.identifiers.id"),
            F.get_json_object(b, "$.data.recipient"),
        ).alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        name.alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                name.alias("event"),
                F.struct(
                    F.get_json_object(b, "$.data.delivery_id").alias(
                        "delivery_id"
                    ),
                    F.get_json_object(b, "$.data.campaign_id")
                    .cast("long")
                    .alias("campaign_id"),
                    F.get_json_object(b, "$.data.recipient").alias("recipient"),
                    F.get_json_object(b, "$.data.subject").alias("subject"),
                ).alias("properties"),
            )
        ).alias("payload"),
    )


def _typeform_response_adapter(df: DataFrame) -> DataFrame:
    """Typeform ``form_response`` webhook: the response ``token`` is the
    anonymous id, ``submitted_at`` (RFC3339) the event time, and the
    free-form ``answers`` array rides into the payload VERBATIM — the
    same dynamic-subtree splice (with the scalar guard) as the Iterable
    adapter, since answer shapes vary per field type and are parsed
    downstream by P5 schema discovery."""
    b = F.col("body")
    fr = lambda p: F.get_json_object(b, f"$.form_response.{p}")  # noqa: E731
    ts = F.coalesce(F.to_timestamp(fr("submitted_at")), F.col("received_at"))
    raw_answers = F.get_json_object(b, "$.form_response.answers")
    answers = F.when(
        F.substring(raw_answers, 1, 1).isin("{", "["), raw_answers
    ).otherwise(F.lit("[]"))
    return df.select(
        F.coalesce(F.get_json_object(b, "$.event_id"), F.expr("uuid()")).alias(
            "message_id"
        ),
        fr("hidden.user_id").alias("user_id"),
        fr("token").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(
            F.get_json_object(b, "$.event_type"), F.lit("form_response")
        ).alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.concat(
            F.regexp_replace(
                F.to_json(
                    F.struct(
                        F.lit("track").alias("type"),
                        F.lit("form_response").alias("event"),
                        F.struct(
                            # coalesce: to_json omits null struct fields, and
                            # an EMPTY properties object would leave the
                            # spliced ',"answers":' with a leading comma
                            F.coalesce(fr("form_id"), F.lit("")).alias(
                                "form_id"
                            ),
                            fr("definition.title").alias("form_title"),
                        ).alias("properties"),
                    )
                ),
                r"\}\}$",
                "",
            ),
            F.lit(',"answers":'),
            answers,
            F.lit("}}"),
        ).alias("payload"),
    )


def _slack_event_adapter(df: DataFrame) -> DataFrame:
    """Slack Events API ``event_callback`` envelope ``{token, team_id,
    event_id, event_time, event: {type, user, channel, ...}}`` → one
    track event named by the INNER ``$.event.type`` (message,
    reaction_added, ...). ``event_id`` is the message id (Slack retries
    with the same id); the team id rides as a property so multi-
    workspace installs stay distinguishable."""
    b = F.col("body")
    ev = lambda p: F.get_json_object(b, f"$.event.{p}")  # noqa: E731
    ts = F.coalesce(
        F.to_timestamp(F.from_unixtime(F.get_json_object(b, "$.event_time"))),
        F.col("received_at"),
    )
    return df.select(
        F.coalesce(F.get_json_object(b, "$.event_id"), F.expr("uuid()")).alias(
            "message_id"
        ),
        ev("user").alias("user_id"),
        F.lit(None).cast("string").alias("anonymous_id"),
        F.lit("track").alias("event_type"),
        F.coalesce(ev("type"), F.lit("slack_event")).alias("event_name"),
        F.col("received_at"),
        ts.alias("sent_at"),
        ts.alias("original_timestamp"),
        F.to_json(
            F.struct(
                F.lit("track").alias("type"),
                F.coalesce(ev("type"), F.lit("slack_event")).alias("event"),
                F.struct(
                    F.get_json_object(b, "$.team_id").alias("team_id"),
                    ev("channel").alias("channel"),
                    ev("text").alias("text"),
                    ev("ts").alias("slack_ts"),
                    ev("reaction").alias("reaction"),
                ).alias("properties"),
            )
        ).alias("payload"),
    )


register_webhook_adapter("shopify_order", _shopify_order_adapter)
register_webhook_adapter("sendgrid_events", _sendgrid_events_adapter)
register_webhook_adapter("intercom_notification", _intercom_notification_adapter)
register_webhook_adapter("iterable_event", _iterable_event_adapter)
register_webhook_adapter("stripe_event", _stripe_event_adapter)
register_webhook_adapter("github_push", _github_push_adapter)
register_webhook_adapter("mailchimp_subscribe", _mailchimp_subscribe_adapter)
register_webhook_adapter("customerio_reporting", _customerio_reporting_adapter)
register_webhook_adapter("typeform_response", _typeform_response_adapter)
register_webhook_adapter("slack_event", _slack_event_adapter)


def verify_webhook_signatures(
    df: DataFrame,
    secrets: dict[str, str],
    body_col: str = "body",
    source_col: str = "source_type",
    sig_col: str = "signature",
) -> DataFrame:
    """S2 transport authentication: HMAC-SHA256 the raw body with the
    source's shared secret and compare against the transport signature
    header (the Shopify/GitHub/Stripe webhook scheme; the reference's
    webhook gateway validates per-source secrets before adapting,
    gateway/webhook/webhook.go).

    Adds ``sig_valid`` (boolean; null-signature rows are invalid). HMAC is
    not in Spark's builtin function set, so this is a genuine Arrow
    mapInPandas case: Python's stdlib hmac over vectorized batches, the
    bounded per-source secret map shipped inside the closure (config-sized
    — the reference stores it per source in the control plane). The
    closure is self-contained (cloudpickle by value; workers never import
    this package). Constant-time comparison via hmac.compare_digest.
    """
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("sig_valid", T.BooleanType())]
    )
    secrets_by_source = dict(secrets)

    def check(batches):
        import hashlib
        import hmac as _hmac

        for pdf in batches:
            valid = []
            for body, src, sig in zip(
                pdf[body_col], pdf[source_col], pdf[sig_col]
            ):
                secret = secrets_by_source.get(src)
                if secret is None or sig is None or body is None:
                    valid.append(False)
                    continue
                digest = _hmac.new(
                    secret.encode(), body.encode(), hashlib.sha256
                ).hexdigest()
                valid.append(_hmac.compare_digest(digest, sig))
            pdf = pdf.copy()
            pdf["sig_valid"] = valid
            yield pdf

    return df.mapInPandas(check, out_schema)
