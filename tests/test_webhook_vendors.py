"""Golden tests for the real-vendor webhook adapters (S2): Shopify order,
Stripe event envelope, GitHub push (one event per commit), Mailchimp
form-encoded subscribe. Payloads follow the vendors' documented public
webhook formats; the reference maps these in its remote transformer
(gateway/webhook/webhookTransformer.go:35-60) — here each is a codegen'd
projection."""

import datetime as dt
import json

from rudder_server_spark.sources.webhook import adapt_webhook

RCV = dt.datetime(2024, 2, 1, 10, 30, 0)


def _raw(spark, body):
    return spark.createDataFrame([(body, RCV)], "body string, received_at timestamp")


SHOPIFY_ORDER = {
    "id": 820982911946154500,
    "cart_token": "cart-abc",
    "created_at": "2024-01-15T09:30:00+00:00",
    "currency": "USD",
    "total_price": "403.00",
    "customer": {"id": 115310627314723950, "email": "john@example.com"},
    "line_items": [
        {"product_id": "632910392", "sku": "IPOD-342", "title": "IPod Nano",
         "price": "199.00", "quantity": 1},
        {"product_id": "921728736", "sku": "IPOD-343", "title": "IPod Touch",
         "price": "102.00", "quantity": 2},
    ],
}


def test_shopify_order_golden(spark):
    out = adapt_webhook(_raw(spark, json.dumps(SHOPIFY_ORDER)), "shopify_order")
    r = out.head()
    assert r["event_type"] == "track" and r["event_name"] == "Order Created"
    assert r["user_id"] == "115310627314723950"
    assert r["anonymous_id"] == "cart-abc"
    assert r["sent_at"] == dt.datetime(2024, 1, 15, 9, 30, 0)
    p = json.loads(r["payload"])
    assert p["properties"]["order_id"] == "820982911946154500"
    assert p["properties"]["revenue"] == 403.0
    assert p["properties"]["currency"] == "USD"
    prods = p["properties"]["products"]
    assert [x["sku"] for x in prods] == ["IPOD-342", "IPOD-343"]
    assert prods[0]["price"] == 199.0 and prods[1]["quantity"] == 2


STRIPE_EVENT = {
    "id": "evt_1NG8Du2eZvKYlo2CUI79vXWy",
    "object": "event",
    "type": "charge.succeeded",
    "created": 1705311000,  # 2024-01-15T09:30:00Z
    "data": {
        "object": {
            "id": "ch_3NG8Du2eZvKYlo2C1B8z0QpQ",
            "amount": 2000,
            "currency": "usd",
            "customer": "cus_9s6XKzkNRiz8i3",
            "status": "succeeded",
        }
    },
}


def test_stripe_event_golden(spark):
    out = adapt_webhook(_raw(spark, json.dumps(STRIPE_EVENT)), "stripe_event")
    r = out.head()
    # envelope id is the message id — F1 exact dedup makes Stripe's
    # at-least-once redelivery idempotent
    assert r["message_id"] == "evt_1NG8Du2eZvKYlo2CUI79vXWy"
    assert r["user_id"] == "cus_9s6XKzkNRiz8i3"
    assert r["event_name"] == "charge.succeeded"
    assert r["sent_at"] == dt.datetime(2024, 1, 15, 9, 30, 0)
    p = json.loads(r["payload"])
    assert p["properties"]["amount"] == 20.0  # minor → major units
    assert p["properties"]["currency"] == "usd"
    assert p["properties"]["status"] == "succeeded"


GITHUB_PUSH = {
    "ref": "refs/heads/main",
    "repository": {"full_name": "octocat/Hello-World"},
    "pusher": {"name": "octocat"},
    "commits": [
        {"id": "abc123", "message": "fix bug",
         "timestamp": "2024-01-15T09:30:00Z",
         "author": {"name": "Octo Cat", "email": "octo@github.com"}},
        {"id": "def456", "message": "add feature",
         "timestamp": "2024-01-15T09:31:00Z",
         "author": {"name": "Octo Cat", "email": "octo@github.com"}},
    ],
}


def test_github_push_explodes_per_commit(spark):
    out = adapt_webhook(_raw(spark, json.dumps(GITHUB_PUSH)), "github_push")
    rows = out.orderBy("message_id").collect()
    assert [r["message_id"] for r in rows] == ["abc123", "def456"]
    assert all(r["user_id"] == "octocat" for r in rows)
    assert rows[1]["sent_at"] == dt.datetime(2024, 1, 15, 9, 31, 0)
    p = json.loads(rows[0]["payload"])
    assert p["properties"]["repository"] == "octocat/Hello-World"
    assert p["properties"]["ref"] == "refs/heads/main"
    assert p["properties"]["sha"] == "abc123"
    assert p["properties"]["author_email"] == "octo@github.com"


def test_mailchimp_subscribe_golden(spark):
    body = ("type=subscribe&fired_at=2024-01-15 09:30:00"
            "&data[email]=api@mailchimp.com&data[list_id]=a6b5da1054"
            "&data[merges][FNAME]=Api")
    out = adapt_webhook(_raw(spark, body), "mailchimp_subscribe")
    r = out.head()
    assert r["event_type"] == "identify"
    assert r["event_name"] == "subscribe"
    assert r["user_id"] == "api@mailchimp.com"
    p = json.loads(r["payload"])
    assert p["traits"]["email"] == "api@mailchimp.com"
    assert p["traits"]["list_id"] == "a6b5da1054"
    assert p["traits"]["first_name"] == "Api"


SENDGRID_BATCH = [
    {"email": "a@x.io", "timestamp": 1706777400, "event": "open",
     "sg_event_id": "ev-1", "sg_message_id": "m-1", "category": "promo"},
    {"email": "b@x.io", "timestamp": 1706777460, "event": "click",
     "sg_event_id": "ev-2", "sg_message_id": "m-1", "url": "https://x.io"},
    {"email": "c@x.io", "timestamp": 1706777520, "event": "bounce",
     "sg_event_id": "ev-3", "sg_message_id": "m-2", "reason": "550"},
]


def test_sendgrid_top_level_array_explodes(spark):
    out = adapt_webhook(_raw(spark, json.dumps(SENDGRID_BATCH)), "sendgrid_events")
    rows = {r["message_id"]: r for r in out.collect()}
    assert set(rows) == {"ev-1", "ev-2", "ev-3"}
    assert rows["ev-2"]["event_name"] == "click"
    assert rows["ev-2"]["user_id"] == "b@x.io"
    p = json.loads(rows["ev-2"]["payload"])
    assert p["properties"]["url"] == "https://x.io"
    assert rows["ev-3"]["event_type"] == "track"
    # redelivery-stable vendor id is the dedup key
    assert rows["ev-1"]["sent_at"] is not None


def test_intercom_topic_routing(spark):
    user_created = {
        "type": "notification_event", "id": "notif-1",
        "topic": "user.created", "created_at": 1706777400,
        "data": {"item": {"id": "u-9", "email": "u9@x.io", "name": "U Nine"}},
    }
    reply = {
        "type": "notification_event", "id": "notif-2",
        "topic": "conversation.user.replied", "created_at": 1706777500,
        "data": {"item": {"id": "c-4",
                          "conversation_message": {"body": "hello"}}},
    }
    r1 = adapt_webhook(_raw(spark, json.dumps(user_created)), "intercom_notification").head()
    assert r1["event_type"] == "identify" and r1["user_id"] == "u-9"
    assert json.loads(r1["payload"])["traits"]["email"] == "u9@x.io"
    r2 = adapt_webhook(_raw(spark, json.dumps(reply)), "intercom_notification").head()
    assert r2["event_type"] == "track"
    assert r2["event_name"] == "conversation.user.replied"
    assert json.loads(r2["payload"])["properties"]["body"] == "hello"
    assert r2["message_id"] == "notif-2"


def test_iterable_dynamic_datafields_verbatim(spark):
    body = {
        "eventName": "emailSend",
        "email": "it@x.io",
        "dataFields": {"campaignId": 12345, "custom": {"deep": [1, 2, 3]},
                       "createdAt": 1706777400},
    }
    r = adapt_webhook(_raw(spark, json.dumps(body)), "iterable_event").head()
    assert r["event_type"] == "track" and r["event_name"] == "emailSend"
    assert r["user_id"] == "it@x.io"
    p = json.loads(r["payload"])
    # dynamic subtree rides verbatim — nested arrays/objects intact
    assert p["properties"]["custom"]["deep"] == [1, 2, 3]
    assert p["properties"]["campaignId"] == 12345


def test_iterable_scalar_datafields_does_not_break_payload_json(spark):
    """ADVICE r10 #4: get_json_object returns UNQUOTED text for scalar
    subtrees; a scalar/missing dataFields must fall back to {} instead of
    splicing malformed JSON into the payload."""
    for body in (
        {"eventName": "emailSend", "email": "s@x.io", "dataFields": "abc"},
        {"eventName": "emailSend", "email": "s@x.io", "dataFields": 42},
        {"eventName": "emailSend", "email": "s@x.io"},
    ):
        r = adapt_webhook(_raw(spark, json.dumps(body)), "iterable_event").head()
        p = json.loads(r["payload"])  # must parse — the r10 bug made this throw
        assert p["properties"] == {}
        assert p["event"] == "emailSend"
    # arrays still ride verbatim
    body = {"eventName": "e", "email": "s@x.io", "dataFields": [1, {"k": "v"}]}
    r = adapt_webhook(_raw(spark, json.dumps(body)), "iterable_event").head()
    assert json.loads(r["payload"])["properties"] == [1, {"k": "v"}]


CUSTOMERIO_OPENED = {
    "event_id": "01E4C4CT6YDC7Y5M7FE1GWWPQJ",
    "object_type": "email",
    "metric": "opened",
    "timestamp": 1706777400,
    "data": {
        "customer_id": "42",
        "delivery_id": "RPILAgUBcRhIBqSfeiIwdIYJKxTY",
        "campaign_id": 23,
        "identifiers": {"id": "42", "email": "cio@x.io"},
        "recipient": "cio@x.io",
        "subject": "Re: your order",
    },
}


def test_customerio_reporting_golden(spark):
    r = adapt_webhook(
        _raw(spark, json.dumps(CUSTOMERIO_OPENED)), "customerio_reporting"
    ).head()
    assert r["message_id"] == "01E4C4CT6YDC7Y5M7FE1GWWPQJ"  # idempotent redelivery
    assert r["user_id"] == "42"
    assert r["event_type"] == "track" and r["event_name"] == "email_opened"
    p = json.loads(r["payload"])
    assert p["event"] == "email_opened"
    assert p["properties"]["campaign_id"] == 23
    assert p["properties"]["recipient"] == "cio@x.io"
    # unix timestamp → event time
    assert r["sent_at"].timetuple()[:3] == (2024, 2, 1)


TYPEFORM_RESPONSE = {
    "event_id": "LtWXD3crgy",
    "event_type": "form_response",
    "form_response": {
        "form_id": "lT4Z3j",
        "token": "a3a12ec67a1365927098a606107fac15",
        "submitted_at": "2024-01-18T18:17:02Z",
        "definition": {"title": "Customer survey"},
        "hidden": {"user_id": "u-77"},
        "answers": [
            {"type": "text", "text": "Engineer",
             "field": {"id": "DlXFaesGBpoF", "type": "short_text"}},
            {"type": "number", "number": 5,
             "field": {"id": "NRsxU591jIW9", "type": "rating"}},
        ],
    },
}


def test_typeform_response_golden(spark):
    r = adapt_webhook(
        _raw(spark, json.dumps(TYPEFORM_RESPONSE)), "typeform_response"
    ).head()
    assert r["message_id"] == "LtWXD3crgy"
    assert r["user_id"] == "u-77"
    assert r["anonymous_id"] == "a3a12ec67a1365927098a606107fac15"
    assert r["event_name"] == "form_response"
    p = json.loads(r["payload"])
    assert p["properties"]["form_id"] == "lT4Z3j"
    assert p["properties"]["form_title"] == "Customer survey"
    # dynamic answers ride verbatim inside properties
    assert p["properties"]["answers"][0]["text"] == "Engineer"
    assert p["properties"]["answers"][1]["number"] == 5
    # no hidden user / no answers: payload still parses (scalar guard +
    # non-empty properties)
    body = {"event_type": "form_response",
            "form_response": {"token": "t1", "answers": "oops"}}
    r2 = adapt_webhook(_raw(spark, json.dumps(body)), "typeform_response").head()
    p2 = json.loads(r2["payload"])
    assert p2["properties"]["answers"] == []
    assert r2["user_id"] is None and r2["anonymous_id"] == "t1"


SLACK_EVENT = {
    "token": "z26uFbvR1xHJEdHE1OQiO6t8",
    "team_id": "T123ABC456",
    "api_app_id": "A123ABC456",
    "event": {
        "type": "reaction_added",
        "user": "U123ABC456",
        "reaction": "tada",
        "channel": "C123ABC456",
        "ts": "1360782804.083113",
    },
    "type": "event_callback",
    "event_id": "Ev123ABC456",
    "event_time": 1706777400,
}


def test_slack_event_golden(spark):
    r = adapt_webhook(_raw(spark, json.dumps(SLACK_EVENT)), "slack_event").head()
    assert r["message_id"] == "Ev123ABC456"  # Slack retries share the id
    assert r["user_id"] == "U123ABC456"
    assert r["event_name"] == "reaction_added"
    p = json.loads(r["payload"])
    assert p["properties"]["team_id"] == "T123ABC456"
    assert p["properties"]["channel"] == "C123ABC456"
    assert p["properties"]["reaction"] == "tada"
    assert r["sent_at"].timetuple()[:3] == (2024, 2, 1)
