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
