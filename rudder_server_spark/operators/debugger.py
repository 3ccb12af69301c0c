"""Live-events debugger (services/debugger/): the UI's live-tail feed.

The reference runs three uploaders — source events
(source/eventUploader.go), transformation statuses
(transformation/transformationStatusUploader.go) and destination delivery
statuses (destination/eventDeliveryStatusUploader.go) — each of which:

  1. accepts events only for ids with live-debugging enabled in the
     backend config (Handle.RecordEventDeliveryStatus:117-134,
     HasUploadEnabled:136-142);
  2. buffers at most ``LiveEvent.cache.size`` (default 3) events per key
     with a TTL (cache/internal/memory/memory.go:22-26 — latest wins);
  3. groups the buffer per id into one upload document
     (EventDeliveryStatusUploader.Transform:144-163, ``{"version":"v2",
     "<destinationId>": [statuses...]}``).

Spark-first: the enabled-ids gate is a broadcast semi-join, the bounded
per-key buffer is a per-key group limit (row_number ≤ size over a key
window — Spark plans it as WindowGroupLimit, so the corpus is never
globally sorted and each key's partition keeps only `size` rows), and the
upload grouping is one aggregation with collect_list over the already-
bounded buffer. Keys are destinations/sources — a bounded dimension — so
every stage past the gate is bounded by #keys × size, not event count.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window, functions as F


def live_events_buffer(
    df: DataFrame,
    enabled_keys: DataFrame,
    key_col: str = "destination_id",
    ts_col: str = "sent_at",
    order_col: str = "message_id",
    size: int = 3,
    ttl_hours: int | None = 3,
    now: datetime.datetime | None = None,
) -> DataFrame:
    """The per-key live-events cache state: for each ENABLED key, the
    latest ``size`` events younger than the TTL, ranked 1 = newest.

    ``enabled_keys`` is the backend-config gate (one column named like
    ``key_col``) — broadcast, like every control-plane dimension here.
    ``order_col`` breaks timestamp ties deterministically.

    ``now`` anchors the TTL cutoff and is REQUIRED while ``ttl_hours`` is
    set (the default); pass ``ttl_hours=None`` to disable age filtering
    explicitly. Raising beats silently returning an unbounded-age buffer.
    """
    if ttl_hours is not None and now is None:
        raise ValueError(
            "ttl_hours is set but now is None — pass now= to anchor the "
            "TTL cutoff, or ttl_hours=None to disable age filtering"
        )
    gated = df.join(
        F.broadcast(enabled_keys.select(key_col).distinct()), key_col, "semi"
    )
    if ttl_hours is not None:
        cutoff = now - datetime.timedelta(hours=ttl_hours)
        gated = gated.where(F.col(ts_col) >= F.lit(cutoff))
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(order_col).desc()
    )
    return (
        gated.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= size)
    )


def delivery_status_upload(
    buffered: DataFrame,
    key_col: str = "destination_id",
    payload_cols: tuple = ("message_id", "job_state", "attempt_num", "error_code"),
) -> DataFrame:
    """The uploader's Transform grouping (eventDeliveryStatusUploader.go:
    144-163): one row per key with the buffered statuses as a JSON array
    (newest first — the buffer's rank order) plus the version tag the
    upload envelope carries. Input is the bounded buffer, so collect_list
    is bounded by ``size`` per key."""
    status = F.struct(*[F.col(c) for c in payload_cols])
    return (
        buffered.groupBy(key_col)
        .agg(
            F.count("*").alias("n_buffered"),
            F.to_json(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rank"), status.alias("s")))
                ).getField("s")
            ).alias("statuses"),
        )
        .withColumn("version", F.lit("v2"))
    )
