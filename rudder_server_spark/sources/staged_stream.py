"""Memoized JSON restage of fixture tables for the streaming-shell queries.

The streaming declared queries (q18/q34/q36) replay a batch fixture through
Structured Streaming's file source, which needs a JSON-lines staging dir.
That parquet→JSON restage is *shell* cost, not operator cost — the
reference writes each staging file once and every downstream consumer
(processor, router, warehouse) replays the same file
(services/fileuploader, processor/processor.go:800-833) — so the restaged
source is written once per (fixture, sf) per process and shared by every
streaming query and every bench sweep. Checkpoints and sinks stay
per-query-run (a reused checkpoint would skip the replay entirely).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession, functions as F

# (fixture-kind, sf_dir) -> staged JSON dir; process-lifetime cache
_STAGED: dict = {}

# superset of the streaming queries' needs: q34 reads (user_id, tsus,
# value), q36 reads (event_id, user_id, event_type, tsus) — the JSON
# source is schema-on-read, so each query's explicit readStream schema
# simply ignores the columns it doesn't use
EVENTS_STREAM_COLS = ("event_id", "user_id", "event_type", "tsus", "value")


def staged_events_parquet(spark: SparkSession, sf: str) -> str:
    """Shared parquet restage of the `events` fixture (µs-precision ts).

    Parquet, not JSON: q18 streams the S4 staging-file format (JSON-lines,
    the gateway dump contract), but q34/q36 replay the generic `events`
    fixture — a columnar replay source, so each streaming leg prunes to
    the columns it reads instead of re-parsing every JSON line per leg
    (q36's two stream legs scan the source twice)."""
    key = ("events", sf)
    if key not in _STAGED:
        from rudder_server_spark.sources.fixtures import load_table

        src = tempfile.mkdtemp(prefix="rss_staged_events_") + "/src"
        e = load_table(spark, sf, "events")
        (
            e.select(
                "event_id",
                "user_id",
                "event_type",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("tsus"),
                "value",
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        _STAGED[key] = src
    return _STAGED[key]


def staged_rudder_events_json(spark: SparkSession, sf: str, max_message_id: str = "msg-001000") -> str:
    """Shared JSON restage of the rudder_events envelope subset q18 streams."""
    key = ("rudder_events", sf, max_message_id)
    if key not in _STAGED:
        from rudder_server_spark.sources.rudder_events import rudder_events_path

        src = tempfile.mkdtemp(prefix="rss_staged_re_") + "/src"
        subset = spark.read.parquet(rudder_events_path(sf)).where(
            F.col("message_id") < max_message_id
        )
        subset.coalesce(4).write.mode("overwrite").json(src)
        _STAGED[key] = src
    return _STAGED[key]


def stream_scratch_dir(prefix: str) -> str:
    """Scratch dir for streaming checkpoints/sinks in local mode: RAM-backed
    (/dev/shm) when available — the offset/commit-log and sink-commit fsyncs
    are the measured fixed cost of each availableNow trigger, and local-mode
    scratch is transient by definition (same reasoning as session.py's
    spark.local.dir). A cluster deployment points checkpoints at durable
    object storage instead; override with $SPARK_GRAFT_STREAM_SCRATCH."""
    import os

    base = os.environ.get(
        "SPARK_GRAFT_STREAM_SCRATCH",
        "/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    return tempfile.mkdtemp(prefix=prefix, dir=base)
