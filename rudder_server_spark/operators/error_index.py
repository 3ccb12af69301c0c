"""Error-index reporting sink (reference enterprise/reporting/error_index/).

Failed events are indexed to parquet for the debugging UI: each failed job
becomes a payload row (types.go:28-39 — message/source/destination/
transformation/tracking-plan ids, failed stage, event type/name, and
received_at/failed_at in MICROSECONDS), grouped into files by failed-at
day/hour (worker.go:184 ``Format("2006-01-02/15")``) and sorted by
``SortingKey`` = (failed_at, destination_id, event_type, event_name,
transformation_id, tracking_plan_id) for better parquet encoding
(worker.go:269-284).

Spark-first: the payload projection is one narrow codegen'd select; the
file layout is ``partitionBy(source_id, failed_day, failed_hour)`` (the
worker's per-source file prefix + day/hour grouping becomes Hive
partitioning, so the UI's (source, time-range) lookups are partition
pruning); the sort is ``sortWithinPartitions`` — no global shuffle, the
reference sorts per file too. The rollup is the index the UI actually
queries: bounded counts per (source, destination, stage, hour).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# worker.go:280-284 — per-file sort for parquet encoding efficiency
SORTING_KEY = (
    "failed_at",
    "destination_id",
    "event_type",
    "event_name",
    "transformation_id",
    "tracking_plan_id",
)

PAYLOAD_COLS = (
    "message_id",
    "source_id",
    "destination_id",
    "transformation_id",
    "tracking_plan_id",
    "failed_stage",
    "event_type",
    "event_name",
    "received_at",
    "failed_at",
)


def error_index_payload(
    failed: DataFrame,
    message_id="message_id",
    source_id="source_id",
    destination_id="destination_id",
    transformation_id=None,
    tracking_plan_id=None,
    failed_stage="failed_stage",
    event_type="event_type",
    event_name=None,
    received_at="received_at",
    failed_at="failed_at",
) -> DataFrame:
    """Project a failed-jobs frame onto the reference payload schema
    (types.go:28-39). String args name input columns; None fills the
    reference's empty-string default; timestamps land as µs longs
    (``SetReceivedAt``/``SetFailedAt``, types.go:41-47)."""

    def scol(spec, default=""):
        return F.col(spec) if spec else F.lit(default)

    def uscol(spec):
        # already-µs longs pass through; timestamps convert
        if dict(failed.dtypes).get(spec) == "bigint":
            return F.col(spec)
        return F.unix_micros(F.col(spec).cast("timestamp"))

    return failed.select(
        scol(message_id).alias("message_id"),
        scol(source_id).alias("source_id"),
        scol(destination_id).alias("destination_id"),
        scol(transformation_id).alias("transformation_id"),
        scol(tracking_plan_id).alias("tracking_plan_id"),
        scol(failed_stage).alias("failed_stage"),
        scol(event_type).alias("event_type"),
        scol(event_name).alias("event_name"),
        uscol(received_at).alias("received_at"),
        uscol(failed_at).alias("failed_at"),
    )


def write_error_index(payload: DataFrame, out_dir: str) -> None:
    """Materialize the index: Hive-partitioned by (source, day, hour) —
    worker.go:184's day/hour file grouping under the per-source prefix —
    with the reference's per-file SortingKey order (worker.go:269-284).
    Readers prune partitions for (source, time-range) lookups."""
    ts = F.timestamp_micros(F.col("failed_at"))
    (
        payload.withColumn("failed_day", F.date_format(ts, "yyyy-MM-dd"))
        .withColumn("failed_hour", F.date_format(ts, "HH"))
        .repartition("source_id", "failed_day", "failed_hour")
        .sortWithinPartitions(*SORTING_KEY)
        .write.mode("overwrite")
        .partitionBy("source_id", "failed_day", "failed_hour")
        .parquet(out_dir)
    )


def error_index_rollup(payload: DataFrame) -> DataFrame:
    """The UI-facing index: failure counts per (source, destination,
    failed stage, hour bucket) with the failure time range and the most
    recent sample message id (max_by on the sorting key's head column).
    One shuffle on the bounded group key."""
    hour = F.date_trunc("hour", F.timestamp_micros(F.col("failed_at")))
    return (
        payload.groupBy(
            "source_id",
            "destination_id",
            "failed_stage",
            hour.alias("failed_hour"),
        )
        .agg(
            F.count("*").alias("n_failures"),
            F.min("failed_at").alias("first_failed_at"),
            F.max("failed_at").alias("last_failed_at"),
            F.expr("max_by(message_id, struct(failed_at, message_id))").alias(
                "sample_message_id"
            ),
        )
    )
