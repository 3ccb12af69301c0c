"""warehouse/api status rollups — the syncs view + retry eligibility.

The reference's warehouse API serves the UI's sync listing and the retry
endpoints off the ``wh_uploads`` relation:

- ``syncsInfo`` (warehouse/internal/repo/upload.go:735-900): per upload,
  the attempt count is the SUM of ``attempt`` over every key of the
  ``error`` JSON document (gjson ForEach at upload.go:841-844 — the keys
  are per-state failure records like ``exporting_data_failed``);
  ``nextRetryTime`` (metadata JSON, RFC3339) is surfaced only for
  uploads that are neither exported nor aborted (upload.go:846-850);
  ``duration`` is ``updated_at - last_exec_at`` for finished uploads and
  ``now - last_exec_at`` for in-flight ones (upload.go:851-859).
- ``Retry`` / ``RetryCount`` (upload.go:971-1036): the eligible set is
  status = aborted (unless ForceRetry) within the trailing
  ``IntervalInHours`` window of ``created_at`` (retryQueryArgs), plus
  optional workspace/source/destination filters.

Spark-first: both are single grouped aggregates over the uploads
relation; the dynamic-key attempt sum is one ``from_json`` to
``map<string, struct<attempt>>`` + a bounded ``aggregate`` over its
values (error documents carry at most one key per upload state — a
handful), never a per-row UDF. Scale: output is bounded by
(destination, status) vocabulary; one map-side-combined shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TERMINAL_UPLOAD_STATES = ("exported_data", "aborted")


def upload_attempts(error_col: Column) -> Column:
    """gjson-ForEach parity (upload.go:841-844): sum ``attempt`` across
    every top-level key of the error document; missing/odd values count
    0, a NULL/unparseable document counts 0."""
    m = F.from_json(error_col, "map<string,struct<attempt:long>>")
    return F.coalesce(
        F.aggregate(
            F.map_values(m),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce(x["attempt"], F.lit(0)),
        ),
        F.lit(0).cast("long"),
    )


def syncs_rollup(
    uploads: DataFrame,
    now: Column,
    retry_interval_hours: int = 48,
    group_cols: tuple = ("destination_id", "status"),
) -> DataFrame:
    """The UI status counts over the uploads relation: per group, upload
    count, total attempts, how many in-flight uploads carry a usable
    nextRetryTime (upload.go:846-850 — RFC3339, skipped for exported/
    aborted), retry-eligible count (retryQueryArgs: aborted within the
    trailing window), and the longest duration (finished: updated-exec;
    in-flight: now-exec)."""
    finished = F.col("status").isin(*TERMINAL_UPLOAD_STATES)
    next_retry = F.get_json_object("metadata", "$.nextRetryTime")
    # RFC3339 the way Go's time.Parse(time.RFC3339, …) accepts it
    # (upload.go:846): 'Z' OR a numeric ±hh:mm offset, with optional
    # fractional seconds. The fraction is stripped before parsing (its
    # digit count is free-form; this check only needs validity, not
    # sub-second value) and XXX matches both Z and numeric offsets.
    # The strip is ANCHORED to the seconds position with the zone
    # immediately after — a stray '.5' after the zone ('…00Z.5') or a
    # double fraction ('…00.1.2Z'), both rejected by Go, stays in place
    # and fails try_to_timestamp instead of being laundered into a valid
    # string. Fixed-width lookbehind keeps the regex janino/ICU-safe.
    # Remaining divergence (documented): Go rejects out-of-range offsets
    # like +24:00 that XXX also rejects, but Go additionally accepts a
    # lone 'Z' only uppercase — matched, since XXX is case-sensitive too.
    next_retry_ok = (
        ~finished
        & F.try_to_timestamp(
            F.regexp_replace(
                next_retry,
                r"(?<=\d{2}:\d{2}:\d{2})\.\d+(?=(?:Z|[+-]\d{2}:\d{2})$)",
                "",
            ),
            F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"),
        ).isNotNull()
    )
    retry_eligible = (F.col("status") == "aborted") & (
        F.col("created_at")
        > now - F.expr(f"INTERVAL {int(retry_interval_hours)} HOUR")
    )
    duration = F.when(
        F.col("last_exec_at").isNotNull(),
        F.when(
            finished,
            F.unix_timestamp("updated_at") - F.unix_timestamp("last_exec_at"),
        ).otherwise(F.unix_timestamp(now) - F.unix_timestamp("last_exec_at")),
    )
    return (
        uploads.select(
            *group_cols,
            upload_attempts(F.col("error")).alias("_attempts"),
            next_retry_ok.cast("int").alias("_nr"),
            retry_eligible.cast("int").alias("_re"),
            duration.alias("_dur"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_uploads"),
            F.sum("_attempts").alias("total_attempts"),
            F.sum("_nr").alias("n_next_retry"),
            F.sum("_re").alias("n_retry_eligible"),
            F.max("_dur").alias("max_duration_sec"),
        )
    )
