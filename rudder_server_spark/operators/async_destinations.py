"""Async/bulk destination delivery (SURVEY §2 batch-router third mode).

The reference delivers events three ways: per-event HTTP (router/), batched
object-storage/warehouse files (batchrouter/), and ASYNC BULK UPLOADS
(router/batchrouter/asyncdestinationmanager/, ~12k LoC): jobs are grouped
per destination into a bulk-upload file, shipped to the destination's bulk
API, then a poll loop fetches the import status and per-record
success/failure is joined back onto job statuses. Interface:
``Upload / Poll / GetUploadStats`` (common/common.go:17-26), lifecycle
``asyncUploadWorker`` / ``sendJobsToStorage`` (handle_async.go:410-560),
upload-file line format ``GetMarshalledData`` (common/common.go:152-166),
per-record outcome ``EventStatMeta`` (common/common.go:136-144), registry
(manager.go:26-82, common/utils.go:11-32).

Spark-first mapping — everything is a bounded window/groupBy, no driver
loops:

- batch formation  → window ``row_number`` per (destination, upload
                     window) ordered by delivery order, integer-divided by
                     the per-file event cap (``maxEventsInABatch``,
                     handle_async.go:372-373; marketo's 10 MB/30k-row file
                     limits, marketo-bulk-upload/utils.go:23) → a
                     ``part_file_number`` (asyncStructSetup,
                     handle_async.go:464-495);
- upload file      → one JSON-lines (or headered CSV) file per upload_id,
                     written with ``partitionBy`` — each upload is one
                     object, exactly the reference's staged .txt file;
- poll             → an upload-level status table. In production this is
                     an external API call per upload (bounded by upload
                     count, not event count); here it is an injected or
                     deterministic DataFrame — the seam keeps the engine
                     testable without destination credentials;
- GetUploadStats   → per-record outcome join-back: upload status joined to
                     member jobs, record-level failed/aborted keys applied
                     (broadcast — poll results are tiny);
- setMultipleJobStatus → final per-job state: succeeded / failed
                     (retryable) / aborted, plus per-upload import stats.

At 100 TB the only shuffle is the (destination, window) repartition for
batch numbering — the same key the upload files are written under, so
batching, file write, and stats reuse one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# common/utils.go:11-20 — the registered async destination types.
ASYNC_DESTINATIONS = (
    "MARKETO_BULK_UPLOAD",
    "BINGADS_AUDIENCE",
    "ELOQUA",
    "YANDEX_METRICA_OFFLINE_EVENTS",
    "BINGADS_OFFLINE_CONVERSIONS",
    "KLAVIYO_BULK_UPLOAD",
    "LYTICS_BULK_UPLOAD",
    "SNOWPIPE_STREAMING",
    "SALESFORCE_BULK_UPLOAD",
    "BQSTREAM_ALL_EVENTS",
)
SFTP_DESTINATIONS = ("SFTP",)
ALL_ASYNC_DESTINATIONS = ASYNC_DESTINATIONS + SFTP_DESTINATIONS

# upload-file format per destination contract: marketo/eloqua ship headered
# CSV (marketobulkupload.go:306-330, eloqua field CSV), the rest JSON lines
CSV_DESTINATIONS = ("MARKETO_BULK_UPLOAD", "ELOQUA")


def is_sftp_destination(name: str) -> bool:
    """common/utils.go:22-24."""
    return name in SFTP_DESTINATIONS


def is_async_regular_destination(name: str) -> bool:
    """common/utils.go:26-28."""
    return name in ASYNC_DESTINATIONS


def is_async_destination(name: str) -> bool:
    """common/utils.go:30-32."""
    return name in ALL_ASYNC_DESTINATIONS


def upload_file_format(dest_type: str) -> str:
    """'csv' or 'json' — the bulk-file contract for a destination type."""
    if not is_async_destination(dest_type):
        raise ValueError(f"invalid destination type: {dest_type!r}")
    return "csv" if dest_type in CSV_DESTINATIONS else "json"


def marshal_jobs(
    df: DataFrame,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    out_col: str = "marshalled",
) -> DataFrame:
    """``GetMarshalledData`` (common/common.go:152-166): wrap each job's
    payload as ``{"message": <payload>, "metadata": {"job_id": N}}``.

    The payload is already a JSON document, so the wrapper is pure string
    assembly — one JVM-side concat, no parse, no Python. Rows whose payload
    is NULL get a NULL line (the reference returns an error per job there;
    callers route those to the failed set).
    """
    line = F.concat(
        F.lit('{"message": '),
        F.col(payload_col),
        F.lit(', "metadata": {"job_id": '),
        F.col(job_id_col).cast("string"),
        F.lit("}}"),
    )
    return df.withColumn(out_col, line)


def assign_upload_batches(
    jobs: DataFrame,
    dest_col: str = "destination_id",
    ts_col: str = "ts",
    order_col: str = "job_id",
    upload_window: str = "day",
    max_events_per_file: int = 10_000,
) -> DataFrame:
    """Group jobs into bulk-upload files: one ``upload_id`` per
    (destination, upload window, part file).

    The upload window is the reference's ``uploadIntervalMap`` timeout
    (asyncUploadWorker, handle_async.go:410-460: a destination's
    accumulating file is shipped every interval); the part number is
    ``PartFileNumber`` (handle_async.go:444,485) driven by the per-file
    event cap (``maxEventsInABatch``, handle_async.go:372-373).

    Adds ``upload_window`` (timestamp), ``part_file_number`` (int) and
    ``upload_id`` (string). One shuffle on (destination, window); the
    row_number's sort is within those bounded partitions.
    """
    w = W.partitionBy(dest_col, "upload_window").orderBy(ts_col, order_col)
    return (
        jobs.withColumn("upload_window", F.date_trunc(upload_window, F.col(ts_col)))
        .withColumn(
            "part_file_number",
            ((F.row_number().over(w) - F.lit(1)) / F.lit(max_events_per_file))
            .cast("int"),
        )
        .withColumn(
            "upload_id",
            F.concat_ws(
                "/",
                F.col(dest_col),
                F.date_format("upload_window", "yyyy-MM-dd'T'HH:mm:ss"),
                F.col("part_file_number").cast("string"),
            ),
        )
    )


def write_upload_files(
    batched: DataFrame,
    out_dir: str,
    dest_col: str = "destination_id",
    line_col: str = "marshalled",
) -> None:
    """Materialize one staged bulk file per upload: text lines partitioned
    by (destination, window, part) — the distributed analogue of the
    reference's per-destination staged ``.txt`` file (asyncStructSetup,
    handle_async.go:464-475). The partition columns ARE the upload id, so
    a poll worker lists exactly one directory per upload."""
    (
        batched.select(
            F.col(dest_col),
            F.date_format("upload_window", "yyyy-MM-dd'T'HH").alias("upload_window_part"),
            F.col("part_file_number"),
            F.col(line_col).alias("value"),
        )
        .repartition(F.col(dest_col), F.col("upload_window_part"), F.col("part_file_number"))
        .write.mode("overwrite")
        .partitionBy(dest_col, "upload_window_part", "part_file_number")
        .text(out_dir)
    )


def simulate_poll(uploads: DataFrame, fail_hex_digits: tuple = ("0", "1", "2")) -> DataFrame:
    """Deterministic stand-in for ``Poll`` (common/common.go:53-62): one
    status row per upload. An upload whose md5(upload_id) leads with one of
    ``fail_hex_digits`` polls back ``HasFailed`` (its records go through
    GetUploadStats triage); the rest poll ``Complete``. Production swaps
    this for the destination's real poll endpoint — statuses per UPLOAD,
    so the table is bounded by upload count, never event count."""
    return uploads.select(
        "upload_id",
        F.substring(F.md5(F.col("upload_id")), 1, 1)
        .isin(*fail_hex_digits)
        .alias("has_failed"),
    ).withColumn("status_code", F.lit(200))


def finalize_job_statuses(
    batched: DataFrame,
    poll: DataFrame,
    abort_hex_digit: str = "f",
    job_id_col: str = "job_id",
) -> DataFrame:
    """``GetUploadStats`` + ``setMultipleJobStatus``: join the upload-level
    poll verdict back to member jobs and derive each record's final state.

    - upload Complete → every member job ``succeeded``;
    - upload HasFailed → per-record triage (EventStatMeta FailedKeys vs
      AbortedKeys, common/common.go:136-144): records whose
      md5(job_id) leads with ``abort_hex_digit`` are ``aborted``
      (non-retryable), the rest ``failed`` (retryable, re-queued with
      attempt+1 by the router's retry sweep).

    The poll frame is one row per upload — broadcast it; the join adds no
    shuffle beyond the batching exchange. An upload ABSENT from the poll
    frame (partial poll results) stays ``importing`` — the reference keeps
    un-polled uploads in the importing state rather than triaging them
    (common/common.go:53-62 Poll lifecycle); a NULL verdict must never fall
    through to the failed/aborted branches.
    """
    pj = F.broadcast(poll.select("upload_id", "has_failed"))
    joined = batched.join(pj, "upload_id", "left")
    aborted = F.substring(F.md5(F.col(job_id_col).cast("string")), 1, 1) == abort_hex_digit
    return joined.withColumn(
        "final_state",
        F.when(F.col("has_failed").isNull(), F.lit("importing"))
        .when(~F.col("has_failed"), F.lit("succeeded"))
        .when(aborted, F.lit("aborted"))
        .otherwise(F.lit("failed")),
    )


def import_stats(
    finalized: DataFrame,
    dest_col: str = "destination_id",
) -> DataFrame:
    """Per-upload import stats (the GetUploadStatsResponse rollup the
    reference records per import): member-job count plus
    succeeded/failed/aborted splits. Groups on the batching key — AQE
    reuses the same exchange; the output is bounded by upload count."""
    return finalized.groupBy(
        dest_col, "upload_window", "part_file_number", "upload_id"
    ).agg(
        F.count("*").alias("n_jobs"),
        F.sum(F.when(F.col("final_state") == "succeeded", 1).otherwise(0)).alias("succeeded"),
        F.sum(F.when(F.col("final_state") == "failed", 1).otherwise(0)).alias("failed"),
        F.sum(F.when(F.col("final_state") == "aborted", 1).otherwise(0)).alias("aborted"),
    )
