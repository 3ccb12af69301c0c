"""Snowpipe-streaming async destination (router/batchrouter/
asyncdestinationmanager/snowpipestreaming/).

The reference ships warehouse events to Snowflake through streaming
channels: staged job lines are grouped per target TABLE
(snowpipestreaming.go:207-209), each table group is size-split against the
max insert-request size (splitEventsExceedingMaxInsertRequestSize,
snowpipestreaming.go:394-430), a channel is created per table and the
group is inserted with offset = the group's latest job id
(sendEventsToSnowpipe, snowpipestreaming.go:436-515), and the poll loop
joins per-channel committed/inserted offsets back to import verdicts
(isInProgress, snowpipestreaming.go:790-831) and finally to per-job
success/failure (GetUploadStats, snowpipestreaming.go:1110-1163).

Spark-first mapping — one shuffle on the table key, reused end-to-end:

- ``split_insert_requests``: the reference scans each table group in
  staged order, skips single events larger than the cap (``oversized`` →
  aborted), and STOPS at the first event that would push the cumulative
  rows-JSON size (``'['+rows+','+...+']'``) past the cap, overflowing the
  rest to preserve job order on retry. Because the cumulative size is
  monotone over the non-oversized subsequence, the break IS a prefix
  cutoff — so the whole split is one window cumsum per table, pure
  codegen, no fold needed (contrast the marketo/bing-ads accept-or-skip
  fold in provider_uploads.sequential_accept, which is not monotone).
- ``upload_infos``: per-table channel insert descriptors — offset =
  max(job id) (the latestJobID the reference commits as the channel
  offset), event count. The channel-create/insert HTTP calls are an
  injectable seam (same convention as publish_kafka / send_kv): callers
  map table → channel id via a broadcastable dimension or the
  deterministic default.
- ``duplicate_stats``: the two pre-insert duplicate probes — ids repeated
  within the batch (checkForDuplicateIDsInBatch, :517-537, skipped for
  the users table) and jobs at-or-below the channel's committed offset
  (checkForDuplicatesDueToOffset, :539-581, only when the status is
  valid+success; negative migration job ids ignored).
- ``poll_import_status``: the three-way offset comparison —
  committed == expected → imported; inserted < expected → failed with the
  lost-job range [committed+1, expected]; inserted > committed → still in
  progress; anything else → failed (unexpected state).
- ``finalize_snowpipe_jobs``: GetUploadStats — member jobs join their
  table's verdict; failed tables fail only jobs inside the lost range and
  succeed the rest.

Scale: tables are a bounded dimension (warehouse schema), so upload_infos
/ statuses / verdicts are tiny broadcastable relations; the only
corpus-sized operations are the per-table window (one exchange) and the
final verdict join-back (broadcast). Idempotent replay: re-uploading a
committed batch yields the same import infos, and every replayed job is
counted by the offset duplicate probe — pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

USERS_TABLE = "USERS"  # whutils.ToProviderCase(SnowpipeStreaming, UsersTable)


def split_insert_requests(
    events: DataFrame,
    max_insert_bytes: int,
    table_col: str = "table",
    job_id_col: str = "job_id",
    size_col: str = "data_bytes",
) -> DataFrame:
    """splitEventsExceedingMaxInsertRequestSize (snowpipestreaming.go:
    394-430) as one window per table. Adds ``disposition``:

    - ``oversized``  — the event alone exceeds the cap (aborted);
    - ``included``   — fits in the cumulative rows-JSON budget
      (``2`` for brackets + sizes + a comma per additional row);
    - ``overflowed`` — everything after the first non-fitting event
      (failed for retry, order preserved).

    ``size_col`` is MessageDataByteSize — the raw byte length of the
    event's ``message.data`` subtree (eventsFromFile, :376).

    CONTRACT (enforced, loudly): ``job_id_col`` is unique per table —
    jobsdb ids are — because the window's cumulative total at a tie is
    order-dependent, so a duplicate key would make the included/
    overflowed boundary nondeterministic. A ``lag`` over the SAME
    window spec detects adjacent duplicates with no extra exchange and
    raises instead of silently flaking.
    """
    over = F.col(size_col) > max_insert_bytes
    non_over = events.where(~over)
    w = (
        W.partitionBy(table_col)
        .orderBy(job_id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rn = F.count("*").over(w)
    batch_bytes = F.lit(2) + F.sum(size_col).over(w) + (rn - F.lit(1))
    dup = (
        F.lag(job_id_col).over(W.partitionBy(table_col).orderBy(job_id_col))
        == F.col(job_id_col)
    )
    split = non_over.withColumn(
        "disposition",
        F.when(
            dup,
            F.raise_error(
                F.concat(
                    F.lit(
                        "split_insert_requests: duplicate (table, job_id) "
                        "key — the size split requires unique job ids: "
                    ),
                    F.col(table_col).cast("string"),
                    F.lit("/"),
                    F.col(job_id_col).cast("string"),
                )
            ).cast("string"),
        )
        .when(batch_bytes <= max_insert_bytes, "included")
        .otherwise("overflowed"),
    )
    return split.unionByName(
        events.where(over).withColumn("disposition", F.lit("oversized"))
    )


def upload_infos(
    included: DataFrame,
    table_col: str = "table",
    job_id_col: str = "job_id",
    channels: DataFrame | None = None,
) -> DataFrame:
    """Per-table channel insert descriptors (sendEventsToSnowpipe →
    importInfo, snowpipestreaming.go:505-512): offset = the group's max
    job id (latestJobID — what the reference commits as the channel
    offset, :442), count = events inserted. ``channels`` is the
    injectable table→``channel_id`` dimension (the channel-create HTTP
    seam); omitted, a deterministic ``ch-<table>`` id stands in. The
    relation is bounded by table count — broadcast it downstream."""
    infos = included.groupBy(table_col).agg(
        F.max(job_id_col).alias("offset"),
        F.count("*").alias("count"),
    )
    if channels is not None:
        return infos.join(F.broadcast(channels), table_col, "left")
    return infos.withColumn(
        "channel_id", F.concat(F.lit("ch-"), F.col(table_col))
    )


def duplicate_stats(
    included: DataFrame,
    statuses: DataFrame | None = None,
    table_col: str = "table",
    job_id_col: str = "job_id",
    id_col: str = "id",
    channel_col: str = "channel_id",
) -> DataFrame:
    """The two pre-insert duplicate probes, per table:

    - ``dup_in_batch`` — events whose ``id`` repeats within the batch
      (total ids minus distinct ids; events without an id don't count;
      the users table is exempt — checkForDuplicateIDsInBatch,
      snowpipestreaming.go:493,517-537);
    - ``dup_due_to_offset`` — non-negative job ids at or below the
      channel's committed offset (checkForDuplicatesDueToOffset,
      :539-581), counted only when the channel status is valid+success.

    ``statuses`` carries (channel_id, committed_offset, valid, success);
    None → offset probe reports 0 (no cached status, like the reference's
    error path)."""
    base = included.groupBy(table_col).agg(
        F.when(
            F.col(table_col) == USERS_TABLE, F.lit(0).cast("long")
        )
        .otherwise(F.count(id_col) - F.countDistinct(id_col))
        .alias("dup_in_batch"),
    )
    if statuses is None:
        return base.withColumn("dup_due_to_offset", F.lit(0).cast("long"))
    chan = upload_infos(included, table_col, job_id_col).select(
        table_col, "channel_id"
    )
    st = F.broadcast(
        statuses.where(F.col("valid") & F.col("success")).select(
            F.col(channel_col), F.col("committed_offset")
        )
    )
    dups = (
        included.join(F.broadcast(chan), table_col)
        .join(st, "channel_id")
        .where(
            (F.col(table_col) != USERS_TABLE)
            & (F.col(job_id_col) >= 0)
            & (F.col(job_id_col) <= F.col("committed_offset"))
        )
        .groupBy(table_col)
        .agg(F.count("*").alias("dup_due_to_offset"))
    )
    return base.join(dups, table_col, "left").fillna(0, ["dup_due_to_offset"])


def poll_import_status(
    import_infos: DataFrame,
    statuses: DataFrame,
    channel_col: str = "channel_id",
) -> DataFrame:
    """isInProgress (snowpipestreaming.go:790-831): join each import's
    expected offset to the channel's (committed, latest-inserted) pair:

    - committed == expected            → ``imported``;
    - inserted  <  expected            → ``failed`` (events lost; the
      retriable range is [committed+1, expected]);
    - inserted  >  committed           → ``in_progress`` (keep polling);
    - otherwise                        → ``failed`` (unexpected state).

    A channel MISSING from the status relation stays ``in_progress`` —
    the un-polled-stays-importing rule every async manager follows.
    Both relations are bounded by channel count."""
    st = statuses.select(
        channel_col,
        F.col("committed_offset"),
        F.col("latest_inserted_offset"),
    )
    j = import_infos.join(F.broadcast(st), channel_col, "left")
    return j.select(
        "*",
        F.when(F.col("committed_offset").isNull(), F.lit("in_progress"))
        .when(F.col("committed_offset") == F.col("offset"), F.lit("imported"))
        .when(F.col("latest_inserted_offset") < F.col("offset"), F.lit("failed"))
        .when(
            F.col("latest_inserted_offset") > F.col("committed_offset"),
            F.lit("in_progress"),
        )
        .otherwise(F.lit("failed"))
        .alias("verdict"),
        F.when(
            F.col("latest_inserted_offset") < F.col("offset"),
            F.col("committed_offset") + 1,
        ).alias("failed_start"),
        F.when(
            F.col("latest_inserted_offset") < F.col("offset"), F.col("offset")
        ).alias("failed_end"),
    )


def finalize_snowpipe_jobs(
    jobs: DataFrame,
    verdicts: DataFrame,
    table_col: str = "table",
    job_id_col: str = "job_id",
) -> DataFrame:
    """GetUploadStats (snowpipestreaming.go:1110-1163): member jobs take
    their table's verdict — ``succeeded`` under an imported table;
    under a failed table only jobs INSIDE the lost range
    [failed_start, failed_end] fail, the rest succeeded (the channel
    committed them before the failure); ``importing`` while the channel
    is still in progress. Verdicts are per-table — broadcast."""
    v = F.broadcast(
        verdicts.select(
            table_col, "verdict", "failed_start", "failed_end"
        )
    )
    j = jobs.join(v, table_col, "left")
    in_range = (
        F.col("failed_start").isNull()
        | (
            (F.col(job_id_col) >= F.col("failed_start"))
            & (F.col(job_id_col) <= F.col("failed_end"))
        )
    )
    return j.withColumn(
        "final_state",
        F.when(F.col("verdict").isNull() | (F.col("verdict") == "in_progress"), "importing")
        .when(F.col("verdict") == "imported", "succeeded")
        .when(in_range, "failed")
        .otherwise("succeeded"),
    ).drop("verdict", "failed_start", "failed_end")
