"""jobsdb-style scans over parquet job tables (reference S3/J1/J2/W1).

The reference's jobsdb is PostgreSQL dataset pairs with a
latest-status-per-job view (``DISTINCT ON (job_id) ... ORDER BY id DESC``,
jobsdb/jobsdb_dataset_ddl.go:242) and ordered limited scans with
state/parameter filters (jobsdb/jobsdb_get.go:343-675). On Spark the jobs
log is a parquet/Delta table of status events; the view is a window.

All helpers return lazy DataFrames — filters/limits push into the scan
(dataset range pruning ≈ parquet min/max + partition pruning; SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_status(
    statuses: DataFrame, job_id: str = "job_id", seq: str = "status_id"
) -> DataFrame:
    """W1/J1: one row per job — its latest status (the ``v_last_`` view)."""
    w = Window.partitionBy(job_id).orderBy(F.col(seq).desc())
    return (
        statuses.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def unprocessed_jobs(
    jobs: DataFrame,
    statuses: DataFrame,
    job_id: str = "job_id",
    terminal_states: tuple = ("succeeded", "aborted", "migrated", "filtered"),
    state_col: str = "job_state",
    seq: str = "status_id",
) -> DataFrame:
    """J2 pileup: jobs with no status row, or whose latest status is
    non-terminal (jobsdb_get.go:86-133). ``seq`` is the latest-status
    ordering column, threaded to latest_status so callers with a
    different status-sequence column (e.g. the reference's ``id``) get a
    consistent definition of "latest" here and in their own rollups."""
    last = latest_status(statuses, job_id, seq=seq)
    joined = jobs.join(last.select(job_id, state_col), [job_id], "left")
    return joined.where(
        F.col(state_col).isNull() | ~F.col(state_col).isin(list(terminal_states))
    )


def ordered_pickup(
    jobs: DataFrame,
    job_id: str = "job_id",
    limit: int | None = None,
    event_count_col: str | None = None,
    max_events: int | None = None,
) -> DataFrame:
    """§2.7 ordered scan with job/event-count limits: ``ORDER BY job_id
    LIMIT n`` plus the cumulative-event-count cap (one extra row kept so a
    single oversized job still returns — jobsdb_get.go:550-570)."""
    out = jobs.orderBy(job_id)
    if event_count_col and max_events is not None:
        w = Window.orderBy(job_id).rowsBetween(Window.unboundedPreceding, 0)
        out = (
            out.withColumn("_running", F.sum(event_count_col).over(w))
            .where((F.col("_running") - F.col(event_count_col)) < max_events)
            .drop("_running")
        )
    if limit is not None:
        out = out.limit(limit)
    return out


def compact_datasets(
    spark,
    in_paths: list,
    out_path: str,
    keep: "Column | None" = None,
    target_file_mb: int = 256,
) -> int:
    """Dataset compaction (jobsdb/jobsdb_compaction.go): copy the jobs still
    worth keeping forward into one right-sized dataset and let the caller
    drop the old ones.

    The reference walks dataset pairs and rewrites unfinished jobs into the
    next pair; the Spark shape is a filtered rewrite with file sizing:
    ``keep`` is the survival predicate (e.g. latest status not terminal),
    and the output is coalesced so files land near ``target_file_mb`` —
    the OPTIMIZE/compaction knob that keeps scan parallelism sane after
    many small streaming micro-batch writes. Returns the file count written.
    """
    import math
    import os

    from pyspark.sql import functions as F

    df = spark.read.parquet(*in_paths)
    if keep is not None:
        df = df.where(keep)
    # size from the SOURCE bytes (cheap, driver-side listing) scaled by the
    # survival fraction of the keep predicate — without the scaling a
    # selective predicate would emit many near-empty files, recreating the
    # small-files problem compaction exists to fix. Total rows come from
    # parquet footers (no data scan); kept rows are one column-pruned
    # filtered count, cheap next to the rewrite itself.
    src_bytes = 0
    parquet_files = []
    for p in in_paths:
        for root, _, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    parquet_files.append(os.path.join(root, f))
                    src_bytes += os.path.getsize(os.path.join(root, f))
    survival = 1.0
    if keep is not None:
        import pyarrow.parquet as pq

        total_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in parquet_files)
        survival = (df.count() / total_rows) if total_rows else 1.0
    n_files = max(1, math.ceil(src_bytes * survival / (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def cleanup_failed_keys(
    keys: DataFrame,
    records: DataFrame,
    before,
    run_col: str = "job_run_id",
    id_col: str = "id",
    ts_col: str = "ts",
) -> DataFrame:
    """J9 rsources retention sweep: expire every job run whose LAST
    activity is at or before ``before``, keeping all keys of still-live
    runs (services/rsources/handler.go:416-427 cleanupTablesBefore —
    failed-keys join their records on id, a run's liveness is the max
    record timestamp across all its keys).

    Returns the surviving keys frame (the relational complement of the
    reference's DELETE). Scale shape: liveness is one partial-agg
    group-by over the bounded run-id vocabulary; the expired-run set is
    tiny → broadcast anti-join, so the corpus shuffles zero times.
    """
    last = (
        keys.select(run_col, id_col)
        .join(records.select(id_col, ts_col), id_col)
        .groupBy(run_col)
        .agg(F.max(ts_col).alias("_mts"))
    )
    expired = last.where(F.col("_mts") <= F.lit(before)).select(run_col)
    return keys.join(F.broadcast(expired), run_col, "left_anti")


def cleanup_stats(
    stats: DataFrame,
    before,
    run_col: str = "job_run_id",
    ts_col: str = "ts",
) -> DataFrame:
    """J9 companion: rsources_stats rows of runs idle since ``before``
    expire (handler.go:408-414 — liveness is the run's own max ts)."""
    last = stats.groupBy(run_col).agg(F.max(ts_col).alias("_mts"))
    expired = last.where(F.col("_mts") <= F.lit(before)).select(run_col)
    return stats.join(F.broadcast(expired), run_col, "left_anti")


def notifier_sweep(
    jobs: DataFrame,
    now: Column,
    orphan_timeout_hours: int = 24,
    slots: int = 64,
    workers: int = 8,
    id_col: str = "id",
    priority_col: str = "priority",
    status_col: str = "status",
    exec_ts_col: str = "last_exec_time",
) -> DataFrame:
    """One tick of the warehouse notifier queue (services/notifier) as a
    deterministic batch transition. Two rules, applied in the reference's
    order:

    1. Orphan requeue (repo.go:480-512 orphanJobIDs): 'executing' jobs
       whose last_exec_time is at least ``orphan_timeout_hours`` old go
       back to 'waiting' — the worker died holding the claim.
    2. Claim round (repo.go:350-394 claim): among 'waiting' OR 'failed'
       jobs (failed jobs re-claim as-is; the attempt>maxAttempt abort
       happens on the NEXT failure, repo.go:400-435), the first ``slots``
       in (priority ASC, id ASC) order become 'executing', assigned
       round-robin to ``workers`` claimants — the batch twin of ``FOR
       UPDATE SKIP LOCKED LIMIT 1`` per worker.

    Adds ``new_status`` and ``worker_id`` (null when unclaimed). One
    row_number window over the claim-eligible subset; the orphan rule is a
    narrow codegen'd projection. At scale the window partitions by nothing
    but filters first to the eligible fraction — bound ``slots`` to the
    worker fleet, not the queue, so the global rank stops at a
    TakeOrdered-sized frontier in practice (rank > slots rows keep their
    status and never need exact ranks; Spark still computes them in one
    pass here, matching the SQL oracle exactly).
    """
    orphaned = F.when(
        (F.col(status_col) == "executing")
        & (F.col(exec_ts_col) <= F.timestamp_add("HOUR", F.lit(-orphan_timeout_hours), now)),
        F.lit("waiting"),
    ).otherwise(F.col(status_col))
    staged = jobs.withColumn("_st1", orphaned)
    claimable = F.col("_st1").isin("waiting", "failed")
    w = Window.orderBy(priority_col, id_col)
    ranked = staged.withColumn(
        "_rk",
        F.when(claimable, F.row_number().over(w.partitionBy(claimable))).otherwise(
            F.lit(None)
        ),
    )
    claimed = claimable & (F.col("_rk") <= slots)
    return (
        ranked.withColumn(
            "new_status", F.when(claimed, F.lit("executing")).otherwise(F.col("_st1"))
        )
        .withColumn(
            "worker_id",
            F.when(
                claimed,
                F.concat(F.lit("w-"), ((F.col("_rk") - 1) % workers).cast("string")),
            ),
        )
        .drop("_st1", "_rk")
    )


def compaction_replay(
    jobs: DataFrame,
    statuses: DataFrame,
    max_ds_size: int = 100_000,
    pair_threshold: float = 0.05,
    max_compact_once: int = 6,
    max_ds_probe: int = 10,
    terminal_states: tuple = ("succeeded", "aborted", "migrated", "filtered"),
    ds_col: str = "ds_index",
    job_id: str = "job_id",
    seq: str = "status_id",
    state_col: str = "job_state",
    max_datasets: int = 100_000,
):
    """One compaction cycle over an ordered dataset list as SET OPERATIONS
    (jobsdb/jobsdb_compaction.go, single-consumer flavor): pick the
    eligible source datasets, copy their UNFINISHED jobs (no status row,
    or latest status non-terminal — copyJobsInTx:518-534) plus the
    latest status of every copied job (copyJobStatusesInTx:553-560) into
    one new destination dataset, and drop the sources. Re-running on the
    output never loses or duplicates a pending job — the fold is
    idempotent on the pending set (unit-pinned).

    Eligibility per dataset (checkIfCompactDS:862-967, retention knobs
    off — they gate on wall-clock age, which a batch replay pins
    upstream): recordsLeft = totalJobs − jobs whose latest status is
    terminal; compact alone when recordsLeft == 0; ``needsPair`` when
    0 < recordsLeft < pair_threshold × max_ds_size. The selection scan
    (getCompactionList:308-407) is replayed exactly: the last dataset is
    exempt (it is being written to), at most ``max_compact_once`` sources
    per cycle, the copied-pending total is capped at ``max_ds_size``, a
    needs-pair dataset WAITS for its neighbour and is dropped from
    waiting when the neighbour is ineligible, and the scan stops at the
    first ineligible dataset once any source was chosen (or after
    ``max_ds_probe`` fruitless probes).

    The per-dataset stats are ONE map-side-combined aggregate (dataset
    count rows, not job rows); the selection fold runs driver-side over
    that bounded list (raise-over-cap contract at ``max_datasets`` —
    dataset count is corpus/max_ds_size by construction, so the collect
    is bounded by the same knob that bounds Postgres table count in the
    reference). The copy/drop is pure DataFrame algebra — no job-level
    driver state.

    Returns ``(jobs_out, statuses_out, report)``: the post-compaction
    relations with ``ds_label`` (string — surviving datasets keep their
    index's text; the destination is '<firstEligible>_c', standing in
    for the reference's dsindex levels, jobsdb_dataset_ddl.go:20-73)
    and a small dict report. When the selection picks sources whose
    pending total is ZERO, the sources are dropped with NO destination
    (doCompaction:626's pure async-drop path).
    """
    from pyspark.sql import Window

    last = latest_status(statuses, job_id=job_id, seq=seq)
    term = F.col(state_col).isin(list(terminal_states))
    per_job = jobs.select(ds_col, job_id).join(
        last.select(job_id, state_col), [job_id], "left"
    )
    stats = (
        per_job.groupBy(ds_col)
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(term, 1).otherwise(0)).alias("terminal"),
        )
        .orderBy(ds_col)
    )
    rows = stats.limit(max_datasets + 1).collect()
    if len(rows) > max_datasets:
        raise RuntimeError(
            f"compaction_replay: >{max_datasets} datasets — raise "
            "max_datasets explicitly if this corpus really has that many "
            "(dataset count is corpus/max_ds_size by construction)"
        )

    # getCompactionList replay (the selection fold, driver-side over the
    # bounded dataset list)
    selected: list = []
    live = 0
    pending = 0
    waiting = None  # (ds, recordsLeft)
    probes = 0
    for i, r in enumerate(rows):
        idx_check = i == len(rows) - 1
        if live >= max_compact_once or pending >= max_ds_size or idx_check:
            break
        left = int(r["total"]) - int(r["terminal"])
        needs_pair = 0 < left < pair_threshold * max_ds_size
        compact = needs_pair or left == 0
        if compact:
            if not needs_pair:
                selected.append(r[ds_col])
                pending += left
                live += 1
            elif waiting is not None:
                if waiting[1] + left > max_ds_size:
                    waiting = None
                else:
                    selected.extend([waiting[0], r[ds_col]])
                    pending += waiting[1] + left
                    live += 2
                    waiting = None
            elif pending > 0:
                if pending + left > max_ds_size:
                    break
                selected.append(r[ds_col])
                pending += left
                live += 1
                waiting = None
            else:
                waiting = (r[ds_col], left)
        else:
            waiting = None
            if live > 0:
                break
            if probes > max_ds_probe:
                break
        probes += 1

    label = F.col(ds_col).cast("string").alias("ds_label")
    if not selected:
        return (
            jobs.select("*", label),
            statuses.select("*", label),
            {"sources": [], "pending_copied": 0, "dest": None},
        )

    dest = f"{min(selected)}_c"
    in_sel = F.col(ds_col).isin(selected)
    survivors_j = jobs.where(~in_sel).select("*", label)
    survivors_s = statuses.where(~in_sel).select("*", label)
    if pending == 0:
        # async-drop path: every job in every source is terminal — drop
        # the sources, create nothing (doCompaction:626)
        return survivors_j, survivors_s, {
            "sources": selected, "pending_copied": 0, "dest": None,
        }

    # copyJobsInTx (single-consumer): latest status NULL or non-terminal
    src_jobs = jobs.where(in_sel)
    keep = unprocessed_jobs(
        src_jobs, statuses.where(in_sel), job_id=job_id,
        terminal_states=terminal_states, state_col=state_col, seq=seq,
    ).select(*src_jobs.columns)
    moved = keep.select("*", F.lit(dest).alias("ds_label"))
    # copyJobStatusesInTx: the latest status row of every copied job
    # (jobs with no status row contribute none)
    moved_status = (
        latest_status(statuses.where(in_sel), job_id=job_id, seq=seq)
        .join(moved.select(job_id), [job_id], "left_semi")
        .select("*", F.lit(dest).alias("ds_label"))
    )
    return (
        survivors_j.unionByName(moved),
        survivors_s.unionByName(moved_status),
        {"sources": selected, "pending_copied": pending, "dest": dest},
    )
