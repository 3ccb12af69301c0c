"""Router delivery operators: per-destination token-bucket throttling and
exponential retry backoff.

Reference behavior:
  - router/throttler/factory.go:49-260 — per-destination token-bucket
    pickup/delivery throttlers (rate per window, destination-specific
    overrides from config); router/handle.go:256-320 — pickup skips jobs
    whose destination's bucket is exhausted, deferring them to a later loop.
  - router/worker.go:1053 + router/utils — failed jobs are re-queued with
    ``RetryTime = exec_time + backoff(attempt)`` where backoff doubles from
    ``minRetryBackoff`` up to ``maxRetryBackoff``, until the job aborts at
    ``maxAttempts`` or ``jobMaxAge`` (retryTimeWindow).

Spark shape: both are single-shuffle window/projection plans.

  - ``throttle_pickup``: a token bucket refilled at ``cap`` tokens per
    ``window`` admits, within each (destination, window) group, the first
    ``cap`` jobs in delivery order — a ``row_number`` window, one shuffle on
    (destination, window_start). At 100 TB the window granularity bounds
    per-group size (a hot destination splits across windows), so no group
    exceeds memory; the deferred set stays in the jobs table for the next
    sweep exactly like the reference's skipped pickup.
  - ``retry_backoff``: a pure narrow projection (codegen'd `least`/`pow`),
    no shuffle at all; the age-based abort predicate compares against a
    literal high-water mark so it reaches the parquet scan as a pushed
    filter when the caller resolves ``now`` driver-side (see q35's pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def throttle_pickup(
    jobs: DataFrame,
    dest_col: str = "destination_id",
    ts_col: str = "ts",
    order_col: str = "job_id",
    caps: dict | None = None,
    default_cap: int = 50,
    window: str = "day",
) -> DataFrame:
    """Token-bucket admission: adds ``window_start``, ``cap`` and boolean
    ``picked`` columns. Within each (destination, window) the first ``cap``
    jobs ordered by (ts, order_col) are picked; the rest are deferred —
    the deterministic batch form of the reference's per-destination bucket
    (throttler/factory.go:49-260), with ``caps`` carrying the per-destination
    config overrides.
    """
    caps = caps or {}
    cap: Column = F.lit(default_cap)
    for dest, c in sorted(caps.items()):
        cap = F.when(F.col(dest_col) == dest, F.lit(c)).otherwise(cap)
    out = jobs.withColumn("window_start", F.date_trunc(window, F.col(ts_col)))
    win = W.partitionBy(dest_col, "window_start").orderBy(ts_col, order_col)
    return (
        out.withColumn("cap", cap)
        .withColumn("_rn", F.row_number().over(win))
        .withColumn("picked", F.col("_rn") <= F.col("cap"))
        .drop("_rn")
    )


def retry_backoff(
    failed: DataFrame,
    attempt_col: str = "attempt",
    ts_col: str = "ts",
    now: Column | None = None,
    initial_s: int = 30,
    max_backoff_s: int = 300,
    max_attempts: int = 3,
    max_age_days: int = 20,
) -> DataFrame:
    """Retry scheduling: adds ``backoff_s`` (doubling from ``initial_s``,
    capped at ``max_backoff_s``), boolean ``aborted`` (attempt >=
    max_attempts, or the job is older than ``max_age_days`` relative to
    ``now``), and ``next_retry_at`` (null for aborted jobs) —
    router/worker.go:1053 + router/utils abort rules.

    ``now`` should be a literal (driver-resolved high-water mark or wall
    clock) so the age predicate pushes down; powers of two up to the cap
    are exactly representable doubles, so the backoff cast is exact.
    """
    backoff = F.least(
        F.lit(max_backoff_s),
        (F.lit(initial_s) * F.pow(F.lit(2.0), F.col(attempt_col) - 1)).cast("int"),
    )
    aborted = F.col(attempt_col) >= F.lit(max_attempts)
    if now is not None:
        aborted = aborted | (F.col(ts_col) < now - F.expr(f"INTERVAL {max_age_days} DAY"))
    return (
        failed.withColumn("backoff_s", backoff)
        .withColumn("aborted", aborted)
        .withColumn(
            "next_retry_at",
            F.when(
                ~F.col("aborted"),
                F.timestamp_add("SECOND", F.col("backoff_s"), F.col(ts_col)),
            ),
        )
    )


def drain_jobs(
    jobs: DataFrame,
    destinations: DataFrame,
    now: Column,
    dest_col: str = "destination_id",
    created_col: str = "created_at",
    job_run_col: str = "source_job_run_id",
    abort_destination_ids: tuple = (),
    cancelled_job_run_ids: tuple = (),
    default_retention_days: int = 30,
    retention_days: dict | None = None,
) -> DataFrame:
    """Router drain sweep: adds ``drain_reason`` (null = still deliverable).

    The reference decides per picked job whether to abort it WITHOUT
    delivery (router/utils/utils.go:141-165 ``drainer.Drain``), first match
    wins, in this exact order:

      1. job older than the destination's retention  → "job expired"
      2. destination id absent from the config       → DrainReasonDestNotFound
      3. destination disabled                        → DrainReasonDestDisabled
      4. destination in Router.toAbortDestinationIDs → DrainReasonDestAbort
      5. job's sourceJobRunID in drain.jobRunIDs     → DrainReasonJobRunIDCancelled
         (internal/drain-config — cancelled retl runs; empty run id never
         matches)

    ``destinations`` is the bounded config registry (destination_id,
    enabled) — broadcast; the drain lists and retention overrides are
    config literals, so everything below 2. folds into one codegen'd
    when-chain. ``now`` should be a literal so the age predicate reaches
    the scan (q35's pushed-filter pattern). Drained jobs transition
    straight to 'aborted' with DRAIN_ERROR_CODE=410 in the reference's
    jobsdb; here the caller filters/aggregates on ``drain_reason``.
    """
    retention_days = retention_days or {}
    retention: Column = F.lit(default_retention_days)
    for dest, d in sorted(retention_days.items()):
        retention = F.when(F.col(dest_col) == dest, F.lit(d)).otherwise(retention)

    reg = destinations.select(
        F.col(dest_col), F.col("enabled").alias("_dest_enabled"), F.lit(True).alias("_dest_known")
    )
    joined = jobs.join(F.broadcast(reg), dest_col, "left")

    expired = F.col(created_col) < F.timestamp_add(
        "DAY", -retention.cast("int"), now
    )
    reason = (
        F.when(expired, F.lit("job expired"))
        .when(~F.coalesce(F.col("_dest_known"), F.lit(False)),
              F.lit("destination is not available in the config"))
        .when(~F.col("_dest_enabled"), F.lit("destination is disabled"))
        .when(F.col(dest_col).isin(*abort_destination_ids) if abort_destination_ids else F.lit(False),
              F.lit("destination configured to abort"))
        .when(
            (F.length(F.coalesce(F.col(job_run_col), F.lit(""))) > 0)
            & (F.col(job_run_col).isin(*cancelled_job_run_ids) if cancelled_job_run_ids else F.lit(False)),
            F.lit("cancelled jobRunID"),
        )
    )
    return joined.withColumn("drain_reason", reason).drop(
        "_dest_enabled", "_dest_known"
    )


def adaptive_caps(
    statuses: DataFrame,
    dest_col: str = "destination_id",
    ok_col: str = "delivered",
    base_cap: int = 50,
    min_cap: int = 5,
) -> dict:
    """Adaptive throttling (throttler/factory.go's adaptive mode): derive
    per-destination caps from the recent delivery outcomes — a destination
    failing f of its attempts gets cap = max(min_cap, base*(1-f)), so a
    429-ing destination backs off next sweep and recovers as its error
    rate falls.

    Returns a {destination: cap} dict for ``throttle_pickup(caps=...)``.
    The aggregate is bounded (one row per destination) and collected
    driver-side exactly like the reference's in-memory limiter state.
    """
    rates = (
        statuses.groupBy(dest_col)
        .agg(
            (1.0 - F.avg(F.col(ok_col).cast("double"))).alias("fail_rate")
        )
        .collect()
    )
    return {
        r[dest_col]: max(min_cap, int(base_cap * (1.0 - r["fail_rate"])))
        for r in rates
    }
