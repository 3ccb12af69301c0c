"""Batch-router circuit breaker (router/batchrouter/circuitbreaker/
circuitbreaker.go + worker.go:28-60).

Each batch-router partition worker wraps its upload loop in a
sony/gobreaker breaker configured MaxRequests=1, Interval=0,
ReadyToTrip = consecutiveFailures >= N (circuitbreaker.go:53-66):

- CLOSED: every upload outcome is recorded (partition_worker.go:192-231);
  a success resets the consecutive-failure count, the Nth consecutive
  failure OPENS the breaker;
- OPEN: ``Work()`` returns before picking up any jobs
  (worker.go:54-59) — the partition's ticks are SKIPPED until ``timeout``
  elapses (Interval=0 means closed-state counts never decay by time);
- after ``timeout`` the next tick is the HALF-OPEN probe (MaxRequests=1 —
  exactly one attempt is admitted): success closes the breaker and resets
  counters, failure re-opens it for another full timeout.

Spark-first: the breaker is a per-partition sequential state machine over
time-ordered upload outcomes — like provider_uploads.sequential_accept it
is a fold, not a window (state depends on prior ADMISSION decisions, not
just prior rows), so ``circuit_breaker_replay`` runs it as one bounded
``applyInPandas`` per breaker instance. Partitions are destination
workers — a bounded dimension — and a replay window (e.g. per day) keeps
each group small; only group count scales with the corpus. The admitted
relation composes upstream of the q37 throttled pickup / q38 backoff
ladder: a skipped tick simply never reaches them, exactly as
worker.Work() returning false skips getWorkerJobs.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame


def circuit_breaker_replay(
    ticks: DataFrame,
    consecutive_failures: int = 3,  # worker.go:32 maxConsecutiveFailures
    timeout_s: float = 30.0,  # worker.go:31 BatchRouter.timeout default 30s
    partition_cols: tuple = ("partition",),
    ts_col: str = "ts",
    ok_col: str = "ok",
    order_cols: tuple = (),
) -> DataFrame:
    """Replay the breaker per partition over (ts, ok) upload ticks.

    Adds ``admitted`` (the worker ran — false while the breaker is open
    inside its timeout), ``state_before`` ('closed' | 'open' |
    'half_open' — the state the tick observed), and ``tripped`` (this
    tick's outcome transitioned the breaker INTO open: the Nth
    consecutive closed-state failure, or a failed half-open probe).

    Skipped ticks record no outcome (the reference's open-state Execute
    rejects the call), so they never advance the failure count —
    which is why this is a fold and not a prefix window.

    CONTRACT (enforced, loudly): (partition_cols, ts_col, order_cols)
    uniquely keys ticks — a duplicate composite key makes the replay's
    scan order, and therefore the whole state machine, nondeterministic.
    The fold raises ValueError on a duplicate instead of silently
    producing run-dependent admissions.
    """
    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    out_schema = StructType(
        list(ticks.schema.fields)
        + [
            StructField("admitted", BooleanType()),
            StructField("state_before", StringType()),
            StructField("tripped", BooleanType()),
        ]
    )
    order = [str(ts_col)] + [str(c) for c in order_cols]
    ok_name, ts_name = str(ok_col), str(ts_col)
    n_trip = int(consecutive_failures)
    tout = datetime.timedelta(seconds=float(timeout_s))

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        # uniqueness contract enforced where it matters: the state machine
        # reads ticks in (ts, order_cols) order, so a tie would replay
        # differently run to run
        if bool(pdf.duplicated(subset=order).any()):
            raise ValueError(
                "circuit_breaker_replay: duplicate (ts, order) key within "
                "a partition — the breaker replay requires a unique tick "
                "ordering"
            )
        state, consec, open_until = "closed", 0, None
        admitted, before, tripped = [], [], []
        for ts, ok in zip(pdf[ts_name], pdf[ok_name]):
            if state == "open" and ts < open_until:
                admitted.append(False)
                before.append("open")
                tripped.append(False)
                continue
            probe = state == "open"  # timeout elapsed → half-open probe
            before.append("half_open" if probe else "closed")
            admitted.append(True)
            if ok:
                state, consec, open_until = "closed", 0, None
                tripped.append(False)
            elif probe:
                state, open_until = "open", ts + tout
                tripped.append(True)
            else:
                consec += 1
                if consec >= n_trip:
                    state, open_until = "open", ts + tout
                    tripped.append(True)
                else:
                    tripped.append(False)
        pdf["admitted"] = admitted
        pdf["state_before"] = before
        pdf["tripped"] = tripped
        return pdf

    grouped = ticks.groupBy(*[c for c in partition_cols])
    return grouped.applyInPandas(fold, schema=out_schema)
