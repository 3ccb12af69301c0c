"""Behavioral-analytics operators over the event stream: ordered funnels
and cohort retention — the two queries every downstream consumer of the
reference's event tables runs first (the reference materializes tracks /
event tables exactly so warehouses can answer these; see
warehouse/schema (1.3) and processor/transformer fan-out (P8)).

Scale shape (both operators):
- every join/aggregate keys on user_id, so one hash-partitioning is
  reused across the step cascade (Catalyst reuses the exchange; at
  1000 executors the k-step funnel is k co-partitioned map-side joins
  after the first shuffle, not k independent shuffles);
- event scans carry a pushed `event_type = step` filter (PushedFilters)
  and prune to (user_id, ts) — two columns off disk, not the payload;
- nothing collects to the driver: the funnel emits one row per step via
  a union of single-row aggregates, retention one row per
  (cohort_week, week_offset) cell.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel: users counted at step k completed steps 1..k in
    strict timestamp order (first qualifying occurrence each), optionally
    with the whole sequence inside ``window_seconds`` of the step-1 time.

    Returns (step_idx, step, users) — monotonically non-increasing.

    The cascade takes each user's FIRST step-1 event, then the first
    step-2 event strictly after it, and so on (the standard first-touch
    funnel; a step-2 event before the user's first step-1 does not
    count). Each stage is min-aggregate → co-partitioned join on
    user_id; stage k's frame only shrinks, so the heavy side is always
    the pushed-filter event scan, never an inflating join.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
        .withColumn("t1", F.col("t"))
    )
    levels = [cur]
    for s in steps[1:]:
        nxt = events.where(F.col(type_col) == s).select(user_col, ts_col)
        cond = t > F.col("c.t")
        if window_seconds is not None:
            cond = cond & (
                t <= F.col("c.t1") + F.expr(f"INTERVAL {int(window_seconds)} SECOND")
            )
        cur = (
            nxt.alias("e")
            .join(cur.alias("c"), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"), F.first("c.t1").alias("t1"))
        )
        levels.append(cur)
    rows = [
        lvl.agg(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            F.count("*").cast("long").alias("users"),
        )
        for i, lvl in enumerate(levels)
    ]
    return reduce(DataFrame.unionByName, rows).orderBy("step_idx")


def retention_cohorts(
    events: DataFrame,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week of the user's first
    ``cohort_event``; a user is active in offset w if they emitted ANY
    event in the week ``cohort_week + 7w days``. Pre-cohort activity is
    excluded. Returns (cohort_week, week_offset, active_users).

    One shuffle to build the cohort map, one user-keyed join, then a
    single-distinct aggregate on the (cohort, offset) grain — Spark
    plans the distinct as a two-phase partial aggregate (no Expand:
    single distinct column). The cohort side is small relative to the
    event stream (one row per converting user) and broadcast-eligible
    under AQE when it fits.
    """
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    cohort = (
        events.where(F.col(type_col) == cohort_event)
        .groupBy(user_col)
        .agg(week(F.min(ts_col)).alias("cohort_week"))
    )
    act = events.select(user_col, week(F.col(ts_col)).alias("week"))
    return (
        act.join(cohort, user_col)
        .where(F.col("week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )
