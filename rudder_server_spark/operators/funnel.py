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


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple = ("view", "click"),
    window_seconds: int = 86400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch channel attribution: each conversion credits the latest
    strictly-preceding touch event by the same user inside the lookback
    window, else 'direct'. Returns (channel, conversions, revenue) —
    revenue summed in DECIMAL(18,6) so the rollup is order-independent
    and exact cross-engine, then rounded to cents.

    One as-of join (operators/asof.py: union + single user-keyed sorted
    window — sort-merge cost, no lateral per-row probe) followed by a
    bounded-grain aggregate. Ties at equal touch ts resolve to the max
    event id, encoded identically in the oracle's ORDER BY."""
    from rudder_server_spark.operators.asof import asof_join

    p = events.where(F.col(type_col) == conversion_type).select(
        user_col, ts_col, value_col
    )
    t = events.where(F.col(type_col).isin(*touch_types)).select(
        user_col, ts_col, type_col, id_col
    )
    att = asof_join(
        t,
        p,
        on=user_col,
        left_ts=ts_col,
        right_ts=ts_col,
        carry_cols=[type_col],
        left_tiebreak=id_col,
    )
    in_window = F.col("asof_ts") >= (
        F.col(ts_col) - F.expr(f"INTERVAL {int(window_seconds)} SECOND")
    )
    channel = F.when(
        F.col("asof_ts").isNotNull() & in_window, F.col(f"asof_{type_col}")
    ).otherwise(F.lit("direct"))
    return (
        att.select(channel.alias("channel"), F.col(value_col))
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("conversions"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("channel")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-type transition counts (the product-analytics Markov
    view: what users do next). Returns (prev_type, next_type, n) over
    consecutive events in (ts, event_id) order; a user's first event has
    no predecessor and contributes nothing.

    One user-keyed window (lag) + one bounded-grain aggregate — the
    window partitions by user, so no single-task sort at any scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    return (
        steps.groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("prev_type", "next_type")
    )


def growth_accounting(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly growth accounting: each active (user, week) is classified
    'new' (first-ever active week), 'retained' (also active the previous
    week) or 'resurrected' (returning after a gap). Returns
    (week, state, users) — the growth dashboard's stacked bars.

    Pre-aggregate to the distinct (user, week) grain FIRST (one partial-
    agg shuffle — the corpus never reaches the window), then a user-keyed
    lag window and a bounded-grain rollup."""
    from pyspark.sql import Window

    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    uw = events.select(F.col(user_col).alias("u"), week.alias("week")).distinct()
    w = Window.partitionBy("u").orderBy("week")
    state = (
        F.when(F.lag("week").over(w).isNull(), F.lit("new"))
        .when(F.datediff("week", F.lag("week").over(w)) == 7, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    return (
        uw.select("week", state.alias("state"))
        .groupBy("week", "state")
        .agg(F.count("*").cast("long").alias("users"))
        .orderBy("week", "state")
    )
