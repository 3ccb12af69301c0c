"""Distinct-count sketches (reference A3 tracked-users HLL).

The reference keeps per-(workspace, source) HyperLogLog sketches of
userIDs / anonymousIDs / identified pairs (segmentio/go-hll,
enterprise/trackedusers/users_reporter.go:108-185) and merges them by union
downstream (flusher/aggregator/tracked_users_inapp.go:41).

Spark-first: the Apache DataSketches HLL functions built into Spark
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) give the
same shape — mergeable binary sketches as group-by state, exact same
union-then-estimate algebra, constant memory per group at any cardinality.
``approx_count_distinct`` is the one-shot convenience; the sketch columns
are what survive re-aggregation across time buckets, which is the property
the reference needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tracked_users_sketches(
    df: DataFrame,
    group_cols=("workspace_id", "source_id"),
    user_col: str = "user_id",
    anon_col: str = "anonymous_id",
    lg_k: int = 12,
) -> DataFrame:
    """Per-group mergeable HLL sketches of users / anonymous ids /
    identified (user, anon) pairs — the users_reporter.go:108-185 rollup."""
    ident = F.when(
        F.col(user_col).isNotNull() & F.col(anon_col).isNotNull(),
        F.concat_ws(":", F.col(user_col).cast("string"), F.col(anon_col).cast("string")),
    )
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_agg(F.col(user_col).cast("string"), F.lit(lg_k)).alias("users_hll"),
        F.hll_sketch_agg(F.col(anon_col).cast("string"), F.lit(lg_k)).alias("anon_hll"),
        F.hll_sketch_agg(ident, F.lit(lg_k)).alias("identified_hll"),
    )


def merge_tracked_users(sketches: DataFrame, group_cols=("workspace_id",)) -> DataFrame:
    """Union sketches up a coarser grouping (minute buckets → day, source →
    workspace), then estimate — tracked_users_inapp.go:41 semantics."""
    return sketches.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("users_estimate"),
        F.hll_sketch_estimate(F.hll_union_agg("anon_hll")).alias("anon_estimate"),
        F.hll_sketch_estimate(F.hll_union_agg("identified_hll")).alias("identified_estimate"),
    )
