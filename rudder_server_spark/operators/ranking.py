"""Scale-safe ranking for low-cardinality window partitions.

``rank() OVER (PARTITION BY status ORDER BY price)`` with a handful of
distinct statuses plans as ONE sort task per status — at 100 TB that is
3 tasks each sorting tens of terabytes, the classic window-parallelism
ceiling (q22 carries the declared single-exchange form; this module is
the rewrite that survives scale).

The two-pass shape (the rank analogue of operators/packing.py's
range-partitioned prefix sum):

1. ``repartitionByRange(group_cols..., order_cols...)`` +
   ``sortWithinPartitions`` — every executor sorts a slice; Spark's
   RangePartitioner keeps equal keys in one partition, so no tie spans
   a boundary.
2. a bounded per-(physical partition, group) count frame (one row per
   task per group) turns into cumulative offsets with a window over
   TINY data, broadcast back.
3. local rank within (partition, group) + the group's offset = the
   exact global rank, ties included.

Wall-clock scales with the slice size, not the biggest group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def scalable_rank(
    df: DataFrame,
    order_cols: "list[Column | str]",
    group_cols: "list[str] | None" = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact ``rank()`` per ``group_cols`` (ties share a rank, gaps after
    ties) computed with range-partitioned parallelism instead of one
    sort task per group. Returns the input plus ``rank_col``.
    """
    groups = list(group_cols or [])
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parted = df.repartitionByRange(*groups, *order).sortWithinPartitions(
        *groups, *order
    )
    staged = parted.withColumn("_pid", F.spark_partition_id())

    # local rank inside (physical partition, group): ties handled locally —
    # safe because range partitioning never splits equal keys
    w_local = W.partitionBy("_pid", *groups).orderBy(*order)
    local = staged.withColumn("_lrank", F.rank().over(w_local))

    # one row per (partition, group): bounded — #tasks x #groups
    counts = staged.groupBy("_pid", *groups).agg(F.count("*").alias("_n"))
    w_off = (
        W.partitionBy(*groups)
        .orderBy("_pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_pid", *groups, "_off")

    return (
        local.join(F.broadcast(offsets), ["_pid", *groups])
        .withColumn(rank_col, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )
