"""As-of join (point-in-time join).

The reference has no as-of join; SURVEY §2.11 Q25 declares one over the
events fixture (latest preceding 'click' for each 'purchase').

Spark-first strategy: instead of a per-row correlated subquery (the naive
O(n*m) lateral form the DuckDB oracle uses), union the two sides into one
stream, sort once within each key partition, and carry the last-seen left row
forward with `last(..., ignorenulls=True)`. This is a single shuffle on the
join key + one sort — the same cost profile as a sort-merge join — and it
scales linearly at 100 TB because each key's timeline is processed
independently inside its partition.

Tie semantics are encoded in the sort order (ts, side, tiebreak): the right
(probe) side sorts BEFORE the left side at equal ts, giving strict
`left.ts < right.ts`; among equal left ts the max tiebreak wins because
`last()` sees it last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    carry_cols: list[str],
    left_tiebreak: str,
) -> DataFrame:
    """For each row of `right`, attach the latest `left` row with
    left_ts strictly < right_ts, matching on key column `on`.

    Returns the right rows plus `asof_<col>` columns (null when no match).
    """
    rt = right.select(
        "*",
        F.col(right_ts).alias("_ts"),
        F.lit(-1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_c_{c}") for c in carry_cols],
    )
    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(left_tiebreak).cast("long").alias("_tb"),
        *[F.col(c).alias(f"_c_{c}") for c in carry_cols],
    )
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = rt.unionByName(lt.select(rt.columns))

    w = (
        W.partitionBy(on)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = unioned
    for c in carry_cols:
        out = out.withColumn(f"asof_{c}", F.last(f"_c_{c}", ignorenulls=True).over(w))
    out = out.withColumn(
        "asof_ts",
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w),
    )
    return out.where(F.col("_side") == -1).drop(
        "_ts", "_side", "_tb", *[f"_c_{c}" for c in carry_cols]
    )
