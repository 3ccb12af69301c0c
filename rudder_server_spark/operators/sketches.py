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


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    k: int = 10,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> "tuple[DataFrame, object]":
    """Exact top-k heavy hitters PLUS a Count-Min sketch of the column
    (Cormode & Muthukrishnan 2005) — the mergeable frequency summary that
    answers point-count queries at 100 TB without keeping the full
    vocabulary: width ~ e/eps counters regardless of cardinality, never
    underestimates, overestimates by at most eps*N with the configured
    confidence.

    Returns (exact top-k frame ordered by count desc, CmsHandle).
    The exact tier is one partial-agg shuffle (bounded by the true
    vocabulary); the sketch is the SQL ``count_min_sketch`` aggregate —
    per-partition sketches merge map-side exactly like the HLL rollup —
    and the final bounded binary deserializes driver-side through the
    JVM class (pyspark 4 dropped the ``df.stat`` wrapper, not the
    aggregate).
    """
    top = (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )
    agg = df.agg(
        F.expr(
            f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})"
        ).alias("s")
    )
    raw = agg.first()["s"]
    return top, CmsHandle.from_bytes(df.sparkSession, raw)


class CmsHandle:
    """Driver-side view of a serialized Spark CountMinSketch (bounded:
    width ~ e/eps x depth counters)."""

    def __init__(self, jcms):
        self._j = jcms

    @classmethod
    def from_bytes(cls, spark, raw: bytes) -> "CmsHandle":
        jvm = spark._jvm
        bis = jvm.java.io.ByteArrayInputStream(bytes(raw))
        return cls(jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis))

    def estimate(self, item) -> int:
        return int(self._j.estimateCount(item))

    def merge(self, other: "CmsHandle") -> "CmsHandle":
        self._j.mergeInPlace(other._j)
        return self

    @property
    def total(self) -> int:
        return int(self._j.totalCount())
