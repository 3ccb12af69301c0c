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


def activation_records(
    jobs: DataFrame,
    source_categories: DataFrame,
    approx: bool = False,
    origin_max_runes: int = 256,
    retl_category: str = "warehouse",
) -> tuple[DataFrame, DataFrame]:
    """Monthly-active-records (MAR) metering — enterprise/activationrecords/
    records_reporter.go GenerateReportsFromJobs (:135-247): one distinct-
    fingerprint sketch per (workspace, source, destination) over reverse-ETL
    jobs only, FAIL-CLOSED on malformed input.

    Per job (jobsdb shape: job_id, workspace_id, parameters, event_payload):

    - empty workspace_id → skipped (``missing_workspace``);
    - rETL classification by the SOURCE's SourceDefinition.Category from the
      backend config (``source_categories`` broadcast dim, case-insensitive
      match on ``retl_category`` — :158-166), NOT the job's source_category
      param; non-rETL majority traffic drops silently (no skip stat);
    - empty destination_id → ``missing_destination``;
    - missing/empty ``batch`` → ``missing_batch``; present-but-not-array →
      ``invalid_batch``;
    - per batch element: ``context.activation.fingerprint`` required
      (``missing_fingerprint``), ``context.activation.origin`` required
      (``missing_origin``).

    The report grain carries the FIRST metered element's origin (the
    accumulator captures it at creation, :204-227), truncated to 256 runes
    (client-controlled value, belt-and-suspenders). Fingerprints count
    distinct — ``approx=True`` uses approx_count_distinct (the HLL
    production path; the reference's murmur64-fed go-hll); exact otherwise
    (the oracle-checkable twin, same convention as tracked_users).

    Returns ``(records, skips)``: the per-grain report relation and the
    per-reason skip counts (the recordSkip stats). One explode + one
    grouped aggregate; the category map is a broadcast dimension.
    """
    p, ep = F.col("parameters"), F.col("event_payload")
    src = F.coalesce(F.get_json_object(p, "$.source_id"), F.lit(""))
    dst = F.coalesce(F.get_json_object(p, "$.destination_id"), F.lit(""))
    batch_raw = F.get_json_object(ep, "$.batch")
    cats = F.broadcast(
        source_categories.select(
            F.col("source_id").alias("__src"),
            F.lower(F.col("category")).alias("__cat"),
        )
    )
    klass = (
        jobs.select(
            "job_id",
            "workspace_id",
            src.alias("__source_id"),
            dst.alias("__destination_id"),
            batch_raw.alias("__batch_raw"),
        )
        .join(cats, F.col("__source_id") == F.col("__src"), "left")
        .withColumn(
            "__skip",
            F.when(
                F.col("workspace_id").isNull() | (F.col("workspace_id") == ""),
                "missing_workspace",
            )
            .when(
                F.coalesce(F.col("__cat"), F.lit(""))
                != retl_category.lower(),
                "not_retl",  # silent in the reference (expected majority)
            )
            .when(F.col("__destination_id") == "", "missing_destination")
            .when(
                F.col("__batch_raw").isNull() | (F.col("__batch_raw") == ""),
                "missing_batch",
            )
            .when(
                F.from_json(F.col("__batch_raw"), "array<variant>").isNull(),
                "invalid_batch",
            ),
        )
    )
    elems = (
        klass.where(F.col("__skip").isNull())
        .select(
            "job_id", "workspace_id", "__source_id", "__destination_id",
            F.posexplode(
                F.from_json(F.col("__batch_raw"), "array<variant>")
            ).alias("__idx", "__elem"),
        )
        .select(
            "*",
            F.coalesce(
                F.try_variant_get(
                    F.col("__elem"), "$.context.activation.fingerprint", "string"
                ),
                F.lit(""),
            ).alias("__fp"),
            F.coalesce(
                F.try_variant_get(
                    F.col("__elem"), "$.context.activation.origin", "string"
                ),
                F.lit(""),
            ).alias("__origin"),
        )
        .withColumn(
            "__eskip",
            F.when(F.col("__fp") == "", "missing_fingerprint").when(
                F.col("__origin") == "", "missing_origin"
            ),
        )
    )
    metered = elems.where(F.col("__eskip").isNull())
    count_expr = (
        F.approx_count_distinct("__fp")
        if approx
        else F.count_distinct("__fp")
    )
    records = metered.groupBy(
        "workspace_id",
        F.col("__source_id").alias("source_id"),
        F.col("__destination_id").alias("destination_id"),
    ).agg(
        F.min_by(
            F.substring("__origin", 1, int(origin_max_runes)),
            F.struct("job_id", "__idx"),
        ).alias("origin"),
        count_expr.alias("n_fingerprints"),
    )
    job_skips = (
        klass.where(F.col("__skip").isNotNull() & (F.col("__skip") != "not_retl"))
        .groupBy(F.col("__skip").alias("reason"))
        .agg(F.count("*").alias("n"))
    )
    elem_skips = (
        elems.where(F.col("__eskip").isNotNull())
        .groupBy(F.col("__eskip").alias("reason"))
        .agg(F.count("*").alias("n"))
    )
    return records, job_skips.unionByName(elem_skips)
