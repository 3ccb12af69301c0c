"""Type coercion with discards routing (reference P7) and small event-side
transforms: reserved-metadata strip (P11), transient-source drop (F9),
job expiry (F10).

P7: when a value disagrees with the upload schema the reference coerces
numerics (int↔float), stringifies anything→string, and DISCARDS
incompatible values into the ``rudder_discards`` table instead of failing
the load (warehouse/slave/worker.go:404-465, HandleSchemaChange 638-696;
discards schema warehouse/utils/utils.go:176-184).

Spark-first: one projection computes every target cast with ``try_cast``
semantics; a second narrow pass collects the per-column failures into the
discards frame. Both outputs share the scan when the caller caches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DISCARD_REASON = "incompatible schema conversion"


def _coerce_expr(col: Column, target: str) -> Column:
    if target == "string":  # anything stringifies (worker.go:450-460)
        return col.cast("string")
    return col.try_cast(target)


def coerce_with_discards(
    df: DataFrame,
    schema: dict[str, str],
    row_id_col: str = "id",
    table_name: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Coerce ``df`` to ``schema`` ({column: spark_type}); incompatible
    values null out in the main output and land in the discards frame
    (row_id, table_name, column_name, column_value, reason)."""
    coerced = df.select(
        *[
            _coerce_expr(F.col(c), schema[c]).alias(c) if c in schema else F.col(c)
            for c in df.columns
        ]
    )
    per_col = []
    for c, tgt in schema.items():
        if tgt == "string":
            continue
        bad = df.where(F.col(c).isNotNull() & _coerce_expr(F.col(c), tgt).isNull())
        per_col.append(
            bad.select(
                F.col(row_id_col).alias("row_id"),
                F.lit(table_name).cast("string").alias("table_name"),
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("column_value"),
                F.lit(DISCARD_REASON).alias("reason"),
            )
        )
    if per_col:
        discards = per_col[0]
        for d in per_col[1:]:
            discards = discards.unionByName(d)
    else:
        discards = df.limit(0).select(
            F.col(row_id_col).alias("row_id"),
            F.lit(table_name).cast("string").alias("table_name"),
            F.lit("").alias("column_name"),
            F.lit("").alias("column_value"),
            F.lit(DISCARD_REASON).alias("reason"),
        )
    return coerced, discards


def strip_reserved_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """P11: delete ``context.activation.{fingerprint,origin}`` for retl
    sources (processor/processor.go:1010-1024) — a JSON rewrite kept
    JVM-side."""
    cleaned = F.regexp_replace(
        F.col(payload_col),
        r'"(fingerprint|origin)"\s*:\s*("([^"\\]|\\.)*"|[^,}\]]+)\s*,?',
        "",
    )
    # tidy dangling commas the removal may leave
    cleaned = F.regexp_replace(cleaned, r",\s*}", "}")
    return df.withColumn(payload_col, cleaned)


def drop_transient_sources(
    df: DataFrame, transient: DataFrame, source_col: str = "source_id"
) -> DataFrame:
    """F9: transient sources skip archival/schema capture
    (services/transientsource) — broadcast anti-join."""
    return df.join(F.broadcast(transient), [source_col], "left_anti")


def expire_jobs(
    df: DataFrame,
    now: Column,
    created_col: str = "created_at",
    max_age_days: int = 30,
) -> DataFrame:
    """F10: retention — drop jobs older than ``jobMaxAge``
    (jobsdb/jobsdb.go:370-372)."""
    return df.where(
        F.col(created_col) >= now - F.make_dt_interval(F.lit(max_age_days))
    )
