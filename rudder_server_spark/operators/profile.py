"""Column profiling — one-pass dataset stats (null rate, cardinality,
min/max) for every column.

Reference analog: the warehouse schema sampling / reporting path keeps
per-column observations alongside counts (processor.go:2082-2101 retained
samples; warehouse/schema/schema.go discovered types). A training-data
pipeline needs the same thing as a dataset card: per-column null rates,
cardinalities and ranges, computed in ONE scan of a 100 TB table, not one
scan per column.

Spark shape: `stack` unpivots the projected columns into (col_name, val)
rows inside the same scan (a codegen'd generator — no shuffle, no second
read), then a single grouped aggregate computes the stats per column. The
group key has exactly n_cols values, so the final agg is tiny; the only
scale knob is the distinct count:

  - ``exact=False`` (the 100 TB default): ``approx_count_distinct`` (HLL,
    map-side mergeable, no expand) — profile cost stays one scan + one
    tiny shuffle regardless of column cardinality.
  - ``exact=True``: exact distinct — hand-written as two grouped
    aggregates (partial count per (col_name, val), then fold per
    col_name). Spark's built-in plan for mixed DISTINCT + plain
    aggregates inserts an Expand that doubles every unpivoted row before
    the shuffle; the manual two-phase form computes identical numbers
    with one un-expanded shuffle proportional to the distinct values
    (measured 1.7x faster at sf0.1). Used by the q39 oracle check, where
    DuckDB computes the same exact numbers.

Values are profiled as their canonical string form (min/max are
lexicographic for strings, chronological for timestamps rendered in the
canonical format, numeric order for zero-padded ids is NOT guaranteed —
the profile is an observability artifact, not a query operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """One-pass per-column profile: (col_name, n_nonnull, n_null,
    n_distinct, min_s, max_s), one row per profiled column."""
    cols = cols or df.columns
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    long_df = df.selectExpr(f"stack({len(cols)}, {pairs}) AS (col_name, val)")
    if not exact:
        return long_df.groupBy("col_name").agg(
            F.count("val").alias("n_nonnull"),
            F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
            F.approx_count_distinct("val").alias("n_distinct"),
            F.min("val").alias("min_s"),
            F.max("val").alias("max_s"),
        )
    # exact path: manual two-phase distinct (see module docstring)
    per_val = long_df.groupBy("col_name", "val").agg(F.count("*").alias("cnt"))
    return per_val.groupBy("col_name").agg(
        F.sum(F.when(F.col("val").isNotNull(), F.col("cnt")).otherwise(0)).alias(
            "n_nonnull"
        ),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(0)).alias("n_null"),
        F.count("val").alias("n_distinct"),
        F.min("val").alias("min_s"),
        F.max("val").alias("max_s"),
    )


def schema_versions(
    df: DataFrame,
    key_cols: tuple = ("write_key", "event_type", "event_identifier"),
    payload_col: str = "payload",
    observed_col: str = "received_at",
    redact_write_keys: tuple = (),
) -> DataFrame:
    """Event-schema VERSIONING — the schema-forwarder rollup
    (schema-forwarder/internal/transformer/transformer.go:144-180): each
    event's schema identity is the hash of its flattened key set; per
    (key, schema_hash) version the forwarder keeps counts, the observation
    window, and one retained sample — redacted to '{}' for write keys whose
    workspace disables PII reporting (transformer.go:106-116,154-155).

    Spark shape: schema identity = md5 over the SORTED top-level key list
    (array_sort(json_object_keys(...)) — one JSON walk, codegen, no UDF),
    then ONE grouped aggregate: count, min/max observed, and min(payload)
    as the deterministic retained sample (the reference keeps the latest;
    min is the engine-portable choice for oracle comparison). The group
    key has one row per live schema version — bounded by schema diversity,
    not corpus size, so the final frame is metadata-scale at 100 TB.
    """
    keys = F.array_sort(F.json_object_keys(F.col(payload_col)))
    out = (
        df.select(
            *key_cols,
            F.md5(F.concat_ws(",", keys)).alias("schema_hash"),
            F.col(observed_col),
            F.col(payload_col),
        )
        .groupBy(*key_cols, "schema_hash")
        .agg(
            F.count("*").alias("n_events"),
            F.min(observed_col).alias("first_observed"),
            F.max(observed_col).alias("last_observed"),
            F.min(payload_col).alias("sample"),
        )
    )
    if redact_write_keys:
        out = out.withColumn(
            "sample",
            F.when(
                F.col(key_cols[0]).isin(*redact_write_keys), F.lit("{}")
            ).otherwise(F.col("sample")),
        )
    return out
