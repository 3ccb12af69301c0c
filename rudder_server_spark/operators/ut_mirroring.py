"""User-transformation mirroring sanity comparison (processor/processor.go
utMirroring block :3225-3400 + processor/types/types.go EqualDetailed
:277-312, responseValuesEqual :..., ut_mirroring_test.go).

The reference shadow-mirrors a sampled fraction of user-transformation
batches to a second transformer (USER_TRANSFORM_MIRROR_URL), then compares
the primary and mirror responses with a two-pass strategy:

  1. ``MirrorFiltered`` responses short-circuit: the transformation is
     cached as mirror-filtered and only the filtered stat is bumped.
  2. STRICT pass — order-insensitive multiset equality of the Events and
     FailedEvents lists (diffLists greedy matching, types.go:414-449):
     metadata, statusCode, error, validationErrors, statTags and the whole
     Output tree must match exactly. Equal → ``equal`` (DatetimeForgiven
     false).
  3. LAX pass — identical except STRING leaves where BOTH sides match
     ``responseDatetimePattern`` (types.go:266) compare equal at ANY
     depth of the Output tree (responseValuesEqual's string branch).
     Equal → ``equal`` with DatetimeForgiven=true
     (processor_ut_mirroring_datetime_forgiven_total).
  4. Still unequal → ``different`` (processor_ut_mirroring_responses_count
     {equality:false}) and a diff artifact is uploaded.

Spark-first mapping: responses are relations keyed by (transformation_id,
message_id) — the reference's diffLists pairs elements greedily, but
element equality requires Metadata equality and Metadata carries
messageId, so joining on the id IS the pairing (duplicate-id batches
aside, which the processor never emits). The comparison is:

- ``ut_mirror_compare`` — full-outer join, one row per (transformation,
  message): presence flags, strict equality of (output, status, error),
  and lax equality where datetime-pattern strings are sentinel-replaced
  in the OUTPUT JSON TEXT before comparing — the text substitution
  applies at any nesting depth, exactly like the recursive walk. Note
  the text comparison assumes both sides serialize maps in a canonical
  key order (the transformer contract; both sides here come through the
  same jsonrs Marshal→Unmarshal normalization — processor.go:3311-3325
  normalizes BOTH sides for precisely this reason).
- ``ut_mirror_stats`` — the per-transformation verdict rollup with
  per-field mismatch counts (the diff content): one bounded explode of
  the union of top-level output keys on DIFFERENT rows only, then a
  sorted ``field:count`` digest per transformation.

Everything is codegen: one full-outer shuffle on the response key and one
bounded explode of differing rows; no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# types.go:266 responseDatetimePattern, verbatim semantics (anchored both
# ends; optional fractional seconds; optional Z or numeric offset)
DATETIME_PATTERN = (
    r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,9})?(Z|[+-]\d{2}:\d{2})?"
)
# the same pattern as a QUOTED JSON string leaf, for in-text substitution
_DT_IN_JSON = '"' + DATETIME_PATTERN + '"'
_DT_SENTINEL = '"⟨dt⟩"'


def _dt_normalize(c: Column) -> Column:
    """Replace every datetime-pattern STRING LEAF in a JSON text with a
    sentinel — the lax pass's forgiveness, applied at any depth (the
    reference recurses; text substitution reaches the same leaves)."""
    return F.regexp_replace(c, _DT_IN_JSON, _DT_SENTINEL)


def _dt_norm_val(c: Column) -> Column:
    """The same forgiveness for an EXTRACTED field value, which has lost
    its quotes: a bare datetime-pattern value normalizes whole; container
    text normalizes its quoted leaves."""
    return F.when(
        c.rlike("^" + DATETIME_PATTERN + "$"), F.lit(_DT_SENTINEL)
    ).otherwise(_dt_normalize(c))


def ut_mirror_compare(
    primary: DataFrame,
    mirror: DataFrame,
    keys: tuple = ("transformation_id", "message_id"),
    output_col: str = "output_json",
    status_col: str = "status_code",
    error_col: str = "error",
) -> DataFrame:
    """One row per response key with the two-pass comparison verdict:
    ``in_primary`` / ``in_mirror`` presence, ``strict_eq`` (exact output
    text + status + error), ``lax_eq`` (datetime leaves forgiven), and the
    primary/mirror output texts for the field-level diff. A row missing
    from either side is the reference's Events-length mismatch — the
    batch is different before any element comparison (types.go:282-287).
    """
    kcols = list(keys)
    p = primary.select(
        *kcols,
        F.col(output_col).alias("__p_out"),
        F.col(status_col).alias("__p_status"),
        F.col(error_col).alias("__p_error"),
    )
    m = mirror.select(
        *kcols,
        F.col(output_col).alias("__m_out"),
        F.col(status_col).alias("__m_status"),
        F.col(error_col).alias("__m_error"),
    )
    j = p.join(m, kcols, "full_outer")
    both = F.col("__p_status").isNotNull() & F.col("__m_status").isNotNull()
    meta_eq = (F.col("__p_status") == F.col("__m_status")) & (
        F.coalesce(F.col("__p_error"), F.lit(""))
        == F.coalesce(F.col("__m_error"), F.lit(""))
    )
    strict = both & meta_eq & (F.col("__p_out") == F.col("__m_out"))
    lax = both & meta_eq & (
        _dt_normalize(F.col("__p_out")) == _dt_normalize(F.col("__m_out"))
    )
    return j.select(
        *kcols,
        F.col("__p_status").isNotNull().alias("in_primary"),
        F.col("__m_status").isNotNull().alias("in_mirror"),
        F.coalesce(strict, F.lit(False)).alias("strict_eq"),
        F.coalesce(lax, F.lit(False)).alias("lax_eq"),
        F.col("__p_out").alias("primary_output"),
        F.col("__m_out").alias("mirror_output"),
    )


def ut_mirror_stats(
    compared: DataFrame,
    filtered: DataFrame | None = None,
    tx_col: str = "transformation_id",
) -> DataFrame:
    """The per-transformation rollup the mirroring stats emit
    (processor.go:601-632): event counts per verdict class, the batch
    verdict with the reference's precedence (mirror-filtered short-circuit
    → any missing/different element ⇒ ``different`` → lax-only matches ⇒
    ``equal_datetime_forgiven`` → ``equal``), plus the diff content as a
    sorted ``field:count`` digest of top-level output keys that disagree
    on DIFFERENT rows (missing rows are a length mismatch, reported
    without field detail — types.go:282-287 returns before any element
    walk). ``filtered`` is the mirror-filtered transformation dimension
    (broadcast, control-plane sized)."""
    tx = F.col(tx_col)
    missing = ~(F.col("in_primary") & F.col("in_mirror"))
    diff_row = ~missing & ~F.col("lax_eq")

    # field-level mismatch digest: bounded explode (top-level keys of the
    # two outputs) over only the differing rows
    pv = F.from_json("primary_output", "map<string,string>")
    mv = F.from_json("mirror_output", "map<string,string>")
    fields = (
        compared.where(diff_row)
        .select(
            tx,
            pv.alias("__p"),
            mv.alias("__m"),
            F.explode(
                F.array_union(
                    F.coalesce(F.map_keys(pv), F.array().cast("array<string>")),
                    F.coalesce(F.map_keys(mv), F.array().cast("array<string>")),
                )
            ).alias("field"),
        )
        .where(
            ~_dt_norm_val(F.col("__p")[F.col("field")]).eqNullSafe(
                _dt_norm_val(F.col("__m")[F.col("field")])
            )
        )
        .groupBy(tx, "field")
        .agg(F.count("*").alias("n"))
        .groupBy(tx)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("field", "n"))),
                    lambda s: F.concat(
                        s["field"], F.lit(":"), s["n"].cast("string")
                    ),
                ),
                ",",
            ).alias("mismatch_fields")
        )
    )

    agg = compared.groupBy(tx).agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("strict_eq"), 1).otherwise(0)).alias("n_equal_strict"),
        F.sum(
            F.when(F.col("lax_eq") & ~F.col("strict_eq"), 1).otherwise(0)
        ).alias("n_datetime_forgiven"),
        F.sum(F.when(diff_row, 1).otherwise(0)).alias("n_different"),
        F.sum(F.when(missing & F.col("in_primary"), 1).otherwise(0)).alias(
            "n_missing_mirror"
        ),
        F.sum(F.when(missing & F.col("in_mirror"), 1).otherwise(0)).alias(
            "n_missing_primary"
        ),
    )
    out = agg.join(fields, [tx_col], "left").withColumn(
        "mismatch_fields", F.coalesce("mismatch_fields", F.lit(""))
    )
    verdict = (
        F.when(
            (F.col("n_different") > 0)
            | (F.col("n_missing_mirror") > 0)
            | (F.col("n_missing_primary") > 0),
            "different",
        )
        .when(F.col("n_datetime_forgiven") > 0, "equal_datetime_forgiven")
        .otherwise("equal")
    )
    out = out.withColumn("verdict", verdict)
    if filtered is not None:
        flt = F.broadcast(
            filtered.select(F.col(tx_col), F.lit(True).alias("__filtered"))
        )
        out = out.join(flt, [tx_col], "left").withColumn(
            "verdict",
            F.when(F.col("__filtered"), "mirror_filtered").otherwise(
                F.col("verdict")
            ),
        )
        # the short-circuit: a filtered transformation reports ONLY the
        # filtered stat — no equality classes, no diff
        for c in (
            "n_equal_strict",
            "n_datetime_forgiven",
            "n_different",
            "n_missing_mirror",
            "n_missing_primary",
        ):
            out = out.withColumn(
                c, F.when(F.col("__filtered"), F.lit(0)).otherwise(F.col(c))
            )
        out = out.withColumn(
            "mismatch_fields",
            F.when(F.col("__filtered"), F.lit("")).otherwise(
                F.col("mismatch_fields")
            ),
        ).drop("__filtered")
    return out
