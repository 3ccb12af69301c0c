"""Deterministic sampling / rebalancing operators for corpus curation.

Training-data pipelines sample with REPRODUCIBLE, content-keyed randomness
(the same doc draws the same ticket in every run and on any cluster
layout), not with `rand()`: resharding or re-running must not change the
sample. Both operators below derive their randomness from md5 of the
document key — the same primitive t15's train/val/test split uses
(operators/text.py hash_split; reference analog: murmur-based stable
partition assignment, processor/eventfilter + router partition keying).

``stratified_sample`` — exactly k docs per stratum, chosen as the k
smallest md5 tickets. The naive plan (rank every row per stratum) sorts
the WHOLE corpus inside each stratum; at 100 TB a hot stratum becomes one
giant sort. Instead:

  1. one tiny agg: per-stratum row counts (broadcast to the scan);
  2. prefilter: keep rows whose ticket fraction ≤ (2k+8)/n — a codegen'd
     narrow filter that discards ~all of the corpus without a shuffle
     (strata with n below the cutoff numerator keep everything, so small
     strata are exact by construction);
  3. exactness guard: a column-pruned pass counts survivors per stratum;
     any stratum whose prefilter kept fewer than min(k, n) rows (possible
     for tiny k — at k=1 the 2k/n cut misses the minimum ticket with
     probability (1-2/n)^n ≈ 13%; the +8 margin makes it rare, the guard
     makes it impossible) is ranked IN FULL instead. The guard pass reads
     only (stratum, id) — never the payload columns — and when no stratum
     falls back, AQE's empty-relation elimination collapses the fallback
     join to nothing at runtime;
  4. exact rank on the survivors (plus any fallback strata), take k.

  The sort that remains touches ≈ 2k·#strata rows regardless of corpus
  size, and the result provably equals rank-everything for every input
  (property-tested in tests/test_sampling_property.py).

``rebalance_repeats`` — per-source repeat factors that flatten the source
mix toward uniform (the "data mixing" step before training; cf. GPT-3 §2.2
/ The Pile §1: rare high-quality sources are upsampled by small integer
factors). Target share here: uniform across sources, factor capped at
``max_repeat``. The fractional part is applied by stochastic rounding on
the doc's md5 ticket — deterministic per doc, unbiased per source — as
codegen'd string/compare expressions (the hex ticket is compared against
the factor's 14-hex-digit threshold, so no hex→int parsing is needed on
either engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# 14 hex digits = 56 bits: fits a signed long exactly, and a fixed-width
# lowercase-hex string compares lexicographically in numeric order
_TICKET_HEX_DIGITS = 14
_TICKET_SPACE = float(2 ** (4 * _TICKET_HEX_DIGITS))


def ticket(key: Column) -> Column:
    """Stable uniform ticket in [0, 1): md5-prefix of the key, scaled."""
    prefix = F.substring(F.md5(key.cast("string")), 1, _TICKET_HEX_DIGITS)
    return F.conv(prefix, 16, 10).cast("bigint") / F.lit(_TICKET_SPACE)


def ticket_hex(key: Column) -> Column:
    """The same ticket as its raw fixed-width hex string (for comparisons
    against :func:`threshold_hex` without any hex parsing)."""
    return F.substring(F.md5(key.cast("string")), 1, _TICKET_HEX_DIGITS)


def threshold_hex(frac: Column) -> Column:
    """Fixed-width lowercase-hex threshold such that
    ``ticket_hex(key) < threshold_hex(frac)`` holds for a ``frac`` share of
    keys (frac in [0, 1])."""
    scaled = F.floor(frac * F.lit(_TICKET_SPACE)).cast("bigint")
    return F.lpad(F.lower(F.hex(scaled)), _TICKET_HEX_DIGITS, "0")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str = "doc_id",
    safety: float = 2.0,
) -> DataFrame:
    """Exactly min(k, n) rows per stratum — the k smallest md5 tickets —
    without ranking more than ~safety·k rows per stratum (module docstring
    has the plan shape and the exactness guard)."""
    t = ticket(F.col(id_col))
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    cut = F.least(F.lit(1.0), (F.lit(safety * k) + F.lit(8.0)) / F.col("_n"))
    surv = df.join(F.broadcast(counts), stratum_col).where(t <= cut)
    # exactness guard: strata whose prefilter kept fewer than min(k, n)
    # rows rank in full. The detection pass prunes to (stratum, id); with
    # no fallback strata AQE collapses both joins at runtime.
    kept = surv.groupBy(stratum_col).agg(F.count("*").alias("_m"))
    need_full = (
        counts.join(kept, stratum_col, "left")
        .where(F.coalesce(F.col("_m"), F.lit(0)) < F.least(F.lit(k), F.col("_n")))
        .select(stratum_col)
    )
    ranked_input = (
        surv.drop("_n")
        .join(F.broadcast(need_full), stratum_col, "left_anti")
        .unionByName(df.join(F.broadcast(need_full), stratum_col, "left_semi"))
    )
    w = W.partitionBy(stratum_col).orderBy(ticket_hex(F.col(id_col)), id_col)
    return (
        ranked_input.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def rebalance_repeats(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    max_repeat: float = 4.0,
) -> DataFrame:
    """Annotate each doc with its integer ``repeats`` under a
    flatten-toward-uniform source mix (factor = mean-source-size / n_i,
    capped at ``max_repeat``, floored at 1). Fractional factors round
    stochastically on the doc's ticket: unbiased per source, deterministic
    per doc."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    # mean stratum size over the bounded source set — computed with a tiny
    # cross-joined 1-row aggregate, never touching the corpus again
    mean_n = counts.agg(
        (F.sum("_n") / F.count("*")).alias("_mean_n")
    )
    factors = counts.crossJoin(F.broadcast(mean_n)).select(
        source_col,
        F.least(
            F.lit(max_repeat),
            F.greatest(F.lit(1.0), F.col("_mean_n") / F.col("_n")),
        ).alias("_factor"),
    )
    frac = F.col("_factor") - F.floor(F.col("_factor"))
    extra = F.when(
        ticket_hex(F.col(id_col)) < threshold_hex(frac), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(factors), source_col)
        .withColumn("repeats", (F.floor("_factor").cast("bigint") + extra))
        .drop("_factor")
    )
