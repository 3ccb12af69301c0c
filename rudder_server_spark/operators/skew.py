"""Skew-handling joins (SURVEY 'Partitioning & shuffle': salting for skew).

AQE's skew-join splitting (on in this engine's session) handles most skew at
runtime, but only for sort-merge joins and only per-partition. Salting is
the explicit fallback for pathological keys (celebrity users, null-ish
defaults) or for aggregations:

- salted equi-join: the skewed (big) side gets a random salt in [0, S);
  the small-but-not-broadcastable side is replicated S times with an
  explode — the join key becomes (key, salt), spreading each hot key over
  S reducers.
- two-phase aggregation: partial aggregate on (key, salt), then final
  aggregate on key — the classic hot-key count/sum shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets): hash of the whole row's
    monotonically increasing id — spread is what matters, not randomness."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)).cast("int")
    )


def replicate(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate each row once per salt value (the small-side of a salted
    join). Row count multiplies by ``buckets`` — only for sides too big to
    broadcast but far smaller than the skewed side."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: join on (on..., salt)."""
    b = with_salt(big, buckets)
    s = replicate(small, buckets)
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame, keys: list[str], buckets: int = 16, count_col: str = "n"
) -> DataFrame:
    """Two-phase hot-key count: (key, salt) partial → key final. The first
    shuffle spreads each hot key over ``buckets`` reducers; the second
    moves only ``buckets`` pre-aggregated rows per key."""
    partial = (
        with_salt(df, buckets)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_pc"))
    )
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("bigint").alias(count_col))
