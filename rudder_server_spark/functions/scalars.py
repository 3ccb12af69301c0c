"""Scalar function library (SURVEY §2.9) — the reference's string/date/
JSON helpers that don't map 1:1 onto a single Spark builtin.

Everything is a column expression (codegen'd); nothing here touches Python
at row scope.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def utf16_len(c: Column) -> Column:
    """UTF-16 code-unit length (datatype.go:81-95: Redshift promotes string
    → text when the UTF-16 length exceeds 512). BMP chars count 1, astral
    (> U+FFFF, e.g. emoji) count 2 — encode to UTF-16BE and halve."""
    return (F.length(F.encode(c, "UTF-16BE")) / 2).cast("int")


def text_override(c: Column, limit: int = 512) -> Column:
    """The rudder 'string' vs 'text' decision for a string value."""
    return F.when(utf16_len(c) > limit, F.lit("text")).otherwise(F.lit("string"))


def first_valid_value(*cols: Column) -> Column:
    """rules.go:146-156 firstValidValue: first non-null, non-empty-string
    value across a path list (coalesce that also skips '')."""
    cleaned = [F.when(c.cast("string") != "", c) for c in cols]
    return F.coalesce(*cleaned)


def map_lookup(m: Column, *keys) -> Column:
    """misc.MapLookup: walk nested map columns by key chain, NULL on any
    missing step."""
    cur = m
    for k in keys:
        cur = F.element_at(cur, F.lit(k))
    return cur


def rfc3339_milli(ts: Column) -> Column:
    """The reference's canonical timestamp wire format
    (processor.go:1026-1054): RFC3339 with milliseconds, UTC 'Z'."""
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("Z")
    )


def murmur_partition(c: Column, partitions: int) -> Column:
    """jobsdb.go:590-596 partition assignment shape: stable hash of the key
    modulo partition count (Spark's hash is Murmur3-based)."""
    return F.pmod(F.hash(c), F.lit(partitions))
