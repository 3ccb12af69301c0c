"""Warehouse index-length constraints (reference warehouse/constraints/
constraint.go:23-118) — the P7-discards-family validate→discard operator
for destinations whose identity-index columns cap the concatenated key
length.

Semantics (constraint.go violates():98-125 + slave/worker.go:404-446):

- Per destination type, a table/column pair carries an ``indexColumns``
  list and a byte ``limit``. BigQuery and Snowflake cap
  ``merge_property_N_type || merge_property_N_value`` at 512 BYTES on
  ``rudder_identity_merge_rules`` (Snowflake with uppercase identifiers).
- The concatenated length sums Go ``len()`` — BYTES of the UTF-8 string —
  over only the STRING-typed index columns that are present; missing or
  non-string columns contribute 0 (violates():103-117).
- A violating row keeps its load-table row, but the violating COLUMN's
  value is replaced with the ViolatedIdentifier
  ``rudder-discards-<uuid>`` (worker.go:427-431) and the original value
  lands in ``rudder_discards`` with the constraint's reason
  (handleDiscardTypes, worker_job.go:577-615). The reference's uuid is
  random (misc.FastUUID); here it is the md5 of (row_id, column_name)
  rendered in uuid shape, so replays and the DuckDB oracle are
  deterministic — a documented divergence in identifier VALUE only.
- Rows of other tables / destinations pass through untouched
  (ViolatedConstraints:84-96 returns the empty violation).

Spark-first: the byte-length test is one codegen'd projection
(octet_length + when/otherwise); discards are a narrow filtered
projection per constrained column, unioned — no UDFs, no shuffle, scan
shared with the caller's load plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class IndexConstraint:
    table_name: str
    column_name: str
    index_columns: tuple
    limit: int

    @property
    def reason(self) -> str:
        return (
            "The maximum length of the concatenated columns "
            f"{self.index_columns[0]} and {self.index_columns[1]} "
            f"should be less than {self.limit}"
        )


# constraint.go:39-74 — BQ lowercase, Snowflake uppercase identifiers
INDEX_CONSTRAINTS: dict[str, tuple] = {
    "BQ": tuple(
        IndexConstraint(
            "rudder_identity_merge_rules",
            f"merge_property_{n}_value",
            (f"merge_property_{n}_type", f"merge_property_{n}_value"),
            512,
        )
        for n in (1, 2)
    ),
    "SNOWFLAKE": tuple(
        IndexConstraint(
            "RUDDER_IDENTITY_MERGE_RULES",
            f"MERGE_PROPERTY_{n}_VALUE",
            (f"MERGE_PROPERTY_{n}_TYPE", f"MERGE_PROPERTY_{n}_VALUE"),
            512,
        )
        for n in (1, 2)
    ),
}


def _concat_bytes(df: DataFrame, cols: tuple, schema: dict[str, str] | None) -> Column:
    """Sum of UTF-8 byte lengths over the string-typed present columns —
    Go len() parity (violates():103-117): absent columns, non-string
    schema types, and NULLs all contribute 0."""
    have = {c.lower(): c for c in df.columns}
    total = F.lit(0)
    for c in cols:
        actual = have.get(c.lower())
        if actual is None:
            continue
        if schema is not None and schema.get(c, "string") != "string":
            continue
        total = total + F.coalesce(F.octet_length(F.col(actual).cast("string")), F.lit(0))
    return total


def _discard_uuid(row_id: Column, column_name: str) -> Column:
    """Deterministic stand-in for misc.FastUUID(): md5(row_id:column) in
    uuid shape, prefixed per strcase.ToKebab(DiscardsTable)."""
    h = F.md5(F.concat_ws(":", row_id.cast("string"), F.lit(column_name)))
    return F.concat(
        F.lit("rudder-discards-"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
    )


def apply_index_constraints(
    df: DataFrame,
    destination_type: str,
    table_name: str,
    row_id_col: str | None = None,
    received_at_col: str = "received_at",
    schema: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Validate → discard: returns ``(loaded, discards)``.

    ``loaded`` is ``df`` with every violating column value replaced by its
    ViolatedIdentifier (worker.go:427-431 keeps the row, swaps the cell).
    ``discards`` carries the rudder_discards columns (utils.go:176-184):
    row_id, table_name, column_name, column_value, reason, received_at.
    When ``row_id_col`` is None (merge-rules rows have no ``id``), the
    ViolatedIdentifier doubles as the row_id — handleDiscardTypes'
    fallback (worker_job.go:581-585).

    Unknown destination types return ``df`` unchanged and an empty
    discards frame (ViolatedConstraints:84-87).
    """
    active = [
        ic
        for ic in INDEX_CONSTRAINTS.get(destination_type, ())
        if ic.table_name.lower() == table_name.lower()
    ]
    have = {c.lower(): c for c in df.columns}
    # worker_job.go:586-589 — handleDiscardTypes falls back to now() when the
    # row carries no received_at, so discard rows ALWAYS have a timestamp.
    # Lookup is case-insensitive like every other column lookup here.
    recv_actual = have.get(received_at_col.lower())
    recv = (
        F.col(recv_actual).cast("string")
        if recv_actual is not None
        else F.current_timestamp().cast("string")
    )

    def empty_discards() -> DataFrame:
        return df.limit(0).select(
            F.lit("").alias("row_id"),
            F.lit(table_name).alias("table_name"),
            F.lit("").alias("column_name"),
            F.lit("").alias("column_value"),
            F.lit("").alias("reason"),
            F.lit("").alias("received_at"),
        )

    if not active:
        return df, empty_discards()

    loaded = df
    discard_parts = []
    for ic in active:
        target = have.get(ic.column_name.lower())
        if target is None:
            continue
        violated = _concat_bytes(df, ic.index_columns, schema) > ic.limit
        rid_src = (
            F.col(row_id_col).cast("string")
            if row_id_col is not None and row_id_col in df.columns
            else None
        )
        ident = _discard_uuid(
            rid_src if rid_src is not None else F.col(target), ic.column_name
        )
        loaded = loaded.withColumn(
            target, F.when(violated, ident).otherwise(F.col(target))
        )
        discard_parts.append(
            df.where(violated).select(
                (rid_src if rid_src is not None else ident).alias("row_id"),
                F.lit(ic.table_name).alias("table_name"),
                F.lit(ic.column_name).alias("column_name"),
                F.col(target).cast("string").alias("column_value"),
                F.lit(ic.reason).alias("reason"),
                recv.alias("received_at"),
            )
        )

    if not discard_parts:
        return loaded, empty_discards()
    discards = discard_parts[0]
    for d in discard_parts[1:]:
        discards = discards.unionByName(d)
    return loaded, discards
