"""Per-destination physical type maps + DDL generation (reference §1.3 /
S7 warehouse integrations).

Each warehouse integration maps the rudder type lattice onto its physical
types (e.g. rudder→Postgres ``int→bigint, float→numeric, string→text,
datetime→timestamptz, json→jsonb`` — warehouse/integrations/postgres/
postgres.go:82-106) and migrates tables with CREATE TABLE / ALTER TABLE ADD
COLUMN. On Spark the same layer renders the DDL the sink executes (JDBC) or
the StructType for parquet/Delta writes.
"""

from __future__ import annotations

from rudder_server_spark.functions.names import safe_column_name, safe_table_name

# rudder lattice → physical type, per destination family
TYPE_MAPS: dict[str, dict[str, str]] = {
    "postgres": {
        "int": "bigint", "bigint": "bigint", "float": "numeric",
        "string": "text", "text": "text", "boolean": "boolean",
        "datetime": "timestamptz", "json": "jsonb", "array(boolean)": "jsonb",
    },
    "redshift": {
        "int": "bigint", "bigint": "bigint", "float": "double precision",
        "string": "varchar(512)", "text": "varchar(max)", "boolean": "boolean",
        "datetime": "timestamp", "json": "super", "array(boolean)": "super",
    },
    "snowflake": {
        "int": "number", "bigint": "number", "float": "double",
        "string": "varchar", "text": "varchar", "boolean": "boolean",
        "datetime": "timestamp_tz", "json": "variant", "array(boolean)": "variant",
    },
    "bigquery": {
        "int": "int64", "bigint": "int64", "float": "float64",
        "string": "string", "text": "string", "boolean": "bool",
        "datetime": "timestamp", "json": "json", "array(boolean)": "array<bool>",
    },
    "spark": {  # parquet/Delta native (this engine's own sink)
        "int": "bigint", "bigint": "bigint", "float": "double",
        "string": "string", "text": "string", "boolean": "boolean",
        "datetime": "timestamp", "json": "string", "array(boolean)": "array<boolean>",
    },
}


def physical_type(rudder_type: str, destination: str) -> str:
    return TYPE_MAPS[destination][rudder_type]


def create_table_ddl(table: str, schema: dict[str, str], destination: str) -> str:
    """CREATE TABLE IF NOT EXISTS with destination physical types; columns
    sorted for stable DDL (the reference sorts for deterministic diffs)."""
    cols = ", ".join(
        f"{safe_column_name(c)} {physical_type(t, destination)}"
        for c, t in sorted(schema.items())
    )
    return f"CREATE TABLE IF NOT EXISTS {safe_table_name(table)} ({cols})"


def migration_ddl(
    table: str,
    current: dict[str, str],
    desired: dict[str, str],
    destination: str,
) -> list[str]:
    """ALTER TABLE ADD COLUMN statements for columns in ``desired`` missing
    from ``current`` — the reference's additive-only migration (existing
    column types are never altered; incompatible values discard, P7)."""
    out = []
    for c, t in sorted(desired.items()):
        if c not in current:
            out.append(
                f"ALTER TABLE {safe_table_name(table)} "
                f"ADD COLUMN {safe_column_name(c)} {physical_type(t, destination)}"
            )
    return out
