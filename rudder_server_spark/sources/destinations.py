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
    # clickhouse has no bool — UInt8 with 0/1 (clickhouse.go:51-63); the
    # Nullable()/LowCardinality/SimpleAggregateFunction wrapping is
    # per-table/column, applied by clickhouse_column_type below
    "clickhouse": {
        "int": "Int64", "bigint": "Int64", "float": "Float64",
        "string": "String", "text": "String", "boolean": "UInt8",
        "datetime": "DateTime", "json": "String",
        "array(int)": "Array(Int64)", "array(float)": "Array(Float64)",
        "array(string)": "Array(String)", "array(datetime)": "Array(DateTime)",
        "array(boolean)": "Array(UInt8)",
    },
    # mssql.go:46-53 — including the reference's literal (and surprising)
    # "json":"jsonb" mapping, kept verbatim for DDL parity
    "mssql": {
        "int": "bigint", "bigint": "bigint", "float": "decimal(28,10)",
        "string": "nvarchar(512)", "text": "nvarchar(max)", "boolean": "bit",
        "datetime": "datetimeoffset", "json": "jsonb", "array(boolean)": "jsonb",
    },
    # azure-synapse.go:48-55 — the mssql variant with plain varchar
    "azure_synapse": {
        "int": "bigint", "bigint": "bigint", "float": "decimal(28,10)",
        "string": "varchar(512)", "text": "varchar(max)", "boolean": "bit",
        "datetime": "datetimeoffset", "json": "jsonb", "array(boolean)": "jsonb",
    },
    # deltalake.go:58-65 (jsons land as STRING; 'date' is a first-class type)
    "deltalake": {
        "int": "BIGINT", "bigint": "BIGINT", "float": "DOUBLE",
        "string": "STRING", "text": "STRING", "boolean": "BOOLEAN",
        "datetime": "TIMESTAMP", "date": "DATE", "json": "STRING",
        "array(boolean)": "STRING",
    },
}

# physical → rudder, for reading back an existing warehouse schema (the
# *DataTypesMapToRudder maps; schema fetch feeds reconcile/coerce):
# clickhouse.go:77-117, mssql.go:55-78, azure-synapse.go:57-80,
# deltalake.go:69-92
FROM_PHYSICAL: dict[str, dict[str, str]] = {
    "clickhouse": {
        **{t: "int" for t in ("Int8", "Int16", "Int32", "Int64")},
        **{f"Nullable({t})": "int" for t in ("Int8", "Int16", "Int32", "Int64")},
        **{
            f"SimpleAggregateFunction(anyLast, Nullable({t}))": "int"
            for t in ("Int8", "Int16", "Int32", "Int64")
        },
        "Array(Int64)": "array(int)", "Array(Nullable(Int64))": "array(int)",
        **{t: "float" for t in ("Float32", "Float64")},
        **{f"Nullable({t})": "float" for t in ("Float32", "Float64")},
        **{
            f"SimpleAggregateFunction(anyLast, Nullable({t}))": "float"
            for t in ("Float32", "Float64")
        },
        "Array(Float64)": "array(float)",
        "Array(Nullable(Float64))": "array(float)",
        "String": "string", "Nullable(String)": "string",
        "SimpleAggregateFunction(anyLast, Nullable(String))": "string",
        "LowCardinality(String)": "string",
        "LowCardinality(Nullable(String))": "string",
        "Array(String)": "array(string)",
        "Array(Nullable(String))": "array(string)",
        "DateTime": "datetime", "Nullable(DateTime)": "datetime",
        "SimpleAggregateFunction(anyLast, Nullable(DateTime))": "datetime",
        "Array(DateTime)": "array(datetime)",
        "Array(Nullable(DateTime))": "array(datetime)",
        "UInt8": "boolean", "Nullable(UInt8)": "boolean",
        "SimpleAggregateFunction(anyLast, Nullable(UInt8))": "boolean",
        "Array(UInt8)": "array(boolean)",
        "Array(Nullable(UInt8))": "array(boolean)",
    },
    "mssql": {
        "integer": "int", "smallint": "int", "bigint": "int", "tinyint": "int",
        "double precision": "float", "numeric": "float", "decimal": "float",
        "real": "float", "float": "float",
        "text": "string", "varchar": "string", "nvarchar": "string",
        "ntext": "string", "nchar": "string", "char": "string",
        "datetimeoffset": "datetime", "date": "datetime",
        "datetime2": "datetime", "timestamp with time zone": "datetime",
        "timestamp": "datetime", "jsonb": "json", "bit": "boolean",
    },
    "deltalake": {
        **{
            t: r
            for T, r in (
                ("TINYINT", "int"), ("SMALLINT", "int"), ("INT", "int"),
                ("BIGINT", "int"), ("DECIMAL", "float"), ("FLOAT", "float"),
                ("DOUBLE", "float"), ("BOOLEAN", "boolean"),
                ("STRING", "string"), ("DATE", "date"),
                ("TIMESTAMP", "datetime"),
            )
            for t in (T, T.lower())
        },
    },
}
# azure-synapse.go:57-80 is byte-identical to the mssql reverse map
FROM_PHYSICAL["azure_synapse"] = dict(FROM_PHYSICAL["mssql"])


def physical_type(rudder_type: str, destination: str) -> str:
    return TYPE_MAPS[destination][rudder_type]


def rudder_type(physical: str, destination: str) -> str | None:
    """Reverse map for schema fetch (unknown physical types are dropped
    from the synced schema, like the reference's ok-guarded lookups)."""
    return FROM_PHYSICAL[destination].get(physical)


# --------------------------------------------------------------- clickhouse
# tables are deduped BY THE ENGINE: ReplacingMergeTree keyed on the sort
# tuple replaces duplicate rows at merge time (clickhouse.go:916-953) — the
# warehouse-side twin of the W2/BQ-view dedup strategies.

CH_SPECIFIC_COLUMNS = {  # clickhouse.go:65-68
    "event": "LowCardinality(String)",
    "event_text": "LowCardinality(String)",
}


def clickhouse_column_type(
    table: str, column: str, rudder: str, not_nullable: bool = False
) -> str:
    """getClickHouseColumnTypeForSpecificTable (clickhouse.go:384-393):
    sort-key columns stay bare; the users table wraps every nullable type
    in SimpleAggregateFunction(anyLast, …) so engine merges keep the last
    non-null trait; arrays never wrap; event/event_text force
    LowCardinality(String)."""
    base = TYPE_MAPS["clickhouse"][rudder]
    if "Array" in base:
        return base
    if not_nullable:
        return CH_SPECIFIC_COLUMNS.get(column, base)
    wrapped = CH_SPECIFIC_COLUMNS.get(column, f"Nullable({base})")
    if table == "users":
        return f"SimpleAggregateFunction(anyLast, {wrapped})"
    return wrapped


def clickhouse_create_table_ddl(
    table: str,
    schema: dict[str, str],
    partition_type: str = "day",
) -> str:
    """CreateTable (clickhouse.go:918-953): ReplacingMergeTree engine,
    sort key (received_at, id) — discards drops id (:919-921) — and
    PARTITION BY over received_at per the configured grain
    (partitionExpr :882-897). Sort-key columns render not-nullable."""
    sort_keys = ["received_at", "id"]
    if table == "rudder_discards":
        sort_keys = ["received_at"]
    sort_keys = [k for k in sort_keys if k in schema]
    cols = ", ".join(
        f'"{safe_column_name(c)}" '
        + clickhouse_column_type(table, c, t, not_nullable=c in sort_keys)
        for c, t in sorted(schema.items())
    )
    tuple_ = "(" + ",".join(f'"{k}"' for k in sort_keys) + ")"
    part_expr = {
        "day": "toDate(received_at)",
        "week": "toStartOfWeek(received_at)",
        "month": "toStartOfMonth(received_at)",
        "quarter": "toStartOfQuarter(received_at)",
    }[partition_type or "day"]
    partition = (
        f" PARTITION BY {part_expr}" if "received_at" in schema else ""
    )
    return (
        f'CREATE TABLE IF NOT EXISTS "{safe_table_name(table)}" ({cols}) '
        f"ENGINE = ReplacingMergeTree() ORDER BY {tuple_}{partition}"
    )


# ---------------------------------------------------------------- deltalake
def deltalake_create_table_ddl(table: str, schema: dict[str, str]) -> str:
    """Deltalake CreateTable (deltalake.go:511-535): USING DELTA with the
    auto-generated ``event_date DATE GENERATED ALWAYS AS
    (CAST(received_at AS DATE))`` partition column whenever the table
    carries received_at — the partition-pruned load path."""
    cols = ", ".join(
        f"{safe_column_name(c)} {physical_type(t, 'deltalake')}"
        for c, t in sorted(schema.items())
    )
    if "received_at" in schema:
        cols += (
            ", event_date DATE GENERATED ALWAYS AS "
            "( CAST(received_at AS DATE) )"
        )
        partition = " PARTITIONED BY(event_date)"
    else:
        partition = ""
    return (
        f"CREATE TABLE IF NOT EXISTS {safe_table_name(table)} "
        f"({cols}) USING DELTA{partition}"
    )


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


def clickhouse_users_table_ddl(
    schema: dict[str, str], partition_type: str = "day", cluster: str = ""
) -> str:
    """createUsersTable (clickhouse.go:...createUsersTable): the users
    table uses the AggregatingMergeTree engine — its columns are
    SimpleAggregateFunction(anyLast, …) states, so engine merges keep the
    last non-null trait per id. Sort key (id); received_at/id render
    not-nullable; a configured cluster wraps the engine in Replicated*
    with ON CLUSTER (the zk path argument is deployment-generated and
    omitted here)."""
    sort_keys = [k for k in ("id",) if k in schema]
    not_nullable = [k for k in ("received_at", "id") if k in schema]
    cols = ", ".join(
        f'"{safe_column_name(c)}" '
        + clickhouse_column_type("users", c, t, not_nullable=c in not_nullable)
        for c, t in sorted(schema.items())
    )
    tuple_ = "(" + ",".join(f'"{k}"' for k in sort_keys) + ")"
    part_expr = {
        "day": "toDate(received_at)",
        "week": "toStartOfWeek(received_at)",
        "month": "toStartOfMonth(received_at)",
        "quarter": "toStartOfQuarter(received_at)",
    }[partition_type or "day"]
    partition = f" PARTITION BY {part_expr}" if "received_at" in schema else ""
    engine = "AggregatingMergeTree"
    cluster_clause = ""
    if cluster.strip():
        cluster_clause = f' ON CLUSTER "{cluster}"'
        engine = "Replicated" + engine
    return (
        f'CREATE TABLE IF NOT EXISTS "users"{cluster_clause} ({cols}) '
        f"ENGINE = {engine}() ORDER BY {tuple_}{partition}"
    )


# clickhouse.go datatypeDefaultValuesMap: the disableNullable mode writes
# these in place of NULL (UInt8 booleans default 0)
CH_DEFAULT_VALUES = {
    "int": 0,
    "float": 0.0,
    "boolean": 0,
    "datetime": "1970-01-01 00:00:00",
}

# mssql.go:40-41 — shared by azure-synapse (azure-synapse.go ProcessColumnValue)
MSSQL_VARCHAR_DEFAULT_LENGTH = 512
MSSQL_VARCHAR_MAX_LENGTH = -1


def mssql_truncate_string(col, varchar_length: int = MSSQL_VARCHAR_DEFAULT_LENGTH):
    """ProcessColumnValue's string branch (mssql.go:523-560, shared with
    azure-synapse): strings load truncated to max(column's declared
    varchar length, 512) unless the column is varchar(max). Returns a
    Spark Column. The reference truncates the BYTE slice — exact for
    ASCII; strings carrying diacritics re-encode to UCS-2 first, so only
    half as many characters survive (str2ucs2's 2-bytes-per-char) — both
    modelled; the UCS-2 byte layout itself is ODBC wire encoding, not
    data."""
    from pyspark.sql import functions as F

    if varchar_length == MSSQL_VARCHAR_MAX_LENGTH:
        return col
    max_len = max(int(varchar_length), MSSQL_VARCHAR_DEFAULT_LENGTH)
    is_ascii = ~col.rlike("[^\\x00-\\x7F]")
    return F.when(is_ascii, F.substring(col, 1, max_len)).otherwise(
        F.substring(col, 1, max_len // 2)
    )


def clickhouse_string_to_array(col, rudder_type: str):
    """castStringToArray (clickhouse.go:...): load files carry array
    values as JSON text; the loader unmarshals them into the typed slice
    the driver binds. Spark twin: from_json to the typed array (datetimes
    parse from their string form)."""
    from pyspark.sql import functions as F

    spark_elem = {
        "array(int)": "bigint",
        "array(float)": "double",
        "array(string)": "string",
        "array(boolean)": "boolean",
        "array(datetime)": "timestamp",
    }[rudder_type]
    return F.from_json(col, f"array<{spark_elem}>")
