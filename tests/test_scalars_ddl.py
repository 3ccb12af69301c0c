"""Tests for the scalar function library (§2.9) and destination type maps /
DDL generation (§1.3, S7).
"""

import pyspark.sql.functions as F

from rudder_server_spark.functions.scalars import (
    first_valid_value,
    map_lookup,
    murmur_partition,
    rfc3339_milli,
    text_override,
    utf16_len,
)
from rudder_server_spark.sources.destinations import (
    create_table_ddl,
    migration_ddl,
    physical_type,
)


def test_utf16_len_and_text_override(spark):
    df = spark.createDataFrame(
        [("abc",), ("héllo",), ("a🎉b",), ("x" * 600,)], "s string"
    ).select(
        utf16_len(F.col("s")).alias("n"), text_override(F.col("s")).alias("t")
    )
    rows = df.collect()
    # emoji is astral → 2 UTF-16 code units
    assert [r["n"] for r in rows] == [3, 5, 4, 600]
    assert [r["t"] for r in rows] == ["string", "string", "string", "text"]


def test_first_valid_value_skips_empty(spark):
    df = spark.createDataFrame([(None, "", "x")], "a string, b string, c string")
    out = df.select(
        first_valid_value(F.col("a"), F.col("b"), F.col("c")).alias("v")
    ).head()
    assert out["v"] == "x"


def test_map_lookup_chain(spark):
    df = spark.createDataFrame(
        [({"ctx": {"ip": "1.2.3.4"}},)], "m map<string,map<string,string>>"
    )
    assert df.select(map_lookup(F.col("m"), "ctx", "ip").alias("v")).head()["v"] == "1.2.3.4"
    assert df.select(map_lookup(F.col("m"), "nope", "ip").alias("v")).head()["v"] is None


def test_rfc3339_and_partition(spark):
    import datetime as dt

    df = spark.createDataFrame([(dt.datetime(2024, 2, 1, 10, 30, 0, 123000),)], "ts timestamp")
    assert df.select(rfc3339_milli(F.col("ts")).alias("s")).head()["s"] == (
        "2024-02-01T10:30:00.123Z"
    )
    parts = (
        spark.range(1000)
        .select(murmur_partition(F.col("id").cast("string"), 8).alias("p"))
        .agg(F.min("p"), F.max("p"), F.countDistinct("p"))
        .head()
    )
    assert parts[0] >= 0 and parts[1] <= 7 and parts[2] == 8


def test_type_maps_and_ddl():
    assert physical_type("datetime", "postgres") == "timestamptz"
    assert physical_type("json", "snowflake") == "variant"
    ddl = create_table_ddl("tracks", {"id": "string", "received_at": "datetime"}, "postgres")
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS tracks (id text, received_at timestamptz)"
    )
    alters = migration_ddl(
        "tracks",
        current={"id": "string"},
        desired={"id": "string", "price": "float", "user": "string"},
        destination="redshift",
    )
    assert alters == [
        "ALTER TABLE tracks ADD COLUMN price double precision",
        # reserved word 'user' escapes to _user
        "ALTER TABLE tracks ADD COLUMN _user varchar(512)",
    ]


def test_dialect_tail_type_maps():
    # clickhouse.go:51-63 (no bool -> UInt8), mssql.go:46-53 (incl. the
    # reference's literal "json":"jsonb"), azure-synapse.go:48-55
    # (varchar variant), deltalake.go:58-65
    assert physical_type("boolean", "clickhouse") == "UInt8"
    assert physical_type("array(float)", "clickhouse") == "Array(Float64)"
    assert physical_type("float", "mssql") == "decimal(28,10)"
    assert physical_type("string", "mssql") == "nvarchar(512)"
    assert physical_type("json", "mssql") == "jsonb"
    assert physical_type("string", "azure_synapse") == "varchar(512)"
    assert physical_type("datetime", "azure_synapse") == "datetimeoffset"
    assert physical_type("float", "deltalake") == "DOUBLE"
    assert physical_type("date", "deltalake") == "DATE"


def test_dialect_reverse_maps():
    from rudder_server_spark.sources.destinations import rudder_type

    # clickhouse.go:77-117: Nullable / LowCardinality / anyLast wrappers
    # all collapse to the rudder type; unknowns drop (None)
    assert rudder_type("Nullable(Int64)", "clickhouse") == "int"
    assert rudder_type(
        "SimpleAggregateFunction(anyLast, Nullable(DateTime))", "clickhouse"
    ) == "datetime"
    assert rudder_type("LowCardinality(String)", "clickhouse") == "string"
    assert rudder_type("Array(Nullable(UInt8))", "clickhouse") == "array(boolean)"
    assert rudder_type("Decimal(38,9)", "clickhouse") is None
    # mssql.go:55-78 == azure-synapse.go:57-80
    assert rudder_type("datetimeoffset", "mssql") == "datetime"
    assert rudder_type("nvarchar", "azure_synapse") == "string"
    assert rudder_type("bit", "azure_synapse") == "boolean"
    # deltalake.go:69-92: both cases
    assert rudder_type("TIMESTAMP", "deltalake") == "datetime"
    assert rudder_type("timestamp", "deltalake") == "datetime"
    assert rudder_type("DECIMAL", "deltalake") == "float"


def test_clickhouse_ddl():
    from rudder_server_spark.sources.destinations import (
        clickhouse_column_type,
        clickhouse_create_table_ddl,
    )

    # getClickHouseColumnTypeForSpecificTable (clickhouse.go:384-393):
    # users wraps in SimpleAggregateFunction(anyLast, Nullable(T)); sort
    # keys stay bare; arrays never wrap; event -> LowCardinality(String)
    assert clickhouse_column_type("tracks", "price", "float") == "Nullable(Float64)"
    assert clickhouse_column_type("tracks", "id", "string", not_nullable=True) == "String"
    assert clickhouse_column_type("users", "email", "string") == (
        "SimpleAggregateFunction(anyLast, Nullable(String))"
    )
    assert clickhouse_column_type("tracks", "tags", "array(int)") == "Array(Int64)"
    assert clickhouse_column_type("tracks", "event", "string") == "LowCardinality(String)"

    ddl = clickhouse_create_table_ddl(
        "tracks", {"id": "string", "received_at": "datetime", "price": "float"}
    )
    # ReplacingMergeTree dedup engine + (received_at, id) sort key +
    # day partition on received_at (clickhouse.go:916-953, 882-889)
    assert 'ENGINE = ReplacingMergeTree() ORDER BY ("received_at","id")' in ddl
    assert "PARTITION BY toDate(received_at)" in ddl
    assert '"id" String' in ddl and '"received_at" DateTime' in ddl
    assert '"price" Nullable(Float64)' in ddl
    # discards drop id from the sort key (clickhouse.go:919-921)
    ddl2 = clickhouse_create_table_ddl(
        "rudder_discards", {"received_at": "datetime", "row_id": "string"}
    )
    assert 'ORDER BY ("received_at")' in ddl2
    # month partitioning (partitionExpr clickhouse.go:882-897)
    ddl3 = clickhouse_create_table_ddl(
        "tracks", {"id": "string", "received_at": "datetime"},
        partition_type="month",
    )
    assert "PARTITION BY toStartOfMonth(received_at)" in ddl3


def test_deltalake_ddl():
    from rudder_server_spark.sources.destinations import (
        deltalake_create_table_ddl,
    )

    ddl = deltalake_create_table_ddl(
        "tracks", {"id": "string", "received_at": "datetime"}
    )
    # deltalake.go:511-535 + :561: generated event_date partition column
    # whenever received_at exists — the partition-pruned load path
    assert ddl.endswith("USING DELTA PARTITIONED BY(event_date)")
    assert (
        "event_date DATE GENERATED ALWAYS AS ( CAST(received_at AS DATE) )"
        in ddl
    )
    assert "id STRING" in ddl and "received_at TIMESTAMP" in ddl
    ddl2 = deltalake_create_table_ddl("lookup", {"k": "string"})
    assert "PARTITIONED" not in ddl2 and ddl2.endswith("USING DELTA")


def test_mssql_synapse_ddl():
    ddl = create_table_ddl(
        "tracks", {"id": "string", "price": "float"}, "mssql"
    )
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS tracks (id nvarchar(512), price decimal(28,10))"
    )
    alters = migration_ddl(
        "tracks", current={"id": "string"},
        desired={"id": "string", "seen_at": "datetime"},
        destination="azure_synapse",
    )
    assert alters == [
        "ALTER TABLE tracks ADD COLUMN seen_at datetimeoffset"
    ]


def test_clickhouse_users_table_and_defaults():
    from rudder_server_spark.sources.destinations import (
        CH_DEFAULT_VALUES,
        clickhouse_users_table_ddl,
    )

    ddl = clickhouse_users_table_ddl(
        {"id": "string", "received_at": "datetime", "email": "string"}
    )
    # users engine is AggregatingMergeTree over anyLast states; id sort key
    assert 'ENGINE = AggregatingMergeTree() ORDER BY ("id")' in ddl
    assert '"email" SimpleAggregateFunction(anyLast, Nullable(String))' in ddl
    assert '"id" String' in ddl  # sort key stays bare
    assert "PARTITION BY toDate(received_at)" in ddl
    ddl2 = clickhouse_users_table_ddl(
        {"id": "string", "received_at": "datetime"}, cluster="c1"
    )
    assert 'ON CLUSTER "c1"' in ddl2 and "ReplicatedAggregatingMergeTree" in ddl2
    assert CH_DEFAULT_VALUES["boolean"] == 0  # UInt8 booleans


def test_mssql_string_truncation_and_ch_arrays(spark):
    import pyspark.sql.functions as F

    from rudder_server_spark.sources.destinations import (
        MSSQL_VARCHAR_MAX_LENGTH,
        clickhouse_string_to_array,
        mssql_truncate_string,
    )

    df = spark.createDataFrame(
        [("a" * 600,), ("é" + "b" * 600,), ("short",)], "s string"
    )
    got = [
        r["t"]
        for r in df.select(
            mssql_truncate_string(F.col("s")).alias("t")
        ).collect()
    ]
    assert len(got[0]) == 512          # ASCII truncates at 512 chars
    assert len(got[1]) == 256          # diacritics: UCS-2 bytes halve it
    assert got[2] == "short"
    # varchar(max) passes through untouched
    full = df.select(
        mssql_truncate_string(F.col("s"), MSSQL_VARCHAR_MAX_LENGTH).alias("t")
    ).collect()
    assert len(full[0]["t"]) == 600
    arr = spark.createDataFrame([('[1,2,3]',)], "v string").select(
        clickhouse_string_to_array(F.col("v"), "array(int)").alias("a")
    ).head()["a"]
    assert arr == [1, 2, 3]
