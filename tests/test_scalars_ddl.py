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
