"""Error-index sink — mirrors enterprise/reporting/error_index/ semantics:
payload schema with µs timestamps (types.go:28-47), day/hour file grouping
per source (worker.go:184), and the per-file SortingKey order
(worker.go:269-284)."""

import os

from pyspark.sql import functions as F

from rudder_server_spark.operators.error_index import (
    PAYLOAD_COLS,
    error_index_payload,
    error_index_rollup,
    write_error_index,
)


def _failed(spark):
    rows = [
        # (message_id, source, dest, stage, ts)
        ("m1", "s1", "d1", "router", "2024-03-01 10:05:00"),
        ("m2", "s1", "d2", "router", "2024-03-01 10:45:00"),
        ("m3", "s1", "d1", "user_transformer", "2024-03-01 11:05:00"),
        ("m4", "s2", "d1", "router", "2024-03-02 09:00:00"),
    ]
    return spark.createDataFrame(
        rows, "message_id string, source_id string, destination_id string, "
              "failed_stage string, ts_s string"
    ).select(
        "message_id", "source_id", "destination_id", "failed_stage",
        F.col("ts_s").cast("timestamp").alias("received_at"),
        F.col("ts_s").cast("timestamp").alias("failed_at"),
        F.lit("track").alias("event_type"),
    )


def test_payload_schema_and_microsecond_times(spark):
    p = error_index_payload(_failed(spark))
    assert tuple(p.columns) == PAYLOAD_COLS
    row = p.where(F.col("message_id") == "m1").head()
    # types.go:41-47 SetReceivedAt/SetFailedAt: UTC UnixMicro
    assert row["received_at"] == 1709287500000000
    assert row["failed_at"] == row["received_at"]
    # None-mapped reference fields land as the empty-string default
    assert row["transformation_id"] == "" and row["tracking_plan_id"] == ""


def test_write_error_index_partitions_by_source_day_hour(spark, tmp_path):
    out = str(tmp_path / "erridx")
    write_error_index(error_index_payload(_failed(spark)), out)
    # worker.go:184 "2006-01-02/15" grouping under the per-source prefix
    parts = sorted(d for d in os.listdir(out) if d.startswith("source_id="))
    assert parts == ["source_id=s1", "source_id=s2"]
    days = os.listdir(os.path.join(out, "source_id=s1"))
    assert sorted(days) == ["failed_day=2024-03-01"]
    hours = sorted(os.listdir(os.path.join(out, "source_id=s1", "failed_day=2024-03-01")))
    assert hours == ["failed_hour=10", "failed_hour=11"]
    # partition pruning serves (source, time-range) lookups in one subtree
    pruned = spark.read.parquet(out).where(
        (F.col("source_id") == "s1") & (F.col("failed_hour") == "10")
    )
    assert {r["message_id"] for r in pruned.collect()} == {"m1", "m2"}


def test_rollup_counts_and_latest_sample(spark):
    roll = {
        (r["source_id"], r["destination_id"], r["failed_stage"], str(r["failed_hour"])): r
        for r in error_index_rollup(error_index_payload(_failed(spark))).collect()
    }
    key = ("s1", "d1", "router", "2024-03-01 10:00:00")
    assert roll[key]["n_failures"] == 1
    assert roll[key]["sample_message_id"] == "m1"
    # two d1 rows fall in different hours -> separate index entries
    assert ("s1", "d1", "user_transformer", "2024-03-01 11:00:00") in roll
    # ranges are µs and ordered
    for r in roll.values():
        assert r["first_failed_at"] <= r["last_failed_at"]
