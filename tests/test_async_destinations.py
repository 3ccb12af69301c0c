"""Async/bulk destination delivery — mirrors the reference's
manager_registration_test.go (every registered type resolves, invalid types
error), GetMarshalledData's line format (common/common.go:152-166), the
part-file batching of handle_async.go:372-373/444, and the
poll → GetUploadStats → setMultipleJobStatus join-back semantics."""

import json
import os

import pytest
from pyspark.sql import functions as F

from rudder_server_spark.operators import async_destinations as A


# ---------------------------------------------------------------- registry

def test_every_reference_destination_is_registered():
    # the exact list from common/utils.go:11-20
    for name in (
        "MARKETO_BULK_UPLOAD", "BINGADS_AUDIENCE", "ELOQUA",
        "YANDEX_METRICA_OFFLINE_EVENTS", "BINGADS_OFFLINE_CONVERSIONS",
        "KLAVIYO_BULK_UPLOAD", "LYTICS_BULK_UPLOAD", "SNOWPIPE_STREAMING",
        "SALESFORCE_BULK_UPLOAD", "BQSTREAM_ALL_EVENTS",
    ):
        assert A.is_async_regular_destination(name)
        assert A.is_async_destination(name)
        assert not A.is_sftp_destination(name)
    assert A.is_sftp_destination("SFTP")
    assert A.is_async_destination("SFTP")
    assert not A.is_async_regular_destination("SFTP")


def test_invalid_destination_type_errors():
    # manager.go NewManager: unknown type -> "invalid destination type"
    assert not A.is_async_destination("WEBHOOK")
    with pytest.raises(ValueError, match="invalid destination type"):
        A.upload_file_format("WEBHOOK")


def test_upload_file_format_contracts():
    assert A.upload_file_format("MARKETO_BULK_UPLOAD") == "csv"
    assert A.upload_file_format("ELOQUA") == "csv"
    assert A.upload_file_format("KLAVIYO_BULK_UPLOAD") == "json"
    assert A.upload_file_format("SFTP") == "json"


# ------------------------------------------------------------- marshalling

def test_marshal_jobs_line_format(spark):
    df = spark.createDataFrame(
        [(7, '{"userId": "u1", "traits": {"email": "a@b.c"}}'), (8, None)],
        "job_id long, payload string",
    )
    rows = {r["job_id"]: r["marshalled"]
            for r in A.marshal_jobs(df).collect()}
    # GetMarshalledData: {"message": <payload>, "metadata": {"job_id": N}}
    parsed = json.loads(rows[7])
    assert parsed == {
        "message": {"userId": "u1", "traits": {"email": "a@b.c"}},
        "metadata": {"job_id": 7},
    }
    # NULL payload -> NULL line (reference errors per job; caller routes)
    assert rows[8] is None


# ---------------------------------------------------------------- batching

def _jobs(spark, n=25, dests=("D1", "D2")):
    rows = [
        (i, dests[i % len(dests)], f"2024-03-0{1 + (i % 2)} 10:{i % 60:02d}:00")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "job_id long, destination_id string, ts_s string"
    ).select("job_id", "destination_id", F.col("ts_s").cast("timestamp").alias("ts"))


def test_assign_upload_batches_caps_and_numbers_parts(spark):
    batched = A.assign_upload_batches(
        _jobs(spark, n=40, dests=("D1",)), upload_window="day",
        max_events_per_file=6,
    ).collect()
    by_win = {}
    for r in batched:
        by_win.setdefault(str(r["upload_window"]), []).append(r)
    for rows in by_win.values():
        parts = {}
        for r in rows:
            parts.setdefault(r["part_file_number"], 0)
            parts[r["part_file_number"]] += 1
        # every part except the last is exactly full; parts number 0..k
        assert sorted(parts) == list(range(len(parts)))
        for p, cnt in parts.items():
            assert cnt == 6 or (p == max(parts) and cnt <= 6)
    # upload_id embeds destination/window/part
    r0 = batched[0]
    assert r0["upload_id"].startswith("D1/2024-03-0")
    assert r0["upload_id"].endswith(f"/{r0['part_file_number']}")


def test_delivery_order_within_upload_is_ts_then_job_id(spark):
    # the reference delivers per-destination in pickup order; the part
    # assignment must follow (ts, job_id), not input order
    rows = [(3, "D", "2024-03-01 10:00:00"), (1, "D", "2024-03-01 09:00:00"),
            (2, "D", "2024-03-01 09:00:00")]
    df = spark.createDataFrame(rows, "job_id long, destination_id string, ts_s string") \
        .select("job_id", "destination_id", F.col("ts_s").cast("timestamp").alias("ts"))
    b = A.assign_upload_batches(df, max_events_per_file=2).orderBy("job_id").collect()
    # delivery order: job1 (09:00) then job2 (09:00, higher id) fill part 0;
    # job3 (10:00) overflows to part 1 — regardless of input row order
    assert [r["part_file_number"] for r in b] == [0, 0, 1]


def test_write_upload_files_one_dir_per_upload(spark, tmp_path):
    out = str(tmp_path / "uploads")
    batched = A.marshal_jobs(
        A.assign_upload_batches(
            _jobs(spark, n=10, dests=("D1", "D2")), max_events_per_file=3
        ).withColumn("payload", F.lit('{"k": 1}')),
    )
    A.write_upload_files(batched, out)
    # layout: destination_id=<D>/upload_window_part=<...>/part_file_number=<n>
    dests = sorted(d for d in os.listdir(out) if d.startswith("destination_id="))
    assert dests == ["destination_id=D1", "destination_id=D2"]
    # every staged line is the marshalled json-lines contract
    txt = spark.read.text(out).collect()
    assert len(txt) == 10
    for r in txt:
        doc = json.loads(r["value"])
        assert set(doc) == {"message", "metadata"}
        assert "job_id" in doc["metadata"]


# ------------------------------------------------- poll / stats / statuses

def test_finalize_and_import_stats_roundtrip(spark):
    batched = A.assign_upload_batches(_jobs(spark, n=30), max_events_per_file=4)
    uploads = batched.select("upload_id").distinct()
    # inject a poll verdict: D1 uploads failed, D2 complete (the seam a
    # real Poll endpoint would fill)
    poll = uploads.select(
        "upload_id", F.col("upload_id").startswith("D1").alias("has_failed")
    )
    fin = A.finalize_job_statuses(batched, poll)
    rows = fin.collect()
    for r in rows:
        if r["destination_id"] == "D2":
            assert r["final_state"] == "succeeded"
        else:
            assert r["final_state"] in ("failed", "aborted")
    stats = A.import_stats(fin).collect()
    # stats are per upload and partition the member jobs exactly
    assert sum(s["n_jobs"] for s in stats) == 30
    for s in stats:
        assert s["n_jobs"] == s["succeeded"] + s["failed"] + s["aborted"]
        if s["destination_id"] == "D2":
            assert s["failed"] == 0 and s["aborted"] == 0


def test_simulate_poll_is_deterministic(spark):
    uploads = spark.createDataFrame(
        [("D1/2024-03-01T00:00:00/0",), ("D1/2024-03-01T00:00:00/1",)],
        "upload_id string",
    )
    a = {r["upload_id"]: r["has_failed"] for r in A.simulate_poll(uploads).collect()}
    b = {r["upload_id"]: r["has_failed"] for r in A.simulate_poll(uploads).collect()}
    assert a == b
    assert all(r["status_code"] == 200 for r in A.simulate_poll(uploads).collect())

def test_unpolled_uploads_stay_importing(spark):
    """Partial poll results: uploads absent from the poll frame must stay
    'importing' (Poll lifecycle, common/common.go:53-62) — never triaged
    into failed/aborted off a NULL verdict."""
    batched = A.assign_upload_batches(_jobs(spark, n=30), max_events_per_file=4)
    uploads = [r["upload_id"] for r in batched.select("upload_id").distinct().collect()]
    assert len(uploads) >= 2
    polled, unpolled = uploads[0], set(uploads[1:])
    poll = spark.createDataFrame([(polled, False)], "upload_id string, has_failed boolean")
    fin = A.finalize_job_statuses(batched, poll)
    for r in fin.collect():
        if r["upload_id"] == polled:
            assert r["final_state"] == "succeeded"
        else:
            assert r["upload_id"] in unpolled
            assert r["final_state"] == "importing"
