"""Snowpipe-streaming contracts — mirrors snowpipestreaming_test.go:
size splitting, channel insert descriptors, offset-based poll verdicts,
per-job finalization, duplicate probes, idempotent replay."""

import pytest

from pyspark.sql import functions as F

from rudder_server_spark.operators import snowpipe as SP


def _events(spark, rows):
    # rows: (table, job_id, data_bytes[, id])
    if rows and len(rows[0]) == 4:
        return spark.createDataFrame(
            rows, "table string, job_id long, data_bytes long, id string"
        )
    return spark.createDataFrame(rows, "table string, job_id long, data_bytes long")


def _go_split(groups, cap):
    """Literal Go splitEventsExceedingMaxInsertRequestSize loop
    (snowpipestreaming.go:394-430)."""
    out = {}
    for table, sizes in groups.items():
        total, kept, disp = 2, 0, []
        broke = False
        for s in sizes:
            if s > cap:
                disp.append("oversized")
                continue
            if broke:
                disp.append("overflowed")
                continue
            sz = s + (1 if kept > 0 else 0)
            if total + sz > cap:
                disp.append("overflowed")
                broke = True
                continue
            total += sz
            kept += 1
            disp.append("included")
        out[table] = disp
    return out


def test_split_matches_go_loop(spark):
    groups = {"T1": [10, 40, 10, 100, 5], "T2": [200, 10, 10]}
    rows = []
    for t, sizes in groups.items():
        rows += [(t, i + 1, s) for i, s in enumerate(sizes)]
    out = SP.split_insert_requests(_events(spark, rows), 60).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["table"], r["job_id"])):
        got.setdefault(r["table"], []).append(r["disposition"])
    assert got == _go_split(groups, 60)
    # T1: 2+10=12, +1+40=53, +1+10=64>60 → overflow from there (100 is
    # oversized either way); T2: 200 oversized, then 2+10, +1+10 fit
    assert got["T1"] == ["included", "included", "overflowed", "oversized", "overflowed"]
    assert got["T2"] == ["oversized", "included", "included"]


def test_split_differential_property(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(st.integers(1, 80), min_size=1, max_size=12),
        st.integers(10, 200),
    )
    def check(sizes, cap):
        rows = [("T", i + 1, s) for i, s in enumerate(sizes)]
        out = SP.split_insert_requests(_events(spark, rows), cap)
        got = [r["disposition"] for r in out.orderBy("job_id").collect()]
        assert got == _go_split({"T": sizes}, cap)["T"]

    check()


def test_upload_infos_offset_and_channel_seam(spark):
    rows = [("T1", 5, 10), ("T1", 9, 10), ("T2", 3, 10)]
    split = SP.split_insert_requests(_events(spark, rows), 1000)
    infos = SP.upload_infos(split.where(F.col("disposition") == "included"))
    got = {r["table"]: (r["offset"], r["count"], r["channel_id"]) for r in infos.collect()}
    assert got == {"T1": (9, 2, "ch-T1"), "T2": (3, 1, "ch-T2")}
    chans = spark.createDataFrame([("T1", "chan-9")], "table string, channel_id string")
    infos2 = SP.upload_infos(
        split.where(F.col("disposition") == "included"), channels=chans
    )
    got2 = {r["table"]: r["channel_id"] for r in infos2.collect()}
    assert got2 == {"T1": "chan-9", "T2": None}


def _statuses(spark, rows):
    return spark.createDataFrame(
        rows,
        "channel_id string, committed_offset long, latest_inserted_offset long,"
        " valid boolean, success boolean",
    )


def test_poll_verdicts_all_branches(spark):
    infos = spark.createDataFrame(
        [("T1", 10, 2, "c1"), ("T2", 10, 2, "c2"), ("T3", 10, 2, "c3"),
         ("T4", 10, 2, "c4"), ("T5", 10, 2, "c5")],
        "table string, offset long, count long, channel_id string",
    )
    st = _statuses(spark, [
        ("c1", 10, 10, True, True),   # committed == expected → imported
        ("c2", 4, 7, True, True),     # inserted < expected → failed, range 5..10
        ("c3", 4, 12, True, True),    # inserted > committed → in_progress
        ("c4", 12, 12, True, True),   # unexpected (past expected) → failed, no range
        # c5 missing → in_progress (un-polled stays importing)
    ])
    out = {r["table"]: r for r in SP.poll_import_status(infos, st).collect()}
    assert out["T1"]["verdict"] == "imported"
    assert out["T2"]["verdict"] == "failed"
    assert (out["T2"]["failed_start"], out["T2"]["failed_end"]) == (5, 10)
    assert out["T3"]["verdict"] == "in_progress"
    assert out["T4"]["verdict"] == "failed" and out["T4"]["failed_start"] is None
    assert out["T5"]["verdict"] == "in_progress"


def test_finalize_jobs_range_semantics(spark):
    jobs = spark.createDataFrame(
        [("T2", j) for j in (3, 5, 8, 10)] + [("T1", 1), ("T5", 2)],
        "table string, job_id long",
    )
    verdicts = spark.createDataFrame(
        [("T1", "imported", None, None), ("T2", "failed", 5, 10),
         ("T5", "in_progress", None, None)],
        "table string, verdict string, failed_start long, failed_end long",
    )
    out = {(r["table"], r["job_id"]): r["final_state"]
           for r in SP.finalize_snowpipe_jobs(jobs, verdicts).collect()}
    # jobs below the lost range were committed before the failure
    assert out[("T2", 3)] == "succeeded"
    assert out[("T2", 5)] == "failed" and out[("T2", 10)] == "failed"
    assert out[("T1", 1)] == "succeeded"
    assert out[("T5", 2)] == "importing"


def test_duplicate_probes(spark):
    rows = [
        ("T1", 1, 10, "a"), ("T1", 2, 10, "a"), ("T1", 3, 10, "b"),
        ("T1", 4, 10, None),
        ("USERS", 5, 10, "a"), ("USERS", 6, 10, "a"),
    ]
    inc = _events(spark, rows)
    base = {r["table"]: r["dup_in_batch"] for r in SP.duplicate_stats(inc).collect()}
    # T1: ids a,a,b → 1 duplicate; null id doesn't count; USERS exempt
    assert base == {"T1": 1, "USERS": 0}
    st = _statuses(spark, [("ch-T1", 2, 2, True, True), ("ch-USERS", 99, 99, True, True)])
    out = {r["table"]: (r["dup_in_batch"], r["dup_due_to_offset"])
           for r in SP.duplicate_stats(inc, st).collect()}
    # jobs 1,2 ≤ committed 2 → 2 offset-duplicates; USERS exempt from both
    assert out == {"T1": (1, 2), "USERS": (0, 0)}
    # invalid/unsuccessful statuses are ignored (reference early-returns)
    st2 = _statuses(spark, [("ch-T1", 2, 2, False, True)])
    out2 = {r["table"]: r["dup_due_to_offset"]
            for r in SP.duplicate_stats(inc, st2).collect()}
    assert out2["T1"] == 0


def test_idempotent_replay(spark):
    """Re-uploading a committed batch: identical import infos, every job
    counted by the offset duplicate probe, verdict imported."""
    rows = [("T1", i, 10, f"id{i}") for i in range(1, 6)]
    split = SP.split_insert_requests(_events(spark, rows), 1000)
    inc = split.where(F.col("disposition") == "included")
    infos1 = sorted(map(tuple, SP.upload_infos(inc).collect()))
    infos2 = sorted(map(tuple, SP.upload_infos(inc).collect()))
    assert infos1 == infos2  # deterministic re-run
    offset = infos1[0][1]
    st = _statuses(spark, [("ch-T1", offset, offset, True, True)])
    verdicts = SP.poll_import_status(SP.upload_infos(inc), st)
    assert verdicts.collect()[0]["verdict"] == "imported"
    dups = SP.duplicate_stats(inc, st).collect()[0]
    assert dups["dup_due_to_offset"] == 5  # all replayed jobs detected
    # negative job ids (migration) are ignored by the offset probe
    rows_neg = rows + [("T1", -7, 10, "idn")]
    inc_neg = SP.split_insert_requests(_events(spark, rows_neg), 1000).where(
        F.col("disposition") == "included"
    )
    dups_neg = SP.duplicate_stats(inc_neg, st).collect()[0]
    assert dups_neg["dup_due_to_offset"] == 5


def test_split_duplicate_job_id_raises_loudly(spark):
    """CONTRACT (r10 verdict #6): a duplicate (table, job_id) makes the
    cumulative boundary order-dependent — fail loudly, don't flake."""
    df = _events(spark, [("T", 1, 40), ("T", 1, 40), ("T", 2, 40)])
    out = SP.split_insert_requests(df, max_insert_bytes=100)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "duplicate (table, job_id)" in str(ei.value)


def test_split_unique_keys_property(spark):
    """Hypothesis: unique job ids never trip the guard and the split
    still matches the literal Go loop; injecting one duplicate always
    trips it."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.integers(1, 80), min_size=1, max_size=10),
           st.integers(30, 150), st.integers(0, 9))
    def check(sizes, cap, dup_at):
        df = _events(spark, [("T", i + 1, s) for i, s in enumerate(sizes)])
        got = {
            r["job_id"]: r["disposition"]
            for r in SP.split_insert_requests(df, cap).collect()
        }
        want = _go_split({"T": sizes}, cap)["T"]
        assert [got[i + 1] for i in range(len(sizes))] == want
        # same data with one duplicated NON-oversized job id → loud error
        i = dup_at % len(sizes)
        if sizes[i] <= cap:
            rows = [("T", j + 1, s) for j, s in enumerate(sizes)]
            rows.append(("T", i + 1, sizes[i]))
            bad = SP.split_insert_requests(_events(spark, rows), cap)
            with pytest.raises(Exception):
                bad.collect()

    check()
