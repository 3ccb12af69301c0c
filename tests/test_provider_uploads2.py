"""Provider upload-shape contracts, part 2 — mirrors eloqua/eloqua_test.go,
salesforce-bulk-upload/utils_test.go, sftp/sftp_test.go,
yandexmetrica/yandexmetrica_test.go, klaviyobulkupload_test.go."""

import json

from pyspark.sql import functions as F

from rudder_server_spark.operators import provider_uploads2 as P2


def _jobs(spark, docs):
    return spark.createDataFrame(
        [(i + 1, json.dumps(d)) for i, d in enumerate(docs)],
        "job_id long, payload string",
    )


# ------------------------------------------------------------------- eloqua

def _eloqua_doc(data, mtype="track", obj="orders"):
    return {"message": {"type": mtype, "customObjectId": obj,
                        "identifierFieldName": "email", "data": data}}


def test_eloqua_header_from_first_event_and_string_only_values(spark):
    docs = [
        _eloqua_doc({"email": "a@b.c", "qty": "2", "note": "null"}),
        _eloqua_doc({"email": "d@e.f", "qty": 7, "extra": "dropped"}),
    ]
    out = P2.eloqua_csv_rows(_jobs(spark, docs)).orderBy("job_id").collect()
    assert out[0]["headers"] == ["email", "qty", "note"]  # first event's keys
    # literal "null" and non-strings render "" (utils.go:95-101)
    assert out[0]["csv_line"] == "a@b.c,2,"
    assert out[1]["csv_line"] == "d@e.f,,"
    assert all(r["group_error"] is None and r["accepted"] for r in out)


def test_eloqua_event_family_gate(spark):
    # identify must target customObjectId == "contacts"
    ok = P2.eloqua_csv_rows(
        _jobs(spark, [_eloqua_doc({"email": "x"}, "identify", "contacts")])
    ).collect()[0]
    assert ok["group_error"] is None
    bad = P2.eloqua_csv_rows(
        _jobs(spark, [_eloqua_doc({"email": "x"}, "identify", "orders")])
    ).collect()[0]
    assert bad["group_error"] == "unable to find event format"
    assert not bad["accepted"]
    # track with empty customObjectId fails too
    bad2 = P2.eloqua_csv_rows(
        _jobs(spark, [_eloqua_doc({"email": "x"}, "track", "")])
    ).collect()[0]
    assert bad2["group_error"] is not None


def test_eloqua_prefix_size_cutoff(spark):
    # the reference checks bytes ALREADY WRITTEN before each row
    # (utils.go:103-110): once over, every later row fails — prefix, not
    # skip (contrast marketo)
    docs = [_eloqua_doc({"email": f"user{i}@example.com"}) for i in range(4)]
    out = P2.eloqua_csv_rows(
        _jobs(spark, docs), file_size_limit=30
    ).orderBy("job_id").collect()
    # header "email" (5+2=7 bytes) + row ~20 bytes: row1 sees 7 <= 30 ok,
    # row2 sees 7+21=28 <= 30 ok, row3 sees 49 > 30 → out, row4 out
    assert [r["accepted"] for r in out] == [True, True, False, False]


# --------------------------------------------------------------- salesforce

def test_salesforce_sorted_union_header_and_format(spark):
    docs = [
        {"message": {"Email": "a@b.c", "Amount": 42.5}},
        {"message": {"Email": "d@e.f", "Tags": ["x", "y"], "Nil": None}},
    ]
    out = P2.salesforce_csv_rows(
        _jobs(spark, docs), external_id_field="Email"
    ).orderBy("job_id").collect()
    assert out[0]["headers"] == ["Amount", "Email", "Nil", "Tags"]  # sorted union
    # FormatCSVValue: float non-scientific, absent → "", nil → "",
    # composite → JSON
    assert out[0]["csv_line"] == "42.5,a@b.c,,"
    assert out[1]["csv_line"] == ',d@e.f,,"[""x"",""y""]"'
    assert all(r["group_error"] is None for r in out)
    import hashlib

    assert out[0]["external_id_hash"] == hashlib.sha256(b"a@b.c").hexdigest()


def test_salesforce_missing_upsert_key_fails_group(spark):
    docs = [{"message": {"Name": "x"}}]
    out = P2.salesforce_csv_rows(_jobs(spark, docs), external_id_field="Email").collect()
    assert "Email" in out[0]["group_error"]


# --------------------------------------------------------------------- sftp

def test_sftp_csv_rows_and_nil_semantics(spark):
    docs = [
        {"message": {"action": "insert",
                     "fields": {"email": "a@b.c", "score": 9}}},
        {"message": {"action": "update", "fields": {"email": "d@e.f"}}},
    ]
    out = P2.sftp_csv_rows(_jobs(spark, docs)).orderBy("job_id").collect()
    assert out[0]["headers"] == ["email", "score", "action"]
    assert out[0]["csv_line"] == "a@b.c,9,insert"
    # absent key prints Go's fmt "%v" of nil (sftp utils.go:183-185)
    assert out[1]["csv_line"] == "d@e.f,<nil>,update"
    srt = P2.sftp_csv_rows(_jobs(spark, docs), sort_column_names=True).collect()[0]
    assert srt["headers"] == ["action", "email", "score"]


def test_sftp_file_path_template(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 7, 8, 5, 9),)], "ts timestamp"
    )
    path = P2.sftp_file_path(
        "/up/{YYYY}/{MM}/{DD}/{hh}-{mm}-{ss}/{destinationID}/x_{unknown}.csv",
        F.col("ts"), destination_id="d1",
    )
    got = df.select(path.alias("p")).head()["p"]
    assert got == "/up/2024/03/07/08-05-09/d1/x_{unknown}.csv"
    import pytest

    with pytest.raises(ValueError):
        P2.sftp_file_path("", F.col("ts"))


# -------------------------------------------------------------------- yandex

def test_yandex_id_priority_and_skip(spark):
    docs = [
        {"message": {"ClientId": "c-1", "Target": "", "DateTime": "2024-01-01",
                     "Price": 120.55, "Currency": "RUB"}},
        {"message": {"Yclid": "y-2", "Target": "goal2", "DateTime": "2024-01-02",
                     "Price": 7, "Currency": "USD"}},
        {"message": {"UserId": 99, "DateTime": "2024-01-03"}},  # non-string → skip
        {"message": {"DateTime": "2024-01-04"}},  # no id → skip
    ]
    out = P2.yandex_csv_rows(_jobs(spark, docs), goal_id="g-default").orderBy(
        "job_id"
    ).collect()
    # header decided by FIRST message's present id field
    assert all(r["id_header"] == "ClientId" for r in out)
    assert out[0]["csv_line"] == "c-1,g-default,2024-01-01,120.55,RUB"
    assert out[1]["csv_line"] == "y-2,goal2,2024-01-02,7,USD"
    assert out[2]["skipped"] and out[2]["csv_line"] is None
    assert out[3]["skipped"]
    assert all(r["group_error"] is None for r in out)


def test_yandex_first_without_id_fails_group(spark):
    # ymMsgsBody[0].ID() error aborts the WHOLE upload (yandexmetrica.go:
    # 166-169) — both a missing and a non-string first id
    docs = [{"message": {"DateTime": "2024-01-04"}},
            {"message": {"ClientId": "c", "DateTime": "2024-01-05"}}]
    out = P2.yandex_csv_rows(_jobs(spark, docs)).orderBy("job_id").collect()
    assert all(r["group_error"] is not None for r in out)
    docs2 = [{"message": {"ClientId": 42, "DateTime": "2024-01-04"}},
             {"message": {"ClientId": "c", "DateTime": "2024-01-05"}}]
    out2 = P2.yandex_csv_rows(_jobs(spark, docs2)).orderBy("job_id").collect()
    assert all(r["group_error"] is not None for r in out2)


# ------------------------------------------------------------------- klaviyo

def _profiles(spark, sizes):
    rows = [(i + 1, "x" * (s - 1)) for i, s in enumerate(sizes)]  # +1 comma = s
    return spark.createDataFrame(rows, "job_id long, profile_json string")


def _go_chunks(sizes, max_bytes, max_elements):
    """Literal chunkBySizeAndElements loop (klaviyobulkupload.go:83-117)."""
    idx, size, count, out = 0, 0, 0, []
    for s in sizes:
        if (size + s >= max_bytes or count == max_elements) and count > 0:
            idx, size, count = idx + 1, 0, 0
        out.append(idx)
        size += s
        count += 1
    return out


def test_klaviyo_chunk_boundaries(spark):
    sizes = [40, 40, 40, 40, 40]
    out = P2.klaviyo_chunks(
        _profiles(spark, sizes), max_bytes=100, max_elements=10
    ).orderBy("job_id").collect()
    got = [r["chunk_index"] for r in out]
    assert got == _go_chunks(sizes, 100, 10) == [0, 0, 1, 1, 2]
    # element cap
    out2 = P2.klaviyo_chunks(
        _profiles(spark, [10] * 5), max_bytes=10**6, max_elements=2
    ).orderBy("job_id").collect()
    assert [r["chunk_index"] for r in out2] == [0, 0, 1, 1, 2]


def test_klaviyo_chunk_differential_property(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.integers(2, 80), min_size=1, max_size=12),
           st.integers(20, 150), st.integers(1, 5))
    def check(sizes, mb, me):
        out = P2.klaviyo_chunks(
            _profiles(spark, sizes), max_bytes=mb, max_elements=me
        ).orderBy("job_id").collect()
        assert [r["chunk_index"] for r in out] == _go_chunks(sizes, mb, me)

    check()


def test_klaviyo_payload_envelope_and_joinback(spark):
    chunked = P2.klaviyo_chunks(
        spark.createDataFrame(
            [(1, '{"a":1}'), (2, '{"b":2}')], "job_id long, profile_json string"
        ),
        max_bytes=10**6, max_elements=10,
    )
    pay = P2.klaviyo_payloads(chunked, list_id="L1").collect()[0]
    doc = json.loads(pay["payload"])
    assert doc["data"]["type"] == "profile-bulk-import-job"
    assert doc["data"]["attributes"]["profiles"]["data"] == [{"a": 1}, {"b": 2}]
    assert doc["data"]["relationships"]["lists"]["data"][0]["id"] == "L1"
    assert pay["n_profiles"] == 2
    # no list id → no relationships member
    pay2 = P2.klaviyo_payloads(chunked).collect()[0]
    assert "relationships" not in json.loads(pay2["payload"])["data"]

    jobs = spark.createDataFrame(
        [(1, "id-a"), (2, "id-b"), (3, "anon-c")], "job_id long, identifier string"
    )
    errs = spark.createDataFrame(
        [("id-b", "invalid email"), ("anon-c", "missing field")],
        "identifier string, detail string",
    )
    fin = {r["job_id"]: r["final_state"]
           for r in P2.klaviyo_abort_joinback(jobs, errs).collect()}
    assert fin == {1: "succeeded", 2: "aborted", 3: "aborted"}


def test_group_first_anchor_tolerates_min_jobid_ties(spark):
    """ADVICE r9 #3: two rows sharing a group's min job_id must yield ONE
    anchor row — the broadcast back-join previously multiplied every row
    of that group (the r8 window form tolerated ties)."""
    df = spark.createDataFrame(
        [("g1", 1, "a"), ("g1", 1, "b"), ("g1", 2, "c"), ("g2", 5, "d")],
        "grp string, job_id long, val string",
    )
    out = P2._group_first_anchor(
        df, ("grp",), "job_id", [("first_val", F.col("val"))]
    )
    rows = out.collect()
    assert len(rows) == 4  # no multiplication
    g1 = {r["val"]: r["first_val"] for r in rows if r["grp"] == "g1"}
    assert set(g1.values()) <= {"a", "b"} and len(set(g1.values())) == 1
    # no-group variant: duplicate global min collapses to a single anchor
    out2 = P2._group_first_anchor(
        spark.createDataFrame(
            [(1, "x"), (1, "y")], "job_id long, val string"
        ),
        (),
        "job_id",
        [("first_val", F.col("val"))],
    )
    assert out2.count() == 2


def test_group_first_anchor_tie_pick_is_deterministic(spark):
    """ADVICE r10 #5: when tied min-job_id rows carry DIFFERING derived
    values, the anchor pick is deterministic (min_by over the derived
    struct's JSON text), so repeated runs and the differential harness
    never flake."""
    df = spark.createDataFrame(
        [("g1", 1, "zeta"), ("g1", 1, "alpha"), ("g1", 1, "mid"), ("g2", 3, "q")],
        "grp string, job_id long, val string",
    )
    for _ in range(3):
        rows = P2._group_first_anchor(
            df, ("grp",), "job_id", [("first_val", F.col("val"))]
        ).collect()
        g1 = {r["first_val"] for r in rows if r["grp"] == "g1"}
        # min over {"first_val":"alpha"} < "mid" < "zeta"
        assert g1 == {"alpha"}
    # ungrouped branch: same deterministic rule
    for _ in range(3):
        rows = P2._group_first_anchor(
            spark.createDataFrame(
                [(1, "zz"), (1, "aa")], "job_id long, val string"
            ),
            (),
            "job_id",
            [("first_val", F.col("val"))],
        ).collect()
        assert {r["first_val"] for r in rows} == {"aa"}
