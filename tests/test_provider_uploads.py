"""Provider upload-shape contracts — mirrors the reference suites:
marketo-bulk-upload/marketobukupload_test.go + utils_test.go,
bing-ads/audience/bingads_test.go, bing-ads/offline-conversions/
bingads_test.go, lytics_bulk_upload/lytics_test.go."""

import hashlib
import json

import pytest

from rudder_server_spark.operators import provider_uploads as PU


def _jobs(spark, docs):
    return spark.createDataFrame(
        [(i + 1, json.dumps(d)) for i, d in enumerate(docs)],
        "job_id long, payload string",
    )


# ------------------------------------------------------------- go csv escaping

def test_go_csv_escaping_differential(spark):
    """Column vs Python-mirror escaping over adversarial fields."""
    cases = [
        "", "plain", "with,comma", 'with"quote', "with\nnewline",
        " leading space", "\ttab", "a,b\"c\nd", r"\.", "trailing space ",
        "ünïcode", "with\rcr",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "v string")
    from pyspark.sql import functions as F

    got = [r["e"] for r in df.select(PU.go_csv_field(F.col("v")).alias("e")).collect()]
    want = [PU.go_csv_field_py(c) for c in cases]
    assert got == want


def test_go_csv_matches_go_stdlib_goldens():
    """Spot-pin against literal outputs of Go's encoding/csv."""
    assert PU.go_csv_line_py(["a", "b,c", 'd"e']) == 'a,"b,c","d""e"'
    assert PU.go_csv_line_py(["", " x", "y"]) == ',\" x\",y'


# ------------------------------------------------------------ admission fold

def _go_fold(sizes, cap, base=0, inclusive=True, count_cap=None):
    """Literal Go accept-or-skip loop (utils.go:216-231 / populateZipFile)."""
    total, n, out = base, 0, []
    for s in sizes:
        new = total + s
        ok = (new <= cap if inclusive else new < cap) and (
            count_cap is None or n < count_cap
        )
        if ok:
            total, n = new, n + 1
        out.append(ok)
    return out


def test_sequential_accept_skip_semantics(spark):
    # a huge row overflows but LATER smaller rows still fit — the fold is
    # not a prefix cutoff
    sizes = [40, 1000, 30, 20, 1000, 5]
    df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(sizes)], "job_id long, sz int"
    )
    out = PU.sequential_accept(df, "sz", byte_cap=100, order_cols=("job_id",))
    got = {r["job_id"]: r["accepted"] for r in out.collect()}
    want = _go_fold(sizes, 100)
    assert [got[i + 1] for i in range(len(sizes))] == want
    assert want == [True, False, True, True, False, True]


def test_sequential_accept_differential_property(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(st.integers(1, 60), min_size=1, max_size=12),
        st.integers(20, 150),
        st.booleans(),
        st.one_of(st.none(), st.integers(1, 6)),
    )
    def check(sizes, cap, inclusive, ccap):
        df = spark.createDataFrame(
            [(i + 1, s) for i, s in enumerate(sizes)], "job_id long, sz int"
        )
        out = PU.sequential_accept(
            df, "sz", byte_cap=cap, inclusive=inclusive, count_cap=ccap
        )
        got = [r["accepted"] for r in out.orderBy("job_id").collect()]
        assert got == _go_fold(sizes, cap, inclusive=inclusive, count_cap=ccap)

    check()


def test_sequential_accept_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 60), ("b", 1, 60), ("b", 2, 60)],
        "g string, job_id long, sz int",
    )
    out = PU.sequential_accept(
        df, "sz", byte_cap=100, group_cols=("g",), inclusive=True
    )
    got = {(r["g"], r["job_id"]): r["accepted"] for r in out.collect()}
    assert got == {("a", 1): True, ("a", 2): False, ("b", 1): True, ("b", 2): False}


def test_sequential_accept_duplicate_key_raises_loudly(spark):
    """CONTRACT enforcement (r9 verdict #3): a duplicate (group, subgroup,
    order) composite key in an OVERFLOWING slice must fail loudly — the
    fold's flag join-back is 1:1, and before the in-fold guard a caller
    bug silently multiplied accepted rows (n^2 per duplicate key set)
    instead of erroring."""
    df = spark.createDataFrame(
        [(1, 60), (1, 60), (2, 60)], "job_id long, sz int"
    )  # duplicate order key job_id=1; total 180 > cap -> slow path
    out = PU.sequential_accept(df, "sz", byte_cap=100, order_cols=("job_id",))
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "duplicate (group, subgroup, order) key" in str(ei.value)


def test_sequential_accept_duplicate_key_fitting_slice_harmless(spark):
    # duplicates in a FITTING slice never join per-row — both rows accept
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10)], "job_id long, sz int"
    )
    out = PU.sequential_accept(df, "sz", byte_cap=100, order_cols=("job_id",))
    rows = out.collect()
    assert len(rows) == 3 and all(r["accepted"] for r in rows)


# ----------------------------------------------------------------- marketo

MAPPING = [
    {"from": "email", "to": "email"},
    {"from": "firstName", "to": "firstName"},
    {"from": "lastName", "to": "lastName"},
]


def test_marketo_csv_rows_basic(spark):
    # TestMarketoBulkUploader_Upload's fixture: 2 jobs, all mapped fields
    docs = [
        {"email": "test1@example.com", "firstName": "Test1", "lastName": "User1"},
        {"email": "test2@example.com", "firstName": "Test2", "lastName": "User2"},
    ]
    out = PU.marketo_csv_rows(_jobs(spark, docs), MAPPING).orderBy("job_id").collect()
    assert PU.marketo_headers(MAPPING) == ["email", "firstName", "lastName"]
    assert [r["csv_line"] for r in out] == [
        "test1@example.com,Test1,User1",
        "test2@example.com,Test2,User2",
    ]
    assert all(r["accepted"] for r in out)
    # calculateHashCode: sha256 of raw values joined with ","
    want = hashlib.sha256(b"test1@example.com,Test1,User1").hexdigest()
    assert out[0]["data_hash"] == want
    # calculateRowSize: escaped bytes + CRLF
    assert out[0]["row_bytes"] == len("test1@example.com,Test1,User1") + 2


def test_marketo_value_semantics(spark):
    # unmapped message keys are dropped; missing mapped keys are "";
    # numbers/bools via JSON text; explicit null prints Go's "<nil>"
    docs = [{"email": "a@b.c", "firstName": 25, "lastName": None, "extra": "x"}]
    out = PU.marketo_csv_rows(_jobs(spark, docs), MAPPING).collect()[0]
    assert out["csv_line"] == "a@b.c,25,<nil>"
    docs2 = [{"email": "a@b.c"}]
    out2 = PU.marketo_csv_rows(_jobs(spark, docs2), MAPPING).collect()[0]
    assert out2["csv_line"] == "a@b.c,,"


def test_marketo_header_dedup_keeps_first():
    m = [
        {"from": "e", "to": "email"},
        {"from": "e2", "to": "email"},
        {"from": "n", "to": "name"},
    ]
    assert PU.marketo_headers(m) == ["email", "name"]


def test_marketo_overflow_jobs_rejected(spark):
    # tiny cap: header(17+2=19 with 'email,firstName,lastName'... ) use
    # default headers; rows sized so job2 overflows but job3 fits again
    docs = [
        {"email": "a@b.c", "firstName": "x", "lastName": "y"},
        {"email": "LOOOOOOOOOOOOOOOOOOOOOONG@example.com",
         "firstName": "AAAAAAAAAAAAAAAA", "lastName": "BBBBBBBBBBBBBBBB"},
        {"email": "c@d.e", "firstName": "z", "lastName": "w"},
    ]
    header_bytes = len(PU.go_csv_line_py(PU.marketo_headers(MAPPING))) + 2
    cap = header_bytes + 13 + 2 + 13 + 2  # room for rows 1 and 3 only
    out = (
        PU.marketo_csv_rows(
            _jobs(spark, docs), MAPPING,
            max_file_bytes=cap, estimate_buffer=1.0,
        )
        .orderBy("job_id")
        .collect()
    )
    assert [r["accepted"] for r in out] == [True, False, True]


# ---------------------------------------------------------- bingads audience

def test_bingads_audience_template():
    t = PU.bingads_audience_template("aud-1", "Add")
    assert t[0].startswith("Type,Status,Id,Parent Id,Client Id")
    assert t[1].split(",")[6] == "6.0"
    assert t[2].split(",")[0] == "Customer List"
    assert t[2].split(",")[2] == "aud-1"
    assert t[2].split(",")[10] == "Add"


def test_bingads_audience_rows_explode_and_clientid(spark):
    docs = [
        {"message": {"Action": "Add", "List": [
            {"email": "e1", "hashedEmail": "h1"},
            {"email": "e2", "hashedEmail": "h2"},
        ]}},
        {"message": {"Action": "Remove", "List": [
            {"email": "e3", "hashedEmail": "h3"},
        ]}},
        {"message": {"Action": "Bogus", "List": []}},
    ]
    out = PU.bingads_audience_rows(_jobs(spark, docs), "aud-9").collect()
    add = sorted(
        (r["client_id"], r["csv_line"]) for r in out
        if r["action"] == "Add" and r["csv_line"]
    )
    assert add[0][0] == "1<<>>h1"
    # the 13-column Customer List Item row (audience/util.go:116)
    cols = add[0][1].split(",")
    assert cols[0] == "Customer List Item"
    assert cols[3] == "aud-9"
    assert cols[4] == "1<<>>h1"
    assert cols[11] == "Email" and cols[12] == "h1"
    assert len(cols) == 13
    bogus = [r for r in out if r["action"] == "Bogus"]
    assert len(bogus) == 1 and bogus[0]["error"] == "invalid action"
    assert not bogus[0]["accepted"]


def test_bingads_audience_caps_per_action(spark):
    # events cap is per action file and counted per JOB, not per member
    docs = []
    for i in range(4):
        docs.append({"message": {"Action": "Add",
                                 "List": [{"email": "e", "hashedEmail": f"h{i}"}]}})
    out = PU.bingads_audience_rows(
        _jobs(spark, docs), "aud", events_limit=2
    ).collect()
    accepted_jobs = {r["job_id"] for r in out if r["accepted"]}
    assert accepted_jobs == {1, 2}
    assert PU.bingads_audience_rows.__doc__  # citation presence sanity


def test_bingads_audience_empty_audience_raises(spark):
    with pytest.raises(ValueError):
        PU.bingads_audience_rows(_jobs(spark, []), "")


# ------------------------------------------------- bingads offline conversions

def _off(spark, fields, action="insert", job_id=1):
    return spark.createDataFrame(
        [(job_id, json.dumps({"action": action, "fields": fields}))],
        "job_id long, payload string",
    )


GOOD = {
    "conversionName": "Purchase",
    "conversionTime": "2024-01-15T10:30:00Z",
    "microsoftClickId": "click-1",
    "conversionCurrencyCode": "USD",
    "conversionValue": "99.9",
}


def test_offline_insert_row_and_time_format(spark):
    out = PU.bingads_offline_rows(_off(spark, GOOD)).collect()[0]
    assert out["error"] is None and out["accepted"]
    cols = out["csv_line"].split(",")
    # populateZipFile insert order (util.go:146)
    assert cols[0] == "Offline Conversion"
    assert cols[2] == "1"  # Id = jobId
    assert cols[6] == "USD"
    assert cols[7] == "Purchase"
    assert cols[8] == "1/15/2024 10:30:00 AM"  # Go "1/2/2006 3:04:05 PM"
    assert cols[10] == "click-1"
    assert len(cols) == 15


def test_offline_us_format_accepted_verbatim(spark):
    f = dict(GOOD, conversionTime="7/2/2025 6:50:54 PM")
    out = PU.bingads_offline_rows(_off(spark, f)).collect()[0]
    assert out["error"] is None
    assert out["csv_line"].split(",")[8] == "7/2/2025 6:50:54 PM"


def test_offline_validation_ladder(spark):
    # missing conversionName
    f = {k: v for k, v in GOOD.items() if k != "conversionName"}
    assert "conversionName" in PU.bingads_offline_rows(_off(spark, f)).collect()[0]["error"]
    # non-string conversionName
    f = dict(GOOD, conversionName=42)
    assert "conversionName" in PU.bingads_offline_rows(_off(spark, f)).collect()[0]["error"]
    # bad time format
    f = dict(GOOD, conversionTime="not-a-time")
    assert "conversionTime" in PU.bingads_offline_rows(_off(spark, f)).collect()[0]["error"]
    # no clickid / email / phone
    f = {k: v for k, v in GOOD.items() if k != "microsoftClickId"}
    assert "microsoftClickId" in PU.bingads_offline_rows(_off(spark, f)).collect()[0]["error"]
    # ...but a present email rescues it (enhanced conversions)
    f2 = dict(f, email="a@b.c")
    assert PU.bingads_offline_rows(_off(spark, f2)).collect()[0]["error"] is None
    # ...and so does an explicit NULL email (Go nil != "" passes)
    f3 = dict(f, email=None)
    assert PU.bingads_offline_rows(_off(spark, f3)).collect()[0]["error"] is None


def test_offline_update_delete_rows(spark):
    f = dict(GOOD, adjustedConversionTime="2024-02-01T08:00:00Z")
    up = PU.bingads_offline_rows(_off(spark, f, action="update")).collect()[0]
    assert up["error"] is None
    cols = up["csv_line"].split(",")
    assert cols[1] == "Restate" and cols[3] == "1"
    assert cols[12] == "2/1/2024 8:00:00 AM"
    assert len(cols) == 13
    dl = PU.bingads_offline_rows(_off(spark, f, action="delete")).collect()[0]
    cols = dl["csv_line"].split(",")
    assert cols[1] == "Retract" and len(cols) == 11
    # update without adjustedConversionTime errors; insert ignores it
    up2 = PU.bingads_offline_rows(_off(spark, GOOD, action="update")).collect()[0]
    assert "adjustedConversionTime" in up2["error"]
    # update without conversionValue errors
    f4 = {k: v for k, v in f.items() if k != "conversionValue"}
    up3 = PU.bingads_offline_rows(_off(spark, f4, action="update")).collect()[0]
    assert "conversionValue" in up3["error"]


def test_offline_hashing(spark):
    f = dict(GOOD, email="user@x.io", phone="123")
    out = PU.bingads_offline_rows(_off(spark, f), is_hash_required=True).collect()[0]
    cols = out["csv_line"].split(",")
    assert cols[11] == hashlib.sha256(b"user@x.io").hexdigest()
    assert cols[12] == hashlib.sha256(b"123").hexdigest()
    # isHashRequired false keeps raw values
    out2 = PU.bingads_offline_rows(_off(spark, f), is_hash_required=False).collect()[0]
    assert out2["csv_line"].split(",")[11] == "user@x.io"
    # hashFields only touches keys PRESENT in the map: an absent phone
    # stays "" unhashed; a present-but-empty email hashes sha256("")
    f2 = dict(GOOD, email="")
    out3 = PU.bingads_offline_rows(_off(spark, f2), is_hash_required=True).collect()[0]
    cols = out3["csv_line"].split(",")
    assert cols[11] == hashlib.sha256(b"").hexdigest()  # present "" → hashed
    assert cols[12] == ""  # absent phone → bare ""


def test_offline_template_headers():
    ins = PU.bingads_offline_template("insert")
    assert ins[0].split(",")[6] == "Conversion Currency Code"
    assert ins[1].split(",")[5] == "6.0"
    up = PU.bingads_offline_template("update")
    assert up[0].split(",")[1] == "Adjustment Type"
    assert len(PU.bingads_offline_template("delete")[0].split(",")) == 11


# ------------------------------------------------------------------- lytics

LYTICS_MAP = [
    {"rudderProperty": "email", "lyticsProperty": "email_addr"},
    {"rudderProperty": "age", "lyticsProperty": "age"},
    {"rudderProperty": "missing", "lyticsProperty": "gone"},
]


def test_lytics_rows_and_headers(spark):
    docs = [
        {"message": {"properties": {"email": "a@b.c", "age": 30, "x": 1}}},
        {"message": {"properties": {"email": "d@e.f", "age": None}}},
    ]
    out = PU.lytics_csv_rows(_jobs(spark, docs), LYTICS_MAP).orderBy("job_id").collect()
    assert PU.lytics_headers(LYTICS_MAP) == ["email_addr", "age", "gone"]
    assert out[0]["csv_line"] == "a@b.c,30,"
    # Go fmt "%v" of nil → "<nil>" (utils.go default branch on nil value)
    assert out[1]["csv_line"] == "d@e.f,<nil>,"
    assert all(r["accepted"] for r in out)


def test_lytics_size_cap_skip(spark):
    big = {"message": {"properties": {"email": "X" * 300}}}
    small = {"message": {"properties": {"email": "s@t.u"}}}
    docs = [small, big, small]
    line_small = PU.lytics_csv_rows(_jobs(spark, [small]), LYTICS_MAP).collect()[0]["line_bytes"]
    out = (
        PU.lytics_csv_rows(
            _jobs(spark, docs), LYTICS_MAP, file_size_limit=2 * line_small + 1
        )
        .orderBy("job_id")
        .collect()
    )
    assert [r["accepted"] for r in out] == [True, False, True]


def test_sequential_accept_count_cap_window_path(spark):
    # bytes always fit, only the row cap binds -> the pure-Spark
    # running-count fast path decides (no Arrow fold); mixed with skips
    # and two groups to pin the per-slice window and the offered-only
    # counting. One group also byte-overflows to exercise the fold side
    # of the union in the same plan.
    rows = []
    for g, sizes, skips in [
        ("a", [10, 10, 10, 10, 10], [False, True, False, False, False]),
        ("b", [10, 10, 10], [False, False, False]),
        ("c", [50, 200, 40, 30], [False, False, False, False]),  # byte overflow
    ]:
        for i, (s, sk) in enumerate(zip(sizes, skips)):
            rows.append((g, i + 1, s, sk))
    df = spark.createDataFrame(rows, "g string, job_id long, sz int, skip boolean")
    out = PU.sequential_accept(
        df, "sz", byte_cap=100, order_cols=("job_id",), group_cols=("g",),
        count_cap=2, inclusive=True, skip_col="skip",
    )
    got = {(r["g"], r["job_id"]): r["accepted"] for r in out.collect()}

    def ref(sizes, skips, cap, ccap):
        total, n, res = 0, 0, []
        for s, sk in zip(sizes, skips):
            if sk:
                res.append(False)
                continue
            new = total + s
            ok = new <= cap and n < ccap
            if ok:
                total, n = new, n + 1
            res.append(ok)
        return res

    for g, sizes, skips in [
        ("a", [10, 10, 10, 10, 10], [False, True, False, False, False]),
        ("b", [10, 10, 10], [False, False, False]),
        ("c", [50, 200, 40, 30], [False, False, False, False]),
    ]:
        want = ref(sizes, skips, 100, 2)
        assert [got[(g, i + 1)] for i in range(len(sizes))] == want, g


def test_vpath_escaped_keys_resolve(spark):
    """_vpath escaping pin (r8 review ask): mapping keys containing a
    double quote or a backslash must still resolve through Spark's
    variant path parser — if the bracket-quoted escape were rejected,
    try_variant_get would return NULL and the cell would silently render
    ''."""
    import json

    from rudder_server_spark.operators.provider_uploads import marketo_csv_rows

    key_q = 'a"b'
    key_b = "c\\d"
    payload = json.dumps({key_q: "vq", key_b: "vb", "plain": "vp"})
    jobs = spark.createDataFrame(
        [(1, payload)], "job_id long, payload string"
    )
    out = marketo_csv_rows(
        jobs,
        [{"from": key_q, "to": key_q}, {"from": key_b, "to": key_b},
         {"from": "plain", "to": "plain"}],
    ).collect()
    assert out[0]["csv_line"] == "vq,vb,vp"


def test_duplicate_json_keys_render_empty_documented(spark):
    """Documented divergence pin (r8 review ask): try_parse_json rejects
    duplicate JSON object keys, so EVERY field of such a payload renders
    '' — where Go's gjson would return the first value. This test pins
    the chosen behavior so a silent change (either way) is caught."""
    from rudder_server_spark.operators.provider_uploads import marketo_csv_rows

    jobs = spark.createDataFrame(
        [(1, '{"email":"first@x.io","email":"second@x.io","name":"n"}')],
        "job_id long, payload string",
    )
    out = marketo_csv_rows(
        jobs, [{"from": "email", "to": "email"}, {"from": "name", "to": "name"}]
    ).collect()
    assert out[0]["csv_line"] == ","  # all cells empty: doc rejected whole
    assert out[0]["accepted"]  # rejection affects rendering, not admission


def test_go_csv_field_sql_twin_differential(spark):
    """The SQL-text twin (go_csv_field_sql) must render byte-identically
    to the Column builder (go_csv_field) AND the Python reference
    (go_csv_field_py) over adversarial cells — quotes, commas, CRLF,
    leading whitespace/control chars, the literal backslash-dot, empty,
    and unicode."""
    from pyspark.sql import functions as F

    cells = [
        "", "plain", "with,comma", 'with"quote', "with\rcr", "with\nlf",
        " leading space", "\tleading tab", "\x0bvtab", "\x0cformfeed",
        "\rleading cr", r"\.", "trailing space ", "uniécode",
        'both",and\nnewline', '""', ",", "\n",
    ]
    df = spark.createDataFrame([(c,) for c in cells], "cell string")
    got = df.select(
        PU.go_csv_field(F.col("cell")).alias("col_api"),
        F.expr(PU.go_csv_field_sql("cell")).alias("sql_twin"),
        "cell",
    ).collect()
    for r in got:
        assert r["col_api"] == r["sql_twin"], r["cell"]
        # the Column/SQL escaping set matches the Python reference on the
        # go fieldNeedsQuotes character class (isspace() beyond these six
        # chars never occurs in provider cells — documented divergence)
        if not (r["cell"][:1].isspace() and r["cell"][:1] not in " \t\n\x0b\x0c\r"):
            assert r["sql_twin"] == PU.go_csv_field_py(r["cell"]), r["cell"]


def test_go_csv_line_sql_twin_differential(spark):
    from pyspark.sql import functions as F

    vals = ["a", "b,c", 'd"e', "", " f"]
    df = spark.createDataFrame([tuple(vals)], "c0 string, c1 string, c2 string, c3 string, c4 string")
    got = df.select(
        PU.go_csv_line([F.col(f"c{i}") for i in range(5)]).alias("col_api"),
        F.expr(PU.go_csv_line_sql([f"c{i}" for i in range(5)])).alias("sql_twin"),
    ).head()
    assert got["col_api"] == got["sql_twin"] == PU.go_csv_line_py(vals)
