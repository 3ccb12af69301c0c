"""BQSTREAM_ALL_EVENTS async destination contracts — mirrors the
reference's events_test.go / bqstreamallevents_test.go pins:
TestSetTimestamps, TestGroupAndChunkEvents, TestSchemaFromEvents,
TestCheckForDuplicateIDsInEvents, TestGetDiscardedRecordsFromEvent,
TestConvertDiscardedEventsToRows, plus encode.go's normalizeRow/sorted
column determinism and the per-chunk verdict triage."""

import json

import pytest
from pyspark.sql import functions as F

from rudder_server_spark.operators.bqstream_events import (
    bq_duplicate_id_stats,
    bq_encode_rows,
    bq_event_schemas,
    chunk_bq_events,
    coerce_bq_events,
    finalize_bq_jobs,
    parse_bq_lines,
    reconcile_bq_schema,
    stamp_bq_events,
)

TS = "2024-01-31T00:00:00.000Z"


def _lines(spark, rows):
    data = [
        (
            json.dumps(
                {
                    "message": {
                        "metadata": {"table": t, "columns": cols},
                        "data": d,
                    },
                    "metadata": {"job_id": j},
                }
            ),
        )
        for (j, t, cols, d) in rows
    ]
    return parse_bq_lines(spark.createDataFrame(data, "line string"))


def test_stamp_only_when_declared(spark):
    # TestSetTimestamps: uuid_ts/loaded_at written only when the columns
    # map declares them; each stamp grows the size by len(formatted_ts)
    df = _lines(
        spark,
        [
            (1, "t", {"id": "string", "uuid_ts": "datetime", "loaded_at": "datetime"}, {"id": "a"}),
            (2, "t", {"id": "string", "uuid_ts": "datetime"}, {"id": "b", "uuid_ts": "old"}),
            (3, "t", {"id": "string"}, {"id": "c"}),
        ],
    )
    out = stamp_bq_events(df, TS)
    rows = {
        r["job_id"]: r
        for r in out.select(
            "job_id",
            "line_bytes",
            "message_data_byte_size",
            F.to_json(F.col("data")[F.lit("uuid_ts")]).alias("uuid_ts"),
            F.to_json(F.col("data")[F.lit("loaded_at")]).alias("loaded_at"),
        ).collect()
    }
    assert rows[1]["uuid_ts"] == f'"{TS}"'
    assert rows[1]["loaded_at"] == f'"{TS}"'
    assert rows[1]["message_data_byte_size"] == rows[1]["line_bytes"] + 2 * len(TS)
    # replace-in-place: the stale value is gone, size grows once
    assert rows[2]["uuid_ts"] == f'"{TS}"'
    assert rows[2]["loaded_at"] is None
    assert rows[2]["message_data_byte_size"] == rows[2]["line_bytes"] + len(TS)
    assert rows[3]["uuid_ts"] is None
    assert rows[3]["message_data_byte_size"] == rows[3]["line_bytes"]


def _greedy_reference(sizes, cap):
    """events.go:88-126 verbatim: flush when cur+size exceeds the cap,
    then append unconditionally."""
    chunk, cur, out = 0, 0, []
    for s in sizes:
        if cur + s > cap and cur > 0:
            chunk += 1
            cur = 0
        out.append(chunk)
        cur += s
    return out


@pytest.mark.parametrize(
    "sizes,cap",
    [
        ([100, 100, 100, 100], 250),       # plain split
        ([100, 900, 100], 500),            # oversized event gets its OWN chunk
        ([500, 500, 500], 500),            # exact fits, one per chunk boundary
        ([1, 1, 1, 1000, 1, 1], 10),       # reset after the big one
    ],
)
def test_chunking_greedy_reset(spark, sizes, cap):
    # TestGroupAndChunkEvents: greedy reset fold, no oversized rejection
    rows = [(i, "t", int(s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(
        rows, "job_id long, table string, message_data_byte_size long"
    )
    got = {
        r["job_id"]: r["chunk_idx"]
        for r in chunk_bq_events(df, cap).collect()
    }
    expected = _greedy_reference(sizes, cap)
    assert [got[i] for i in range(len(sizes))] == expected


def test_chunking_independent_per_table(spark):
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "a", 100), (4, "b", 100)],
        "job_id long, table string, message_data_byte_size long",
    )
    got = chunk_bq_events(df, 150).groupBy("table").agg(
        F.max("chunk_idx").alias("mx")
    )
    assert {r["table"]: r["mx"] for r in got.collect()} == {"a": 1, "b": 1}


def test_first_seen_schema_and_reconcile(spark):
    # TestSchemaFromEvents: first event mentioning a column fixes its type
    df = _lines(
        spark,
        [
            (1, "t", {"a": "int", "b": "string"}, {}),
            (2, "t", {"a": "float", "c": "boolean"}, {}),
            (3, "u", {"a": "json"}, {}),
        ],
    )
    es = bq_event_schemas(df)
    got = {
        (r["table"], r["column_name"]): r["column_type"] for r in es.collect()
    }
    assert got == {
        ("t", "a"): "int",
        ("t", "b"): "string",
        ("t", "c"): "boolean",
        ("u", "a"): "json",
    }
    wh = spark.createDataFrame(
        [("t", "a", "float"), ("t", "b", "string")],
        "table string, column_name string, column_type string",
    )
    actions, merged = reconcile_bq_schema(es, wh)
    acts = {(r["table"], r["column_name"]): r["action"] for r in actions.collect()}
    # findNewColumns: only c is new on t; table u is created wholesale
    assert acts == {("t", "c"): "add_column", ("u", "a"): "create"}
    m = {(r["table"], r["column_name"]): r["column_type"] for r in merged.collect()}
    # warehouse type WINS for both-known columns (a stays float: that
    # disagreement is HandleSchemaChange's job)
    assert m[("t", "a")] == "float" and m[("t", "c")] == "boolean"


def test_duplicate_ids_per_chunk_users_excluded(spark):
    # TestCheckForDuplicateIDsInEvents: [1,1,2,2,3] → 2; no-id events
    # don't count; the users table is skipped; chunks count independently
    rows = [
        (1, "t", {"id": "string"}, {"id": "1"}),
        (2, "t", {"id": "string"}, {"id": "1"}),
        (3, "t", {"id": "string"}, {"id": "2"}),
        (4, "t", {"id": "string"}, {"id": "2"}),
        (5, "t", {"id": "string"}, {"id": "3"}),
        (6, "t", {}, {}),
        (7, "users", {"id": "string"}, {"id": "1"}),
        (8, "users", {"id": "string"}, {"id": "1"}),
    ]
    df = stamp_bq_events(_lines(spark, rows), TS)
    one_chunk = df.withColumn("chunk_idx", F.lit(0))
    got = {r["table"]: r["duplicate_ids"] for r in bq_duplicate_id_stats(one_chunk).collect()}
    assert got == {"t": 2}
    # same ids in different chunks are NOT duplicates (per-chunk scope)
    split = df.withColumn("chunk_idx", (F.col("job_id") % 2).cast("int"))
    got2 = {r["table"]: r["duplicate_ids"] for r in bq_duplicate_id_stats(split).collect()}
    assert got2["t"] == 0


def _coerce(spark, rows, wh_rows):
    df = stamp_bq_events(_lines(spark, rows), TS)
    wh = spark.createDataFrame(
        wh_rows, "table string, column_name string, column_type string"
    )
    return coerce_bq_events(df, wh, TS)


def test_discard_matrix(spark):
    # TestGetDiscardedRecordsFromEvent: int→float converts (no discard);
    # float→int truncates; int→string stringifies; incompatible pairs
    # null + discard with the Go reason string; missing id/received_at →
    # nulled but NOT discarded
    rows = [
        (1, "t", {"id": "string", "received_at": "datetime", "a": "int",
                  "b": "float", "c": "int", "d": "boolean"},
         {"id": "x1", "received_at": "2024-01-30T10:00:00.000Z",
          "a": 5, "b": 7.9, "c": 42, "d": True}),
        # no id → discard suppressed, value still nulled
        (2, "t", {"received_at": "datetime", "d": "boolean"},
         {"received_at": "2024-01-30T11:00:00.000Z", "d": False}),
    ]
    wh = [("t", "id", "string"), ("t", "received_at", "datetime"),
          ("t", "a", "float"), ("t", "b", "int"), ("t", "c", "string"),
          ("t", "d", "int")]
    vals, disc = _coerce(spark, rows, wh)
    v = {
        (r["job_id"], r["column_name"]): r["value_json"]
        for r in vals.collect()
    }
    assert v[(1, "a")] == "5.0"        # int widens to float
    assert v[(1, "b")] == "7"          # float truncates toward zero
    assert v[(1, "c")] == '"42"'       # %v stringify, JSON-quoted
    assert v[(1, "d")] is None         # int ← boolean: incompatible
    assert v[(2, "d")] is None         # nulled even without identity
    d = disc.collect()
    assert len(d) == 1
    row = d[0]
    assert row["column_name"] == "d"
    assert row["column_value"] == "true"
    assert row["reason"] == "incompatible schema conversion from int to boolean"
    assert row["row_id"] == "x1"
    assert row["received_at"] == "2024-01-30T10:00:00.000Z"
    assert row["table_name"] == "t"
    assert row["uuid_ts"] == TS


def test_slice_and_json_branches(spark):
    rows = [
        (1, "t", {"id": "string", "received_at": "datetime",
                  "tags": "json", "n": "int", "s": "string"},
         {"id": "x", "received_at": "2024-01-30T10:00:00.000Z",
          "tags": [1, "x", True], "n": 3, "s": "hi"}),
    ]
    # tags json==json: slice STILL stringifies (events.go:190-197);
    # n int → wh json: %v quoted; s string → wh json: strconv.Quote
    wh = [("t", "id", "string"), ("t", "received_at", "datetime"),
          ("t", "tags", "json"), ("t", "n", "json"), ("t", "s", "json")]
    vals, disc = _coerce(spark, rows, wh)
    v = {r["column_name"]: r["value_json"] for r in vals.collect()}
    assert v["tags"] == json.dumps('[1,"x",true]')
    assert v["n"] == '"3"'
    assert v["s"] == '"hi"'
    assert disc.count() == 0


def test_missing_value_goes_through_matrix_as_nil(spark):
    # Go passes the interface nil through HandleSchemaChange: wh string ←
    # ev int with NO value writes the literal "<nil>" (marketo %v parity)
    rows = [
        (1, "t", {"id": "string", "received_at": "datetime", "m": "int"},
         {"id": "x", "received_at": "2024-01-30T10:00:00.000Z"}),
    ]
    wh = [("t", "id", "string"), ("t", "received_at", "datetime"),
          ("t", "m", "string")]
    vals, disc = _coerce(spark, rows, wh)
    v = {r["column_name"]: r["value_json"] for r in vals.collect()}
    assert v["m"] == '"<nil>"'
    # and an incompatible nil discards with columnValue "<nil>"
    wh2 = [("t", "id", "string"), ("t", "received_at", "datetime"),
           ("t", "m", "float")]
    vals2, disc2 = _coerce(spark, rows, wh2)
    d = disc2.collect()
    assert len(d) == 1 and d[0]["column_value"] == "<nil>"


def test_encode_rows_sorted_micros_unknown_column(spark):
    rows = [
        (1, "t", {"id": "string", "received_at": "datetime", "z": "int",
                  "a": "int"},
         {"id": "x", "received_at": "2024-01-30T10:00:00.000Z",
          "z": 1, "a": 2}),
        # stray data key outside the warehouse schema → encode error
        (2, "t", {"id": "string", "received_at": "datetime"},
         {"id": "y", "received_at": "2024-01-30T10:00:00.000Z",
          "stray": 9}),
    ]
    wh = [("t", "id", "string"), ("t", "received_at", "datetime"),
          ("t", "z", "int"), ("t", "a", "int")]
    df = stamp_bq_events(_lines(spark, rows), TS)
    whdf = spark.createDataFrame(
        wh, "table string, column_name string, column_type string"
    )
    vals, _ = coerce_bq_events(df, whdf, TS)
    enc = {
        r["job_id"]: r
        for r in bq_encode_rows(
            vals, whdf, group_cols=("table", "job_id")
        ).collect()
    }
    # sorted column-name order — toBigQuerySchema's positional-proto pin
    assert enc[1]["encoded_fields"] == [
        "a=2",
        'id="x"',
        "received_at=1706608800000000",  # epoch micros (normalizeRow)
        "z=1",
    ]
    assert not enc[1]["encode_error"]
    assert enc[2]["encode_error"]


def test_finalize_per_chunk_verdicts(spark):
    # streamEventBatches: acked chunks succeed even when a sibling chunk
    # of the same table fails; abort-vs-retry follows the FIRST erroring
    # chunk's grpc code
    chunked = spark.createDataFrame(
        [("t", 0, 1), ("t", 0, 2), ("t", 1, 3), ("t", 2, 4),
         ("u", 0, 5), ("u", 1, 6)],
        "table string, chunk_idx int, job_id long",
    )
    results = spark.createDataFrame(
        [("t", 1, "Internal"), ("t", 2, "PermissionDenied"),
         ("u", 1, "Unauthenticated")],
        "table string, chunk_idx int, error_code string",
    )
    got = {
        r["job_id"]: r["job_state"]
        for r in finalize_bq_jobs(chunked, results).collect()
    }
    # t's first error (chunk 1) is Internal → retryable: both failed
    assert got == {
        1: "succeeded", 2: "succeeded", 3: "failed", 4: "failed",
        5: "succeeded", 6: "aborted",
    }
    # no seam → happy path, everything acks
    happy = finalize_bq_jobs(chunked, None)
    assert {r["job_state"] for r in happy.collect()} == {"succeeded"}


def test_encode_sort_by_name_not_rendered_string(spark):
    # ADVICE r7: 'address1' vs 'address' — sort.Strings over NAMES puts
    # 'address' first; sorting the rendered 'name=value' strings would
    # compare '=' (0x3D) against '1' (0x31) and flip them
    rows = [
        (1, "t", {"address": "int", "address1": "int"},
         {"address": 7, "address1": 8}),
    ]
    wh = [("t", "address", "int"), ("t", "address1", "int")]
    df = stamp_bq_events(_lines(spark, rows), TS)
    whdf = spark.createDataFrame(
        wh, "table string, column_name string, column_type string"
    )
    vals, _ = coerce_bq_events(df, whdf, TS)
    enc = bq_encode_rows(vals, whdf, group_cols=("table", "job_id")).collect()
    assert enc[0]["encoded_fields"] == ["address=7", "address1=8"]


def test_encode_rfc3339_strict_and_nanos(spark):
    # time.Parse(RFC3339Nano) parity: date-only / space-separated /
    # offset-less strings FAIL the field (Go rejects them); 9-digit nano
    # fractions truncate to micros like time.UnixMicro
    rows = [
        (1, "t", {"id": "string", "d": "datetime"},
         {"id": "a", "d": "2024-01-30"}),
        (2, "t", {"id": "string", "d": "datetime"},
         {"id": "b", "d": "2024-01-30 10:00:00Z"}),
        (3, "t", {"id": "string", "d": "datetime"},
         {"id": "c", "d": "2024-01-30T10:00:00"}),
        (4, "t", {"id": "string", "d": "datetime"},
         {"id": "d", "d": "2024-01-30T10:00:00.123456789Z"}),
        (5, "t", {"id": "string", "d": "datetime"},
         {"id": "e", "d": "2024-01-30T10:00:00+02:00"}),
    ]
    wh = [("t", "id", "string"), ("t", "d", "datetime")]
    df = stamp_bq_events(_lines(spark, rows), TS)
    whdf = spark.createDataFrame(
        wh, "table string, column_name string, column_type string"
    )
    vals, _ = coerce_bq_events(df, whdf, TS)
    enc = {
        r["job_id"]: r
        for r in bq_encode_rows(vals, whdf, group_cols=("table", "job_id")).collect()
    }
    assert enc[1]["encode_error"] and enc[2]["encode_error"] and enc[3]["encode_error"]
    assert not enc[4]["encode_error"]
    assert "d=1706608800123456" in enc[4]["encoded_fields"]
    assert not enc[5]["encode_error"]
    assert "d=1706601600000000" in enc[5]["encoded_fields"]  # +02:00 honored


def test_encode_all_null_event_emits_empty_row(spark):
    # encodeRows still appends an EMPTY proto row for an event whose
    # fields are all nil — the group row must exist with [] fields
    rows = [
        (1, "t", {"id": "string"}, {"id": None}),
    ]
    wh = [("t", "id", "string")]
    df = stamp_bq_events(_lines(spark, rows), TS)
    whdf = spark.createDataFrame(
        wh, "table string, column_name string, column_type string"
    )
    vals, _ = coerce_bq_events(df, whdf, TS)
    enc = bq_encode_rows(vals, whdf, group_cols=("table", "job_id")).collect()
    assert len(enc) == 1
    assert enc[0]["encoded_fields"] == [] and not enc[0]["encode_error"]


def test_duplicate_ids_numeric_and_null_variants(spark):
    # Go sees 1 and 1.0 as the SAME float64 key; a present-but-nil id is
    # still a map key that counts toward duplicates
    rows = [
        (1, "t", {"id": "int"}, {"id": 1}),
        (2, "t", {"id": "int"}, {"id": 1.0}),
        (3, "t", {"id": "int"}, {"id": None}),
        (4, "t", {"id": "int"}, {"id": None}),
    ]
    df = stamp_bq_events(_lines(spark, rows), TS).withColumn(
        "chunk_idx", F.lit(0)
    )
    got = {r["table"]: r["duplicate_ids"] for r in bq_duplicate_id_stats(df).collect()}
    assert got == {"t": 2}


def test_go_v_array_keeps_nil_elements(spark):
    # fmt %v of a slice prints '[1 <nil> 2]' — array_join must not drop
    # the null element. Surfaces via the discard column_value.
    rows = [
        (1, "t", {"id": "string", "received_at": "datetime", "a": "json"},
         {"id": "x", "received_at": "2024-01-30T10:00:00.000Z",
          "a": [1, None, 2]}),
    ]
    wh = [("t", "id", "string"), ("t", "received_at", "datetime"),
          ("t", "a", "int")]  # json -> int: incompatible, discards
    vals, disc = _coerce(spark, rows, wh)
    d = disc.collect()
    assert len(d) == 1 and d[0]["column_value"] == "[1 <nil> 2]"


def test_chunk_duplicate_job_id_raises_loudly(spark):
    """CONTRACT (r10 verdict #6): a duplicate order key makes the greedy
    reset scan — and every chunk boundary — nondeterministic; the fold
    must raise instead of silently mis-chunking."""
    df = spark.createDataFrame(
        [("t", 1, 50), ("t", 1, 50), ("t", 2, 50)],
        "table string, job_id long, message_data_byte_size long",
    )
    out = chunk_bq_events(df, max_chunk_bytes=80)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "duplicate order key" in str(ei.value)


def test_chunk_property_unique_ids_match_go_loop(spark):
    """Hypothesis: unique job ids never trip the guard and the chunk
    assignment matches the literal Go greedy loop (events.go:88-126);
    one injected duplicate always trips it."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def go_chunks(sizes, cap):
        chunk, cur, idx = 0, 0, []
        for sz in sizes:
            if cur + sz > cap and cur > 0:
                chunk, cur = chunk + 1, 0
            idx.append(chunk)
            cur += sz
        return idx

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.integers(1, 120), min_size=1, max_size=10),
           st.integers(40, 200), st.integers(0, 9))
    def check(sizes, cap, dup_at):
        df = spark.createDataFrame(
            [("t", i + 1, s) for i, s in enumerate(sizes)],
            "table string, job_id long, message_data_byte_size long",
        )
        got = {
            r["job_id"]: r["chunk_idx"]
            for r in chunk_bq_events(df, cap).collect()
        }
        assert [got[i + 1] for i in range(len(sizes))] == go_chunks(sizes, cap)
        i = dup_at % len(sizes)
        bad_rows = [("t", j + 1, s) for j, s in enumerate(sizes)]
        bad_rows.append(("t", i + 1, sizes[i]))
        bad = chunk_bq_events(
            spark.createDataFrame(
                bad_rows,
                "table string, job_id long, message_data_byte_size long",
            ),
            cap,
        )
        with pytest.raises(Exception):
            bad.collect()

    check()
