"""Error-detail reporting contracts — mirrors enterprise/reporting/
error_extractor.go's extraction ladder, CleanUpErrorMessage regex chain,
GetErrorCode, and error_grouper.go's connection-grain merge."""

import pyspark.sql.functions as F

from rudder_server_spark.operators.error_details import (
    clean_error_message,
    error_code,
    extract_error_message,
    group_error_details,
    truncate_error_message,
)


def _extract(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    return [
        r["m"]
        for r in df.select(
            extract_error_message(F.col("s")).alias("m")
        ).collect()
    ]


def test_extraction_ladder(spark):
    got = _extract(
        spark,
        [
            "plain text passes through",
            '{"reason":"rate limited"}',
            '{"Error":"first line\\nsecond line"}',
            '{"response":"{\\"message\\":\\"nested msg\\"}"}',
            '{"error":"plain error string"}',
            '{"internal_processing_failed":{"errors":["a","a","b"]}}',
            '{"msg":"direct msg"}',
            '{"destinationResponse":{"detail":"dr detail"}}',
            '{"errors":["x","y"]}',
            '{"unrelated":"nothing here"}',
        ],
    )
    assert got[0] == "plain text passes through"
    assert got[1] == "rate limited"
    assert got[2] == "first line"          # handleError: first line only
    assert got[3] == "nested msg"          # nested-JSON message key
    assert got[4] == "plain error string"  # non-JSON error value verbatim
    assert got[5] == "a.b"                 # warehouse errors uniq'd + '.'
    assert got[6] == "direct msg"
    assert got[7] == "dr detail"
    assert got[8] == "x.y"                 # errors fallback join
    assert got[9] == ""                    # nothing found -> ""


def test_extraction_html_and_priority(spark):
    got = _extract(
        spark,
        [
            '{"response":"<html><head><title>t</title></head>'
            '<body>Service Unavailable</body></html>"}',
            # message keys in priority order: error_message beats title
            '{"title":"low prio","error_message":"high prio"}',
        ],
    )
    assert "Service Unavailable" in got[0] and "<" not in got[0]
    assert got[1] == "high prio"


def test_cleanup_regex_chain(spark):
    df = spark.createDataFrame(
        [("connect https://x.io/y from 10.1.2.3 as a@b.co id ab12cd, done!",)],
        "s string",
    )
    got = df.select(clean_error_message(F.col("s")).alias("m")).head()["m"]
    # url, ip, email, digit-bearing token scrubbed; \W+ and \s+ collapsed
    assert got == "connect from as id done"


def test_truncate(spark):
    df = spark.createDataFrame([("x" * 250,), ("short",)], "s string")
    got = [
        r["m"]
        for r in df.select(
            truncate_error_message(F.col("s")).alias("m")
        ).collect()
    ]
    assert got[0] == "x" * 200 + "..." and got[1] == "short"


def test_error_code_priority_and_warehouse_skip(spark):
    rows = [
        # statTags win over everything
        ("whatever", "network", "timeout", "WEBHOOK", "network:timeout"),
        # category alone (Go appends present parts only)
        ("whatever", "network", None, "WEBHOOK", "network"),
        # deprecation detected (version context + keyword set)
        ("this api version is deprecated", None, None, "WEBHOOK", "deprecation"),
        # hyphen normalization: end-of-life -> end of life
        ("api end-of-life reached", None, None, "WEBHOOK", "deprecation"),
        # warehouse destinations skip deprecation detection
        ("this api version is deprecated", None, None, "POSTGRES", ""),
        # no context key -> no code
        ("deprecated thing", None, None, "WEBHOOK", ""),
    ]
    df = spark.createDataFrame(
        [(m, c, t, d) for m, c, t, d, _ in rows],
        "m string, c string, t string, d string",
    )
    got = [
        r["code"]
        for r in df.select(
            error_code(F.col("m"), F.col("c"), F.col("t"), F.col("d")).alias(
                "code"
            )
        ).collect()
    ]
    assert got == [exp for *_ignore, exp in rows]


def test_group_merge(spark):
    df = spark.createDataFrame(
        [
            ("s1", "d1", "router", "track", "", "boom"),
            ("s1", "d1", "router", "track", "", "boom"),
            ("s1", "d1", "router", "track", "", "other"),
            ("s1", "d2", "router", "track", "", "boom"),
        ],
        "source_id string, destination_id string, pu string, "
        "event_type string, error_code string, error_message string",
    )
    got = {
        (r["source_id"], r["destination_id"], r["error_message"]): r["count"]
        for r in group_error_details(df).collect()
    }
    assert got == {
        ("s1", "d1", "boom"): 2,
        ("s1", "d1", "other"): 1,
        ("s1", "d2", "boom"): 1,
    }
