#!/usr/bin/env python
"""Interleaved A/B: routed_stream_document's struct builder deriving
userId/anonymousId/event/messageId/properties via per-path
get_json_object (committed shape — the optimizer duplicates the
struct-field expressions per consumer: q91's plan pays $.userId x3,
$.event x3, $.anonymousId x1 full-payload parses per row) vs ONE
json_tuple Generate level feeding the same struct fields (guide §2.3/
§4 — a Generate's outputs are concrete attributes the optimizer cannot
duplicate, so every consumer reads the one parsed value; the house
q92 single-parse pattern applied to the shared routed document).

Also probes per-field parity of json_tuple vs get_json_object over the
FULL corpus before timing (missing keys, JSON nulls, container values).

Usage: python bench/ab_q91jt.py [rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def routed_struct_jt(df, payload_col="payload", fields=None):
    """json_tuple variant of routed_stream_document(as_struct=True)."""
    import pyspark.sql.functions as F
    from rudder_server_spark.sources.streammanager import _nonempty

    p = F.col(payload_col)
    etype = (
        F.col("event_type")
        if "event_type" in df.columns
        else F.get_json_object(p, "$.type")
    )
    pre = df.select(
        "*",
        F.json_tuple(
            p, "userId", "anonymousId", "event", "messageId", "properties"
        ).alias("_jt_uid", "_jt_aid", "_jt_ename", "_jt_msgid", "_jt_props"),
    )
    ename = _nonempty(F.col("_jt_ename"))
    uid = F.coalesce(_nonempty(F.col("_jt_uid")), F.col("_jt_aid"), F.lit(""))

    def js(c):
        arr = F.to_json(F.array(c))
        return arr.substr(F.lit(2), F.length(arr) - F.lit(2))

    positioned = F.concat(
        F.lit('{"0":{"attributeKey":"messageId","attributeValue":'),
        js(F.col("_jt_msgid")),
        F.lit('},"1":{"attributeKey":"event","attributeValue":'),
        js(F.col("_jt_ename")),
        F.lit('},"2":{"attributeKey":"price","attributeValue":'),
        F.coalesce(F.get_json_object(F.col("_jt_props"), "$.price"), F.lit("null")),
        F.lit("}}"),
    )
    named = [
        ("message", p),
        ("userId", uid),
        ("detail", p),
        ("detailType", etype),
        ("source", ename),
        ("deliveryStreamMapTo", ename),
        ("payload", F.when(~etype.isin("page", "extract"), p)),
        (
            "choice",
            F.when(etype == "merge", F.lit("PutUsers"))
            .when(etype == "extract", F.lit("PutItems")),
        ),
        ("datasetId", F.when(etype != "page", F.lit("d"))),
        ("tableId", F.lit("t")),
        (
            "properties",
            F.when(
                etype == "track",
                F.concat(F.lit("["), p, F.lit(","), p, F.lit("]")),
            ).otherwise(p),
        ),
        (
            "batch",
            F.when(
                etype == "track",
                F.concat(F.lit('[{"message":'), positioned, F.lit("}]")),
            ),
        ),
    ]
    if fields is not None:
        named = [(n, c) for n, c in named if n in fields]
    doc = F.struct(*[c.alias(n) for n, c in named])
    return pre.select(*df.columns, doc.alias("json_data"))


def main() -> None:
    import pyspark.sql.functions as F
    from rudder_server_spark.session import get_spark
    from rudder_server_spark.sources.fixtures import fan_out
    from rudder_server_spark.sources.rudder_events import rudder_events_path
    from rudder_server_spark.sources import streammanager as SM
    from rudder_server_spark.plans.rudder import _load

    spark = get_spark(app_name="ab_q91jt")

    # ---- full-corpus per-field parity probe: json_tuple == get_json_object
    src = _load(spark, SF_DIR).select("payload")
    probe = src.select(
        "payload",
        F.json_tuple(
            F.col("payload"),
            "userId", "anonymousId", "event", "messageId", "properties",
        ).alias("ju", "ja", "je", "jm", "jp"),
    ).select(
        *[
            (
                ~F.col(j).eqNullSafe(F.get_json_object(F.col("payload"), g))
            ).cast("int").alias(j)
            for j, g in [
                ("ju", "$.userId"), ("ja", "$.anonymousId"), ("je", "$.event"),
                ("jm", "$.messageId"), ("jp", "$.properties"),
            ]
        ]
    )
    mism = probe.agg(*[F.sum(c).alias(c) for c in probe.columns]).head()
    assert all((v or 0) == 0 for v in mism), f"FIELD PARITY MISMATCH: {mism}"
    print("# json_tuple == get_json_object on all 5 fields, full corpus",
          file=sys.stderr, flush=True)

    WL = {"message", "userId", "payload", "detail", "detailType", "source"}

    def q91(jt: bool):
        from rudder_server_spark.sources.streammanager import (
            eventbridge_shape,
            kinesis_shape,
            lambda_shape,
        )

        base = fan_out(
            _load(spark, SF_DIR).select("event_type", "payload"), spark,
            paths=[rudder_events_path(SF_DIR)],
        )
        if jt:
            docs = routed_struct_jt(base, fields=WL)
        else:
            docs = SM.routed_stream_document(base, as_struct=True, fields=WL)
        docs = docs.select("event_type", "json_data")
        s = kinesis_shape(
            docs, {"stream": "evt-stream", "useMessageID": True}
        ).select(
            "event_type", "json_data",
            (F.col("partition_key").isNotNull() & (F.col("partition_key") != ""))
            .alias("_kin_keyed"),
            F.col("error").isNull().alias("_kin_ok"),
        )
        s = lambda_shape(s, {"lambda": "fn-events"}).select(
            "event_type", "json_data", "_kin_keyed", "_kin_ok",
            F.col("error").isNull().alias("_lam_ok"),
        )
        s = eventbridge_shape(s).select(
            "event_type", "_kin_keyed", "_kin_ok", "_lam_ok",
            F.col("error").isNull().alias("_eb_ok"),
        )

        def cnt(c):
            return F.sum(F.when(c, 1).otherwise(0)).cast("long")

        agg = s.groupBy("event_type").agg(
            cnt(F.col("_eb_ok")).alias("eb_res"),
            cnt(~F.col("_eb_ok")).alias("eb_fail"),
            cnt(F.col("_kin_ok")).alias("kin_res"),
            cnt(~F.col("_kin_ok")).alias("kin_fail"),
            cnt(F.col("_kin_keyed")).alias("kin_keyed"),
            cnt(F.col("_lam_ok")).alias("lam_res"),
            cnt(~F.col("_lam_ok")).alias("lam_fail"),
        )
        return agg.select(
            "event_type",
            F.expr(
                "stack(3, "
                "'eventbridge', eb_res, eb_fail, CAST(0 AS BIGINT), "
                "'kinesis', kin_res, kin_fail, kin_keyed, "
                "'lambda', lam_res, lam_fail, CAST(0 AS BIGINT)"
                ") AS (manager, resolved, failed, keyed)"
            ),
        ).select(
            "manager", "event_type", "resolved", "failed", "keyed"
        ).orderBy("manager", "event_type")

    a = [tuple(r) for r in q91(False).collect()]
    b = [tuple(r) for r in q91(True).collect()]
    assert a == b, f"OUTPUT MISMATCH: {a[:3]} vs {b[:3]}"
    print(f"# q91 outputs identical ({len(a)} rows)", file=sys.stderr, flush=True)

    def run(jt: bool) -> float:
        t0 = time.time()
        q91(jt).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    run(False); run(True)  # warm both

    out = {"sf": SF_DIR, "rounds": ROUNDS, "pairs": []}
    for r in range(ROUNDS):
        if r % 2 == 0:
            o, n = run(False), run(True)
        else:
            n, o = run(True), run(False)
        out["pairs"].append({"gjo": o, "json_tuple": n})
        print(f"# round {r}: gjo {o} json_tuple {n}", file=sys.stderr, flush=True)
    out["gjo_min"] = min(p["gjo"] for p in out["pairs"])
    out["json_tuple_min"] = min(p["json_tuple"] for p in out["pairs"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
