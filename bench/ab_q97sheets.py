#!/usr/bin/env python
"""Interleaved A/B: googlesheets_shape's message-cell explode via
to_json + from_json(map<string,variant>) re-parse (committed r11 shape)
vs a direct try_variant_get(_mv, '$.message', 'map<string,variant>') cast
(guide §2.3/§4 — one serialization + one parse per row removed; from_json
over variant values is also CodegenFallback-adjacent). Output pinned
byte-identical by probe incl. NULL cohorts (non-object message, absent
message, non-numeric positions).

Usage: python bench/ab_q97sheets.py [rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> None:
    import pyspark.sql.functions as F
    from rudder_server_spark.session import get_spark
    from rudder_server_spark.sources.fixtures import fan_out
    from rudder_server_spark.sources.rudder_events import rudder_events_path
    from rudder_server_spark.sources.streammanager import (
        _getter,
        routed_stream_document,
    )
    from rudder_server_spark.plans.rudder import _load

    spark = get_spark(app_name="ab_q97sheets")

    def shape(df, direct_map: bool, json_data_col: str = "json_data"):
        get, whole = _getter(df, json_data_col)
        batch = get("$.batch")
        elems = F.when(
            batch.isNotNull(), F.from_json(batch, "array<variant>")
        ).otherwise(F.array(F.try_parse_json(whole)))
        rows = df.select(
            "*", F.posexplode_outer(elems).alias("batch_index", "_mv")
        )
        if direct_map:
            cells = rows.select(
                *[c for c in rows.columns if c != "_mv"],
                F.explode_outer(
                    F.try_variant_get(
                        F.col("_mv"), "$.message", "map<string,variant>"
                    )
                ).alias("_pos", "_cell"),
            )
        else:
            rows = rows.select(
                "*",
                F.to_json(
                    F.try_variant_get(F.col("_mv"), "$.message", "variant")
                ).alias("_msg"),
            )
            cells = rows.select(
                *[c for c in rows.columns if c != "_mv"],
                F.explode_outer(
                    F.from_json(F.col("_msg"), "map<string,variant>")
                ).alias("_pos", "_cell"),
            )
        raw_val = F.to_json(
            F.try_variant_get(F.col("_cell"), "$.attributeValue", "variant")
        )
        is_num = raw_val.isNotNull() & ~raw_val.startswith('"') & ~raw_val.isin(
            "null", "true", "false"
        ) & ~raw_val.startswith("[") & ~raw_val.startswith("{")
        pos = F.col("_pos").try_cast("int")
        return cells.select(
            *[c for c in cells.columns if not c.startswith("_")],
            pos.alias("position"),
            F.try_variant_get(F.col("_cell"), "$.attributeKey", "string").alias(
                "attribute_key"
            ),
            F.try_variant_get(F.col("_cell"), "$.attributeValue", "string").alias(
                "value_str"
            ),
            F.when(
                is_num,
                F.try_variant_get(F.col("_cell"), "$.attributeValue", "double"),
            ).alias("value_num"),
            F.when(
                F.col("_pos").isNotNull() & pos.isNull(),
                F.lit("non-numeric message position"),
            ).alias("error"),
        )

    def q97(direct_map: bool):
        src = _load(spark, SF_DIR).select("event_type", "payload")
        docs = routed_stream_document(
            fan_out(src, spark, paths=[rudder_events_path(SF_DIR)]),
            as_struct=True,
            fields={"batch"},
        ).select("event_type", "json_data")
        shaped = shape(
            docs.where(F.col("event_type") == "track"), direct_map
        )
        return (
            shaped.groupBy("position", "attribute_key")
            .agg(
                F.count("*").alias("n_cells"),
                F.sum(
                    F.when(F.col("value_num").isNotNull(), 1).otherwise(0)
                ).alias("n_numeric"),
            )
            .orderBy("position", "attribute_key")
        )

    # value-level equivalence pin at this SF before timing
    a = [tuple(r) for r in q97(False).collect()]
    b = [tuple(r) for r in q97(True).collect()]
    assert a == b, f"OUTPUT MISMATCH: {a[:3]} vs {b[:3]}"
    print(f"# outputs identical ({len(a)} rows)", file=sys.stderr, flush=True)

    def run(direct_map: bool) -> float:
        t0 = time.time()
        q97(direct_map).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    run(False); run(True)  # warm both

    out = {"sf": SF_DIR, "rounds": ROUNDS, "pairs": []}
    for r in range(ROUNDS):
        if r % 2 == 0:
            o, n = run(False), run(True)
        else:
            n, o = run(True), run(False)
        out["pairs"].append({"reparse": o, "direct_map": n})
        print(f"# round {r}: reparse {o} direct_map {n}", file=sys.stderr, flush=True)
    out["reparse_min"] = min(p["reparse"] for p in out["pairs"])
    out["direct_map_min"] = min(p["direct_map"] for p in out["pairs"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
