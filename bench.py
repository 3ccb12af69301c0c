#!/usr/bin/env python
"""Benchmark harness: runs the declared headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries: one per operator family (joins/windows/aggs/dedup/
# identity/flatten/similarity/text) — the set the 2× gate is judged on
BENCH_QUERIES = [
    "q1_flatten_infer",
    "q2_latest_status",
    "q3_pileup",
    "q4_exact_dedup",
    "q7_fanout",
    "q8_latest_traits",
    "q9_identity_graph",
    "q11_reporting_rollup",
    "q20_tpch_q3",
    "q21_rollup",
    "q22_windows",
    "q25_asof",
    "q26_text_ops",
    "q27_similarity_topk",
    "t2_ngram_jaccard",
    "t3_minhash_lsh",
]


def main() -> None:
    from rudder_server_spark.plans.registry import load_all
    from rudder_server_spark.session import get_spark

    reg = load_all()
    spark = get_spark(app_name="bench")

    # warm the JVM + fixture generation outside the timed region
    from rudder_server_spark.sources.rudder_events import rudder_events_path

    rudder_events_path(SF_DIR)
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in reg:
            continue
        t0 = time.time()
        df = reg[name].spark_fn(spark, SF_DIR)
        # noop sink: executes the FULL plan (incl. final sort) without
        # count()'s projection/sort elimination or collect()'s driver cost
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
