#!/usr/bin/env python
"""Interleaved A/B: q98's four provider-branch builds sequential (committed)
vs overlapped on driver threads (guide §2.6 applied to plan construction).

Each provider branch ends in sequential_accept's localCheckpoint(eager=False),
which forces full Catalyst physical planning of the heavy render lineage at
BUILD time (r11 profile: ~1.3 s of the ~2.6 s py4j build is the four
checkpoint plannings, serialized). The lineages are independent, py4j
releases the GIL during socket waits, and the JVM plans concurrently on
separate threads — so a 4-thread build should overlap most of that cost.
The produced plan is IDENTICAL (same branches, same union order); only the
driver-side construction schedule changes.

Usage: python bench/ab_q98threads.py [rounds]
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
    from rudder_server_spark.plans.registry import load_all
    from rudder_server_spark.session import get_spark

    reg = load_all()
    spark = get_spark(app_name="ab_q98threads")

    # Both variants build from the SAME committed branch closures
    # (plans/core._q98_branches), so the branch expressions are
    # byte-identical; only the construction schedule differs.
    import pyspark.sql.functions as F
    from rudder_server_spark.plans.core import _q98_branches  # type: ignore

    def _finish(mk, aud, off, ly):
        allp = mk.unionByName(aud).unionByName(off).unionByName(ly)
        return (
            allp.groupBy("provider", "action")
            .agg(
                F.sum("job_first").cast("long").alias("n_jobs"),
                F.count("csv_line").alias("n_rows"),
                F.sum(F.when(F.col("failed"), 1).otherwise(0)).alias("n_failed"),
                F.min("csv_line").alias("min_line"),
                F.max("csv_line").alias("max_line"),
                F.min("hash").alias("min_hash"),
                F.max("hash").alias("max_hash"),
            )
            .orderBy("provider", "action")
        )

    def build_committed():  # sequential branch builds (pre-r12 shape)
        return _finish(*[fn() for fn in _q98_branches(spark, SF_DIR)])

    def build_threaded():  # overlapped branch builds (committed q98 shape)
        from concurrent.futures import ThreadPoolExecutor

        branches = _q98_branches(spark, SF_DIR)
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [pool.submit(fn) for fn in branches]
            mk, aud, off, ly = [f.result() for f in futs]
        return _finish(mk, aud, off, ly)

    def run(builder):
        t0 = time.time()
        df = builder()
        t_built = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_done = time.time()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
        return round(t_built - t0, 3), round(t_done - t0, 3)

    # warm both paths once (JIT/codegen) before timing
    run(build_committed)
    run(build_threaded)

    out = {"sf": SF_DIR, "rounds": ROUNDS, "pairs": []}
    for r in range(ROUNDS):
        if r % 2 == 0:
            cb, ct = run(build_committed)
            tb, tt = run(build_threaded)
        else:
            tb, tt = run(build_threaded)
            cb, ct = run(build_committed)
        out["pairs"].append(
            {"committed": {"build": cb, "total": ct},
             "threaded": {"build": tb, "total": tt}}
        )
        print(f"# round {r}: committed build {cb} total {ct} | "
              f"threaded build {tb} total {tt}", file=sys.stderr, flush=True)

    cmin = min(p["committed"]["total"] for p in out["pairs"])
    tmin = min(p["threaded"]["total"] for p in out["pairs"])
    out["committed_min_total"] = cmin
    out["threaded_min_total"] = tmin
    out["committed_min_build"] = min(p["committed"]["build"] for p in out["pairs"])
    out["threaded_min_build"] = min(p["threaded"]["build"] for p in out["pairs"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
