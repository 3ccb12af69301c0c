#!/usr/bin/env python
"""Driver-equivalent strict verification sweep (VERDICT r2 next-round #4).

Runs EVERY declared query at $VERIFY_SF_DIR (default /root/testdata/sf0.01)
under a deliberately hostile vanilla session — no repo session factory, a
non-UTC timezone, cwd-independent — and compares each against its DuckDB
oracle with the STRICT comparator (tests/oracle.py): row count, column
names, canonicalized dtypes (HUGEINT / TIMESTAMPTZ oracle outputs are
hard failures), and order-insensitive values. Queries without an oracle
record a rows-only count.

Writes VERIFY_ALL.json at the repo root:
  {"sf": ..., "n_queries": N, "n_oracle": N, "failures": {...},
   "rows_only": {...}, "elapsed_sec": N}

Usage: python verify_all.py [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession

    # hostile probes: the driver may run non-UTC, AND with the default-
    # sized 1g driver heap (the r3 regression class: janino/codegen driver-
    # side compilation OOMs only surface under a small driver). Explicit so
    # the guard cannot silently weaken if the box's defaults change.
    driver_mem = os.environ.get("VERIFY_DRIVER_MEMORY", "1g")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("verify_all")
        .getOrCreate()
    )
    import __spark_entry__ as E
    from rudder_server_spark.plans.registry import load_all
    from tests.oracle import compare, duck_connect

    sf_name = os.path.basename(os.path.normpath(SF))
    duck = duck_connect(SF)
    queries, oracles = E.queries(), E.oracle_sql()
    invariants = {n: qd.invariant for n, qd in load_all().items() if qd.invariant}
    failures: dict[str, str] = {}
    rows_only: dict[str, int] = {}
    query_sec: dict[str, float] = {}
    # per-query elapsed budget (VERDICT r8 #6): a single query running
    # away (the r7 q104 surprise cost 277 s at sf0.01) must fail the
    # sweep loudly, not land silently in a 20-minute artifact. sf0.01 is
    # the driver gate; larger SFs scale the budget linearly with SF.
    budget = float(os.environ.get("VERIFY_QUERY_BUDGET_SEC", "60"))
    if sf_name != "sf0.01":
        try:
            budget *= max(float(sf_name.replace("sf", "")) / 0.01, 1.0)
        except ValueError:
            pass
    t0 = time.time()
    for name in sorted(queries):
        tq = time.time()
        try:
            df = queries[name](spark, SF)
            if name not in oracles:
                if name in invariants:
                    # semantic floor for approximate tiers (recall/shape
                    # pins) — a crash or collapsed recall fails the sweep,
                    # not just a cardinality drift (VERDICT r3 #7). These
                    # outputs are bounded by construction (summary rows /
                    # top-k), so the collect is safe in a vanilla session.
                    rows = df.collect()
                    rows_only[name] = len(rows)
                    err = invariants[name](rows)
                    if err:
                        failures[name] = f"INVARIANT {err}"[:500]
                    print(
                        f"{name}: rows-only {len(rows)} "
                        f"{'INVARIANT-FAIL ' + err if err else 'invariant-ok'}",
                        flush=True,
                    )
                else:
                    rows_only[name] = df.count()
                    print(f"{name}: rows-only {rows_only[name]}", flush=True)
                continue
            sql = oracles[name].replace(
                "rudder_events_sf0.01.parquet", f"rudder_events_{sf_name}.parquet"
            )
            ok, msg = compare(df, duck, sql)
            print(f"{name}: {'OK' if ok else 'FAIL ' + str(msg)[:200]}", flush=True)
            if not ok:
                failures[name] = str(msg)[:500]
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            failures[name] = f"EXC {ex}"[:500]
            print(f"{name}: EXC {ex}", flush=True)
        finally:
            # queries are independent: drop persisted/cached blocks so one
            # query's materializations don't accumulate against the 1g
            # hostile heap (measured: ~104 queries of residual caches
            # OOM'd the sf0.1 sweep mid-q98) — same hygiene as bench.py
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
            query_sec[name] = round(time.time() - tq, 1)
            if query_sec[name] > budget and name not in failures:
                failures[name] = (
                    f"BUDGET {query_sec[name]}s > {budget:.0f}s per-query cap"
                )
                print(f"{name}: BUDGET-FAIL {query_sec[name]}s", flush=True)
    # trend vs the PREVIOUS committed sweep artifact (VERDICT r9 #8): a
    # creeping per-query regression must be visible before it trips the
    # budget. Significant = |delta| >= max(2 s, 30% of the old time).
    fname = "VERIFY_ALL.json" if sf_name == "sf0.01" else f"VERIFY_ALL_{sf_name}.json"
    prev_sec: dict = {}
    try:
        with open(os.path.join(REPO, fname)) as fh:
            prev_sec = json.load(fh).get("query_sec", {})
    except (OSError, json.JSONDecodeError):
        pass
    trend = {
        n: {"prev": prev_sec[n], "now": query_sec[n]}
        for n in query_sec
        if n in prev_sec
        and abs(query_sec[n] - prev_sec[n]) >= max(2.0, 0.3 * prev_sec[n])
    }
    out = {
        "sf": sf_name,
        "n_queries": len(queries),
        "n_oracle": len(oracles),
        "failures": failures,
        "rows_only": rows_only,
        "elapsed_sec": round(time.time() - t0, 1),
        "query_sec": query_sec,
        "query_sec_moved": trend,
        "query_budget_sec": budget,
        # recorded so the artifact proves which driver heap the sweep ran
        # under (VERDICT r5 #7: keep every row deterministic at 1g)
        "driver_memory": spark.conf.get("spark.driver.memory", driver_mem),
    }
    # sf0.01 is the driver's gate -> canonical VERIFY_ALL.json; other SFs
    # (e.g. the 10x sf0.1 re-check) write a suffixed artifact alongside
    with open(os.path.join(REPO, fname), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "rows_only"}))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
