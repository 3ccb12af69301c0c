#!/usr/bin/env python
"""Regenerate bench/baseline_sf*.json: wall-clock of each BENCH query's
DuckDB oracle at the target scale — the single-node reference the 2× bench
gate compares against (BASELINE.md "project bench gate").

Usage: python bench/make_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    from bench import BENCH_QUERIES, ROSTER_V2_EXTRA  # single source of truth
    from rudder_server_spark.plans.registry import load_all
    from rudder_server_spark.sources.fixtures import TABLES
    from rudder_server_spark.sources.rudder_events import rudder_events_path

    rudder_events_path(sf_dir)  # materialize the fixture outside timing
    reg = load_all()

    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    def time_roster(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            qd = reg.get(name)
            if qd is None or qd.oracle is None:
                continue
            sql = qd.oracle.replace(
                "rudder_events_sf0.01.parquet", f"rudder_events_{sf_name}.parquet"
            )
            con.sql(sql).fetchall()  # warm (page cache + duckdb compile)
            # min-of-3 warm runs: the same steady-state estimator bench.py
            # uses for the Spark side — a single warm run on this shared VM
            # can be inflated 2x by a transient interference episode, which
            # would make the gate ratio look better than it is
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                con.sql(sql).fetchall()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)
        return timings

    here = os.path.dirname(os.path.abspath(__file__))
    rosters = {f"baseline_{sf_name}.json": BENCH_QUERIES}
    # the v1 baseline is the COMMITTED gate denominator — only regenerate
    # it when explicitly asked, so a re-run for v2 can't move the gate
    if os.environ.get("ROSTER") == "v1" or not os.path.exists(
        os.path.join(here, f"baseline_{sf_name}.json")
    ):
        pass
    else:
        rosters = {}
    rosters[f"baseline_v2_{sf_name}.json"] = ROSTER_V2_EXTRA

    for fname, roster in rosters.items():
        timings = time_roster(roster)
        out = {
            "engine": "duckdb",
            "sf": float(sf_name.replace("sf", "")),
            "threads": os.cpu_count(),
            "queries": timings,
            "total": round(sum(timings.values()), 3),
        }
        with open(os.path.join(here, fname), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({"file": fname, **out}))


if __name__ == "__main__":
    main()
