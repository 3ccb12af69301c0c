#!/usr/bin/env python
"""Interleaved HEAD-vs-prior-ref A/B over a set of declared queries, in ONE
Spark session (VERDICT r11 "Next round" #1: retire the host-drift question).

The r11 driver bench read 29/35 queries "regressed" while the worst rows had
zero code change on their paths — classic host drift. This harness settles
drift-vs-regression with committed evidence: both code versions run
INTERLEAVED in the same JVM/session on the same host, with the two variants'
runs of a given query executed back-to-back (seconds apart), so environment
episodes straddle both variants of each pair.

Design notes, learned from a first block-granularity attempt (whose artifact
this file replaces): host noise is CORRELATED across queries within a time
window, so variant-per-block interleaving yields ~n_blocks effective samples
no matter how many queries run — and min-over-samples then favors whichever
variant owns the quietest block (observed: block totals fell monotonically
99->45 s over a 13-minute session as the JVM settled, handing the last-run
variant a systematic win on every untouched query). Query-level adjacency
plus lead alternation removes both biases:

- per round, per query: run variant X then variant Y back-to-back, with the
  lead alternating by (round + query index) parity;
- the prior ref is checked out into a git worktree; before each run the
  `rudder_server_spark` package is purged from sys.modules and re-imported
  from the right root (pyspark/JVM untouched; session.py is identical at
  both refs — verified);
- module-level caches whose backing code is identical at both refs
  (staged_stream._STAGED staging dirs, fixtures._RG_CACHE footer counts)
  are carried across swaps so no variant's TIMED run pays a restage the
  other already has;
- reported per query: the per-round adjacent-pair ratios, their median, and
  min-over-rounds seconds per variant; headline = geomean of median ratios.

Usage:
  python bench/compare_ab.py [--ref 13a18dd] [--queries q1,..|regressed]
                             [--rounds 4] [--sf /root/testdata/sf0.1]
                             [--out bench/compare_ab_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
HEAD_ROOT = os.path.dirname(HERE)

# the 29 queries PERF_r11.json flagged "regressed" (speedup < 0.9 vs r10)
REGRESSED_R11 = [
    "q1_flatten_infer", "q2_latest_status", "q3_pileup", "q4_exact_dedup",
    "q7_fanout", "q8_latest_traits", "q11_reporting_rollup", "q15_envelope",
    "q17_fanout_counts", "q18_streaming_fanout", "q20_tpch_q3", "q21_rollup",
    "q22_windows", "q25_asof", "q26_text_ops", "q27_similarity_topk",
    "q29_sessionize", "q34_streaming_sessions", "q36_streaming_interval_join",
    "q37_throttled_pickup", "q40_tpch_q5", "q47_hopping_windows",
    "q64_tpch_q10", "q79_retention", "t3_minhash_lsh", "t13_token_topk",
    "t15_hash_split", "t44_budget_select", "t56_knn_classify",
]

# caches safe to carry across variant swaps: their producing code is
# IDENTICAL at both refs (verified: `git diff <ref>..HEAD` is empty for
# sources/staged_stream.py and sources/fixtures.py), and they hold plain
# strings/ints (staging dir paths, parquet footer row-group counts), never
# plan objects built by variant code.
_CARRIED: dict[str, dict] = {"staged": {}, "rg": {}}


def ensure_worktree(ref: str) -> str:
    path = f"/tmp/rss_ab_{ref}"
    if not os.path.isdir(os.path.join(path, "rudder_server_spark")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, ref],
            cwd=HEAD_ROOT, check=True, capture_output=True, text=True,
        )
    return path


def swap_root(root: str) -> None:
    """Point imports of rudder_server_spark at `root` (purge + re-path)."""
    # save carried caches from the outgoing module set
    ss = sys.modules.get("rudder_server_spark.sources.staged_stream")
    if ss is not None:
        _CARRIED["staged"].update(ss._STAGED)
    fx = sys.modules.get("rudder_server_spark.sources.fixtures")
    if fx is not None:
        _CARRIED["rg"].update(fx._RG_CACHE)
    for name in [n for n in sys.modules if n.split(".")[0] == "rudder_server_spark"]:
        del sys.modules[name]
    sys.path[:] = [p for p in sys.path if p not in (HEAD_ROOT,) and not p.startswith("/tmp/rss_ab_")]
    sys.path.insert(0, root)
    # prime the incoming module set with the carried caches
    import rudder_server_spark.sources.staged_stream as ss2
    import rudder_server_spark.sources.fixtures as fx2

    ss2._STAGED.update(_CARRIED["staged"])
    fx2._RG_CACHE.update(_CARRIED["rg"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="13a18dd")
    ap.add_argument("--queries", default="regressed")
    ap.add_argument("--rounds", type=int, default=4, help="adjacent H/P pairs per query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(HERE, "compare_ab_r12.json"))
    args = ap.parse_args()

    names = (
        REGRESSED_R11 if args.queries == "regressed" else args.queries.split(",")
    )
    prior_root = ensure_worktree(args.ref)
    roots = {"head": HEAD_ROOT, "prior": prior_root}

    # session + warmup from HEAD (session.py identical at both refs)
    swap_root(HEAD_ROOT)
    from rudder_server_spark.session import get_spark
    from rudder_server_spark.sources.fixtures import load_table
    from rudder_server_spark.sources.rudder_events import rudder_events_path
    import pyspark.sql.functions as F

    spark = get_spark(app_name="compare_ab")
    # same warmup as bench.py: page-cache the big fixtures, exercise codegen
    spark.read.parquet(rudder_events_path(args.sf)).select(
        F.sum(F.length("payload"))
    ).collect()
    load_table(spark, args.sf, "lineitem").count()
    load_table(spark, args.sf, "nation").count()

    def run_query(name: str) -> float:
        from rudder_server_spark.plans.registry import load_all

        reg = load_all()
        t0 = time.time()
        df = reg[name].spark_fn(spark, args.sf)
        df.write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 3)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
        return dt

    # untimed warmup: one run of every query under EACH variant, so JIT/
    # codegen compilation and staging restages are paid before timing starts
    for variant in ("head", "prior"):
        swap_root(roots[variant])
        for name in names:
            try:
                run_query(name)
            except Exception as exc:
                print(f"# warmup {variant} {name}: ERROR {exc}", file=sys.stderr)

    samples: dict[str, dict[str, list[float]]] = {
        n: {"head": [], "prior": []} for n in names
    }
    for rnd in range(args.rounds):
        for qi, name in enumerate(names):
            pair = ["head", "prior"] if (rnd + qi) % 2 == 0 else ["prior", "head"]
            for variant in pair:
                swap_root(roots[variant])
                spark.sparkContext.setJobDescription(f"ab r{rnd} {variant} {name}")
                try:
                    samples[name][variant].append(run_query(name))
                except Exception as exc:
                    print(f"# r{rnd} {variant} {name}: ERROR {exc}", file=sys.stderr)
            h, p = samples[name]["head"], samples[name]["prior"]
            if h and p:
                print(
                    f"# r{rnd} {name}: head {h[-1]:.3f} prior {p[-1]:.3f}",
                    file=sys.stderr, flush=True,
                )

    import math
    import statistics

    result = {}
    medians = []
    for name in names:
        h, p = samples[name]["head"], samples[name]["prior"]
        if not h or not p or len(h) != len(p):
            result[name] = {"head": h, "prior": p, "error": "missing samples"}
            continue
        pair_ratios = [round(pp / hh, 3) for hh, pp in zip(h, p) if hh > 0]
        med = round(statistics.median(pair_ratios), 3)
        medians.append(med)
        result[name] = {
            "head_min": min(h),
            "prior_min": min(p),
            # >1 = HEAD faster than the prior ref, per adjacent-pair median
            "median_pair_ratio": med,
            "pair_ratios": pair_ratios,
            "head_samples": h,
            "prior_samples": p,
        }
    geomean = (
        round(math.exp(sum(math.log(m) for m in medians) / len(medians)), 3)
        if medians else None
    )
    out = {
        "ref_prior": args.ref,
        "sf": args.sf,
        "rounds": args.rounds,
        "design": "query-level adjacent pairs, lead alternating by (round+query) parity",
        "geomean_median_pair_ratio": geomean,
        "per_query": result,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_query"}))
    print(f"# full result: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
