#!/usr/bin/env python
"""Interleaved A/B/C for t65_strip_passages / t66_strip_contamination.

A = current strip_repeated_passages / strip_contaminated_spans
B = A + lazy localCheckpoint of the final projection before orderBy
    (the range sort samples its child; without the checkpoint the whole
    coverage join + clean_text rebuild executes twice)
C = B + token base hash-partitioned by sid before the posexplode so the
    lead-window's exchange moves doc rows once instead of token rows
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table
import pyspark.sql.functions as F

spark = get_spark(app_name="ab_strip")
load_table(spark, sf, "nation").count()

from rudder_server_spark.plans.training import _docs
from rudder_server_spark.operators.dedup import (
    strip_repeated_passages,
    strip_contaminated_spans,
    _span_hashes,
)

N = 8


def _base(df, pre_part=False):
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    out = df.select(
        F.col("doc_id").alias("sid"),
        F.when(norm == "", F.array().cast("array<string>"))
        .otherwise(F.split(norm, " "))
        .alias("tk"),
    )
    if pre_part:
        out = out.repartition("sid")
    return out.localCheckpoint(eager=False)


def _rebuild(base, covered, ckpt_final):
    out = (
        base.join(covered, "sid", "left")
        .select(
            F.col("sid").alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform("
                "  array_except(CASE WHEN size(tk) = 0 THEN array() "
                "               ELSE sequence(0, size(tk) - 1) END, "
                "               coalesce(cov, array())), "
                "  i -> element_at(tk, i + 1)))"
            ).alias("clean_text"),
            F.size("tk").cast("long").alias("n_tokens"),
            F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )
    if ckpt_final:
        out = out.localCheckpoint(eager=False)
    return out.orderBy("doc_id")


def t65_variant(pre_part, ckpt_final):
    def fn():
        base = _base(_docs(spark, sf), pre_part)
        ex = _span_hashes(base, N).localCheckpoint(eager=False)
        rep = (
            ex.groupBy("h")
            .agg(F.count_distinct("sid").alias("_nd"))
            .where(F.col("_nd") >= 2)
            .select("h")
        )
        covered = (
            ex.join(rep, "h")
            .groupBy("sid")
            .agg(F.collect_set("s").alias("starts"))
            .select(
                "sid",
                F.expr(
                    f"array_distinct(flatten(transform(starts, s -> sequence(s, s + {N - 1}))))"
                ).alias("cov"),
            )
        )
        return _rebuild(base, covered, ckpt_final)
    return fn


def t66_variant(pre_part, ckpt_final):
    def fn():
        d = _docs(spark, sf)
        bench_hashes = (
            _span_hashes(_base(d.where(F.col("doc_id") % 10 == 0)), N)
            .select("h").distinct()
        )
        tr = _base(d.where(F.col("doc_id") % 10 != 0), pre_part)
        ex = _span_hashes(tr, N)
        covered = (
            ex.join(bench_hashes, "h")
            .groupBy("sid")
            .agg(F.collect_set("s").alias("starts"))
            .select(
                "sid",
                F.expr(
                    f"array_distinct(flatten(transform(starts, s -> sequence(s, s + {N - 1}))))"
                ).alias("cov"),
            )
        )
        return _rebuild(tr, covered, ckpt_final)
    return fn


def t65_a():
    return strip_repeated_passages(_docs(spark, sf), n=N, min_docs=2)


def t66_a():
    d = _docs(spark, sf)
    return strip_contaminated_spans(
        d.where(F.col("doc_id") % 10 != 0), d.where(F.col("doc_id") % 10 == 0), n=N
    )


def run(fn):
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt


suites = [
    ("t65", [("A", t65_a), ("B", t65_variant(False, True)), ("C", t65_variant(True, True))]),
    ("t66", [("A", t66_a), ("B", t66_variant(False, True)), ("C", t66_variant(True, True))]),
]
for qname, variants in suites:
    for _, fn in variants:
        run(fn)  # warm
    mins = {}
    for i in range(rounds):
        line = []
        for label, fn in variants:
            dt = run(fn)
            mins.setdefault(label, []).append(dt)
            line.append(f"{label} {dt:.3f}s")
        print(f"# {qname} round {i}: " + "  ".join(line), flush=True)
    print(
        f"{qname}: " + "  ".join(f"{l} min {min(v):.3f}s" for l, v in mins.items()),
        flush=True,
    )
