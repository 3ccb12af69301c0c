#!/usr/bin/env python
"""Interleaved A/B of the sort-before-parse vs checkpoint-narrow shapes
for q1_flatten_infer and q15_envelope (same trade q16 settled: double
raw scan + payload through the exchange vs one parse + narrow checkpoint).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table
import pyspark.sql.functions as F

spark = get_spark(app_name="ab_sortparse")
load_table(spark, sf, "nation").count()

from rudder_server_spark.plans import rudder as R
from rudder_server_spark.operators.flatten import flatten_events
from rudder_server_spark.operators.envelope import normalize_envelope

state = R._flat_state(spark, sf)
schema = [tuple(e) for e in state["schema"]]
promote = set(state["promote"])


def q1_a():
    df = R._load(spark, sf)
    pre = df.repartitionByRange("message_id").sortWithinPartitions("message_id")
    return flatten_events(
        pre, keep_cols=("message_id",), schema=schema, promote=promote
    ).orderBy("message_id")


def q1_b():
    df = R._load(spark, sf)
    return (
        flatten_events(df, keep_cols=("message_id",), schema=schema, promote=promote)
        .localCheckpoint(eager=False)
        .orderBy("message_id")
    )


def q15_a():
    df = (
        normalize_envelope(R._load(spark, sf))
        .repartitionByRange("message_id")
        .sortWithinPartitions("message_id")
    )
    return df.select("message_id", "rudder_id", "timestamp").orderBy("message_id")


def q15_b():
    df = normalize_envelope(R._load(spark, sf))
    return (
        df.select("message_id", "rudder_id", "timestamp")
        .localCheckpoint(eager=False)
        .orderBy("message_id")
    )


def run(fn):
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt


for qname, fa, fb in (("q1", q1_a, q1_b), ("q15", q15_a, q15_b)):
    run(fa); run(fb)  # warm both shapes
    ta, tb = [], []
    for i in range(rounds):
        ta.append(run(fa))
        tb.append(run(fb))
        print(f"# {qname} round {i}: A {ta[-1]:.3f}s  B {tb[-1]:.3f}s", flush=True)
    print(f"{qname}: A min {min(ta):.3f}s  B min {min(tb):.3f}s", flush=True)
