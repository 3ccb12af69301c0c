#!/usr/bin/env python
"""Interleaved A/B of q16 shapes inside ONE session.

A = committed shape (range-sort raw input before the parse, orderBy elides)
B = parse first, lazy localCheckpoint the narrow tracks frame, then orderBy
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

spark = get_spark(app_name="ab_q16")
load_table(spark, sf, "nation").count()

from rudder_server_spark.plans import rudder as R
from rudder_server_spark.operators.event_tables import event_table_fanout
from rudder_server_spark.operators.envelope import normalize_envelope

state = R._fanout_state(spark, sf)


def variant_a():
    pre = (
        normalize_envelope(R._load(spark, sf).where(F.col("event_type") == "track"))
        .repartitionByRange("message_id")
        .sortWithinPartitions("message_id")
    )
    tables = event_table_fanout(
        pre, materialize=False, schemas=state["per_alias"],
        promote=set(state["promote"]), normalized=True,
    )
    return tables["tracks"].orderBy("id")


def variant_b():
    pre = normalize_envelope(R._load(spark, sf).where(F.col("event_type") == "track"))
    tables = event_table_fanout(
        pre, materialize=False, schemas=state["per_alias"],
        promote=set(state["promote"]), normalized=True,
    )
    return tables["tracks"].localCheckpoint(eager=False).orderBy("id")


def run(fn):
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt


# warmup both shapes once (JIT/codegen)
run(variant_a); run(variant_b)
ta, tb = [], []
for i in range(rounds):
    ta.append(run(variant_a))
    tb.append(run(variant_b))
    print(f"# round {i}: A {ta[-1]:.3f}s  B {tb[-1]:.3f}s", flush=True)
print(f"A min {min(ta):.3f}s  B min {min(tb):.3f}s")
