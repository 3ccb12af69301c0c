#!/usr/bin/env python
"""Interleaved A/B of q1_flatten_infer at sf0.1 inside ONE session.

A = committed shape: repartitionByRange("message_id") (AQE decides the
    post-shuffle width; advisory 64 MB can coalesce the 18-field from_json
    parse onto very few tasks)
B = scale-adaptive explicit width: repartitionByRange(N, "message_id") with
    N = max(defaultParallelism, ceil(input_bytes / 128 MB)) — explicit N
    disables AQE coalescing for that exchange, so the parse stays wide at
    bench scale; at cluster scale the bytes term dominates and the shape
    matches the committed one.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table
from rudder_server_spark.sources.rudder_events import rudder_events_path
from rudder_server_spark.operators.flatten import flatten_events
from rudder_server_spark.plans.rudder import _flat_state, _load
import pyspark.sql.functions as F

spark = get_spark(app_name="ab_q1")
load_table(spark, sf, "nation").count()
spark.read.parquet(rudder_events_path(sf)).select(F.sum(F.length("payload"))).collect()


def variant_a():
    df = _load(spark, sf)
    pre = df.repartitionByRange("message_id").sortWithinPartitions("message_id")
    state = _flat_state(spark, sf)
    return flatten_events(
        pre, keep_cols=("message_id",),
        schema=[tuple(e) for e in state["schema"]],
        promote=set(state["promote"]),
    ).orderBy("message_id")


def variant_b():
    df = _load(spark, sf)
    want = max(
        spark.sparkContext.defaultParallelism,
        math.ceil(os.path.getsize(rudder_events_path(sf)) / (128 << 20)),
    )
    pre = df.repartitionByRange(want, "message_id").sortWithinPartitions("message_id")
    state = _flat_state(spark, sf)
    return flatten_events(
        pre, keep_cols=("message_id",),
        schema=[tuple(e) for e in state["schema"]],
        promote=set(state["promote"]),
    ).orderBy("message_id")


VARIANTS = {"A_aqe": variant_a, "B_explicitN": variant_b}


def run(fn):
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt


for fn in VARIANTS.values():
    run(fn)

times = {n: [] for n in VARIANTS}
order = list(VARIANTS)
for r in range(rounds):
    for n in order if r % 2 == 0 else order[::-1]:
        t = run(VARIANTS[n])
        times[n].append(round(t, 3))
        print(f"# r{r} {n}: {t:.3f}", file=sys.stderr, flush=True)

import json

print(json.dumps({n: {"min": min(ts), "samples": ts} for n, ts in times.items()}))
