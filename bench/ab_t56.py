#!/usr/bin/env python
"""Interleaved A/B of t56 at sf0.1 inside ONE session.

A = plain load_table corpus (pre-2e3110f shape)
B = fan_out corpus (committed _emb shape)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table
import pyspark.sql.functions as F

spark = get_spark(app_name="ab_t56")
load_table(spark, sf, "nation").count()

from rudder_server_spark.operators.similarity import knn_classify
from rudder_server_spark.plans.training import _emb


def variant_a():
    e = load_table(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") % 10 == 0)
    c = e.where(F.col("vec_id") % 10 != 0)
    return knn_classify(q, c, k=5)


def variant_b():
    e = _emb(spark, sf)
    q = e.where(F.col("vec_id") % 10 == 0)
    c = e.where(F.col("vec_id") % 10 != 0)
    return knn_classify(q, c, k=5)


def run(fn):
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt


run(variant_a); run(variant_b)
ta, tb = [], []
for i in range(rounds):
    ta.append(run(variant_a))
    tb.append(run(variant_b))
    print(f"# round {i}: A {ta[-1]:.3f}s  B {tb[-1]:.3f}s", flush=True)
print(f"A min {min(ta):.3f}s  B min {min(tb):.3f}s")
