#!/usr/bin/env python
"""Time one declared query the way bench.py does (noop sink, warm min).

Usage: python bench/time_one.py q98_provider_upload_shapes [sf_dir] [runs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

from rudder_server_spark.plans.registry import load_all
from rudder_server_spark.session import get_spark

reg = load_all()
spark = get_spark(app_name="time_one")
import pyspark.sql.functions as F
from rudder_server_spark.sources.fixtures import load_table

load_table(spark, sf, "nation").count()

times = []
for i in range(runs):
    t0 = time.time()
    df = reg[name].spark_fn(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    dt = round(time.time() - t0, 3)
    times.append(dt)
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    print(f"# run {i}: {dt:.3f}s", file=sys.stderr, flush=True)

print(json.dumps({"query": name, "sf": sf, "times": times, "warm_min": min(times[1:]) if len(times) > 1 else times[0]}))
