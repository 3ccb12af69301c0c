#!/usr/bin/env python
"""Survey remaining mid-weight queries: warm-min total + plan-build share."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or [
    "q17_fanout_counts", "q69_batch_pipeline", "q9_identity_graph",
    "t56_knn_classify", "q102_provider_upload_shapes2", "q100_snowpipe_streaming",
    "q29_sessionize", "q21_rollup", "q11_reporting_rollup", "t44_budget_select",
    "q25_asof", "q79_retention",
]

from rudder_server_spark.plans.registry import load_all
from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table

reg = load_all()
spark = get_spark(app_name="survey_mid")
load_table(spark, sf, "nation").count()

def run(name):
    t0 = time.time()
    df = reg[name].spark_fn(spark, sf)
    tb = time.time() - t0
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt, tb

res = {}
for sweep in range(3):
    for name in names:
        dt, tb = run(name)
        tot, bld = res.get(name, (9e9, 9e9))
        res[name] = (min(tot, dt), min(bld, tb))
for name in names:
    tot, bld = res[name]
    print(f"{tot:6.2f}  build {bld:6.2f}  exec {tot-bld:6.2f}  {name}", flush=True)
