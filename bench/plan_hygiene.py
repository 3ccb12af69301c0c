import os, sys, re, json
sys.path.insert(0, '/root/repo')
from rudder_server_spark.plans.registry import load_all
from rudder_server_spark.session import get_spark

reg = load_all()
spark = get_spark(app_name="plan_hygiene")
sf = "/root/testdata/sf0.1"
report = {}
for name, ent in sorted(reg.items()):
    try:
        df = ent.spark_fn(spark, sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    except Exception as e:
        report[name] = {"error": str(e)[:100]}
        continue
    # count node-definition lines "(N) NodeName" to avoid double counting tree refs
    nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", txt, re.M)
    batch = nodes.count("BatchEvalPython")
    arrow = nodes.count("ArrowEvalPython")
    mip = nodes.count("MapInPandas")
    exch = nodes.count("Exchange")
    cart = nodes.count("CartesianProduct") + nodes.count("BroadcastNestedLoopJoin")
    if batch or arrow or mip > 1 or cart:
        report[name] = {"BatchEvalPython": batch, "ArrowEvalPython": arrow,
                        "MapInPandas": mip, "Exchange": exch, "NLJ_or_cartesian": cart}
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
print(json.dumps(report, indent=1))
