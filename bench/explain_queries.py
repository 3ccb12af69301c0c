#!/usr/bin/env python
"""Dump .explain("formatted") for named declared queries to plans/<tag>/.

Usage: python bench/explain_queries.py <tag> <suffix> q1 q2 ...
Writes plans/<tag>/<query>_<suffix>.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tag, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from rudder_server_spark.plans.registry import load_all
from rudder_server_spark.session import get_spark

reg = load_all()
spark = get_spark(app_name="explain")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = reg[name].spark_fn(spark, sf)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
