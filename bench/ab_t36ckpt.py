import sys, time
sys.path.insert(0, '/root/repo')
from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table, fan_out
import rudder_server_spark.operators.dedup as D
from rudder_server_spark.functions.localframe import local_frame
import pyspark.sql.functions as F
import os
spark = get_spark(app_name="abt36")
sf = "/root/testdata/sf0.1"
d = fan_out(load_table(spark, sf, "documents"), spark, paths=[os.path.join(sf, "documents.parquet")])
d.count()

def run(ckpt):
    exact = D.ngram_jaccard_pairs(d, threshold=0.8).select("a", "b")
    lsh = D.minhash_lsh_pairs(d, threshold=0.8).select("a", "b")
    if ckpt:
        exact = exact.localCheckpoint(eager=False)
        lsh = lsh.localCheckpoint(eager=False)
    both = exact.intersect(lsh).count()
    ne, nl = exact.count(), lsh.count()
    return (ne, nl, both)

res = {"plain": [], "ckpt": []}
vals = {}
for rnd in range(3):
    order = [("plain", False), ("ckpt", True)] if rnd % 2 == 0 else [("ckpt", True), ("plain", False)]
    for label, c in order:
        t0=time.time(); v = run(c); dt=round(time.time()-t0,2)
        res[label].append(dt); vals[label] = v
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        print(f"round {rnd} {label}: {dt}s {v}", flush=True)
print({k:(min(v),v) for k,v in res.items()}, "values match:", vals["plain"]==vals["ckpt"])
