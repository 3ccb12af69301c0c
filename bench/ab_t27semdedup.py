import sys, time
sys.path.insert(0, '/root/repo')
from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table
import rudder_server_spark.operators.similarity as S
from rudder_server_spark.operators.similarity import norm_sq_sql, cosine_cols, dot_cols_fold, ivf_assign
import pyspark.sql.functions as F
spark = get_spark(app_name="abt27")
sf = "/root/testdata/sf0.1"
e = load_table(spark, sf, "embeddings")
e.count()
cents = S.ivf_train(e, k=8)
dim = 64

def old_semdedup():
    a = ivf_assign(e, cents)
    l = a.select(F.col("ivf_cell"), F.col("vec_id").alias("a"), F.col("embedding").alias("_va"))
    r = a.select(F.col("ivf_cell"), F.col("vec_id").alias("b"), F.col("embedding").alias("_vb"))
    dropped = (l.join(r, "ivf_cell").where(F.col("a") < F.col("b"))
               .where(cosine_cols("_va","_vb",dim) >= 0.95)
               .select(F.col("b").alias("vec_id")).distinct().withColumn("_d", F.lit(True)))
    return a.join(dropped, "vec_id", "left").select(
        "vec_id", "ivf_cell", F.coalesce("_d", F.lit(False)).alias("dropped")
    ).select("vec_id","dropped").orderBy("vec_id")

def new_semdedup():
    return S.semdedup(e, cents, threshold=0.95).select("vec_id","dropped").orderBy("vec_id")

res = {"old": [], "new": []}
for rnd in range(3):
    order = [("old", old_semdedup), ("new", new_semdedup)] if rnd % 2 == 0 else [("new", new_semdedup), ("old", old_semdedup)]
    for label, fn in order:
        t0=time.time(); fn().write.mode("overwrite").format("noop").save()
        dt=round(time.time()-t0,2); res[label].append(dt)
        print(f"round {rnd} {label}: {dt}s", flush=True)
print({k:(min(v),v) for k,v in res.items()})
