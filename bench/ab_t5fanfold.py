import sys, time, os
sys.path.insert(0, '/root/repo')
from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table, fan_out
import rudder_server_spark.operators.similarity as S
from rudder_server_spark.operators.similarity import norm_sq_sql
import pyspark.sql.functions as F
spark = get_spark(app_name="abt5fan2")
sf = "/root/testdata/sf0.1"
e = load_table(spark, sf, "embeddings")
e.count()
dim = 64

def build(fold):
    src = fan_out(e, spark, paths=[os.path.join(sf, "embeddings.parquet")])
    if fold:
        norm = F.expr(norm_sq_sql("embedding", dim))
        a = src.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), norm.alias("_na"))
        b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), norm.alias("_nb"))
        sim = S.dot_cols_fold("ea", "eb") / (F.sqrt("_na") * F.sqrt("_nb"))
    else:
        a = src.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
        b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
        sim = S.cosine_cols("ea", "eb", dim)
    return (a.join(b, F.col("a") < F.col("b")).withColumn("_sim", sim)
            .where(F.col("_sim") >= 0.95)
            .select("a", "b", F.round(F.col("_sim"), 6).alias("cos_sim")).orderBy("a","b"))

res = {"fan_mono": [], "fan_fold": []}
for rnd in range(4):
    order = [("fan_mono", False), ("fan_fold", True)] if rnd % 2 == 0 else [("fan_fold", True), ("fan_mono", False)]
    for label, f in order:
        t0=time.time(); build(f).write.mode("overwrite").format("noop").save()
        dt=round(time.time()-t0,2); res[label].append(dt)
        print(f"round {rnd} {label}: {dt}s", flush=True)
print({k:(min(v),v) for k,v in res.items()})
