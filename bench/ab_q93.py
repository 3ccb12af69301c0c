#!/usr/bin/env python
"""Interleaved A/B/C of q93_wh_archive at sf0.1 inside ONE session.

A = plain narrow scan (pre-6e3a7c2 shape, no fan_out)
B = fan_out to cluster width (committed r11 shape)
C = width-capped fan: repartition(min(want, 8))

VERDICT r11 #4: the fan costs a pure extra Exchange at bench scale (driver
v2 ratio 26.6 -> 39.2); keep whichever wins, re-run the uploads probe for it.
"""
import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import fan_out, load_table
from rudder_server_spark.operators.wh_archive import archive_uploads
import pyspark.sql.functions as F

spark = get_spark(app_name="ab_q93")
load_table(spark, sf, "nation").count()
load_table(spark, sf, "events").count()


def build(e):
    d = F.to_date("ts")
    dom = F.dayofmonth(d)
    upload_id = F.concat("event_type", F.lit("/"), F.date_format(d, "yyyy-MM-dd"))
    staging = e.select(F.col("event_id").alias("id"), upload_id.alias("upload_id"))
    uploads = (
        e.groupBy(
            upload_id.alias("upload_id"),
            F.col("event_type").alias("source_id"),
            F.when(dom % 7 == 0, "exporting").otherwise("exported_data").alias("status"),
            F.when(dom % 11 == 0, "").otherwise(
                F.concat(F.lit("ws-"), (dom % 3).cast("string"))
            ).alias("workspace_id"),
            F.when(dom % 5 == 0, '{"archivedStagingAndLoadFiles":true}')
            .otherwise("{}").alias("metadata"),
        )
        .agg(F.max("ts").alias("created_at"))
        .withColumn("destination_id", F.lit("wh"))
    )
    res = archive_uploads(
        uploads, staging, staging,
        now=dt.datetime(2024, 2, 1), days=7, skip_workspaces=("ws-2",),
    )
    return res["stats"].select(
        "upload_id", "source_id", "destination_id",
        "archived_staging_files", "archived_load_files",
    ).orderBy("upload_id")


def narrow():
    return load_table(spark, sf, "events").select("event_id", "event_type", "ts")


VARIANTS = {
    "A_plain": lambda: build(narrow()),
    "B_fan_width": lambda: build(
        fan_out(narrow(), spark, paths=[os.path.join(sf, "events.parquet")])
    ),
    "C_fan_cap8": lambda: build(
        narrow().repartition(min(spark.sparkContext.defaultParallelism, 8))
    ),
}


def run(fn):
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    dt_ = time.time() - t0
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt_


# warmup each variant once
for name, fn in VARIANTS.items():
    run(fn)

times = {n: [] for n in VARIANTS}
order = list(VARIANTS)
for r in range(rounds):
    seq = order if r % 2 == 0 else order[::-1]
    for n in seq:
        t = run(VARIANTS[n])
        times[n].append(round(t, 3))
        print(f"# r{r} {n}: {t:.3f}", file=sys.stderr, flush=True)

import json

print(json.dumps({n: {"min": min(ts), "samples": ts} for n, ts in times.items()}))
