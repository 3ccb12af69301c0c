#!/usr/bin/env python
"""Interleaved A/B of the q34/q36 streaming shells at sf0.1 in ONE session.

Variants probe the per-trigger fixed cost (VERDICT r11 "Next round" #2):
  - state-store/shuffle partition count (4 = committed, 2, 1)
  - q34: session-window local merge before the shuffle
  - sink width (coalesce(1) before writeStream)

Usage: python bench/ab_stream.py [q34|q36] [sf_dir] [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

which = sys.argv[1] if len(sys.argv) > 1 else "q34"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

from rudder_server_spark.session import get_spark
from rudder_server_spark.sources.fixtures import load_table
from rudder_server_spark.sources.staged_stream import (
    staged_events_parquet,
    stream_scratch_dir,
)
from rudder_server_spark.streaming.pipeline import (
    sessionize_stream,
    stream_interval_join,
)
import pyspark.sql.functions as F

spark = get_spark(app_name="ab_stream")
load_table(spark, sf, "nation").count()
src = staged_events_parquet(spark, sf)


def run_q34(nparts: int, local_merge: bool | None = None, coalesce1: bool = False):
    tmp = stream_scratch_dir("rss_ab34_")
    out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
    schema = "user_id long, tsus long, value double"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_lm = spark.conf.get(
        "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    if local_merge is not None:
        spark.conf.set(
            "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition",
            str(local_merge).lower(),
        )
    try:
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.timestamp_micros("tsus"))
            .withColumn("value", F.col("value").cast("decimal(18,6)"))
        )
        body = sessionize_stream(stream, gap="30 minutes", watermark="1 hour")
        if coalesce1:
            body = body.coalesce(1)
        q = (
            body.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if local_merge is not None:
            if prev_lm is None:
                spark.conf.unset(
                    "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition"
                )
            else:
                spark.conf.set(
                    "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition",
                    prev_lm,
                )
    return (
        spark.read.parquet(out)
        .select(
            "user_id", "session_start", "session_end", "n_events",
            F.round(F.col("value_total"), 2).cast("double").alias("value_total"),
        )
        .orderBy("user_id", "session_start")
    )


def run_q36(nparts: int, coalesce1: bool = False):
    tmp = stream_scratch_dir("rss_ab36_")
    out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
    schema = "event_id long, user_id long, event_type string, tsus long"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.timestamp_micros("tsus"))
        )
        body = stream_interval_join(
            stream.where(F.col("event_type") == "purchase"),
            stream.where(F.col("event_type") == "click"),
        )
        if coalesce1:
            body = body.coalesce(1)
        q = (
            body.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata)
    return spark.read.parquet(out).orderBy("purchase_event_id", "click_event_id")


if which == "q34":
    VARIANTS = {
        "p4_committed": lambda: run_q34(4),
        "p2": lambda: run_q34(2),
        "p1": lambda: run_q34(1),
        "p4_localmerge": lambda: run_q34(4, local_merge=True),
        "p4_coalesce1": lambda: run_q34(4, coalesce1=True),
    }
else:
    VARIANTS = {
        "p4_committed": lambda: run_q36(4),
        "p2": lambda: run_q36(2),
        "p1": lambda: run_q36(1),
        "p2_coalesce1": lambda: run_q36(2, coalesce1=True),
    }


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
