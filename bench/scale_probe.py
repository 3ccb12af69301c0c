#!/usr/bin/env python
"""Shingle-dedup scale crossover probe (VERDICT r4 #7).

t2/t3's 6-8-stage bucketed DAGs are slower than DuckDB's one in-process
hash join at sf0.1 (5k docs) — the claim is that the staged, linear-in-
corpus design wins as the corpus grows. This probe measures the ratio at
1x / 4x / 10x the sf0.1 documents corpus and records the trend.

Corpus scaling preserves the near-dup rate instead of inflating it:
replica k rewrites every third token with a replica-specific suffix, so
every 3-shingle crosses a rewritten position — cross-replica Jaccard is
~0 (no candidate-pair explosion) while within-replica near-dup structure
mirrors the original. Both engines read the SAME scaled parquet.

Usage: python bench/scale_probe.py [K ...]   (default 1 4 10)
Prints one JSON line per (K, query).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_scaled_corpus(spark, k: int, out_dir: str) -> str:
    """Write documents.parquet at k x the base corpus under out_dir."""
    from pyspark.sql import functions as F

    from rudder_server_spark.sources.fixtures import load_table

    os.makedirs(out_dir, exist_ok=True)
    d = load_table(spark, BASE_SF, "documents")
    reps = []
    for r in range(k):
        if r == 0:
            reps.append(d)
            continue
        toks = F.split(F.col("text"), r"\s+")
        rewritten = F.array_join(
            F.transform(
                toks,
                lambda w, i: F.when(i % 3 == 0, F.concat(w, F.lit(f"_r{r}"))).otherwise(w),
            ),
            " ",
        )
        reps.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
            .withColumn("text", rewritten)
        )
    from functools import reduce

    corpus = reduce(lambda a, b: a.unionByName(b), reps)
    corpus.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return out_dir


def main() -> None:
    import duckdb

    from rudder_server_spark.plans.registry import load_all
    from rudder_server_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    reg = load_all()
    spark = get_spark(app_name="scale_probe")

    for k in ks:
        sf_dir = build_scaled_corpus(spark, k, f"/tmp/rss_scale_{k}x")
        for name in ("t2_ngram_jaccard", "t3_minhash_lsh"):
            qd = reg[name]
            # engine: warm min-of-2 (first run per scale pays fixture IO)
            times = []
            for _ in range(3):
                t0 = time.time()
                qd.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                times.append(time.time() - t0)
            engine = round(min(times[1:]), 3)
            # oracle: DuckDB warm second run on the same parquet
            con = duckdb.connect()
            # Spark writes a parquet DIRECTORY; give DuckDB the part glob
            con.sql(
                f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, 'documents.parquet', '*.parquet')}')"
            )
            con.sql(f"SET threads TO {os.cpu_count()}")
            duck_times = []
            for _ in range(2):
                t0 = time.time()
                con.sql(qd.oracle).fetchall()
                duck_times.append(time.time() - t0)
            duck = round(min(duck_times), 3)
            con.close()
            print(
                json.dumps(
                    {
                        "k": k,
                        "docs": 5000 * k,
                        "query": name,
                        "engine_warm_sec": engine,
                        "duckdb_warm_sec": duck,
                        "ratio": round(engine / duck, 2) if duck else None,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
