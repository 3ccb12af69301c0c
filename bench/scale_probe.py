#!/usr/bin/env python
"""Scale crossover probes (VERDICT r4 #7 shingle dedup; r5 #1 CC/fan-out).

The staged multi-shuffle DAGs are slower than DuckDB's in-process hash
joins at sf0.1 — the claim is that the linear-in-corpus designs win as the
corpus grows. These probes measure the engine-vs-DuckDB ratio as the input
scales, holding the STRUCTURE (dup rate / component-size distribution)
fixed so only size grows:

- documents probes (t2/t3 shingle LSH, t55 near-dup CC clusters): replica
  k rewrites every third token with a replica suffix — cross-replica
  Jaccard ~0, within-replica structure mirrors the original.
- rudder_events probes (q9 identity CC, q16 fan-out): replica k shifts the
  identifier space (emails/anonymousIds/messageIds get a replica suffix),
  so the merge graph gains k disjoint copies of the same component-size
  distribution instead of densifying one giant component.

Both engines always read the SAME scaled parquet. The q9 probe also
records the connected-components path (driver union-find vs distributed
label propagation) and, forced onto the distributed path, the iteration
count — the "iterations vs graph size" evidence for the O(log d) claim.

Usage: python bench/scale_probe.py [K ...]      (default 1 4 10)
       PROBE=cc|fanout|dedup|floors|floors2|provider to select a suite (default all; provider only when named)
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


def build_scaled_events(spark, k: int, sf_dir: str) -> str:
    """Materialize the rudder_events fixture at k x the base corpus,
    registered under ``sf_dir``'s basename so the declared queries'
    ``rudder_events_path(sf_dir)`` resolves to it directly.

    Replica r > 0 suffixes every identifier namespace — emails and
    anonymousIds inside payloads (the q9 merge-graph nodes) and the
    message_id column (q16's primary key) — so the identity graph gains k
    DISJOINT copies of the base component-size distribution and fan-out
    ids stay unique. Payload layout is otherwise untouched.
    """
    from pyspark.sql import functions as F

    from rudder_server_spark.sources.rudder_events import (
        FIXTURE_DIR,
        rudder_events_path,
    )

    os.makedirs(sf_dir, exist_ok=True)
    name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(FIXTURE_DIR, f"rudder_events_{name}.parquet")
    if os.path.exists(out):
        return sf_dir
    base = spark.read.parquet(rudder_events_path(BASE_SF))
    reps = []
    for r in range(k):
        if r == 0:
            reps.append(base)
            continue
        p = F.col("payload")
        p = F.regexp_replace(p, r"(u\d+)@example\.com", rf"$1.r{r}@example.com")
        p = F.regexp_replace(p, r"(anon-\d{4})", rf"$1r{r}")
        # keep the 'msg-<digits>' shape (q69 parses the numeric suffix):
        # replica r prefixes the digit run instead of breaking the prefix
        p = F.regexp_replace(p, r'"messageId":"msg-', f'"messageId":"msg-{r}')
        reps.append(
            base.withColumn("payload", p)
            .withColumn(
                "message_id",
                F.regexp_replace("message_id", r"^msg-", f"msg-{r}"),
            )
            .withColumn(
                "anonymous_id",
                F.regexp_replace("anonymous_id", r"(anon-\d{4})", rf"$1r{r}"),
            )
        )
    from functools import reduce

    corpus = reduce(lambda a, b: a.unionByName(b), reps)
    # reproduce the base fixture's layout discipline EXACTLY
    # (rudder_events.py: single file, stable event_type cluster, 16k-row
    # row groups since r10 — keep this in lockstep with the generator):
    # DuckDB's window/dedup oracles are strongly layout-sensitive
    # (measured 40x on q69 between the clustered single file and a 32 MB-
    # block Spark directory of the SAME rows), and the probe must not
    # handicap the baseline side.
    tmp = out + ".spark_tmp"
    (
        corpus.repartition(1)
        .sortWithinPartitions("event_type", "message_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp_file = out + ".onefile"
    # stream row groups (the spark tmp is already globally sorted in one
    # partition, so batch order IS the clustered order) — a to_table()
    # materialization at 25x is tens of GB
    writer = None
    for batch in pads.dataset(tmp, format="parquet").to_batches(
        batch_size=16 * 1024
    ):
        if batch.num_rows == 0:
            continue
        if writer is None:
            writer = pq.ParquetWriter(tmp_file, batch.schema)
        writer.write_batch(batch)
    writer.close()
    # rudder_events_path expects a directory OR single file — the base
    # fixture is a single file; match it
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.replace(tmp_file, out)
    shutil.rmtree(tmp, ignore_errors=True)
    return sf_dir


def _duck_path(parquet_path: str) -> str:
    """DuckDB read target: the path itself for a single-file fixture, a
    glob for a Spark directory."""
    return (
        parquet_path
        if os.path.isfile(parquet_path)
        else os.path.join(parquet_path, "*.parquet")
    )


def _time_engine(spark, fn, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(min(times[1:]), 3)


def _time_duck(setup_sql: list, query_sql: str) -> float:
    import duckdb

    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for s in setup_sql:
        con.sql(s)
    duck_times = []
    for _ in range(2):
        t0 = time.time()
        con.sql(query_sql).fetchall()
        duck_times.append(time.time() - t0)
    con.close()
    return round(min(duck_times), 3)


def _emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def probe_dedup(spark, reg, ks) -> None:
    """t2/t3 banded-LSH crossover (r4 probe) + t55 near-dup CC clusters."""
    for k in ks:
        sf_dir = build_scaled_corpus(spark, k, f"/tmp/rss_scale_{k}x")
        glob = os.path.join(sf_dir, "documents.parquet", "*.parquet")
        view = f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')"
        for name in ("t2_ngram_jaccard", "t3_minhash_lsh", "t55_dup_clusters", "t65_strip_passages"):
            qd = reg[name]
            engine = _time_engine(
                spark,
                lambda: qd.spark_fn(spark, sf_dir)
                .write.mode("overwrite")
                .format("noop")
                .save(),
            )
            duck = _time_duck([view], qd.oracle)
            _emit(
                k=k, docs=5000 * k, query=name, engine_warm_sec=engine,
                duckdb_warm_sec=duck,
                ratio=round(engine / duck, 2) if duck else None,
            )


def probe_cc(spark, reg, ks) -> None:
    """q9 identity connected components: default path vs DuckDB recursive
    CTE, plus the forced-distributed loop's iteration count (the O(log d)
    pointer-jumping claim — iterations must stay flat as replicas grow,
    because replicas are disjoint and diameter is unchanged)."""
    from pyspark.sql import functions as F

    from rudder_server_spark.operators import identity as I
    from rudder_server_spark.sources.rudder_events import rudder_events_path

    base_fixture = rudder_events_path("/root/testdata/sf0.01")
    for k in ks:
        sf_dir = build_scaled_events(spark, k, f"/tmp/rss_ev_{k}x")
        scaled = rudder_events_path(sf_dir)
        glob = _duck_path(scaled)
        qd = reg["q9_identity_graph"]
        engine = _time_engine(
            spark,
            lambda: qd.spark_fn(spark, sf_dir)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        default_path = I.LAST_RUN["path"]
        duck = _time_duck([], qd.oracle.replace(base_fixture, glob))

        # forced distributed run: same edges, broadcast fast path disabled
        ev = spark.read.parquet(scaled).where(F.col("event_type") == "merge")
        mp = F.from_json(
            F.col("payload"),
            "mergeProperties array<struct<type:string,value:string>>",
        )["mergeProperties"]
        edges = ev.select(
            F.element_at(mp, 1)["value"].alias("src"),
            F.element_at(mp, 2)["value"].alias("dst"),
        )

        def run_dist():
            I.connected_components(edges, broadcast_threshold=0).write.mode(
                "overwrite"
            ).format("noop").save()

        dist = _time_engine(spark, run_dist)
        _emit(
            k=k, merge_rows=ev.count(), query="q9_identity_graph",
            engine_warm_sec=engine, engine_path=default_path,
            distributed_warm_sec=dist,
            distributed_iterations=I.LAST_RUN["iterations"],
            duckdb_warm_sec=duck,
            ratio=round(engine / duck, 2) if duck else None,
            distributed_ratio=round(dist / duck, 2) if duck else None,
        )


def probe_fanout(spark, reg, ks) -> None:
    """q16 event-table fan-out (the q18 per-micro-batch inner plan): full
    tracks-table materialization vs the DuckDB single-pass projection."""
    from rudder_server_spark.sources.rudder_events import rudder_events_path

    base_fixture = rudder_events_path("/root/testdata/sf0.01")
    for k in ks:
        sf_dir = build_scaled_events(spark, k, f"/tmp/rss_ev_{k}x")
        glob = os.path.join(rudder_events_path(sf_dir), "*.parquet")
        for name in ("q16_tracks_table", "q17_fanout_counts", "q69_batch_pipeline"):
            qd = reg[name]
            engine = _time_engine(
                spark,
                lambda: qd.spark_fn(spark, sf_dir)
                .write.mode("overwrite")
                .format("noop")
                .save(),
            )
            duck = _time_duck([], qd.oracle.replace(base_fixture, glob))
            _emit(
                k=k, query=name, engine_warm_sec=engine, duckdb_warm_sec=duck,
                ratio=round(engine / duck, 2) if duck else None,
            )


def build_scaled_sf(spark, k: int, out_dir: str) -> str:
    """A scaled driver-table sf dir: events.parquet at k x the base (event
    and user id spaces offset per replica so per-user/cohort structure is
    replicated, not densified), every other table symlinked from the base —
    queries and oracles run unmodified against it."""
    from pyspark.sql import functions as F

    from rudder_server_spark.sources.fixtures import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(BASE_SF, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t != "events" and os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    ev_out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(ev_out):
        return out_dir
    e = load_table(spark, BASE_SF, "events")
    reps = [
        e.withColumn("event_id", F.col("event_id") + F.lit(r * 10**9)).withColumn(
            "user_id", F.col("user_id") + F.lit(r * 10**7)
        )
        for r in range(k)
    ]
    from functools import reduce

    # same layout discipline as build_scaled_events (single sorted file,
    # bounded row groups) so the oracle side is never layout-handicapped
    (
        reduce(lambda a, b: a.unionByName(b), reps)
        .repartition(1)
        .sortWithinPartitions("event_type", "ts")
        .write.mode("overwrite")
        .option("parquet.block.size", 32 * 1024 * 1024)
        .parquet(ev_out)
    )
    return out_dir


def probe_floors(spark, reg, ks) -> None:
    """The remaining perf-weak floor rows (q3 pileup, q39 column profile,
    q79 retention): multi-stage DAGs whose sf0.1 cost is dominated by
    local-mode scheduling floors. Measured here at growing event volume to
    show the ratio falls as real work amortizes the floors."""
    for k in ks:
        sf_dir = build_scaled_sf(spark, k, f"/tmp/rss_sf_{k}x")
        glob_ev = os.path.join(sf_dir, "events.parquet", "*.parquet")
        setup = [
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob_ev}')"
        ]
        for name in ("q3_pileup", "q39_column_profile", "q79_retention"):
            qd = reg[name]
            engine = _time_engine(
                spark,
                lambda: qd.spark_fn(spark, sf_dir)
                .write.mode("overwrite")
                .format("noop")
                .save(),
            )
            duck = _time_duck(setup, qd.oracle)
            _emit(
                k=k, events=100_000 * k, query=name, engine_warm_sec=engine,
                duckdb_warm_sec=duck,
                ratio=round(engine / duck, 2) if duck else None,
            )


def build_scaled_embeddings(spark, k: int, out_dir: str) -> str:
    """embeddings.parquet at k x the base: replica r > 0 offsets vec_id so
    the query vector (vec_id=0) stays unique and the similarity
    distribution is replicated, not densified."""
    from pyspark.sql import functions as F

    from rudder_server_spark.sources.fixtures import load_table

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return out_dir
    e = load_table(spark, BASE_SF, "embeddings")
    reps = [
        e if r == 0 else e.withColumn("vec_id", F.col("vec_id") + F.lit(r * 10**9))
        for r in range(k)
    ]
    from functools import reduce

    (
        reduce(lambda a, b: a.unionByName(b), reps)
        .repartition(1)
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 32 * 1024 * 1024)
        .parquet(out)
    )
    return out_dir


def probe_floors2(spark, reg, ks) -> None:
    """r7 verdict #7: q27 (similarity top-k) and q69 (batch pipeline)
    regressed >2x driver-side at r7 with no code change — give them the
    same 1-100x crossover table q3/q79 carry, so floor amortization is
    MEASURED, not argued. q27 scales embeddings; q69 scales the
    rudder_events fixture (shared with the q9/q16 probes)."""
    from rudder_server_spark.sources.rudder_events import rudder_events_path

    base_oracle_path = rudder_events_path("/root/testdata/sf0.01")
    for k in ks:
        emb_dir = build_scaled_embeddings(spark, k, f"/tmp/rss_emb_{k}x")
        glob_emb = os.path.join(emb_dir, "embeddings.parquet", "*.parquet")
        qd = reg["q27_similarity_topk"]
        engine = _time_engine(
            spark,
            lambda: qd.spark_fn(spark, emb_dir)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        duck = _time_duck(
            [f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{glob_emb}')"],
            qd.oracle,
        )
        _emit(
            k=k, query="q27_similarity_topk", engine_warm_sec=engine,
            duckdb_warm_sec=duck,
            ratio=round(engine / duck, 2) if duck else None,
        )

        if k > 25:
            # the rudder_events fixture is 10x events rows with ~KB
            # payloads: 25x (26M rows) is the same cap the q9 cc probe
            # uses; 100x would be a ~50 GB single-file rewrite
            continue
        ev_dir = build_scaled_events(spark, k, f"/tmp/rss_ev_{k}x")
        scaled_path = _duck_path(rudder_events_path(ev_dir))
        qd = reg["q69_batch_pipeline"]
        engine = _time_engine(
            spark,
            lambda: qd.spark_fn(spark, ev_dir)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        duck = _time_duck([], qd.oracle.replace(base_oracle_path, scaled_path))
        _emit(
            k=k, query="q69_batch_pipeline", engine_warm_sec=engine,
            duckdb_warm_sec=duck,
            ratio=round(engine / duck, 2) if duck else None,
        )



def probe_provider(spark, reg, ks) -> None:
    """The provider-shape audits (q98 four-provider CSV contracts, q102
    round-7 provider batch) — the dominant v2 bench lines. Their sf0.1
    floor-adjusted ratios are enormous because the DuckDB oracle renders
    the same strings in <0.2 s with a fully-vectorized kernel; the scale
    claim is that Spark's cost is MAP-SIDE linear (CSV render +
    validation ladder per row, no corpus-wide join/sort beyond the
    per-day admission windows), so the ratio falls as volume amortizes
    scheduling + expression-eval constants."""
    for k in ks:
        sf_dir = build_scaled_sf(spark, k, f"/tmp/rss_sf_{k}x")
        glob_ev = os.path.join(sf_dir, "events.parquet", "*.parquet")
        setup = [
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob_ev}')"
        ]
        for name in (
            "q98_provider_upload_shapes",
            "q102_provider_upload_shapes2",
        ):
            qd = reg[name]

            def run():
                qd.spark_fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
                spark.catalog.clearCache()

            engine = _time_engine(spark, run)
            duck = _time_duck(setup, qd.oracle)
            _emit(
                k=k, events=100_000 * k, query=name, engine_warm_sec=engine,
                duckdb_warm_sec=duck,
                ratio=round(engine / duck, 2) if duck else None,
            )


def probe_uploads(spark, reg, ks) -> None:
    """r10 verdict #2: the three big-ratio bounded-dimension audits with
    no committed probe — q94 live-events (debugger.py), q93 wh_archive
    (wh_archive.py), q84 async destinations (async_destinations.py). All
    three derive their uploads/statuses from the events table, so the
    scaled-sf fixture grows the corpus side while the bounded dimension
    (enabled destinations / eligible uploads / upload windows) stays
    bounded-or-linear — the structural claim the sf0.1 ratios can't show.
    Same build_scaled_sf layout discipline as probe_provider."""
    for k in ks:
        sf_dir = build_scaled_sf(spark, k, f"/tmp/rss_sf_{k}x")
        glob_ev = os.path.join(sf_dir, "events.parquet", "*.parquet")
        setup = [
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob_ev}')"
        ]
        for name in (
            "q84_async_destinations",
            "q93_wh_archive",
            "q94_live_events",
        ):
            qd = reg[name]

            def run():
                qd.spark_fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
                spark.catalog.clearCache()

            engine = _time_engine(spark, run)
            duck = _time_duck(setup, qd.oracle)
            _emit(
                k=k, events=100_000 * k, query=name, engine_warm_sec=engine,
                duckdb_warm_sec=duck,
                ratio=round(engine / duck, 2) if duck else None,
            )


def main() -> None:
    from rudder_server_spark.plans.registry import load_all
    from rudder_server_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    which = os.environ.get("PROBE", "all")
    reg = load_all()
    spark = get_spark(app_name="scale_probe")
    if which in ("all", "dedup"):
        probe_dedup(spark, reg, ks)
    if which in ("all", "cc"):
        probe_cc(spark, reg, ks)
    if which in ("all", "fanout"):
        probe_fanout(spark, reg, ks)
    if which in ("all", "floors"):
        probe_floors(spark, reg, ks)
    if which in ("all", "floors2"):
        probe_floors2(spark, reg, ks)
    if which == "provider":
        probe_provider(spark, reg, ks)
    if which == "uploads":
        probe_uploads(spark, reg, ks)


if __name__ == "__main__":
    main()
