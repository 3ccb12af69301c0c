"""Tests for webhook adapters (S2), coercion+discards (P7), P11/F9/F10,
reporting aggregates (A5/A6/A8/A9) and sync-window scheduling (§2.10).
"""

import datetime as dt
import json

import pyspark.sql.functions as F

from rudder_server_spark.operators.coerce import (
    coerce_with_discards,
    drop_transient_sources,
    expire_jobs,
    strip_reserved_metadata,
)
from rudder_server_spark.operators.reporting import (
    gateway_event_stats,
    in_exclude_window,
    schema_version_counts,
    staging_file_stats,
    sync_window_start,
)
from rudder_server_spark.sources.webhook import adapt_webhook

T0 = dt.datetime(2024, 2, 1, 10, 30, 0)


def test_webhook_generic_adapter(spark):
    df = spark.createDataFrame(
        [(json.dumps({"event": "Signed Up", "userId": "u1", "plan": "pro"}), T0)],
        "body string, received_at timestamp",
    )
    out = adapt_webhook(df, "generic").head()
    assert out["event_type"] == "track" and out["event_name"] == "Signed Up"
    assert out["user_id"] == "u1"
    assert json.loads(out["payload"])["properties"]["plan"] == "pro"


def test_webhook_batch_adapter_explodes(spark):
    body = json.dumps(
        {"events": [json.dumps({"event": f"E{i}", "userId": str(i)}) for i in range(3)]}
    )
    df = spark.createDataFrame([(body, T0)], "body string, received_at timestamp")
    out = adapt_webhook(df, "generic_batch")
    assert sorted(r["event_name"] for r in out.collect()) == ["E0", "E1", "E2"]


def test_coerce_with_discards(spark):
    df = spark.createDataFrame(
        [(1, "42", "x"), (2, "not-a-number", "y"), (3, None, "z")],
        "id long, v string, s string",
    )
    coerced, discards = coerce_with_discards(df, {"v": "bigint", "s": "string"})
    got = {r["id"]: r["v"] for r in coerced.collect()}
    assert got == {1: 42, 2: None, 3: None}
    d = discards.collect()
    assert len(d) == 1
    assert d[0]["row_id"] == 2 and d[0]["column_name"] == "v"
    assert d[0]["column_value"] == "not-a-number"
    assert d[0]["reason"] == "incompatible schema conversion"


def test_strip_reserved_metadata(spark):
    payload = json.dumps(
        {"context": {"activation": {"fingerprint": "fp1", "origin": "o1"}, "ip": "1.1.1.1"}}
    )
    df = spark.createDataFrame([(payload,)], "payload string")
    out = json.loads(strip_reserved_metadata(df).head()["payload"])
    assert out["context"]["activation"] == {}
    assert out["context"]["ip"] == "1.1.1.1"


def test_transient_and_expiry(spark):
    df = spark.createDataFrame(
        [("s1", T0), ("s2", T0), ("s3", T0 - dt.timedelta(days=40))],
        "source_id string, created_at timestamp",
    )
    transient = spark.createDataFrame([("s2",)], "source_id string")
    assert {r["source_id"] for r in drop_transient_sources(df, transient).collect()} == {"s1", "s3"}
    fresh = expire_jobs(df, F.lit(T0).cast("timestamp"), max_age_days=30)
    assert {r["source_id"] for r in fresh.collect()} == {"s1", "s2"}


def test_staging_stats_and_gateway_stats(spark):
    df = spark.createDataFrame(
        [("f1", "abc", T0, "s1", "track", "A"),
         ("f1", "defgh", T0 + dt.timedelta(60), "s1", "track", "A"),
         ("f2", "x", T0, "s1", "page", None)],
        "staging_file string, payload string, received_at timestamp, "
        "source_id string, event_type string, event_name string",
    )
    st = {r["staging_file"]: r for r in staging_file_stats(df).collect()}
    assert st["f1"]["total_events"] == 2 and st["f1"]["total_bytes"] == 8
    assert st["f1"]["first_event_at"] == T0
    assert st["f1"]["last_event_at"] == T0 + dt.timedelta(60)

    gw = {(r["event_type"], r["event_name"]): r["n"] for r in gateway_event_stats(df).collect()}
    assert gw[("track", "A")] == 2 and gw[("page", None)] == 1


def test_schema_version_counts(spark):
    df = spark.createDataFrame(
        [(json.dumps({"a": 1, "b": 2}),),
         (json.dumps({"b": 5, "a": 9}),),   # same key set → same hash
         (json.dumps({"a": 1}),)],
        "payload string",
    )
    out = schema_version_counts(df).collect()
    counts = sorted(r["n"] for r in out)
    assert counts == [1, 2]


def test_sync_windows(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 2, 1, 10, 44),), (dt.datetime(2024, 2, 1, 10, 46),)],
        "ts timestamp",
    )
    # 30-min windows anchored at :15 → [10:15, 10:45), [10:45, 11:15)
    out = df.select(
        sync_window_start(F.col("ts"), 30, start_at_minutes=15).alias("w")
    ).collect()
    assert out[0]["w"] == dt.datetime(2024, 2, 1, 10, 15)
    assert out[1]["w"] == dt.datetime(2024, 2, 1, 10, 45)

    ex = df.select(in_exclude_window(F.col("ts"), 22, 2).alias("e")).collect()
    assert [r["e"] for r in ex] == [False, False]
    late = spark.createDataFrame([(dt.datetime(2024, 2, 1, 23, 5),)], "ts timestamp")
    assert late.select(in_exclude_window(F.col("ts"), 22, 2).alias("e")).head()["e"]


def test_salted_join_and_count(spark):
    from rudder_server_spark.operators.skew import salted_count, salted_join

    # skewed big side: one hot key (90%) + tail
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, "hot").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k950", "T")], "k string, label string"
    )
    out = salted_join(big, small, on=["k"], buckets=4)
    agg = {r["label"]: r["n"] for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert agg == {"H": 900, "T": 1}  # same result as a plain join

    counts = {r["k"]: r["n"] for r in salted_count(big, ["k"], buckets=8).collect()}
    assert counts["hot"] == 900 and counts["k999"] == 1


def test_incremental_identity_merge(spark):
    from rudder_server_spark.operators.identity import apply_merge_rules

    cols = "merge_property_1_value string, merge_property_2_value string"
    batch1 = spark.createDataFrame([("a", "b"), ("c", "d")], cols)
    batch2 = spark.createDataFrame([("b", "c"), ("e", "f")], cols)  # merges {a,b}∪{c,d}

    m1 = apply_merge_rules(None, batch1)
    assert {r["identifier"]: r["component"] for r in m1.collect()} == {
        "a": "a", "b": "a", "c": "c", "d": "c",
    }
    m2 = apply_merge_rules(m1, batch2)
    got = {r["identifier"]: r["component"] for r in m2.collect()}
    # incremental result == from-scratch over all rules
    full = apply_merge_rules(None, batch1.unionByName(batch2))
    assert got == {r["identifier"]: r["component"] for r in full.collect()}
    assert got["d"] == "a" and got["e"] == "e" and got["f"] == "e"


def test_connected_components_broadcast_vs_distributed(spark):
    import random

    from rudder_server_spark.operators.identity import connected_components

    rng = random.Random(7)
    edges = [(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}") for _ in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {(r[0], r[1]) for r in connected_components(df).collect()}
    slow = {(r[0], r[1]) for r in connected_components(df, broadcast_threshold=0).collect()}
    assert fast == slow and fast


def test_connected_components_long_ids_and_negatives(spark):
    """connected_components is id-type-generic (ADVICE r3: the padded-string
    encoding broke on negative ids): long node ids — including negatives —
    label with the true numeric min, identically on both paths, and the
    output schema keeps the input id type."""
    from rudder_server_spark.operators.identity import connected_components

    edges = [(-5, 3), (3, 7), (100, 101), (-10, -2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = connected_components(df)
    assert dict(fast.dtypes) == {"identifier": "bigint", "component": "bigint"}
    got = {r["identifier"]: r["component"] for r in fast.collect()}
    assert got == {-5: -5, 3: -5, 7: -5, 100: 100, 101: 100, -10: -10, -2: -10}
    slow = {
        (r[0], r[1])
        for r in connected_components(df, broadcast_threshold=0).collect()
    }
    assert slow == set(got.items())


def test_q9_distributed_path_matches_oracle(spark):
    """The driver's q9 run at small SF takes the driver-side union-find fast
    path; this pins the DISTRIBUTED min-label path against the same DuckDB
    oracle so both stay green (VERDICT r1 #7)."""
    import os

    import pyspark.sql.functions as F

    from rudder_server_spark.operators.identity import connected_components
    from rudder_server_spark.plans.registry import load_all
    from rudder_server_spark.sources.rudder_events import rudder_events_path
    from tests.oracle import compare, duck_connect

    sf_dir = "/root/testdata/sf0.001"
    df = (
        spark.read.parquet(rudder_events_path(sf_dir))
        .where(F.col("event_type") == "merge")
    )
    mp = "mergeProperties array<struct<type:string,value:string>>"
    edges = df.select(F.from_json(F.col("payload"), mp).alias("_s")).select(
        F.element_at("_s.mergeProperties", 1).getField("value").alias("src"),
        F.element_at("_s.mergeProperties", 2).getField("value").alias("dst"),
    )
    out = connected_components(edges, broadcast_threshold=0).orderBy("identifier")

    sql = load_all()["q9_identity_graph"].oracle.replace(
        "rudder_events_sf0.01.parquet",
        f"rudder_events_{os.path.basename(os.path.normpath(sf_dir))}.parquet",
    )
    con = duck_connect(sf_dir)
    try:
        ok, msg = compare(out, con, sql)
    finally:
        con.close()
    assert ok, msg


def test_hash_split_deterministic(spark):
    import pyspark.sql.functions as F

    from rudder_server_spark.operators.text import hash_split

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    # stable under repartitioning — assignment depends only on the key
    b = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(7)).collect()}
    assert a == b
    counts = {}
    for v in a.values():
        counts[v] = counts.get(v, 0) + 1
    # 14/1/1 sixteenths, roughly
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert set(counts) == {"train", "val", "test"}


def test_repetition_features(spark):
    from rudder_server_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a b a b a b", "en"),       # "a b" x3, "b a" x2 -> top 3/5
            (2, "x y z w", "en"),           # all bigrams unique -> top 1/3
            (3, "solo", "en"),              # <2 tokens: no bigrams, dropped
        ],
        "doc_id long, text string, lang string",
    )
    rows = {r["sid"]: r for r in repetition_features(df).collect()}
    assert set(rows) == {1, 2}  # doc 3 has no bigrams
    assert rows[1]["top_bigram_cnt"] == 3 and rows[1]["bigram_cnt"] == 5
    assert rows[1]["n_tokens"] == 6 and rows[1]["n_distinct_tokens"] == 2
    assert rows[2]["top_bigram_cnt"] == 1 and rows[2]["bigram_cnt"] == 3


def test_contamination_counts(spark):
    from rudder_server_spark.operators.dedup import contamination_counts

    train = spark.createDataFrame(
        [
            (1, "one two three four five six"),   # shares the 5-gram span with eval 10
            (2, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "one two three four five seven")],  # one shared 5-gram: "one..five"
        "doc_id long, text string",
    )
    out = {r["train_doc"]: r for r in contamination_counts(train, ev, n=5).collect()}
    assert set(out) == {1}
    assert out[1]["shared_ngrams"] == 1 and out[1]["eval_docs_hit"] == 1


def test_pii_email_features(spark):
    from rudder_server_spark.operators.text import pii_email_features

    df = spark.createDataFrame(
        [
            (1, 'contact a@b.co and c.d+x@e-f.org today'),
            (2, "no pii at all"),
            (3, "not-an-email @ nor this@"),
        ],
        "id long, payload string",
    )
    rows = {r["id"]: r for r in pii_email_features(df).collect()}
    assert rows[1]["pii_email_cnt"] == 2
    assert rows[1]["pii_redacted"] == "contact [EMAIL] and [EMAIL] today"
    assert rows[2]["pii_email_cnt"] == 0 and rows[2]["pii_redacted"] == "no pii at all"
    assert rows[3]["pii_email_cnt"] == 0


def test_incremental_dedup_batch_vs_corpus(spark):
    from rudder_server_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha, beta!"),  # normalizes to a corpus doc → dropped
            (11, "epsilon zeta"),  # new → kept
            (12, "epsilon zeta"),  # within-batch dup of 11 → dropped
            (13, "eta theta"),     # new → kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in incremental_dedup(batch, corpus).collect())
    assert kept == [11, 13]


def test_quality_filter_per_rule_attribution(spark):
    from rudder_server_spark.operators.text import quality_filter

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat on top of the large mat today"),  # passes all
            (2, "the and of"),  # too few tokens
            (3, "the " + "supercalifragilistic " * 30),  # mean token len > 15
            (4, "the 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 !!!"),  # alpha ratio < 0.6
            (5, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff"),  # no stopword hit
            (6, "the cat " * 40),  # one bigram dominates
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in quality_filter(df).collect()}
    assert out[1]["pass_all"]
    assert not out[2]["pass_len"] and out[2]["pass_stop"]
    assert not out[3]["pass_wordlen"]
    assert not out[4]["pass_alpha"]
    assert not out[5]["pass_stop"] and out[5]["pass_len"]
    assert not out[6]["pass_rep"]
    for i in (2, 3, 4, 5, 6):
        assert not out[i]["pass_all"]


def test_ngram_jaccard_doc_freq_cap(spark):
    from rudder_server_spark.operators.dedup import ngram_jaccard_pairs

    # two exact near-dup pairs + a hot shingle shared by EVERY doc
    hot = "common filler words here"
    docs = [
        (1, f"{hot} alpha beta gamma delta epsilon zeta"),
        (2, f"{hot} alpha beta gamma delta epsilon zeta"),
        (3, f"{hot} one two three four five six seven"),
        (4, f"{hot} one two three four five six seven"),
        (5, f"{hot} totally unrelated content lives in this document"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(df, 0.8).collect()}
    assert exact == {(1, 2), (3, 4)}
    # cap 4 drops the shingles every doc shares; jaccard is computed over
    # the reduced universe, so the identical pairs still score 1.0
    capped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, 0.8, max_doc_freq=4).collect()
    }
    assert set(capped) == {(1, 2), (3, 4)}
    assert all(j == 1.0 for j in capped.values())


def test_webhook_batch_udtf(spark):
    from rudder_server_spark.sources.webhook import register_batch_udtf

    register_batch_udtf(spark)
    body = json.dumps(
        {
            "events": [
                json.dumps({"event": "A", "userId": "u1"}),
                "not json {{{",
                json.dumps({"event": "B", "userId": "u2", "x": 1}),
            ]
        }
    )
    spark.createDataFrame([(1, body), (2, "garbage")], "id long, body string").createOrReplaceTempView(
        "wh_payloads"
    )
    rows = spark.sql(
        "SELECT p.id, t.event_name, t.user_id FROM wh_payloads p, "
        "LATERAL explode_webhook_batch(body) t ORDER BY t.event_name"
    ).collect()
    assert [(r["id"], r["event_name"], r["user_id"]) for r in rows] == [
        (1, "A", "u1"),
        (1, "B", "u2"),
    ]


def test_profile_columns_approx_mode(spark):
    """The 100 TB profile path: approx_count_distinct within ~5% of exact,
    same n_null/min/max, no expand over the full value set."""
    from rudder_server_spark.operators.profile import profile_columns

    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(id % 37 AS STRING) AS cat",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 1.5 END AS v",
    )
    exact = {r["col_name"]: r for r in profile_columns(df, exact=True).collect()}
    approx = {r["col_name"]: r for r in profile_columns(df, exact=False).collect()}
    for c in ("id", "cat", "v"):
        assert approx[c]["n_null"] == exact[c]["n_null"]
        assert approx[c]["min_s"] == exact[c]["min_s"]
        assert approx[c]["max_s"] == exact[c]["max_s"]
        rel = abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) / max(
            1, exact[c]["n_distinct"]
        )
        assert rel <= 0.05, (c, approx[c]["n_distinct"], exact[c]["n_distinct"])


def test_canonical_dedup_keeps_longest(spark):
    """Keep-best policy: longest copy wins its content group (tie -> min
    id); group_size counts all copies; distinct contents are untouched."""
    from rudder_server_spark.operators.dedup import canonical_dedup

    # note: normalize_text strips non-[a-z0-9 ] BEFORE lower (t1's pinned
    # semantics), so the copies here differ only in punctuation
    rows = [
        (1, "hello world"),        # group A, len 11
        (2, "hello, world!!"),     # group A after normalization, len 14 -> wins
        (3, "hello world"),        # group A
        (4, "something else"),     # group B, alone
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["group_size"] for r in canonical_dedup(df).collect()}
    assert out == {2: 3, 4: 1}


def test_t34_approx_percentiles_close_to_exact(spark):
    """Sketch tier vs exact tier (t34 vs t21): same groups, p50/p95 within
    the sketch's rank-error bound (loose 5% value tolerance at this SF)."""
    from rudder_server_spark.plans.registry import load_all

    reg = load_all()
    sfd = "/root/testdata/sf0.001"
    exact = {r["lang"]: r for r in reg["t21_length_percentiles"].spark_fn(spark, sfd).collect()}
    approx = {r["lang"]: r for r in reg["t34_approx_percentiles"].spark_fn(spark, sfd).collect()}
    assert set(exact) == set(approx)
    for lang in exact:
        assert approx[lang]["docs"] == exact[lang]["docs"]
        for c in ("p50_chars", "p95_chars"):
            e, a = exact[lang][c], approx[lang][c]
            assert abs(a - e) <= max(2.0, 0.05 * e), (lang, c, a, e)


def test_containment_asymmetry(spark):
    """A short doc quoted inside a long one: containment ≈ 1 from the
    short side, well below 1 from the long side, while the pair's Jaccard
    stays under a dedup threshold — the case t35 exists to catch."""
    from rudder_server_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "intro words here . " + quote + " . and then many more words follow "
        "that pad this document out with unrelated content entirely"
    )
    df = spark.createDataFrame([(1, quote), (2, long_doc)], "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["containment"]
             for r in ngram_containment_pairs(df, threshold=0.0).collect()}
    assert pairs[(1, 2)] == 1.0          # every shingle of the quote is in the long doc
    assert pairs[(2, 1)] < 0.5           # but the long doc is mostly novel
    jac = ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert jac and jac[0]["jaccard"] < 0.5  # Jaccard alone would miss this pair


def test_webhook_envelope_and_form_adapters(spark):
    """The two other common webhook families: epoch-stamped data envelope
    and form-encoded bodies — both land in the standard event envelope."""
    import datetime as dtm

    from rudder_server_spark.sources.webhook import adapt_webhook

    t0 = dtm.datetime(2024, 2, 1, 10, 30, 0)
    env_body = json.dumps(
        {"type": "customer.created", "created": 1706745600,
         "data": {"userId": "u9", "plan": "pro"}}
    )
    df = spark.createDataFrame([(env_body, t0)], "body string, received_at timestamp")
    out = adapt_webhook(df, "data_envelope").head()
    assert out["event_name"] == "customer.created" and out["user_id"] == "u9"
    assert out["sent_at"] == dtm.datetime(2024, 2, 1, 0, 0, 0)  # epoch, UTC session
    assert json.loads(out["payload"])["properties"]["plan"] == "pro"

    form = spark.createDataFrame(
        [("event=Signed+Up&userId=u3&plan=free", t0)],
        "body string, received_at timestamp",
    )
    fo = adapt_webhook(form, "form").head()
    assert fo["event_name"] == "Signed+Up" and fo["user_id"] == "u3"
    assert json.loads(fo["payload"])["properties"]["plan"] == "free"


def test_t36_lsh_recall_is_perfect_at_fixtures(spark):
    """The LSH tier's verified output must equal the exact tier at the
    fixtures (identical docs always collide in some band): recall ==
    precision == 1.0. Catches banding-parameter drift."""
    from rudder_server_spark.plans.registry import load_all

    row = load_all()["t36_lsh_recall"].spark_fn(spark, "/root/testdata/sf0.001").head()
    assert row["recall"] == 1.0 and row["precision"] == 1.0
    assert row["exact_pairs"] == row["lsh_pairs"] == row["agree"]


def test_stratified_sample_matches_full_rank_and_is_layout_stable(spark):
    from pyspark.sql import Window as W

    from rudder_server_spark.operators.sampling import (
        stratified_sample,
        ticket_hex,
    )
    from rudder_server_spark.sources.fixtures import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    k = 5
    got = stratified_sample(d, "lang", k=k).select("lang", "doc_id")
    # brute-force: rank EVERY row per stratum (the oracle semantics)
    w = W.partitionBy("lang").orderBy(ticket_hex(F.col("doc_id")), "doc_id")
    want = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("lang", "doc_id")
    )
    assert sorted(got.collect()) == sorted(want.collect())
    # exactly min(k, n) per stratum
    per = dict(got.groupBy("lang").count().collect())
    n = dict(d.groupBy("lang").count().collect())
    assert per == {lang: min(k, c) for lang, c in n.items()}
    # resharding must not change the sample (content-keyed tickets)
    reshuffled = stratified_sample(d.repartition(7, "doc_id"), "lang", k=k)
    assert sorted(reshuffled.select("lang", "doc_id").collect()) == sorted(got.collect())


def test_rebalance_repeats_bounds_and_determinism(spark):
    from rudder_server_spark.operators.sampling import rebalance_repeats
    from rudder_server_spark.sources.fixtures import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    r = rebalance_repeats(d, source_col="lang", id_col="doc_id", max_repeat=4.0)
    rows = r.select("lang", "doc_id", "repeats").collect()
    # every repeat within [1, ceil(cap)]
    assert all(1 <= x["repeats"] <= 4 for x in rows)
    # per-stratum: repeats differ by at most 1 (floor vs stochastic +1)
    spread = r.groupBy("lang").agg(
        (F.max("repeats") - F.min("repeats")).alias("spread")
    )
    assert all(x["spread"] <= 1 for x in spread.collect())
    # deterministic under resharding
    again = rebalance_repeats(
        d.repartition(5, "doc_id"), source_col="lang", id_col="doc_id", max_repeat=4.0
    )
    assert sorted(again.select("lang", "doc_id", "repeats").collect()) == sorted(rows)
    # uniform strata rebalance to a no-op (factor 1 everywhere)
    uni = rebalance_repeats(d, source_col="source", id_col="doc_id")
    assert uni.where(F.col("repeats") != 1).count() == 0


def test_webhook_signature_verification(spark):
    import hashlib
    import hmac

    from rudder_server_spark.sources.webhook import verify_webhook_signatures

    secrets = {"shopify": "s3cret", "github": "hunter2"}
    body = '{"event":"order"}'
    good = hmac.new(b"s3cret", body.encode(), hashlib.sha256).hexdigest()
    rows = [
        ("shopify", body, good),                    # valid
        ("shopify", body, "deadbeef"),              # forged
        ("github", body, good),                     # wrong source secret
        ("unknown", body, good),                    # unregistered source
        ("shopify", body, None),                    # missing header
    ]
    df = spark.createDataFrame(rows, "source_type string, body string, signature string")
    got = {
        (r["source_type"], r["signature"]): r["sig_valid"]
        for r in verify_webhook_signatures(df, secrets).collect()
    }
    assert got[("shopify", good)] is True
    assert got[("shopify", "deadbeef")] is False
    assert got[("github", good)] is False
    assert got[("unknown", good)] is False
    assert got[("shopify", None)] is False


def test_sync_window_expr_variants_agree(spark):
    from rudder_server_spark.operators.reporting import (
        in_exclude_window,
        in_exclude_window_expr,
        sync_window_start,
        sync_window_start_expr,
    )
    from rudder_server_spark.sources.fixtures import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events").select("ts")
    both = e.select(
        sync_window_start(F.col("ts"), 45, 10).alias("a"),
        sync_window_start_expr(F.col("ts"), F.lit(45), F.lit(10)).alias("b"),
        in_exclude_window(F.col("ts"), 22, 3).alias("x"),
        in_exclude_window_expr(F.col("ts"), F.lit(22), F.lit(3)).alias("y"),
    )
    assert both.where((F.col("a") != F.col("b")) | (F.col("x") != F.col("y"))).count() == 0


def test_quantize_embeddings_roundtrip(spark):
    import numpy as np

    from rudder_server_spark.operators.quantize import quantize_embeddings
    from rudder_server_spark.sources.fixtures import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = quantize_embeddings(e)
    joined = {r["vec_id"]: r for r in q.collect()}
    for r in e.limit(20).collect():
        out = joined[r["vec_id"]]
        a = np.asarray(r["embedding"], dtype=np.float64)
        s = out["scale"]
        code = np.asarray(out["q"], dtype=np.float64)
        assert len(code) == len(a)
        assert np.abs(code).max() <= 127
        # reconstruction error bounded by half a quantization step
        recon = code / s
        assert np.abs(recon - a).max() <= (0.5 / s) + 1e-12
    # zero vector: scale 0, all-zero code
    z = spark.createDataFrame([(99, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
    zr = quantize_embeddings(z).collect()[0]
    assert zr["scale"] == 0.0 and list(zr["q"]) == [0, 0, 0]


def test_quantized_topk_recall_vs_exact(spark):
    from rudder_server_spark.operators.quantize import quantized_topk
    from rudder_server_spark.operators.similarity import brute_force_topk
    from rudder_server_spark.sources.fixtures import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = [float(v) for v in e.where(F.col("vec_id") == 0).head()["embedding"]]
    rest = e.where(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in brute_force_topk(rest, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in quantized_topk(rest, qvec, k=10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8
    # rescoring reports EXACT similarities: the overlap's sims must match
    exact_sims = {r["vec_id"]: r["sim"] for r in brute_force_topk(rest, qvec, k=10).collect()}
    for r in quantized_topk(rest, qvec, k=10).collect():
        if r["vec_id"] in exact_sims:
            assert abs(r["sim"] - exact_sims[r["vec_id"]]) < 1e-9


def test_group_centroid_diversity_empty_and_view_hygiene(spark):
    """ADVICE r2: empty input short-circuits to an empty typed frame
    (the generated dim-0 SQL would be a parse error), and the temp view
    is per-call unique and dropped after analysis — two interleaved
    calls cannot clobber each other and leave nothing in the catalog."""
    from rudder_server_spark.operators.similarity import group_centroid_diversity

    empty = spark.createDataFrame([], "label string, embedding array<double>")
    out = group_centroid_diversity(empty)
    assert out.count() == 0
    assert out.columns == ["label", "n_vectors", "avg_cos", "min_cos"]

    a = spark.createDataFrame(
        [("x", [1.0, 0.0]), ("x", [0.0, 1.0])], "label string, embedding array<double>"
    )
    b = spark.createDataFrame(
        [("y", [1.0, 1.0, 0.0]), ("y", [1.0, 1.0, 0.1])],
        "label string, embedding array<double>",
    )
    # interleave: build both frames before collecting either
    da, db = group_centroid_diversity(a), group_centroid_diversity(b)
    ra = {r["label"]: r["n_vectors"] for r in da.collect()}
    rb = {r["label"]: r["n_vectors"] for r in db.collect()}
    assert ra == {"x": 2} and rb == {"y": 2}
    leftover = [t.name for t in spark.catalog.listTables() if t.name.startswith("_gcd_input")]
    assert leftover == []


def test_zorder_key_bit_roundtrip(spark):
    """Morton key invariant: de-interleaving the generated key recovers
    both inputs exactly (bits=8), and the key is monotone under
    quadrant nesting (prefix property) — checked JVM-side for a grid."""
    import pyspark.sql.functions as F

    from rudder_server_spark.sources.layout import zorder_key

    df = spark.range(1024).select(
        (F.col("id") % 32).alias("u"), ((F.col("id") * 13) % 32).alias("v")
    )
    k = df.withColumn("zk", zorder_key(["u", "v"], bits=8))
    # de-interleave in SQL: odd bit positions -> u, even -> v
    u_back = " | ".join(
        f"shiftleft(shiftright(zk, {2 * i + 1}) & 1, {i})" for i in range(8)
    )
    v_back = " | ".join(
        f"shiftleft(shiftright(zk, {2 * i}) & 1, {i})" for i in range(8)
    )
    bad = k.where(
        (F.expr(u_back) != F.col("u")) | (F.expr(v_back) != F.col("v"))
    ).count()
    assert bad == 0


def test_repeated_passages_invariants(spark):
    """t51 invariants on the fixture corpus: 0 <= n_repeated <= n_distinct
    <= n_windows, and a doc duplicated verbatim has ALL its spans
    repeated."""
    import pyspark.sql.functions as F

    from rudder_server_spark.operators.dedup import repeated_passages

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
        (3, "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repeated_passages(df, n=8, min_docs=2).collect()}
    for r in out.values():
        assert 0 <= r["n_repeated"] <= r["n_distinct"] <= r["n_windows"]
    assert out[1]["n_repeated"] == out[1]["n_distinct"] == 3  # 10 toks, n=8
    assert out[2]["n_repeated"] == 3
    assert out[3]["n_repeated"] == 0


def test_tfidf_keywords_rank_contract(spark):
    """t52 contract: per-doc ranks are 1..k dense, scores non-increasing
    within a doc, and a corpus-universal term (df == N, idf == 0) can
    never outrank a discriminative one."""
    from rudder_server_spark.operators.text import tfidf_keywords

    rows = [
        (1, "common common apple apple apple"),
        (2, "common banana banana"),
        (3, "common cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(df, k=2)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    for doc, entries in by_doc.items():
        entries.sort()
        assert [e[0] for e in entries] == list(range(1, len(entries) + 1))
        scores = [e[2] for e in entries]
        assert scores == sorted(scores, reverse=True)
    # 'common' appears in every doc -> idf 0 -> rank-1 term is the local one
    assert by_doc[1][0][1] == "apple"
    assert by_doc[2][0][1] == "banana"


def test_scalable_rank_matches_window_rank_with_ties(spark):
    """scalable_rank == rank() OVER (...) exactly, including shared ranks
    for ties and the gap after a tie group — checked over many physical
    partitions so tie groups and offsets actually cross task boundaries."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from rudder_server_spark.operators.ranking import scalable_rank

    # value collisions on purpose: id % 97 gives ~100 docs per tie group
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 97).alias("val"),
        F.col("id").alias("rid"),
    )
    got = scalable_rank(df, order_cols=[F.desc("val")], group_cols=["grp"])
    expected = df.withColumn(
        "rank",
        F.rank().over(W.partitionBy("grp").orderBy(F.desc("val"))).cast("long"),
    )
    g = {(r["grp"], r["rid"]): r["rank"] for r in got.collect()}
    e = {(r["grp"], r["rid"]): r["rank"] for r in expected.collect()}
    assert g == e


def test_heavy_hitters_cms_bounds_and_merge(spark):
    """Count-Min guarantees: estimate >= exact for every heavy hitter,
    estimate <= exact + eps*N (w.h.p.), and two half-corpus sketches
    MERGE into the whole-corpus sketch (the property that lets per-shard
    summaries roll up without a second pass)."""
    import pyspark.sql.functions as F

    from rudder_server_spark.operators.sketches import heavy_hitters_cms

    df = spark.range(50_000).select(
        F.concat(F.lit("tok"), (F.col("id") % F.when(F.col("id") % 7 == 0, 3)
                                .otherwise(1000)).cast("string")).alias("tok")
    )
    n = df.count()
    top, cms = heavy_hitters_cms(df, "tok", k=5, eps=0.005)
    rows = top.collect()
    assert len(rows) == 5 and rows[0]["cnt"] >= rows[-1]["cnt"]
    for r in rows:
        est = cms.estimate(r["tok"])
        assert r["cnt"] <= est <= r["cnt"] + 0.005 * n
    assert cms.total == n

    h1 = df.where(F.crc32("tok") % 2 == 0)
    h2 = df.where(F.crc32("tok") % 2 == 1)
    _, c1 = heavy_hitters_cms(h1, "tok", eps=0.005)
    _, c2 = heavy_hitters_cms(h2, "tok", eps=0.005)
    merged = c1.merge(c2)
    for r in rows:
        assert merged.estimate(r["tok"]) >= r["cnt"]


def test_dup_clusters_transitive_family_and_election(spark):
    """A~B and B~C must land in one family even when A and C never pair;
    canonical = longest text, tie -> smallest id; singletons excluded."""
    from pyspark.sql import functions as F

    from rudder_server_spark.operators.dedup import dup_clusters

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", 50),
            (2, "the quick brown fox jumps over the lazy dog tonight", 51),
            (3, "a quick brown fox jumps over the lazy dog tonight", 49),
            (9, "completely unrelated text with no shared shingles here", 54),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = dup_clusters(df, threshold=0.6).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    assert {r["cluster_id"] for r in out} == {1}
    assert all(r["cluster_size"] == 3 for r in out)
    # doc 2 has the largest n_chars -> canonical
    assert {r["doc_id"]: r["is_canonical"] for r in out} == {1: False, 2: True, 3: False}

    # pairs= injection: cluster from an externally supplied candidate tier
    pairs = spark.createDataFrame([(1, 9)], "a long, b long")
    out2 = dup_clusters(df, pairs=pairs).collect()
    assert sorted(r["doc_id"] for r in out2) == [1, 9]
    assert all(r["cluster_id"] == 1 for r in out2)
    # tie-free: doc 9 longer -> canonical
    assert {r["doc_id"]: r["is_canonical"] for r in out2} == {1: False, 9: True}


def test_funnel_ordering_and_window(spark):
    """A click before the user's first view must not count; a purchase
    outside the window must not count; monotone step counts."""
    from datetime import datetime as dt

    from rudder_server_spark.operators.funnel import funnel_steps

    rows = [
        # u1: clean view -> click -> purchase inside window
        (1, dt(2024, 1, 1, 0), "view"),
        (1, dt(2024, 1, 1, 1), "click"),
        (1, dt(2024, 1, 1, 2), "purchase"),
        # u2: click BEFORE first view -> stops at view
        (2, dt(2024, 1, 1, 0), "click"),
        (2, dt(2024, 1, 1, 1), "view"),
        # u3: purchase outside the 2h window -> stops at click
        (3, dt(2024, 1, 1, 0), "view"),
        (3, dt(2024, 1, 1, 0, 30), "click"),
        (3, dt(2024, 1, 1, 3), "purchase"),
        # u4: never viewed
        (4, dt(2024, 1, 1, 0), "purchase"),
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["step"]: r["users"]
        for r in funnel_steps(
            e, ["view", "click", "purchase"], window_seconds=7200
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohort_excludes_precohort_activity(spark):
    from datetime import datetime as dt

    from rudder_server_spark.operators.funnel import retention_cohorts

    rows = [
        (1, dt(2024, 1, 1), "click"),     # Monday, BEFORE signup -> excluded
        (1, dt(2024, 1, 8), "signup"),    # cohort week = 2024-01-08
        (1, dt(2024, 1, 16), "view"),     # offset 1
        (2, dt(2024, 1, 9), "signup"),    # same cohort week
        (2, dt(2024, 1, 9), "view"),      # offset 0 (same week as signup)
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = retention_cohorts(e).collect()
    cells = {(str(r["cohort_week"]), r["week_offset"]): r["active_users"] for r in out}
    assert cells == {("2024-01-08", 0): 2, ("2024-01-08", 1): 1}


def test_knn_classify_majority_and_tiebreak(spark):
    """2-2 vote split resolves to the smallest label; neighbor ranking
    ties resolve by n_id."""
    from rudder_server_spark.operators.similarity import knn_classify

    # 2D embeddings: query at origin-ish; neighbors at equal distance carry
    # labels 7 and 3 twice each -> tie -> pred 3
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.1], 7),
            (2, [1.0, -0.1], 7),
            (3, [0.1, 1.0], 3),
            (4, [-0.1, 1.0], 3),
            (5, [-1.0, -1.0], 9),  # far: must not be picked at k=4
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    out = knn_classify(q, corpus, k=4).collect()
    assert len(out) == 1
    assert out[0]["vec_id"] == 100
    assert out[0]["pred_label"] == 3
    assert out[0]["votes"] == 2


def test_knn_join_ivf_recall_on_clustered_data(spark):
    """On well-separated clusters with matched cell count, probing ONE
    cell recovers the exact neighbor set (recall 1.0); the fixture-scale
    QA (t57) reports the recall/nprobe trade-off on unstructured data."""
    import numpy as np

    from rudder_server_spark.operators.similarity import (
        ivf_train,
        knn_join,
        knn_join_ivf,
    )

    rng = np.random.RandomState(3)
    rows = []
    for cl in range(4):
        center = np.zeros(8)
        center[cl * 2] = 10.0
        for i in range(40):
            v = center + rng.normal(0, 0.05, 8)
            rows.append((cl * 1000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") % 10 == 0)
    c = df.where(F.col("vec_id") % 10 != 0)
    exact = {(r["q_id"], r["n_id"]) for r in knn_join(q, c, k=3).collect()}
    cents = ivf_train(c, k=4)
    approx = {
        (r["q_id"], r["n_id"])
        for r in knn_join_ivf(q, c, cents, k=3, nprobe=1).collect()
    }
    assert exact and approx == exact


def test_cluster_safe_split_families_never_straddle(spark):
    """All members of a near-dup family get ONE split; singletons keep the
    family-blind hash_split assignment exactly."""
    from rudder_server_spark.operators.dedup import cluster_safe_split
    from rudder_server_spark.operators.text import hash_split

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", 50),
            (2, "the quick brown fox jumps over the lazy dog tonight", 51),
            (3, "a quick brown fox jumps over the lazy dog tonight", 49),
            (9, "completely unrelated text with no shared shingles here", 54),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = {r["doc_id"]: r for r in cluster_safe_split(df, threshold=0.6).collect()}
    assert len(out) == 4
    # family {1,2,3} shares key 1 and therefore one split
    assert {out[i]["split_key"] for i in (1, 2, 3)} == {1}
    assert len({out[i]["split"] for i in (1, 2, 3)}) == 1
    # singleton 9 matches the plain hash_split bit-for-bit
    blind = hash_split(df.select("doc_id"), key_col="doc_id").collect()
    blind = {r["doc_id"]: r["split"] for r in blind}
    assert out[9]["split_key"] == 9 and out[9]["split"] == blind[9]


def test_mmr_select_prefers_diversity(spark):
    """With two near-identical high-relevance items, MMR picks one of them
    first and a DIVERSE lower-relevance item second; pure relevance would
    pick the twin."""
    from rudder_server_spark.operators.similarity import mmr_select

    rows = [
        (1, [0.9, 0.1, 0.0]),      # highest rel
        (2, [0.9, 0.11, 0.0]),     # near-twin of 1 (sim ~1 -> penalized)
        (3, [0.8, -0.6, 0.0]),     # diverse: lower rel, low sim to 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_select(df, [1.0, 0.0, 0.0], m=2, lam=0.5).collect()
    assert [r["vec_id"] for r in out] == [1, 3]
    assert [r["rank"] for r in out] == [1, 2]
    # m > pool -> returns everything, still deterministic
    all3 = mmr_select(df, [1.0, 0.0, 0.0], m=10, lam=0.5).collect()
    assert len(all3) == 3


def test_chunk_documents_windows_and_edges(spark):
    from rudder_server_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "solo"),
            (3, "   "),  # whitespace-only -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: stride 3 -> starts 0,3,6,9 -> sizes 4,4,4,1
    assert [r["n_tokens"] for r in by_doc[1]] == [4, 4, 4, 1]
    assert by_doc[1][0]["chunk_text"] == "w0 w1 w2 w3"
    assert by_doc[1][1]["chunk_text"] == "w3 w4 w5 w6"  # overlap of 1
    assert by_doc[1][3]["chunk_text"] == "w9"
    assert [r["chunk_idx"] for r in by_doc[1]] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in by_doc[2]] == [1]
    assert 3 not in by_doc


def test_strip_repeated_passages_semantics(spark):
    """Lee et al. strip pass: planted cross-doc boilerplate is fully
    excised (overlapping windows merge), clean/short/empty docs pass
    through, and in-doc self-repeats alone do NOT qualify a span."""
    from rudder_server_spark.operators.dedup import strip_repeated_passages

    boil = "subscribe to our newsletter for the latest updates and offers today"
    selfrep = "x1 x2 x3 x4 x5 x6 x7 x8 " * 2  # same 8-gram twice, ONE doc
    docs = [
        (1, f"alpha bravo charlie {boil} delta echo"),
        (2, f"{boil} foxtrot golf hotel india juliet kilo"),
        (3, "unique text with no shared passages at all here ok"),
        (4, "short doc"),
        (5, ""),
        (6, selfrep.strip()),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_repeated_passages(df, n=8, min_docs=2).collect()}
    assert out[1]["clean_text"] == "alpha bravo charlie delta echo"
    assert out[2]["clean_text"] == "foxtrot golf hotel india juliet kilo"
    assert out[1]["n_removed"] == 11 and out[2]["n_removed"] == 11
    assert out[3]["n_removed"] == 0 and out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_tokens"] == 0
    # min_docs counts DISTINCT documents: a self-repeat is not boilerplate
    assert out[6]["n_removed"] == 0

    # idempotence: stripping the stripped corpus is a no-op (no span can
    # still be shared once all shared spans are gone)
    cleaned = spark.createDataFrame(
        [(k, v["clean_text"]) for k, v in out.items()], "doc_id long, text string"
    )
    again = {r["doc_id"]: r for r in strip_repeated_passages(cleaned, n=8, min_docs=2).collect()}
    assert all(r["n_removed"] == 0 for r in again.values())
    assert all(again[k]["clean_text"] == out[k]["clean_text"] for k in out)


def test_strip_contaminated_spans_semantics(spark):
    """Decontamination strip: training spans shared with the benchmark are
    excised; train-only repeats survive; benchmark docs are untouched
    input (not in the output)."""
    from rudder_server_spark.operators.dedup import strip_contaminated_spans

    leak = "the quick brown fox jumps over the lazy dog tonight"
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            (1, f"intro words {leak} outro words"),
            (2, "totally original training text with nothing leaked here ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_contaminated_spans(train, bench, n=8).collect()}
    assert set(out) == {1, 2}
    assert out[1]["clean_text"] == "intro words outro words"
    assert out[1]["n_removed"] == 10  # the full 10-token leaked passage
    assert out[2]["n_removed"] == 0


def test_activation_records_skips_and_first_origin(spark):
    # enterprise/activationrecords records_reporter.go: fail-closed skip
    # ladder, rETL-only (EqualFold), first-metered-element origin capped
    # at 256 runes, distinct fingerprints per grain
    import json

    from rudder_server_spark.operators.sketches import activation_records

    def job(jid, ws, src, dst, batch):
        params = json.dumps({"source_id": src, "destination_id": dst})
        payload = (
            json.dumps({"batch": batch}) if batch is not None else "{}"
        )
        return (jid, ws, params, payload)

    def elem(fp=None, origin=None):
        act = {}
        if fp is not None:
            act["fingerprint"] = fp
        if origin is not None:
            act["origin"] = origin
        return {"context": {"activation": act}}

    rows = [
        job(1, "", "s1", "d1", [elem("f1", "o1")]),            # missing ws
        job(2, "w", "s2", "d1", [elem("f1", "o1")]),           # non-rETL (silent)
        job(3, "w", "s3", "d1", [elem("f1", "o1")]),           # unknown src (silent)
        job(4, "w", "s1", "", [elem("f1", "o1")]),             # missing dest
        job(5, "w", "s1", "d1", None),                         # missing batch
        (6, "w", '{"source_id":"s1","destination_id":"d1"}',
         '{"batch":{"not":"array"}}'),                         # invalid batch
        job(7, "w", "s1", "d1",
            [elem(None, "oX"), elem("f1", "FIRST" + "x" * 300),
             elem("f1", None), elem("f2", "later")]),
        job(8, "w", "s1", "d1", [elem("f2", "even-later")]),
    ]
    jobs = spark.createDataFrame(
        rows,
        "job_id long, workspace_id string, parameters string, "
        "event_payload string",
    )
    cats = spark.createDataFrame(
        [("s1", "WareHouse"), ("s2", "event-stream")],
        "source_id string, category string",
    )
    records, skips = activation_records(jobs, cats)
    recs = records.collect()
    assert len(recs) == 1
    r = recs[0]
    assert (r["workspace_id"], r["source_id"], r["destination_id"]) == (
        "w", "s1", "d1"
    )
    assert r["n_fingerprints"] == 2                  # f1, f2
    assert r["origin"].startswith("FIRST") and len(r["origin"]) == 256
    got = {s["reason"]: s["n"] for s in skips.collect()}
    assert got == {
        "missing_workspace": 1,
        "missing_destination": 1,
        "missing_batch": 1,
        "invalid_batch": 1,
        "missing_fingerprint": 1,
        "missing_origin": 1,
    }


def test_syncs_rollup_rfc3339_lenient(spark):
    """ADVICE r9 #2: Go parses nextRetryTime with time.RFC3339 (upload.go:
    846), which accepts numeric offsets and fractional seconds — both
    count as usable; garbage and finished-status rows do not."""
    import pyspark.sql.functions as F

    from rudder_server_spark.operators.wh_api import syncs_rollup

    rows = [
        # (status, metadata) — all in-flight except the exported one
        ("waiting", '{"nextRetryTime":"2024-01-15T10:00:00Z"}'),
        ("waiting", '{"nextRetryTime":"2024-01-15T10:00:00+05:30"}'),
        ("waiting", '{"nextRetryTime":"2024-01-15T10:00:00.123Z"}'),
        ("waiting", '{"nextRetryTime":"2024-01-15T10:00:00.123456-07:00"}'),
        ("waiting", '{"nextRetryTime":"not a time"}'),
        ("waiting", "{}"),
        ("exported_data", '{"nextRetryTime":"2024-01-15T10:00:00Z"}'),
    ]
    df = spark.createDataFrame(
        [
            (i, "dst-0", s, "{}", m, None, None, None)
            for i, (s, m) in enumerate(rows)
        ],
        "upload_id long, destination_id string, status string, error string, "
        "metadata string, created_at timestamp, last_exec_at timestamp, "
        "updated_at timestamp",
    )
    out = syncs_rollup(
        df, F.lit("2024-01-16 00:00:00").cast("timestamp"),
        group_cols=("destination_id",),
    ).collect()
    assert len(out) == 1
    assert out[0]["n_next_retry"] == 4  # Z, +offset, fractional Z, fractional offset


def test_syncs_rollup_rfc3339_rejects_misplaced_fractions(spark):
    """ADVICE r10 #3: the fraction strip is anchored to the seconds
    position — shapes Go's time.Parse(RFC3339) rejects (fraction after
    the zone, double fractions, fraction with no zone digits after it)
    must NOT be laundered into parseable strings."""
    import pyspark.sql.functions as F

    from rudder_server_spark.operators.wh_api import syncs_rollup

    rows = [
        ("waiting", '{"nextRetryTime":"2026-01-01T00:00:00Z.5"}'),      # after zone
        ("waiting", '{"nextRetryTime":"2026-01-01T00:00:00.1.2Z"}'),    # double
        ("waiting", '{"nextRetryTime":"2026-01-01T00:00:00.5"}'),       # no zone
        ("waiting", '{"nextRetryTime":"2026-01-01T00:00.5:00Z"}'),      # in minutes
        ("waiting", '{"nextRetryTime":"2026-01-01T00:00:00.5+05:30"}'), # valid
        ("waiting", '{"nextRetryTime":"2026-01-01T00:00:00.5Z"}'),      # valid
    ]
    df = spark.createDataFrame(
        [
            (i, "dst-0", s, "{}", m, None, None, None)
            for i, (s, m) in enumerate(rows)
        ],
        "upload_id long, destination_id string, status string, error string, "
        "metadata string, created_at timestamp, last_exec_at timestamp, "
        "updated_at timestamp",
    )
    out = syncs_rollup(
        df, F.lit("2026-01-16 00:00:00").cast("timestamp"),
        group_cols=("destination_id",),
    ).collect()
    assert len(out) == 1
    assert out[0]["n_next_retry"] == 2  # only the two genuinely valid shapes
