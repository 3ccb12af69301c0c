"""DSIR importance resampling (operators/dsir.py): feature counts,
log-ratio direction, weight ordering, Gumbel determinism."""

from pyspark.sql import functions as F

from rudder_server_spark.operators import dsir as D


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_ngram_buckets_count_with_multiplicity(spark):
    # "a b a b" has bigrams: (a b), (b a), (a b) — multiplicity preserved
    feats = D.ngram_buckets(_docs(spark, ["a b a b"]), n_buckets=64).collect()
    assert sum(r["cnt"] for r in feats) == 3
    # two distinct bigrams -> at most 2 buckets (collision possible but
    # with 64 buckets and 2 keys overwhelmingly 2)
    assert len(feats) <= 2


def test_target_like_docs_weigh_higher(spark):
    target = _docs(spark, ["the cat sat on the mat", "the cat ran"], start_id=100)
    raw = _docs(
        spark,
        ["the cat sat on the mat today",  # target-like
         "zx qv zx qv zx qv zx qv"],      # alien bigrams
    )
    raw_feats = D.ngram_buckets(raw, n_buckets=512)
    lr = D.fit_log_ratio(D.ngram_buckets(target, n_buckets=512), raw_feats, 512)
    w = {r["doc_id"]: r["weight"] for r in D.importance_weights(raw_feats, lr).collect()}
    assert w[0] > w[1]


def test_temperature_zero_is_plain_topk(spark):
    weights = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 1.0)], "doc_id long, weight double"
    )
    got = [r["doc_id"] for r in D.gumbel_topk(weights, 2, temperature=0.0).collect()]
    assert got == [2, 1]


def test_gumbel_selection_is_seed_deterministic(spark):
    weights = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "doc_id long, weight double"
    )
    a = [r["doc_id"] for r in D.gumbel_topk(weights, 10, seed=3).collect()]
    b = [r["doc_id"] for r in D.gumbel_topk(weights, 10, seed=3).collect()]
    c = [r["doc_id"] for r in D.gumbel_topk(weights, 10, seed=4).collect()]
    assert a == b
    assert a != c  # a different seed reshuffles the near-ties


def test_end_to_end_prefers_target_domain(spark):
    target = _docs(spark, ["alpha beta gamma delta"] * 3, start_id=1000)
    raw = _docs(
        spark,
        ["alpha beta gamma delta epsilon"] * 5  # target-like, ids 0-4
        + ["zz yy xx ww vv uu"] * 5,            # alien, ids 5-9
    )
    sel = {r["doc_id"] for r in D.dsir_select(raw, target, k=5, n_buckets=512, temperature=0.0).collect()}
    assert sel == {0, 1, 2, 3, 4}
