"""BPE vocabulary training + tokenization (operators/bpe.py): golden merge
sequence, reconstruction, determinism, bounded-collect contract."""

import pytest
from pyspark.sql import functions as F

from rudder_server_spark.operators import bpe as B


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_golden_merge_sequence(spark):
    # classic subword-nmt toy corpus: low/lower/newest/widest family
    corpus = ["low low low low low", "lower lower", "newest newest newest newest newest newest", "widest widest widest"]
    merges = B.bpe_train(_docs(spark, corpus), num_merges=4)
    # 'newest' (freq 6) drives the first merges: e+s, es+t</w>, then n+e,
    # with deterministic lexicographic tie-breaks
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    assert ("l", "o") in merges or ("n", "e") in merges


def test_tokenize_reconstructs_words(spark):
    corpus = ["the quick brown fox", "the lazy dog", "quick quick"]
    df = _docs(spark, corpus)
    merges = B.bpe_train(df, num_merges=20)
    rows = {r["doc_id"]: r["tokens"] for r in B.bpe_tokenize(df, merges).collect()}
    for i, text in enumerate(corpus):
        joined = "".join(rows[i]).replace(B.END, " ").strip()
        assert joined == text.lower()


def test_more_merges_never_increase_token_count(spark):
    corpus = ["abc abc abd abd abd", "bcd bcd abc"]
    df = _docs(spark, corpus)
    m0 = B.bpe_train(df, num_merges=0)
    m5 = B.bpe_train(df, num_merges=5)
    n0 = B.bpe_tokenize(df, m0).select(F.sum(F.size("tokens"))).head()[0]
    n5 = B.bpe_tokenize(df, m5).select(F.sum(F.size("tokens"))).head()[0]
    assert n5 < n0  # merges compress


def test_determinism_across_runs(spark):
    corpus = ["aa ab aa ab ba", "ba ba aa"]
    df = _docs(spark, corpus)
    assert B.bpe_train(df, num_merges=6) == B.bpe_train(df, num_merges=6)


def test_train_rejects_unbounded_vocab(spark, monkeypatch):
    monkeypatch.setattr(B, "BPE_MAX_WORDS", 2)
    with pytest.raises(ValueError, match="max_words"):
        B.bpe_train(_docs(spark, ["one two three four five"]), num_merges=2)


def test_word_counts_matches_sql(spark):
    # the distributed reduce is the one corpus-scale step — cross-check it
    corpus = ["Hello, hello world", "world world!"]
    df = _docs(spark, corpus)
    got = {r["word"]: r["n"] for r in B.word_counts(df).collect()}
    assert got == {"hello": 2, ",": 1, "world": 3, "!": 1}
