"""Byte-pair-encoding vocabulary training + tokenization over a corpus.

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units", ACL) learns a subword vocabulary by repeatedly merging
the most frequent adjacent symbol pair. The naive formulation re-scans
the corpus once per merge — 30k merges × 100 TB is a non-starter — so
this uses the standard production decomposition (what HF ``tokenizers``
and the original subword-nmt do):

1. **word-count reduce** (distributed, ONE shuffle): the corpus collapses
   to a (word, count) table. Natural-language vocabulary grows ~ O(corpus
   ^0.5) (Heaps' law), and a ``max_words`` cap + raise keeps the next
   step bounded by construction, not by luck.
2. **merge learning** (driver, bounded): classic pair-count/merge loop
   over the word-frequency dict — state is O(distinct words), zero
   corpus scans regardless of merge count. Deterministic: ties break on
   the lexicographically smallest pair, so two runs (or two engines)
   produce identical merge tables.
3. **tokenize** (distributed, narrow): the learned merge ranks broadcast
   to an Arrow ``mapInPandas`` pass that applies merges per word with a
   word-level memo — no shuffle, pipeline-fused with the scan.

Each merged symbol is the concatenation of its parts, and a word-end
marker ``</w>`` distinguishes suffix from interior occurrences (the
original subword-nmt convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
import pyspark.sql.types as T

END = "</w>"

# step-2 state must be bounded by construction: word-count rows collected
# to the driver are capped, with an explicit raise over the cap
BPE_MAX_WORDS = 1_000_000

# the same word splitter the token-count battery uses (text.py): words,
# numbers, or single non-space symbols
WORD_SPLIT = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the corpus' single distributed reduce. Lowercased,
    regex-split; one shuffle on the word, map-side combined."""
    # Column-form pattern (F.lit) — an inline SQL literal would eat the
    # \s escape during SQL string parsing
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_SPLIT), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from the corpus word counts.

    Returns the ordered merge list [(left, right), ...] — rank = index.
    Deterministic: highest pair count first, ties to the smallest pair.
    """
    if max_words is None:
        max_words = BPE_MAX_WORDS  # read at call time so tests/deployments can tune it
    rows = word_counts(df, text_col).limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"bpe_train vocabulary exceeds max_words={max_words} distinct "
            "words; raise consciously or pre-normalize the corpus"
        )
    # word -> (symbol tuple, count); symbols start as characters + </w>
    vocab: dict[tuple, int] = {}
    for r in rows:
        syms = tuple(r["word"][:-1]) + (r["word"][-1] + END,)
        vocab[syms] = vocab.get(syms, 0) + r["n"]

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple, int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # deterministic tie-break: max count, then lexicographically
        # smallest pair
        top = max(pair_counts.values())
        best = min(p for p, n in pair_counts.items() if n == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>) — apply the merge table distributed.

    One Arrow pass; merge ranks ship in the closure (broadcast-by-value,
    O(num_merges) bytes) and a per-batch word memo makes the cost
    O(distinct words per batch), not O(tokens).
    """
    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    _id, _text = id_col, text_col

    def fn(batches):
        import re

        import pandas as pd

        word_re = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
        memo: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w[:-1]) + [w[-1] + END]
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            memo[w] = syms
            return syms

        for pdf in batches:
            toks = []
            for text in pdf[_text]:
                out: list[str] = []
                for w in word_re.findall((text or "").lower()):
                    out.extend(encode_word(w))
                toks.append(out)
            yield pd.DataFrame({_id: pdf[_id], "tokens": toks})

    return df.select(_id, _text).mapInPandas(fn, out_schema)


def subword_stats(tokenized: DataFrame) -> DataFrame:
    """(token, n) subword frequency profile over the tokenized corpus —
    the vocabulary-coverage audit a tokenizer rollout runs. One shuffle
    on the (bounded) subword vocabulary."""
    return (
        tokenized.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
