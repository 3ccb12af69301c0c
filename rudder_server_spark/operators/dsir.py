"""DSIR-style data selection: hashed n-gram importance resampling.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", NeurIPS) selects pretraining documents that look like a
target domain: featurize every document as hashed n-gram bucket counts,
fit bag-of-ngrams distributions for the target sample and the raw corpus,
weight each raw document by its log importance ratio, and sample by
weight (Gumbel top-k).

Spark-first decomposition — every corpus-scale step is one shuffle or
narrow, the model state is B floats:

- **featurize**: explode word bigrams → bucket = murmur-style hash mod B
  (``F.hash``: deterministic, seedable, JVM-codegen) → per-doc bucket
  counts. One shuffle on (doc, bucket).
- **fit**: the target/raw bucket distributions are two B-row aggregates
  (B ~ 10k buckets; add-one smoothed). Bounded by construction —
  broadcast back as a B-row log-ratio table.
- **weight**: per-doc log importance = Σ_b n_doc[b] · (log p_target[b] −
  log p_raw[b]) — a broadcast join + one sum per doc, fully JVM-side.
- **select**: Gumbel top-k — weight + Gumbel(0,1) noise from a seeded
  per-doc md5 ticket (deterministic, layout-invariant like sampling.py's
  md5 tickets) — equivalent to sampling-without-replacement proportional
  to softmax weight; ``temperature=0`` degrades to plain top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

DEFAULT_BUCKETS = 8192


def ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket, cnt) hashed word-bigram counts — the DSIR feature map.

    Bigrams come from the same zero-width-lookahead regex the shingle
    tiers use (dedup.shingles) — higher-order array functions evaluate
    interpreted, the regex stays in whole-stage codegen — but WITH
    multiplicity (DSIR features count occurrences, not the distinct set).
    """
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " "),
        r"\s+",
        " ",
    )
    bigrams = F.regexp_extract_all(norm, F.lit(r"(?=\b([^ ]+ [^ ]+))"), 1)
    return (
        df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .select(
            id_col,
            (F.pmod(F.hash("bigram"), F.lit(n_buckets))).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """B-row (bucket, log_ratio) table: add-one-smoothed log p_target −
    log p_raw. Two bounded aggregates; the result broadcasts."""
    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tn"))
    r = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rn"))
    joined = (
        t.join(r, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("tn", F.lit(0)).alias("tn"),
            F.coalesce("rn", F.lit(0)).alias("rn"),
        )
    )
    tot = joined.agg(
        F.sum("tn").alias("T"), F.sum("rn").alias("R")
    ).head()
    T, R = (tot["T"] or 0) + n_buckets, (tot["R"] or 0) + n_buckets
    return joined.select(
        "bucket",
        (
            F.log((F.col("tn") + 1) / F.lit(float(T)))
            - F.log((F.col("rn") + 1) / F.lit(float(R)))
        ).alias("log_ratio"),
    )


def importance_weights(
    raw_feats: DataFrame,
    log_ratio: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, weight): Σ n_doc[b] · log_ratio[b] — broadcast join + one
    per-doc sum (reuses the feature map's (doc, bucket) partitioning)."""
    return (
        raw_feats.join(F.broadcast(log_ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("weight"))
    )


def gumbel_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Select k docs by weight + temperature·Gumbel noise (seeded md5
    ticket → uniform → Gumbel), the without-replacement sampler DSIR
    uses; temperature=0 is deterministic top-k."""
    if temperature > 0:
        u = (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))), 1, 13),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**13))
        )
        # clamp away from 0/1 so the double log is finite
        u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        key = F.col("weight") + F.lit(temperature) * (-F.log(-F.log(u)))
    else:
        key = F.col("weight")
    return (
        weights.select(id_col, "weight", key.alias("sel_key"))
        .orderBy(F.desc("sel_key"), id_col)
        .limit(k)
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """End-to-end: featurize both sides, fit the log-ratio table, weight
    the raw corpus, Gumbel-top-k select. Returns (id, weight, sel_key)."""
    raw_feats = ngram_buckets(raw, id_col, text_col, n_buckets)
    target_feats = ngram_buckets(target, id_col, text_col, n_buckets)
    lr = fit_log_ratio(target_feats, raw_feats, n_buckets)
    w = importance_weights(raw_feats, lr, id_col)
    return gumbel_topk(w, k, id_col, temperature, seed)
