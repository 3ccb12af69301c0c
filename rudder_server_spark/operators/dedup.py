"""Deduplication operators for a training-data pipeline.

Four tiers, in increasing scale-friendliness:

  exact_dedup        hash-groupBy on a normalization key — one shuffle.
  ngram_jaccard      exact pairwise similarity via shingle join — the
                     correctness oracle; O(pairs sharing a shingle), only
                     viable at small N or after LSH candidate pruning.
  minhash_lsh        MinHash signatures + banded LSH: shingle → xxhash64
                     minima → band buckets → bucket join. The 100 TB path:
                     candidate generation is a single equi-join on
                     (band, bucket-hash), linear in corpus size.
  simhash            64-bit SimHash + hamming-distance banding.

Embedding-cosine near-dup lives in operators/similarity.py.

All shingling/hashing is built-in (split/transform/xxhash64) — JVM-side,
no Python UDFs. Determinism: xxhash64 is a fixed published function; the
verification step recomputes EXACT jaccard on candidates, so the final
output of minhash_lsh_dedup equals the exact-pairs result whenever LSH
recall covers the threshold (identical docs always collide; J≥0.8 pairs
are missed with prob (1-J^4)^16 ≈ 2e-4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_text(text: Column) -> Column:
    """SURVEY Q28 normalization: strip non-[a-z0-9 ] then lower."""
    return F.lower(F.regexp_replace(text, "[^a-z0-9 ]", ""))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per normalized-text group. One shuffle on the
    normalization key (at scale: on md5(key) to keep shuffle rows narrow)."""
    key = F.md5(normalize_text(F.col(text_col))).alias("_k")
    w_min = df.select(F.col(id_col), key).groupBy("_k").agg(F.min(id_col).alias("_keep"))
    return (
        df.select("*", key)
        .join(w_min, "_k")
        .where(F.col(id_col) == F.col("_keep"))
        .drop("_k", "_keep")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the whitespace-tokenized lowercase text."""
    toks = F.split(F.lower(text), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]))
    )


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    return df.select(F.col(id_col).alias("sid"), F.explode(shingles(F.col(text_col), n)).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exact pairs (a < b) with shingle-set Jaccard ≥ threshold.

    Plan: explode shingles → self-equi-join on shingle → count intersection
    → join sizes → filter. Every step is a shuffle on either shingle or doc
    id; no cross join. Hot shingles (stopword runs) are the skew risk at
    scale — AQE skew-join handles moderate skew; beyond that, drop shingles
    with document-frequency above a cap (standard trick) before the join.
    """
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy("sid").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("sid").alias("a"), "sh")
    b = sh.select(F.col("sid").alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("sid").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("sid").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("union_sz", F.col("sza") + F.col("szb") - F.col("inter"))
        .where(F.col("inter").cast("double") / F.col("union_sz") >= threshold)
        .select(
            "a",
            "b",
            (F.col("inter").cast("double") / F.col("union_sz")).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame, num_hashes: int = 64, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """num_hashes MinHash values per doc: min over shingles of xxhash64(shingle, seed)."""
    sh = shingles(F.col(text_col), n)
    sig = F.array(
        *[F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i)))) for i in range(num_hashes)]
    )
    return df.select(F.col(id_col).alias("sid"), sig.alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs (a<b).

    One explode (doc × bands) + one equi-join on (band, bucket hash).
    """
    banded = sigs.select(
        "sid",
        F.posexplode(
            F.array(*[F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows).cast("string")) for b in range(bands)])
        ).alias("band", "bucket"),
    )
    l = banded.select(F.col("sid").alias("a"), "band", "bucket")
    r = banded.select(F.col("sid").alias("b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, id_col, text_col, n).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(sigs, bands, rows)
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy("sid").agg(F.count("*").alias("sz"))
    # verify only candidate pairs: semi-restrict the shingle join
    a = sh.select(F.col("sid").alias("a"), "sh")
    b = sh.select(F.col("sid").alias("b"), "sh")
    inter = (
        cand.join(a, "a")
        .join(b.withColumnRenamed("sh", "shb"), "b")
        .where(F.col("sh") == F.col("shb"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("sid").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("sid").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("union_sz", F.col("sza") + F.col("szb") - F.col("inter"))
        .where(F.col("inter").cast("double") / F.col("union_sz") >= threshold)
        .select("a", "b", (F.col("inter").cast("double") / F.col("union_sz")).alias("jaccard"))
    )


def simhash64(text: Column, n: int = 3) -> Column:
    """63-bit SimHash over shingle xxhash64 values (top bit left 0 so the
    fingerprint stays a non-negative long).

    bit j of the fingerprint = majority vote of bit j across shingle hashes.
    Built from bitwise built-ins only (shiftright/bitwise AND) — codegen'd.
    """
    hashes = F.transform(shingles(text, n), lambda s: F.xxhash64(s))
    out = F.lit(0).cast("long")
    for j in range(63):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit = F.when(votes > 0, F.lit(1)).otherwise(F.lit(0))
        out = out + bit.cast("long") * F.lit(2**j).cast("long")
    return out


def simhash_pairs(df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 × 16-bit bands;
    any pair within hamming ≤ 3 shares at least one identical band
    (pigeonhole) → equi-join per band, then exact popcount verify.
    """
    fp = df.select(F.col(id_col).alias("sid"), simhash64(F.col(text_col)).alias("fp"))
    banded = fp.select(
        "sid",
        "fp",
        F.posexplode(
            F.array(*[F.shiftright(F.col("fp"), b * 16).bitwiseAND(F.lit(0xFFFF)) for b in range(4)])
        ).alias("band", "key"),
    )
    l = banded.select(F.col("sid").alias("a"), F.col("fp").alias("fpa"), "band", "key")
    r = banded.select(F.col("sid").alias("b"), F.col("fp").alias("fpb"), "band", "key")
    cand = l.join(r, ["band", "key"]).where(F.col("a") < F.col("b")).select("a", "b", "fpa", "fpb").distinct()
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fpa").bitwiseXOR(F.col("fpb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
