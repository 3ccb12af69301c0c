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
    """Distinct n-word shingles of the whitespace-tokenized lowercase text.

    Implemented as a zero-width-lookahead regex extraction over the
    space-normalized text rather than transform/element_at over a token
    array: higher-order functions evaluate interpreted (outside whole-stage
    codegen) and benched 3.5× slower; the regex stays JVM-codegen'd and
    produces byte-identical shingles.
    """
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    pat = r"(?=\b(" + " ".join(["[^ ]+"] * n) + r"))"
    return F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    return df.select(F.col(id_col).alias("sid"), F.explode(shingles(F.col(text_col), n)).alias("sh"))


def _shingle_base(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(sid, shs array<string>, sz) — one row per doc, pre-explode.

    The compact form both Jaccard tiers build on: the per-doc set SIZE is
    the array length (a codegen'd narrow map), so no O(shingle-rows)
    groupBy shuffle ever runs just to count set sizes — at corpus scale
    that aggregation is a full extra pass over the exploded table. The
    64-bit hashing happens at explode time (_exploded), keeping xxhash64
    inside whole-stage codegen (F.transform over the array would evaluate
    it interpreted — see the module docstring on higher-order functions).
    Checkpointed lazily: one row per doc, materialized inside the first
    consuming action and shared by every downstream subtree.
    """
    arr = shingles(F.col(text_col), n)
    return (
        df.select(F.col(id_col).alias("sid"), arr.alias("shs"))
        .withColumn("sz", F.size("shs"))
        .localCheckpoint(eager=False)
    )


def _exploded(base: DataFrame) -> DataFrame:
    """(sid, sh long) — the shingle table, hashed to 8-byte join keys."""
    return base.select("sid", F.explode("shs").alias("_s")).select(
        "sid", F.xxhash64("_s").alias("sh")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact pairs (a < b) with shingle-set Jaccard ≥ threshold.

    Plan: explode shingles → self-equi-join on shingle → count intersection
    → join sizes → filter. Every step is a shuffle on either shingle or doc
    id; no cross join. Hot shingles (stopword runs) are the skew risk at
    scale — AQE skew-join handles moderate skew; beyond that, set
    ``max_doc_freq``: shingles appearing in more of the corpus than that are
    dropped BEFORE the self-join (the standard stop-shingle cap). A shingle
    in d docs contributes d² join rows, so the cap turns the worst-case
    quadratic blowup into d ≤ cap. Jaccard is then computed over the
    REDUCED universe — set sizes also count only surviving shingles — so
    identical documents still score 1.0 and the similarity is exact w.r.t.
    the stop-shingle-free vocabulary (the same universe both sides of a
    pair see). Exactness over the full vocabulary requires
    max_doc_freq=None, the default and what the t2 oracle tier uses.

    Shingles are 64-bit-hashed before the join: the shuffle and the
    checkpoint carry 8-byte keys instead of ~n-word strings (the dominant
    byte volume at corpus scale). A hash collision merges two shingles
    across the whole corpus — probability ~ distinct_shingles²/2⁶⁵,
    negligible against the threshold test even at 100 TB.
    """
    # lazy checkpoint of the compact per-doc form: materializes inside the
    # first action, blocks shared by the consumers; set sizes are array
    # lengths (narrow map), not an exploded-table aggregation
    base = _shingle_base(df, id_col, text_col, n)
    sh = _exploded(base)
    sizes = base.select("sid", "sz")
    if max_doc_freq is not None:
        # one extra agg on the shingle key (same partitioning the join needs
        # anyway); the semi-join keeps only sub-cap shingles, and sizes are
        # recomputed over the reduced universe so both ends of a pair agree
        keep = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(keep, "sh", "left_semi").localCheckpoint(eager=False)
        sizes = sh.groupBy("sid").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("sid").alias("a"), "sh")
    # MERGE hint: the exploded shingle table is corpus-sized, so it must
    # never be a broadcast build side — under the session's 64 MB auto
    # threshold Catalyst happily collects the whole exploded relation to
    # the driver and rebuilds it as a hash relation per-core (the r11
    # measurement: broadcast 1.92 s vs sort-merge 1.20 s warm at sf0.1,
    # and at 100 TB the collect is simply impossible). Sort-merge keeps
    # both sides co-partitioned on the 8-byte shingle key and spills
    # gracefully under hot-shingle skew (AQE skew-split still applies).
    b = sh.select(F.col("sid").alias("b"), "sh").hint("MERGE")
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
    df: DataFrame | None = None,
    num_hashes: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """num_hashes MinHash values per doc: min over shingles of
    xxhash64(shingle, i).

    Shape: explode shingles once, compute all num_hashes hashes as plain
    codegen'd columns, take num_hashes `min` aggregates per doc. Array-fold
    formulations (aggregate/zip_with/transform) evaluate interpreted —
    higher-order functions sit outside whole-stage codegen — and benched an
    order of magnitude slower. The wide partial agg combines map-side, so
    the shuffle carries one num_hashes-wide row per doc per partition.

    Pass ``shingle_df`` (sid, sh) to reuse an existing shingle table — the
    shingle values may be strings or already-64-bit-hashed longs; both feed
    xxhash64(sh, i) as a valid min-wise hash family.
    """
    sh = shingle_df if shingle_df is not None else shingle_table(df, id_col, text_col, n)
    mins = sh.groupBy("sid").agg(
        *[F.min(F.xxhash64("sh", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "sid", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )


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
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold.

    ONE shingle table feeds both the signatures and the verification tier
    (hashed to 8-byte keys — see ngram_jaccard_pairs on collisions), and all
    checkpoints are lazy: everything materializes once inside the single
    final job instead of spending a scheduled job per eager checkpoint.
    """
    rows = num_hashes // bands
    base = _shingle_base(df, id_col, text_col, n)
    sh = _exploded(base)
    sigs = minhash_signatures(num_hashes=num_hashes, shingle_df=sh).localCheckpoint(eager=False)
    cand = minhash_lsh_candidates(sigs, bands, rows)
    sizes = base.select("sid", "sz")
    # verify only candidate pairs: attach a's shingles, then equi-join on
    # BOTH (b, sh) — joining on b alone would cross a's shingles with all of
    # b's before filtering (quadratic per pair)
    a = sh.select(F.col("sid").alias("a"), "sh")
    b = sh.select(F.col("sid").alias("b"), "sh")
    inter = (
        cand.join(a, "a")
        .join(b, ["b", "sh"])
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


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW ingest batch against an EXISTING corpus snapshot, then
    within itself: keep the min-id batch row per normalized-text group whose
    content does not already appear in the corpus.

    This is the cross-snapshot dedup every recurring crawl/ingest pipeline
    runs (new dump vs. everything already kept) — distinct from exact_dedup,
    which dedups one corpus against itself.

    Shape at scale: the corpus side reduces to a single 16-byte fingerprint
    column (at 100 TB: a precomputed, bucketed fingerprint index — appending
    each accepted batch's keys keeps it incremental, so the corpus text is
    never rescanned). Within-batch dedup runs first, shrinking the anti-join
    left side to unique keys; the anti-join shuffles only fingerprints, and
    when the batch is far smaller than the index (the common case) AQE plans
    it as a broadcast/bloom-pruned probe rather than a full index shuffle.
    """
    key = F.md5(normalize_text(F.col(text_col)))
    seen = corpus.select(key.alias("_k")).distinct()
    b = batch.select("*", key.alias("_k"))
    keep = b.groupBy("_k").agg(F.min(id_col).alias("_keep"))
    return (
        b.join(keep, "_k")
        .where(F.col(id_col) == F.col("_keep"))
        .join(seen, "_k", "left_anti")
        .drop("_k", "_keep")
    )


def contamination_counts(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: for each training document, the
    number of distinct word n-grams it shares with ANY document of the
    held-out/eval corpus, and how many eval documents it collides with.

    This is the standard n-gram-collision decontamination pass run before
    training (cf. GPT-3 appendix C / PaLM app. D: 13-gram overlap against
    benchmark sets; n is configurable — the fixtures' short synthetic docs
    use n=5).

    Shape at scale: distinct n-grams per side (one explode each), one
    equi-join on the gram, one count-distinct agg keyed by train doc. The
    eval side (benchmark suites) is tiny in practice → Catalyst broadcasts
    it; hot grams on the train side never skew the join because the
    broadcast avoids a shuffle entirely. For eval corpora too big to
    broadcast, hash grams to 8-byte keys (xxhash64) exactly as
    ngram_jaccard_pairs does.
    """
    tr = train.select(
        F.col(id_col).alias("train_doc"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    )
    ev = eval_set.select(
        F.col(id_col).alias("eval_doc"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    )
    return (
        tr.join(ev, "g")
        .groupBy("train_doc")
        .agg(
            F.countDistinct("g").alias("shared_ngrams"),
            F.countDistinct("eval_doc").alias("eval_docs_hit"),
        )
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """63-bit SimHash per doc (top bit left 0 so the fingerprint stays a
    non-negative long): bit j = majority vote of bit j across shingle
    xxhash64 values.

    Same explode+wide-agg shape as minhash_signatures (codegen'd sums, one
    map-side-combined shuffle) instead of an interpreted array fold.
    """
    sh = shingle_table(df, id_col, text_col, n)
    h = F.xxhash64("sh")
    votes = sh.groupBy("sid").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{j}")
            for j in range(63)
        ]
    )
    fp = None
    for j in range(63):
        term = F.when(F.col(f"_v{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return votes.select("sid", fp.alias("fp"))


def simhash_pairs(df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 × 16-bit bands;
    any pair within hamming ≤ 3 shares at least one identical band
    (pigeonhole) → equi-join per band, then exact popcount verify.
    """
    fp = simhash_fingerprints(df, id_col, text_col)
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


def canonical_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefer: list | None = None,
) -> DataFrame:
    """Keep-BEST exact dedup: within each normalized-content group keep the
    copy that wins the ``prefer`` ordering (default: longest text, then min
    id), and annotate it with the group size.

    ``exact_dedup`` keeps the min-id copy; real curation pipelines keep the
    highest-quality copy — the longest version of a page, the one with the
    best quality score — because near-identical crawls truncate or pad the
    same content differently. Same scale shape as exact_dedup: ONE shuffle
    on the md5 content key; the row_number and the group-size count share
    the same window partitioning, so the annotation is free.
    """
    prefer = prefer or [F.length(F.col(text_col)).desc(), F.col(id_col).asc()]
    from pyspark.sql import Window as W

    key = F.md5(normalize_text(F.col(text_col)))
    win = W.partitionBy("_k")
    return (
        df.withColumn("_k", key)
        .withColumn("_rn", F.row_number().over(win.orderBy(*prefer)))
        .withColumn("group_size", F.count("*").over(win))
        .where(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )


def ngram_containment_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact DIRECTED pairs (a, b, a != b) where containment
    C(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ threshold —
    the ASYMMETRIC near-dup relation Jaccard misses: a short document
    quoted inside a long one scores C≈1 from the short side while the
    pair's Jaccard stays tiny (Lee et al. 2021 use both; containment
    catches subset/quotation duplication).

    Same plan skeleton as ngram_jaccard_pairs (shingle self-join, one
    intersection count per pair) but normalized by the SOURCE side's set
    size only, and emitted in both directions. Rounded to 6 decimals so
    the division is portable across engines.
    """
    base = _shingle_base(df, id_col, text_col, n)
    sh = _exploded(base)
    sizes = base.select("sid", "sz")
    a = sh.select(F.col("sid").alias("a"), "sh")
    # MERGE: same corpus-sized-build-side argument as ngram_jaccard_pairs
    b = sh.select(F.col("sid").alias("b"), "sh").hint("MERGE")
    inter = (
        a.join(b, "sh")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("sid").alias("a"), F.col("sz").alias("sza")), "a")
        .withColumn(
            "containment",
            F.round(F.col("inter").cast("double") / F.col("sza"), 6),
        )
        .where(F.col("containment") >= threshold)
        .select("a", "b", "containment")
    )


def repeated_passages(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-passage mining — the substring-level dedup signal of
    Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better" (arXiv:2107.06499): an ``n``-token span is *repeated* when it
    occurs in at least ``min_docs`` distinct documents. Per document:
    (n_windows raw spans, n_distinct distinct spans, n_repeated distinct
    spans shared with other docs) — the stats a strip-repeated-passages
    pass keys on, and the doc-level signal for "this page is boilerplate".

    Scale shape: spans come from the same zero-width-lookahead regex as
    the shingle tiers (codegen'd, no interpreted HOF), deduped per doc
    BEFORE the explode (array_distinct), then hashed to 8-byte xxhash64
    keys so the document-frequency aggregate shuffles longs, not strings.
    Two shuffles total (span-freq, per-doc rollup), both linear in corpus
    span count; min_docs bounds nothing here (stats, not pairs) so there
    is no quadratic tier at all. The span-frequency side is the classic
    skewed aggregate — partial map-side combine absorbs hot boilerplate
    spans before the exchange.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = df.select(
        F.col(id_col).alias("sid"),
        F.array_distinct(
            F.regexp_extract_all(
                norm,
                F.lit(r"(?=\b(" + " ".join(["[^ ]+"] * n) + r"))"),
                1,
            )
        ).alias("shs"),
        F.greatest(
            F.size(F.split(F.trim(norm), " ")) - F.lit(n - 1), F.lit(0)
        ).alias("n_windows"),
    ).localCheckpoint(eager=False)
    ex = base.select("sid", F.explode("shs").alias("_s")).select(
        "sid", F.xxhash64("_s").alias("sh")
    )
    rep = (
        ex.groupBy("sh")
        .agg(F.count("*").alias("_nd"))  # (sid, sh) unique by construction
        .where(F.col("_nd") >= min_docs)
        .select("sh")
    )
    per_doc = ex.join(rep, "sh").groupBy("sid").agg(
        F.count("*").alias("n_repeated")
    )
    return (
        base.join(per_doc, "sid", "left")
        .select(
            F.col("sid").alias(id_col),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.size("shs").cast("long").alias("n_distinct"),
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
        )
        .orderBy(id_col)
    )


def dup_clusters(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    keep_col: str = "n_chars",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Duplicate-family resolution: near-dup pairs → connected components →
    canonical election. The step after pair generation in every production
    dedup pipeline — pairwise hits must become FAMILIES (A~B, B~C ⇒
    {A,B,C} even when A and C never paired) before exactly one member can
    be kept.

    Returns one row per document that belongs to a ≥2-doc family:
    (id_col, cluster_id = min doc id in the family, cluster_size,
    is_canonical). Canonical = largest ``keep_col`` (ties → smallest id),
    the usual keep-the-longest policy.

    Scale shape: the edge set is already threshold-filtered, so it is far
    smaller than the corpus; components run on operators/identity.py's
    pointer-jumping min-label propagation (O(log diameter) rounds, each one
    equi-join — the small-graph path collapses to a driver union-find
    automatically). Node ids travel as native longs (connected_components
    is id-type-generic, so the numeric min IS the cluster id — no padded-
    string encoding, and negative ids order correctly); election + size
    are one shuffle on cluster_id. The skew risk is a boilerplate
    mega-cluster making one window partition hot — bounded because
    election needs only rank-1, so AQE skew-split plus the two-pass rank
    (operators/ranking.py) is the fallback; at the tested shape the plain
    window wins.

    Supply ``pairs`` to cluster candidates from another tier (MinHash-LSH,
    SimHash, embedding near-dup) — any (a, b) long-id frame works.
    """
    from rudder_server_spark.operators.identity import connected_components
    from pyspark.sql import Window

    if pairs is None:
        pairs = ngram_jaccard_pairs(df, threshold, id_col=id_col, text_col=text_col, n=n)
    edges = pairs.select(
        F.col("a").cast("bigint").alias("src"),
        F.col("b").cast("bigint").alias("dst"),
    )
    comp = connected_components(edges)
    members = comp.select(
        F.col("identifier").alias(id_col),
        F.col("component").alias("cluster_id"),
    )
    ranked = members.join(df.select(id_col, keep_col), id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(keep_col).desc(), F.col(id_col)
    )
    wc = Window.partitionBy("cluster_id")
    return (
        ranked.withColumn("cluster_size", F.count("*").over(wc).cast("long"))
        .withColumn("is_canonical", F.row_number().over(w) == F.lit(1))
        .select(id_col, "cluster_id", "cluster_size", "is_canonical")
        .orderBy("cluster_id", id_col)
    )


def cluster_safe_split(
    df: DataFrame,
    threshold: float = 0.8,
    splits: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: near-duplicate FAMILIES are
    split as a unit, so a document can never sit in train while its
    near-copy sits in test (the contamination mode a plain per-doc hash
    split cannot prevent — t15's split is stable but family-blind).

    Each doc's split key is its family's cluster id (min doc id in the
    connected component) when it belongs to one, else its own id; the key
    then goes through the same md5-nibble bucketing as hash_split, so
    singleton assignments are IDENTICAL to the family-blind split and
    only family members move (onto their canonical member's bucket).
    Returns (id_col, split_key, split).

    Cost on top of the pair tier: the family frame is one row per
    clustered doc — a left join against the corpus on its primary key,
    then a narrow codegen'd map. Nothing else shuffles.
    """
    from rudder_server_spark.operators.text import hash_split

    fams = dup_clusters(
        df, threshold, id_col=id_col, text_col=text_col, n=n, pairs=pairs
    )
    keyed = (
        df.select(id_col)
        .join(fams.select(id_col, "cluster_id"), id_col, "left")
        .withColumn(
            "split_key", F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("long")
        )
    )
    return (
        hash_split(keyed, key_col="split_key", splits=splits)
        .select(id_col, "split_key", "split")
        .orderBy(id_col)
    )


def ngram_novelty(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Marginal-content scoring: per document, the fraction of its DISTINCT
    n-word shingles whose FIRST corpus occurrence (minimum ``id_col``) is
    this document.

    Boilerplate-heavy documents (every shingle already seen in an earlier
    doc) score ~0; genuinely new content scores ~1 — the n-gram-level twin
    of dup_spans' row-level attribution, and the signal curriculum/
    dedup-threshold tuning reads before deleting anything.

    Returns (id, n_shingles, n_novel, novelty). Scale shape: two linear
    keyed shuffles — first-occurrence attribution is a map-side-combining
    min per shingle, the join back is on the same key, and the per-doc
    rollup is keyed by id. Raw shingle strings are joined (not xxhash64)
    so the numbers are exactly reproducible by the SQL oracle; at corpus
    scale swap the join key for the hashed form if shingle strings
    dominate the shuffle (collision odds are the same argument minhash
    already accepts).
    """
    ex = shingle_table(df, id_col, text_col, n)
    first = ex.groupBy("sh").agg(F.min("sid").alias("_first_sid"))
    per_doc = (
        ex.join(first, "sh")
        .groupBy("sid")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count_if(F.col("sid") == F.col("_first_sid")).alias("n_novel"),
        )
    )
    return per_doc.select(
        F.col("sid").alias(id_col),
        "n_shingles",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


def _span_hashes(base: DataFrame, n: int) -> DataFrame:
    """(sid, s, h): the xxhash64 of every n-token span of each document's
    ``tk`` token array, via posexplode + (n-1) lead() windows. The prior
    shape — ``transform(sequence(...), s -> xxhash64(concat_ws(slice)))``
    — ran the slice+concat+hash INTERPRETED per span (higher-order
    lambdas never codegen); exploding tokens first keeps the gram concat
    and hash in compiled projections, at the cost of one shuffle of the
    (sid, pos, token) relation — linear in corpus tokens, the same scale
    class as the span explode both strips already paid."""
    from pyspark.sql.window import Window

    toks = base.select("sid", F.posexplode("tk").alias("s", "_t0"))
    w = Window.partitionBy("sid").orderBy("s")
    parts = [F.col("_t0")] + [F.lead("_t0", i).over(w) for i in range(1, n)]
    last = F.lead("_t0", n - 1).over(w)
    return (
        toks.select("sid", "s", F.concat_ws(" ", *parts).alias("_g"), last.alias("_l"))
        .where(F.col("_l").isNotNull())
        .select("sid", "s", F.xxhash64("_g").alias("h"))
    )


def strip_repeated_passages(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-passage REMOVAL — the strip pass of Lee et al. 2021
    (arXiv:2107.06499 §4: delete every n-token span occurring in ≥
    ``min_docs`` distinct documents), completing t51's mining stats with
    the cleaning operator a training pipeline actually runs.

    Returns (id_col, clean_text, n_tokens, n_removed): the NORMALIZED
    (lowercased, whitespace-collapsed) text with every covered token
    excised — overlapping repeated spans merge naturally because removal
    is by covered token POSITION, not by span string.

    Scale shape: span hashes come from :func:`_span_hashes` (posexplode +
    lead windows — compiled projections, no interpreted lambda); the
    corpus-wide span-frequency aggregate shuffles 8-byte xxhash64 keys
    with map-side combine absorbing hot boilerplate; the join-back carries only
    REPEATED (doc, start) pairs, so the per-doc coverage flatten is
    bounded by repeated-span count × n, and the rebuild (array_except of
    index sequences + element_at) is linear per document. Two shuffles
    total, both linear in corpus span count — removal never materializes
    doc pairs. In-doc self-repeats do NOT qualify a span (frequency
    counts DISTINCT documents, matching the paper's between-doc dedup),
    but once a span qualifies, EVERY occurrence in every doc is excised.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = df.select(
        F.col(id_col).alias("sid"),
        F.when(norm == "", F.array().cast("array<string>"))
        .otherwise(F.split(norm, " "))
        .alias("tk"),
    ).localCheckpoint(eager=False)
    # lazy checkpoint: the span table feeds BOTH the frequency aggregate
    # and the coverage join — without it the posexplode + per-doc sort +
    # 8-lead window subtree runs twice (two sorted shuffles of the token
    # relation; visible as two Window subtrees in the r11 before-plan).
    # Blocks are (sid, s, h) rows — same byte class as the second shuffle
    # they replace.
    ex = _span_hashes(base, n).localCheckpoint(eager=False)
    rep = (
        ex.groupBy("h")
        .agg(F.count_distinct("sid").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("h")
    )
    covered = (
        ex.join(rep, "h")
        .groupBy("sid")
        .agg(F.collect_set("s").alias("starts"))
        .select(
            "sid",
            F.expr(
                f"array_distinct(flatten(transform(starts, s -> sequence(s, s + {n - 1}))))"
            ).alias("cov"),
        )
    )
    return (
        base.join(covered, "sid", "left")
        .select(
            F.col("sid").alias(id_col),
            F.expr(
                "concat_ws(' ', transform("
                "  array_except(CASE WHEN size(tk) = 0 THEN array() "
                "               ELSE sequence(0, size(tk) - 1) END, "
                "               coalesce(cov, array())), "
                "  i -> element_at(tk, i + 1)))"
            ).alias("clean_text"),
            F.size("tk").cast("long").alias("n_tokens"),
            F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"),
        )
        .orderBy(id_col)
    )


def strip_contaminated_spans(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Decontamination REMOVAL — excise every ``n``-token span of a
    TRAINING document that also occurs anywhere in the BENCHMARK corpus
    (the surgical alternative to t19/t42's drop-the-document detection;
    the n-gram-overlap decontamination of GPT-3 appendix C / PaLM §6.1,
    applied at span rather than document grain).

    Returns (id_col, clean_text, n_tokens, n_removed) over ``train``,
    normalized like :func:`strip_repeated_passages`.

    Scale shape: the benchmark side reduces to DISTINCT 8-byte span
    hashes (tiny relative to any training corpus — benchmarks are
    bounded); the train side joins its positioned spans against that
    set — Spark/AQE broadcasts it when small, hash-join otherwise — so
    the work is one linear pass over training spans; coverage/rebuild
    identical to the repeated-passage strip. No doc pairs, no Python.
    """
    def _base(df: DataFrame) -> DataFrame:
        norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        return df.select(
            F.col(id_col).alias("sid"),
            F.when(norm == "", F.array().cast("array<string>"))
            .otherwise(F.split(norm, " "))
            .alias("tk"),
        )

    bench_hashes = _span_hashes(_base(benchmark), n).select("h").distinct()
    tr = _base(train).localCheckpoint(eager=False)
    ex = _span_hashes(tr, n)
    covered = (
        ex.join(bench_hashes, "h")
        .groupBy("sid")
        .agg(F.collect_set("s").alias("starts"))
        .select(
            "sid",
            F.expr(
                f"array_distinct(flatten(transform(starts, s -> sequence(s, s + {n - 1}))))"
            ).alias("cov"),
        )
    )
    return (
        tr.join(covered, "sid", "left")
        .select(
            F.col("sid").alias(id_col),
            F.expr(
                "concat_ws(' ', transform("
                "  array_except(CASE WHEN size(tk) = 0 THEN array() "
                "               ELSE sequence(0, size(tk) - 1) END, "
                "               coalesce(cov, array())), "
                "  i -> element_at(tk, i + 1)))"
            ).alias("clean_text"),
            F.size("tk").cast("long").alias("n_tokens"),
            F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"),
        )
        .orderBy(id_col)
    )
