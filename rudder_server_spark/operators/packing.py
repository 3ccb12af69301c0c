"""Dataset-assembly operators for a training-data pipeline: sequence
packing and deterministic mixture sampling.

These are the last-mile curation steps between a filtered corpus and a
training loader (no reference counterpart — the reference stops at
warehouse tables; charter: training-pipeline ops are first-class):

  pack_sequences   concat-and-chunk packing (GPT-style): documents are
                   concatenated in a deterministic order and the token
                   stream is cut into fixed-length sequences; the output
                   is the PACKING INDEX a loader shards by — for each doc,
                   its global token offset and the sequence ids it spans.
  mixture_sample   per-source weighted downsampling by content-independent
                   md5 bucket — the "dataset mixture" knob (e.g. 3 epochs
                   of wiki, 0.3 of common-crawl), stable across runs,
                   engines and partitionings like hash_split.
  shard_assign     deterministic global shuffle + shard/position assignment
                   (the "shuffle and write N shards" step) — a pure
                   function of md5(key), reproducible everywhere.

Scale shape of pack_sequences: the global token prefix-sum is the only
coupling between partitions, and it is computed as range-partition →
per-partition cumsum → driver-side exclusive offsets over ONE ROW PER
PARTITION (metadata-scale collect, same trick as classic two-pass prefix
sum; 1000 executors → 1000-row collect). No single-partition global
window, no corpus-wide sort-merge beyond the range exchange Spark needs
anyway to order the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_cumsum(
    df: DataFrame, val_col: str, order_col: str, out_col: str = "cumsum"
) -> DataFrame:
    """Inclusive prefix sum of ``val_col`` in ``order_col`` order, at scale.

    Two-pass distributed prefix sum: range-partition by the order key (so
    partitions are contiguous key blocks), cumsum WITHIN each partition via
    a window (parallel — the window partitions by the physical partition
    id, never collapsing to one task), then add each partition's exclusive
    offset, computed driver-side from one total per partition.

    The result is invariant to the (sampled, run-varying) range boundaries:
    only the order defined by ``order_col`` matters.
    """
    # checkpoint the range exchange: the totals job and the main plan must
    # see the SAME physical partitioning (range boundaries come from a
    # sample; recomputing the exchange in the second job could legally pick
    # different cuts and desync the offsets) — and the blocks are shared, so
    # the corpus is range-shuffled once, not twice
    part = (
        df.repartitionByRange(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        part.groupBy("_pid").agg(F.sum(val_col).alias("_t")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["_pid"]] = acc
        acc += r["_t"] or 0
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for pid, o in sorted(offsets.items()) for x in (pid, o)]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.withColumn(out_col, F.sum(val_col).over(w) + off)
        .drop("_pid")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    token_col: Column | str = "ntok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing index: docs concatenated in ``id_col``
    order, token stream cut every ``seq_len`` tokens.

    Returns one row per non-empty doc: ``(id_col, ntok, start_tok,
    seq_first, seq_last, n_seqs)`` — ``start_tok`` is the doc's offset in
    the global token stream, ``seq_first``/``seq_last`` the first/last
    sequence ids it lands in (a doc longer than ``seq_len`` spans several;
    a boundary-crossing doc spans two). Empty docs (0 tokens) pack nowhere
    and are dropped.

    To pack a shuffled corpus, pre-compute a shuffle key (e.g.
    ``xxhash64(doc_id)``) as a column and pass it as ``id_col`` — the
    operator only assumes the key is unique.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    base = df.select(F.col(id_col), tok.cast("long").alias("ntok")).where(
        F.col("ntok") > 0
    )
    cum = global_cumsum(base, "ntok", id_col, out_col="_cend")
    start = F.col("_cend") - F.col("ntok")
    seq_first = F.floor(start / seq_len).cast("bigint")
    seq_last = F.floor((F.col("_cend") - 1) / seq_len).cast("bigint")
    return cum.select(
        id_col,
        "ntok",
        start.alias("start_tok"),
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + F.lit(1)).alias("n_seqs"),
    )


def shard_assign(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic global shuffle + sharding: each row gets a ``shard``
    (0..n_shards-1) and a ``pos`` (0-based rank within its shard), both
    functions of md5(key ++ seed) only — the "shuffle the corpus and write N
    shards" step before training, stable across runs, engines, and input
    partitionings (same argument as hash_split). Change ``seed`` for a fresh
    but equally stable permutation.

    shard = first two hex chars of the md5 (0..255) mod n_shards;
    pos     = rank of the full md5 string within the shard (ties broken by
              the key), i.e. a pseudorandom but reproducible reading order.

    Shape at scale: one hash-partition exchange on ``shard`` + a sort within
    each shard — exactly the shuffle a shard-writing job must do anyway.
    Real pipelines use O(10k) shards so each sort fits an executor; the
    window below partitions by shard, so parallelism == n_shards.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    shard = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % n_shards
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("_h")
    )


def quota_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per group, selected deterministically: rank
    by md5(key ++ seed) within the group (ties broken by the key) and keep
    rank ≤ k — the per-domain cap a crawl-balancing pipeline applies (no
    domain may dominate the mixture), stable across runs/engines/
    partitionings like hash_split.

    Unlike mixture_sample (a RATE per source), this is an absolute QUOTA —
    small groups pass through whole, large groups truncate to exactly k.
    Shape at scale: one shuffle on the group key + per-group sort. For
    pathologically hot groups, pre-thin with mixture_sample (a narrow map)
    to ~k·fanout rows before the exact window.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    w = Window.partitionBy(group_col).orderBy(h, key_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    key_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "",
) -> DataFrame:
    """Deterministic per-source downsampling to a target mixture.

    Keeps a row iff its md5(key ++ seed) bucket (first 4 hex chars →
    0..65535) falls below ``rate(source) * 65536`` — i.e. each source is
    thinned to its configured rate by a content-independent hash, so the
    sample is stable across runs/engines/partitionings (same leakage-safety
    argument as hash_split; change ``seed`` to draw a different but equally
    stable sample). Pure codegen'd narrow map — free at 100 TB; composes
    with hash_split because the two hash different strings (seeded key vs
    bare key nibble).

    Rates above 1.0 are clamped (upsampling/epoch repetition is a loader
    concern, not a filter).
    """
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed))), 1, 4),
        16,
        10,
    ).cast("int")
    rate = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for s, r in sorted(rates.items()) for x in (s, float(r))]
            ),
            F.col(source_col),
        )
        if rates
        else F.lit(None).cast("double"),
        F.lit(float(default_rate)),
    )
    return df.where(bucket < F.least(rate, F.lit(1.0)) * 65536)


def budget_select(
    df: DataFrame,
    budget: int,
    token_col: str = "ntok",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus selection under a token budget: keep the highest-scoring
    documents until ``budget`` tokens are reached.

    The "train on the best N billion tokens" curation step: docs are
    ranked by (score DESC, id ASC) and a doc is kept iff it STARTS within
    the budget — the crossing doc is kept (q58's one-extra pickup
    semantics), so a single over-budget doc still selects.

    Scale shape: the global ranking never materializes on one node — the
    cumulative token count comes from `global_cumsum`'s two-pass
    range-partitioned prefix sum (the struct sort key (-score, id) gives
    descending-score order with a deterministic tie-break). One range
    exchange + one metadata-scale collect, same as pack_sequences.

    Returns the selected rows with the running total (`_cum`) dropped.
    """
    keyed = df.withColumn(
        "_rank_key",
        F.struct((-F.col(score_col)).alias("s"), F.col(id_col).alias("i")),
    )
    cum = global_cumsum(keyed, token_col, "_rank_key", out_col="_cum")
    return (
        cum.where((F.col("_cum") - F.col(token_col)) < budget)
        .drop("_rank_key", "_cum")
    )
