"""Dataset-assembly operators (operators/packing.py): sequence packing and
mixture sampling."""

import pyspark.sql.functions as F
import pytest

from rudder_server_spark.operators.packing import (
    global_cumsum,
    mixture_sample,
    pack_sequences,
    shard_assign,
)


def test_global_cumsum_matches_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cumsum"] for r in global_cumsum(df, "v", "k").collect()
    }
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_global_cumsum_unaffected_by_input_partitioning(spark):
    rows = [(i, i % 7 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = {r["k"]: r["cumsum"] for r in global_cumsum(df.repartition(13), "v", "k").collect()}
    b = {r["k"]: r["cumsum"] for r in global_cumsum(df.coalesce(1), "v", "k").collect()}
    assert a == b


def test_pack_sequences_spans_and_offsets(spark):
    # 3 docs: 300 + 300 + 600 tokens, seq_len 512
    #   doc 1: [0, 300)    → seq 0 only
    #   doc 2: [300, 600)  → crosses the 512 boundary → seqs 0-1
    #   doc 3: [600, 1200) → spans seqs 1-2
    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 600), (4, 0)], "doc_id long, ntok long"
    )
    out = {r["doc_id"]: r.asDict() for r in pack_sequences(df, seq_len=512).collect()}
    assert 4 not in out  # empty doc packs nowhere
    assert (out[1]["start_tok"], out[1]["seq_first"], out[1]["seq_last"]) == (0, 0, 0)
    assert (out[2]["start_tok"], out[2]["seq_first"], out[2]["seq_last"]) == (300, 0, 1)
    assert (out[3]["start_tok"], out[3]["seq_first"], out[3]["seq_last"]) == (600, 1, 2)
    assert out[3]["n_seqs"] == 2


def test_pack_sequences_token_expr_column(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "d e")], "doc_id long, text string")
    from rudder_server_spark.operators.text import token_count

    out = {
        r["doc_id"]: r["ntok"]
        for r in pack_sequences(df, seq_len=4, token_col=token_count(F.col("text"))).collect()
    }
    assert out == {1: 3, 2: 2}


def test_mixture_sample_deterministic_and_rate(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(4000)],
        "doc_id long, source string",
    )
    kept1 = mixture_sample(df, {"a": 0.25}, default_rate=1.0).collect()
    kept2 = mixture_sample(df, {"a": 0.25}, default_rate=1.0).collect()
    assert sorted(r["doc_id"] for r in kept1) == sorted(r["doc_id"] for r in kept2)
    by_src = {"a": 0, "b": 0}
    for r in kept1:
        by_src[r["source"]] += 1
    assert by_src["b"] == 2000  # default rate 1.0 keeps everything
    assert by_src["a"] == pytest.approx(500, rel=0.15)  # ~25% of 2000

    # a different seed draws a different (but stable) sample
    seeded = mixture_sample(df, {"a": 0.25}, default_rate=1.0, seed="s1").collect()
    assert sorted(r["doc_id"] for r in seeded) != sorted(r["doc_id"] for r in kept1)


def test_mixture_sample_clamps_rates_above_one(spark):
    df = spark.createDataFrame([(i, "a") for i in range(100)], "doc_id long, source string")
    assert mixture_sample(df, {"a": 3.0}).count() == 100


def test_shard_assign_partition_invariant_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_assign(df.repartition(17), 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_assign(df.coalesce(1), 8).collect()}
    assert a == b  # assignment is a pure function of the key
    shards = {}
    for sid, (sh, pos) in a.items():
        shards.setdefault(sh, []).append(pos)
    assert set(shards) == set(range(8))
    for sh, poss in shards.items():
        assert sorted(poss) == list(range(len(poss)))  # dense 0-based positions
    # roughly balanced (md5 bucket of 2000 keys over 8 shards)
    sizes = [len(v) for v in shards.values()]
    assert min(sizes) > 150 and max(sizes) < 350


def test_shard_assign_seed_changes_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_assign(df, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_assign(df, 8, seed="s1").collect()}
    assert a != b


def test_quota_sample_caps_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(950)],
        "doc_id long, source string",
    )
    from rudder_server_spark.operators.packing import quota_sample

    a = quota_sample(df, 100).collect()
    by = {}
    for r in a:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by["big"]) == 100  # truncated to the quota
    assert len(by["small"]) == 50  # small group passes through whole
    b = quota_sample(df.repartition(13), 100).collect()
    assert {r["doc_id"] for r in b} == {r["doc_id"] for r in a}  # stable
    c = quota_sample(df, 100, seed="s1").collect()
    assert {r["doc_id"] for r in c if r["source"] == "big"} != by["big"]


def test_resize_stub_contract(spark):
    """Resize plumbing: schema, dims replaced, byte budget scales by area
    ratio and never grows."""
    from rudder_server_spark.operators.multimodal import resize_stub

    rows = [(1, 100, 100, bytes(range(200))), (2, 10, 10, b"tiny"), (3, 0, 0, b"x")]
    df = spark.createDataFrame(
        rows, "item_id long, width int, height int, payload binary"
    )
    out = {r["item_id"]: r for r in resize_stub(df, 50, 50, fake=True).collect()}
    assert out[1]["width"] == 50 and out[1]["height"] == 50
    assert len(out[1]["payload"]) == 50  # 200 * (2500/10000)
    assert out[2]["payload"] == b"tiny"  # upscale never grows bytes
    assert out[3]["payload"] is None  # degenerate dims -> null


def test_frame_sample_one_to_many(spark):
    """Frame sampling: one row per sampled ts; expansion is partition-local
    (no exchange in the plan)."""
    from rudder_server_spark.operators.multimodal import frame_sample

    rows = [(1, 1000, bytes(range(100))), (2, 250, b"abcdefgh"), (3, None, b"x")]
    df = spark.createDataFrame(rows, "item_id long, duration_ms long, payload binary")
    out = frame_sample(df, every_ms=400, fake=True)
    got = [(r["item_id"], r["frame_idx"], r["ts_ms"]) for r in out.collect()]
    # item 1: frames at 0,400,800; item 2: frame at 0; item 3: dropped
    assert sorted(got) == [(1, 0, 0), (1, 1, 400), (1, 2, 800), (2, 0, 0)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
