"""Golden-file checks for the rows-only declared queries (t4/t11/t12/t14).

These queries have no SQL oracle (approximate/sketch algorithms), so the
driver's check is rows-only. The committed goldens pin their exact sf0.001
output (all four are deterministic: fixed xxhash64 banding, fixed LCG
hyperplanes, seeded k-means, deterministic HLL) so regressions surface in
CI, not just cardinality drift. VERDICT r1 #6.
"""

import json
import os

import pytest

from rudder_server_spark.plans.registry import load_all

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REG = load_all()


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize(
    "name",
    [
        "t4_simhash",
        "t11_ann_lsh",
        "t12_hll_tracked_users",
        "t14_ann_ivf",
        "t27_semdedup",
        "t34_approx_percentiles",
        "t36_lsh_recall",
        "t41_ann_quantized",
    ],
)
def test_golden(name, spark):
    with open(os.path.join(GOLDEN_DIR, f"{name}_sf0.001.json")) as f:
        expect = json.load(f)
    df = REG[name].spark_fn(spark, SF)
    assert df.columns == expect["columns"]
    rows = sorted(
        [[_norm(v) for v in r] for r in df.collect()],
        key=lambda r: [str(x) for x in r],
    )
    assert rows == expect["rows"]


def test_t12_hll_within_2pct_of_exact(spark):
    """The HLL estimates must track q12's exact COUNT(DISTINCT) within ±2%
    per row (VERDICT r1 #6) — the accuracy contract of the lgK used."""
    import pyspark.sql.functions as F

    from rudder_server_spark.sources.fixtures import load_table

    est = {
        r["source_id"]: r["users_estimate"]
        for r in REG["t12_hll_tracked_users"].spark_fn(spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = e.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(1, 0.02 * exact[k]), (k, est[k], exact[k])


def test_t27_semdedup_drops_planted_near_dups(spark):
    """SemDeDup soundness on planted duplicates: tiny perturbations of a
    base vector (cos ≈ 0.999) must be dropped in favor of the min-id copy,
    and every drop must be justified by a true cos >= threshold lower-id
    neighbor — checked against brute force over all pairs."""
    import numpy as np

    from rudder_server_spark.operators.similarity import ivf_train, semdedup

    rng = np.random.RandomState(11)
    dim, n = 16, 300
    base = rng.randn(n, dim)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant 3 groups of near-identical vectors (ids chosen above the corpus)
    for g in range(3):
        v = base[g * 7]
        for j in range(2):
            rows.append(
                (1000 + g * 10 + j, [float(x) for x in v + 0.001 * rng.randn(dim)])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train(df, k=4)
    out = {r["vec_id"]: r["dropped"] for r in semdedup(df, cents, 0.95).collect()}

    # every planted copy has the original (lower id, same cluster w.h.p. at
    # cos 0.999) to collapse into
    planted = [1000 + g * 10 + j for g in range(3) for j in range(2)]
    assert all(out[i] for i in planted), {i: out[i] for i in planted}
    # soundness: any dropped id really has a cos>=0.95 lower-id neighbor
    vecs = {i: np.array(v) for i, v in rows}
    for i, dropped in out.items():
        if dropped:
            has = any(
                float(vecs[i] @ vecs[j]) / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j])) >= 0.95
                for j in vecs
                if j < i
            )
            assert has, i


def test_t11_lsh_recovers_planted_neighbors(spark):
    """Hyperplane LSH's contract is recall on genuinely-similar vectors —
    on the fixture's random (near-orthogonal) embeddings, bucket overlap is
    chance, so recall vs the exact top-10 is meaningless there. Plant true
    near-duplicates of the query (cos ≈ 0.995+) in a random corpus: the
    probe must recover them (same side of every hyperplane w.h.p.)."""
    import numpy as np

    from rudder_server_spark.operators.similarity import lsh_topk
    from rudder_server_spark.plans.training import _fixed_planes

    rng = np.random.RandomState(7)
    dim, n = 16, 400
    base = rng.randn(n, dim)
    q = rng.randn(dim)
    # ids 9000+: tiny perturbations of the query vector
    planted = [q + 0.02 * rng.randn(dim) for _ in range(5)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(9000 + j, [float(x) for x in v]) for j, v in enumerate(planted)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = lsh_topk(df, [float(x) for x in q], _fixed_planes(dim=dim, bits=4), k=10)
    top = {r["vec_id"] for r in got.collect()}
    recovered = len({9000 + j for j in range(5)} & top)
    assert recovered >= 4, (recovered, sorted(top))


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Multiprobe LSH (Lv et al. 2007): probing the nprobe next-likeliest
    buckets recovers neighbors that fall just across one hyperplane — the
    multiprobe candidate set strictly contains the single-probe set, and
    the probe sequence starts at the query's own bucket."""
    import numpy as np

    from rudder_server_spark.operators.similarity import (
        lsh_probe_buckets,
        lsh_topk,
    )
    from rudder_server_spark.plans.training import _fixed_planes

    rng = np.random.RandomState(11)
    dim, n = 16, 400
    base = rng.randn(n, dim)
    q = rng.randn(dim)
    # perturbed just enough that some copies flip one near-zero-margin plane
    planted = [q + 0.25 * rng.randn(dim) for _ in range(8)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(9000 + j, [float(x) for x in v]) for j, v in enumerate(planted)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = _fixed_planes(dim=dim, bits=4)
    qv = [float(x) for x in q]

    probes = lsh_probe_buckets(qv, planes, nprobe=4)
    assert len(probes) == 4 and len(set(probes)) == 4
    assert probes[0] == lsh_probe_buckets(qv, planes, nprobe=1)[0]

    planted_ids = {9000 + j for j in range(8)}
    one = {r["vec_id"] for r in lsh_topk(df, qv, planes, k=20, nprobe=1).collect()}
    four = {r["vec_id"] for r in lsh_topk(df, qv, planes, k=20, nprobe=4).collect()}
    assert len(four & planted_ids) >= len(one & planted_ids)
    assert len(four) >= len(one)  # candidate set can only grow


def test_registered_invariants_hold_at_fixture_scale(spark):
    """Every oracle-less query that declares a semantic invariant (recall
    floors, top-k shapes — VERDICT r3 #7) satisfies it at sf0.001. The
    strict sweeps enforce the same invariants at sf0.01/sf0.1."""
    with_inv = {n: qd for n, qd in REG.items() if qd.invariant is not None}
    # the floor exists for exactly the approximate/oracle-less tiers
    assert {
        "t11_ann_lsh", "t14_ann_ivf", "t36_lsh_recall",
        "t41_ann_quantized", "t57_ann_knn_recall", "t59_mmr_select",
    } <= set(with_inv)
    for name, qd in sorted(with_inv.items()):
        rows = qd.spark_fn(spark, SF).collect()
        err = qd.invariant(rows)
        assert err is None, f"{name}: {err}"
