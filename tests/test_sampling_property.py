"""Property tests for the deterministic sampling operators: for ANY frame
shape (stratum sizes from 0 to >>k, duplicate-free ids), the two-phase
cutoff sample must equal the rank-everything brute force, and rebalancing
must keep its factor bounds. Guards the safety-factor math against stratum
and row-count edge cases the fixture never hits.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F


@st.composite
def strata(draw):
    """[(stratum, n_rows)] with sizes straddling the k=5 / 2k cutoff."""
    n_strata = draw(st.integers(1, 4))
    return [
        (f"s{i}", draw(st.integers(1, 25)))
        for i in range(n_strata)
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=strata(), k=st.integers(1, 8))
def test_stratified_sample_equals_brute_force(spark, spec, k):
    from pyspark.sql import Window as W

    from rudder_server_spark.operators.sampling import stratified_sample, ticket_hex

    rows = []
    next_id = 0
    for stratum, n in spec:
        for _ in range(n):
            rows.append((next_id, stratum))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    got = sorted(
        stratified_sample(df, "lang", k=k).select("lang", "doc_id").collect()
    )
    w = W.partitionBy("lang").orderBy(ticket_hex(F.col("doc_id")), "doc_id")
    want = sorted(
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("lang", "doc_id")
        .collect()
    )
    assert got == want
    per = dict(
        stratified_sample(df, "lang", k=k).groupBy("lang").count().collect()
    )
    assert per == {s: min(k, n) for s, n in spec}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=strata())
def test_rebalance_repeats_bounds_hold(spark, spec):
    from rudder_server_spark.operators.sampling import rebalance_repeats

    rows = []
    next_id = 0
    for stratum, n in spec:
        for _ in range(n):
            rows.append((next_id, stratum))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = rebalance_repeats(df, source_col="source", id_col="doc_id", max_repeat=4.0)
    rows_out = out.select("source", "repeats").collect()
    assert len(rows_out) == len(rows)
    by_src = {}
    for r in rows_out:
        assert 1 <= r["repeats"] <= 4
        by_src.setdefault(r["source"], []).append(r["repeats"])
    # per-source spread at most 1 (floor vs stochastic +1)
    for reps in by_src.values():
        assert max(reps) - min(reps) <= 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(st.integers(1, 500), st.integers(0, 100)), min_size=1, max_size=40
    ),
    budget=st.integers(0, 2000),
)
def test_budget_select_is_rank_prefix(spark, docs, budget):
    """budget_select must equal the brute-force prefix of the
    (score DESC, id ASC) ranking for ANY token/score distribution and
    budget — including budget=0 (nothing selects unless... the one-extra
    rule keeps the first doc only when it starts at 0 < budget is false,
    so 0 selects nothing), zero-token docs (start == previous cum, so
    they ride along while under budget), and over-corpus budgets
    (everything selects)."""
    from rudder_server_spark.operators.packing import budget_select

    rows = [(i, ntok, float(score) / 10.0) for i, (ntok, score) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, ntok long, score double")

    got = sorted(r["doc_id"] for r in budget_select(df, budget).collect())

    ranked = sorted(rows, key=lambda r: (-r[2], r[0]))
    want, cum = [], 0
    for i, ntok, _ in ranked:
        if cum < budget:
            want.append(i)
        cum += ntok
    assert got == sorted(want)
