"""Product-quantization ANN (operators/pq.py): codebook shape/determinism,
Arrow encode, codegen-only ADC scan, and recall vs the exact top-k."""

import pytest
from pyspark.sql import functions as F

from rudder_server_spark.operators import pq as PQ
from rudder_server_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def books(spark, emb):
    return PQ.pq_train(emb, m=8, k=16)


def test_train_shape_and_determinism(spark, emb, books):
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # dsub = 64/8
    again = PQ.pq_train(emb, m=8, k=16)
    assert books == again  # seeded Lloyd → bit-identical codebooks


def test_train_rejects_unbounded_sample(spark, emb, monkeypatch):
    monkeypatch.setattr(PQ, "PQ_TRAIN_SAMPLE_CAP", 5)
    with pytest.raises(ValueError, match="sample_fraction"):
        PQ.pq_train(emb, m=8, k=16)


def test_encode_shape_and_range(spark, emb, books):
    codes = PQ.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_adc_scan_stays_in_codegen(spark, emb, books):
    # the coarse stage must read only the code column and keep the ADC
    # expression JVM-side: no ArrowEvalPython/BatchEvalPython in the scan
    codes = PQ.pq_encode(emb, books)
    q = [0.1] * 64
    plan = (
        codes.select("vec_id", PQ.adc_score(books, q).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the encode itself is the Arrow stage; the ADC projection adds no
    # second Python crossing on top of it
    assert plan.count("ArrowEvalPython") <= 1
    assert "BatchEvalPython" not in plan


def test_recall_vs_exact_topk(spark, emb, books):
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    base = emb.where(F.col("vec_id") != 0)
    from rudder_server_spark.operators.similarity import cosine_query

    exact = {
        r["vec_id"]
        for r in base.select(
            "vec_id", cosine_query("embedding", qvec).alias("sim")
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
        .collect()
    }
    got = {r["vec_id"] for r in PQ.pq_topk(base, books, qvec, k=10).collect()}
    assert len(got) == 10
    # 4x rescore over an 8x16 PQ on this fixture recovers most of the
    # exact set; random 10-of-N overlap would be ~0
    assert len(got & exact) >= 6, (got, exact)


def test_rescore_scores_are_exact_cosines(spark, emb, books):
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    base = emb.where(F.col("vec_id") != 0)
    from rudder_server_spark.operators.similarity import cosine_query

    got = {r["vec_id"]: r["sim"] for r in PQ.pq_topk(base, books, qvec, k=10).collect()}
    exact = {
        r["vec_id"]: r["sim"]
        for r in base.select(
            "vec_id", F.round(cosine_query("embedding", qvec), 6).alias("sim")
        ).collect()
    }
    for vid, sim in got.items():
        assert sim == exact[vid]  # rescore is the exact metric, not ADC


def test_pq_rejects_codebooks_over_int8_range(spark, emb):
    """Codes are signed int8: k>128 must raise at train AND encode time,
    never silently wrap negative into adc_score's element_at lookup."""
    import pytest

    with pytest.raises(ValueError, match="int8"):
        PQ.pq_train(emb, m=8, k=129)
    bad_books = [[[0.0] * 8] * 129 for _ in range(8)]
    with pytest.raises(ValueError, match="int8"):
        PQ.pq_encode(emb, bad_books)
    # k=128 exactly is the documented envelope and must be accepted
    books = PQ.pq_train(emb.limit(300), m=8, k=128)
    assert len(books[0]) == 128
