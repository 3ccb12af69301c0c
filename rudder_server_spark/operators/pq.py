"""Product quantization (PQ) ANN — the compression tier past SQ8.

PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 33(1)) splits each d-dim vector into ``m`` subvectors
and vector-quantizes each subspace against its own ``k``-entry codebook:
a d×4-byte float vector becomes ``m`` small codes (here one byte each —
d=64 → 8 bytes, 32× smaller). Search uses ADC (asymmetric distance
computation): the query precomputes an m×k table of subspace dot
products, and each database vector's approximate score is ``m`` table
lookups — no float math against the corpus at all.

Spark-first split of the three phases:

- **train** — codebooks are k·m·dsub floats of global state learned from
  a bounded sample (FAISS trains on samples too); a seeded numpy Lloyd
  on a capped driver-side sample (explicit raise over the cap) beats m
  separate Spark-ML fits whose per-fit scheduling would dominate at this
  state size. The corpus-scale phases below are fully distributed.
- **encode** — one Arrow ``mapInPandas`` pass: per batch, per subspace,
  an argmax of X_j · C_jᵀ (BLAS), emitting ``array<tinyint>`` codes. A
  narrow map, pipeline-fused with the scan; no shuffle.
- **search (ADC)** — the m×k query table folds into a GENERATED SQL
  expression: ``sum_j element_at(table_j, codes[j]+1)`` over literal
  arrays — m element_at lookups per row inside whole-stage codegen,
  scanning ONLY the 8-byte code column. Top ``rescore_factor·k``
  candidates fetch their float vectors for exact-cosine rescoring — at
  100 TB the float column is read for ~k·rescore rows, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
import pyspark.sql.types as T

# training reads a bounded sample onto the driver: codebook state is tiny,
# but the sample must be bounded by construction, never by luck
PQ_TRAIN_SAMPLE_CAP = 200_000


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    iters: int = 10,
) -> list:
    """Learn the ``m`` per-subspace codebooks (each k × d/m floats).

    Seeded/deterministic Lloyd iterations on a capped driver sample.
    Raises if the sample exceeds ``PQ_TRAIN_SAMPLE_CAP`` rows — pass
    ``sample_fraction`` to bound it explicitly at corpus scale.
    """
    import numpy as np

    if k > 128:
        raise ValueError(
            f"pq_train k={k} exceeds 128: codes are stored as signed int8 "
            "(array<tinyint>), so codebooks above 128 entries would wrap "
            "negative and adc_score's element_at lookup would silently read "
            "from the wrong end of the table"
        )
    train = df if sample_fraction is None else df.sample(sample_fraction, seed=seed)
    rows = (
        train.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .limit(PQ_TRAIN_SAMPLE_CAP + 1)
        .collect()
    )
    if len(rows) > PQ_TRAIN_SAMPLE_CAP:
        raise ValueError(
            f"pq_train sample exceeds PQ_TRAIN_SAMPLE_CAP={PQ_TRAIN_SAMPLE_CAP}"
            " rows; pass sample_fraction to bound the training sample"
        )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(n, size=min(k, n), replace=False)].copy()
        if len(C) < k:  # degenerate tiny corpus: pad by repetition
            C = np.vstack([C] * (k // len(C) + 1))[:k]
        for _ in range(iters):
            # assign to nearest centroid (ties -> lowest index, stable)
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books.append([[float(v) for v in row] for row in C])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<tinyint>) — one Arrow pass, argmin per subspace."""
    if any(len(b) > 128 for b in codebooks):
        raise ValueError(
            "pq_encode codebook exceeds 128 entries; int8 codes would wrap "
            "negative (train with k<=128)"
        )
    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("codes", T.ArrayType(T.ByteType())),
        ]
    )
    books = [[list(map(float, c)) for c in b] for b in codebooks]
    _id, _vec = id_col, vec_col

    def fn(batches):
        import numpy as np
        import pandas as pd

        C = [np.asarray(b, dtype=np.float64) for b in books]
        m = len(C)
        dsub = C[0].shape[1]
        for pdf in batches:
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[_vec]])
            codes = np.empty((len(X), m), dtype=np.int8)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                # expanded ||s-c||^2 argmin: -2 s·c + ||c||^2 (s-term constant)
                key = (C[j] * C[j]).sum(axis=1)[None, :] - 2.0 * (S @ C[j].T)
                codes[:, j] = np.argmin(key, axis=1).astype(np.int8)
            yield pd.DataFrame({_id: pdf[_id], "codes": list(codes)})

    return df.select(_id, _vec).where(F.col(_vec).isNotNull()).mapInPandas(fn, out_schema)


def adc_score(codebooks: list, query: list, codes_col: str = "codes") -> Column:
    """The ADC expression: approximate dot(query, x) as m table lookups.

    ``element_at(array(<k literals>), CAST(codes[j] AS INT) + 1)`` per
    subspace, summed — literal tables, whole-stage codegen, reads only
    the code column. m·k stays small by design (8×16 here; k is capped
    at 128 by pq_train/pq_encode because codes are signed int8, keeping
    the expression far under the shingle/codegen hazards documented in
    operators/similarity.py)."""
    import numpy as np

    q = np.asarray([float(v) for v in query], dtype=np.float64)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    terms = []
    for j in range(m):
        qj = q[j * dsub : (j + 1) * dsub]
        table = [float(np.dot(qj, np.asarray(c, dtype=np.float64))) for c in codebooks[j]]
        lits = ", ".join(repr(v) for v in table)
        terms.append(f"element_at(array({lits}), CAST({codes_col}[{j}] AS INT) + 1)")
    return F.expr("(" + " + ".join(terms) + ")")


def pq_topk(
    df: DataFrame,
    codebooks: list,
    query_vec: list,
    k: int = 10,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Two-stage PQ ANN: ADC coarse rank over the code column, exact
    cosine rescore of the top ``rescore_factor · k``. Pass ``codes``
    (from :func:`pq_encode`, persisted in production) to skip re-encoding."""
    from rudder_server_spark.operators.similarity import cosine_query

    if codes is None:
        codes = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)
    coarse = (
        codes.select(id_col, adc_score(codebooks, query_vec).alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), id_col)
        .limit(rescore_factor * k)
    )
    return (
        coarse.join(df.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col),
            F.round(cosine_query(vec_col, [float(v) for v in query_vec]), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )
