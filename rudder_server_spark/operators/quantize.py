"""Embedding quantization — the storage-scale path for vector columns.

At 100 TB of float32 embeddings, int8 symmetric quantization cuts the
vector bytes 4x (and most ANN stacks — FAISS IVF/SQ8, ScaNN — train on
exactly this representation): per vector, scale = 127/max|x|, q_i =
floor(x_i * scale + 0.5) in [-127, 127]. Reconstruction is q/scale.

Spark shape: a vectorized Arrow ``mapInPandas`` stage (numpy per batch) —
per-element array math over thousands of dimensions is the case where
Python+numpy beats interpreted SQL higher-order functions, and the stage
is a pure narrow map (no shuffle, pipeline-fused with the scan). The
floor(x+0.5) rounding is chosen over round() because floor is
bit-identical across engines (round's half-even/half-up conventions
differ), which is what lets the t40 declared query hash-match a DuckDB
oracle end-to-end through a float64 multiply.

All-zero vectors get scale=0 and an all-zero code (guarded; reconstruction
is exact for them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

import pyspark.sql.types as T


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, scale double, q array<tinyint>) — int8 symmetric quantization.

    Closure is self-contained (cloudpickle by value; workers never import
    this package).
    """
    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("scale", T.DoubleType()),
            T.StructField("q", T.ArrayType(T.ByteType())),
        ]
    )
    _vec, _id = vec_col, id_col

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            scales = []
            codes = []
            for emb in pdf[_vec]:
                a = np.asarray(emb, dtype=np.float64)
                m = float(np.abs(a).max()) if a.size else 0.0
                s = 127.0 / m if m > 0.0 else 0.0
                q = np.floor(a * s + 0.5).astype(np.int8)
                scales.append(s)
                codes.append(q)
            yield pd.DataFrame({_id: pdf[_id], "scale": scales, "q": codes})

    return df.select(_id, _vec).mapInPandas(fn, out_schema)


def quantized_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 two-stage ANN: coarse-rank by integer dot product over the int8
    codes, exact-rescore the top ``rescore_factor * k`` candidates in
    float, return the final top k by exact cosine.

    The production read path scans ONLY the 4x-smaller code column for the
    coarse stage (at 100 TB that is the entire point: the float vectors
    are fetched for ~k·rescore_factor rows, not the corpus). Both stages
    are generated per-index arithmetic in one SQL string each — fully
    whole-stage-codegen (interpreted zip_with/aggregate folds measured
    4-10x slower on these shapes; see operators/similarity.py).
    """
    import pyspark.sql.functions as F

    from rudder_server_spark.operators.similarity import cosine_query

    codes = quantize_embeddings(df, vec_col=vec_col, id_col=id_col)
    # quantize the query the same way (driver-side, bounded)
    m = max(abs(float(v)) for v in query_vec) or 1.0
    qs = 127.0 / m
    q_code = [int((float(v) * qs + 0.5) // 1) for v in query_vec]
    int_dot = F.expr(
        "(" + " + ".join(
            f"CAST(q[{i}] AS BIGINT) * {c}" for i, c in enumerate(q_code)
        ) + ")"
    )
    # scale back so ordering matches the float dot product's
    coarse = codes.select(
        id_col, (int_dot.cast("double") / (F.col("scale") * F.lit(qs))).alias("approx_dot")
    ).orderBy(F.desc("approx_dot"), id_col).limit(rescore_factor * k)
    return (
        coarse.join(df.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col),
            F.round(cosine_query(vec_col, [float(v) for v in query_vec]), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )
