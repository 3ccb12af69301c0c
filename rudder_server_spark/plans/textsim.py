"""Declared queries Q26-Q28: text ops, similarity top-k, near-dup dedup
(SURVEY §2.11 extended surface) over documents/embeddings fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rudder_server_spark.operators.dedup import normalize_text
from rudder_server_spark.operators.similarity import cosine_query
from rudder_server_spark.plans.registry import register
from rudder_server_spark.sources.fixtures import load_table


# --------------------------------------------------------------------------
# Q26 text ops — per-lang stats over documents. avg rounded to a fixed
# scale in BOTH engines (raw double division is formatting-sensitive in
# the driver's value hash — VERDICT r1 §What's wrong #1).
@register(
    "q26_text_ops",
    """
    SELECT lang, count(*) AS cnt,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / count(*), 3) AS DOUBLE) AS avg_chars,
           CAST(SUM(CASE WHEN contains(lower(text), 'data') THEN 1 ELSE 0 END) AS BIGINT) AS data_cnt
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Per-lang doc stats. SURVEY Q26.",
)
def q26(spark, sf):
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 3)
            .cast("double")
            .alias("avg_chars"),
            F.sum(
                F.when(F.lower(F.col("text")).contains("data"), 1).otherwise(0)
            ).alias("data_cnt"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q27 similarity top-k — cosine against vec_id=0, exact brute force.
# The query vector is collected once (one driver-side row) and inlined as a
# literal → the scan is a narrow map, no join, no shuffle except top-k.
@register(
    "q27_similarity_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT e.vec_id,
             ROUND(
               list_sum(list_transform(range(1, len(e.embedding)+1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             6) AS sim
      FROM embeddings e, q WHERE e.vec_id <> 0
    )
    SELECT vec_id, sim FROM sims ORDER BY sim DESC, vec_id LIMIT 10
    """,
    doc="Exact cosine top-10 vs vec_id=0. SURVEY Q27.",
)
def q27(spark, sf):
    e = load_table(spark, sf, "embeddings")
    qvec = e.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return (
        e.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine_query("embedding", [float(v) for v in qvec]), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q28 near-dup text dedup — exact normalized-text dedup counts.
@register(
    "q28_neardup_counts",
    """
    WITH g AS (
      SELECT lower(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS k, count(*) AS c
      FROM documents GROUP BY 1
    )
    SELECT count(*) AS n_kept, CAST(SUM(c) - count(*) AS BIGINT) AS n_dropped FROM g
    """,
    doc="Exact dedup on normalized text: kept vs dropped counts. SURVEY Q28.",
)
def q28(spark, sf):
    d = load_table(spark, sf, "documents")
    g = d.groupBy(normalize_text(F.col("text")).alias("k")).agg(F.count("*").alias("c"))
    return g.agg(
        F.count("*").alias("n_kept"),
        (F.sum("c") - F.count("*")).cast("bigint").alias("n_dropped"),
    )
