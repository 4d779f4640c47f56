"""Similarity-search queries over ``embeddings`` (64-dim float
vectors): exact brute-force top-k baseline + SRP-LSH bucketed ANN.

The ANN oracle replicates the exact same deterministic algorithm in SQL
(the ±1 hyperplanes are md5-derived literals embedded in both plans),
so the driver checks the bucketing logic itself, not merely row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ann_topk_srp, brute_force_topk, srp_planes
from ..registry import query
from ..sources.batch import load_table

_NUM_QUERIES = 5  # vec_id < 5 are the query vectors
_DIM = 64
_PLANES = 8

_NORMED = """
WITH n AS (
    SELECT
        vec_id,
        embedding::DOUBLE[] AS v,
        sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
    FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
    WHERE vec_id < 5
)
"""

_BRUTE_ORACLE = (
    _NORMED
    + """
, scored AS (
    SELECT
        q.query_id,
        c.vec_id AS corpus_id,
        round(list_inner_product(q.qv, c.v) / (q.qnorm * c.norm), 6) AS cosine
    FROM n c, q
    WHERE c.vec_id <> q.query_id
)
SELECT query_id, corpus_id, cosine, rank FROM (
    SELECT *,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
) WHERE rank <= 10
"""
)


@query("similarity_topk_brute", _BRUTE_ORACLE)
def similarity_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector: broadcast query batch ×
    corpus scan, per-partition ranked window. The exact baseline ANN
    variants are measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _NUM_QUERIES)
    result = brute_force_topk(emb, queries_df, k=10)
    return result.withColumn("rank", F.col("rank").cast("bigint"))


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(f"{s:.1f}" for s in plane) + "]"


_BUCKET_TERMS = " + ".join(
    f"(CASE WHEN list_inner_product(v, {_plane_literal(plane)}) > 0 "
    f"THEN {2 ** p} ELSE 0 END)"
    for p, plane in enumerate(srp_planes(_PLANES, _DIM))
)

_ANN_ORACLE = f"""
WITH n AS (
    SELECT
        vec_id,
        embedding::DOUBLE[] AS v,
        sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
    FROM embeddings
),
b AS (
    SELECT *, CAST({_BUCKET_TERMS} AS INTEGER) AS bucket FROM n
),
q AS (
    SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket AS qbucket
    FROM b WHERE vec_id < 5
),
scored AS (
    SELECT
        q.query_id,
        c.vec_id AS corpus_id,
        round(list_inner_product(q.qv, c.v) / (q.qnorm * c.norm), 6) AS cosine
    FROM b c JOIN q ON c.bucket = q.qbucket AND c.vec_id <> q.query_id
)
SELECT query_id, corpus_id, cosine, rank FROM (
    SELECT *,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


@query("similarity_ann_srp_lsh", _ANN_ORACLE)
def similarity_ann_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-5: 8 md5-derived ±1 hyperplanes → 256
    sign-pattern buckets → score only the query's bucket. Bucket
    equi-join replaces the cross join (~2^8× less scoring work)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _NUM_QUERIES)
    result = ann_topk_srp(emb, queries_df, num_planes=_PLANES, dim=_DIM, k=5)
    return result.withColumn("rank", F.col("rank").cast("bigint"))
