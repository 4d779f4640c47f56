"""The BLAS (mapInPandas) top-k twin must agree with the pure-expression
form (both round cosines to 6 decimals and tie-break on corpus_id)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
)
from kafka_spark_streaming_app_spark.sources.batch import load_table


def test_pandas_topk_matches_expression_topk(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    expr_rows = {
        (r["query_id"], r["rank"]): (r["corpus_id"], r["cosine"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    blas_rows = {
        (r["query_id"], r["rank"]): (r["corpus_id"], r["cosine"])
        for r in brute_force_topk_pandas(emb, queries, k=10).collect()
    }
    assert expr_rows == blas_rows
