"""Deterministic sampling family (queries/sampling.py)."""

from __future__ import annotations

from collections import Counter

from kafka_spark_streaming_app_spark import registry

registry.load_all()


def test_reservoir_exact_k_and_deterministic(spark, sf_smoke):
    fn = registry.QUERIES["reservoir_sample_exact"]
    a = fn(spark, sf_smoke).collect()
    b = fn(spark, sf_smoke).collect()
    assert len(a) == 100
    ids_a = {r.doc_id for r in a}
    assert len(ids_a) == 100  # without replacement
    assert ids_a == {r.doc_id for r in b}  # rank-based => reproducible


def test_reservoir_prefix_property(spark, sf_smoke):
    """Rank-based sampling nests: the k'=50 sample is exactly the 50
    smallest keys of the k=100 sample — growing a sample never
    reshuffles what was already drawn (the property that lets a
    pipeline extend an eval holdout without invalidating it)."""
    rows = sorted(
        registry.QUERIES["reservoir_sample_exact"](spark, sf_smoke).collect(),
        key=lambda r: (r.sample_key, r.doc_id),
    )
    first_50 = {r.doc_id for r in rows[:50]}
    all_keys = sorted((r.sample_key, r.doc_id) for r in rows)
    assert {d for _, d in all_keys[:50]} == first_50


def test_stratified_allocations_sum_to_k_and_fill(spark, sf_smoke):
    rows = registry.QUERIES["stratified_sample_neyman"](
        spark, sf_smoke
    ).collect()
    assert len(rows) == 200
    by_lang = Counter(r.lang for r in rows)
    alloc = {r.lang: r.n_alloc for r in rows}
    # every stratum drew exactly its allocation (no stratum smaller
    # than its allocation at this SF), and allocations sum to k
    assert by_lang == {k: v for k, v in alloc.items()}
    assert sum(alloc.values()) == 200
    assert len(by_lang) >= 2  # genuinely stratified at sf0.001


def test_weighted_es_sample_prefers_heavy_docs_and_matches_numpy(
    spark, sf_smoke
):
    """Efraimidis-Spirakis: (1) the selected set must match an
    independent numpy recompute of top-k ln(u)/w keys; (2) selection
    must be biased toward heavy (long) documents — the weighted
    semantics a uniform sampler lacks."""
    import numpy as np
    import pandas as pd

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.queries.sampling import (
        _P,
        _WES_A,
        _WES_C,
        _WES_K,
    )

    registry.load_all()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    docs = docs[docs["n_chars"] > 0]
    key = (docs["doc_id"].to_numpy() * _WES_A + _WES_C) % _P
    lk = np.floor(
        1e12 * (np.log((key.astype(np.float64) + 1.0) / _P)
                / docs["n_chars"].to_numpy())
    ).astype(np.int64)
    order = np.lexsort((docs["doc_id"].to_numpy(), -lk))
    want = set(docs["doc_id"].to_numpy()[order[:_WES_K]])

    rows = registry.QUERIES["weighted_sample_es"](spark, sf_smoke).collect()
    got = {r.doc_id for r in rows}
    assert got == want
    # weighted selection skews long: sampled mean length must exceed
    # the corpus mean by a clear margin (k/N = 1/5 at smoke scale, so
    # the skew is muted — observed ~1.19x)
    assert np.mean([r.n_chars for r in rows]) > 1.1 * docs["n_chars"].mean()
