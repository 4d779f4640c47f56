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
