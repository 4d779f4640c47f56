"""Unit tests for operators/corpus.py — repetition metrics,
boilerplate n-grams, contamination — on hand-built corpora with known
answers, including the degenerate short-document edges the synthetic
corpus never exercises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.corpus import (
    boilerplate_ngrams,
    contamination_check,
    repetition_metrics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_metrics_known_values(spark):
    df = _docs(
        spark,
        [
            # 6 tokens, 3 distinct; bigrams: "a a","a b","b a","a b","b b"
            # -> 5 instances, 4 distinct, top "a b" x2
            (1, "a a b a b b"),
            (2, "x y z"),  # all distinct, all bigrams unique
        ],
    )
    got = {
        r["doc_id"]: r for r in repetition_metrics(df).collect()
    }
    r1 = got[1]
    assert r1["n_tokens"] == 6 and r1["n_distinct_tokens"] == 2
    assert r1["dup_word_frac"] == pytest.approx(1 - 2 / 6)
    assert r1["top_bigram_frac"] == pytest.approx(2 / 5)
    assert r1["dup_bigram_frac"] == pytest.approx(1 - 4 / 5)
    r2 = got[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_bigram_frac"] == pytest.approx(1 / 2)
    assert r2["dup_bigram_frac"] == 0.0


def test_repetition_metrics_short_doc_keeps_row(spark):
    df = _docs(spark, [(1, "solo"), (2, "a b")])
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["top_bigram_frac"] == 0.0
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 1.0


def test_boilerplate_ngrams_shared_gram(spark):
    shared = "the quick brown fox jumps"
    df = _docs(
        spark,
        [
            (1, shared + " over the lazy dog"),
            (2, shared + " into a puddle"),
            (3, "completely unrelated words in this document here"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in boilerplate_ngrams(df, n=5, min_docs=2).collect()
    }
    assert got[1]["n_boiler"] >= 1 and got[2]["n_boiler"] >= 1
    assert got[3]["n_boiler"] == 0 and got[3]["boiler_frac"] == 0.0
    assert 0 < got[2]["boiler_frac"] <= 1.0


def test_contamination_flags_copied_doc(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [
            (0, bench_text),  # benchmark
            (1, bench_text),  # verbatim copy -> overlap 1.0
            (2, "iota kappa lambda mu nu xi omicron pi rho"),  # clean
        ],
    )
    out = contamination_check(
        df, is_benchmark=F.col("doc_id") == 0, n=3, flag_threshold=0.5
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2}  # benchmark docs are not scored
    assert got[1]["overlap_frac"] == 1.0 and got[1]["contaminated"]
    assert got[2]["overlap_frac"] == 0.0 and not got[2]["contaminated"]


def test_contamination_empty_benchmark(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "e f g h")])
    out = contamination_check(
        df, is_benchmark=F.lit(False), n=3, flag_threshold=0.5
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2}
    assert all(r["n_hit"] == 0 and not r["contaminated"] for r in got.values())


# --- Aho-Corasick multi-pattern scan ------------------------------------------


def test_aho_corasick_counts_nested_and_adjacent_matches():
    """Nested patterns must fire through output links; adjacent and
    repeated occurrences all count."""
    from kafka_spark_streaming_app_spark.operators.multipattern import (
        build_aho_corasick,
        scan_counts,
    )

    pats = ["scan", "scan slow", "fast", "fast key", "an s"]
    goto, fail, out = build_aho_corasick(pats)
    text = "scan slow scan fast key fast scan slow"
    got = dict(zip(pats, scan_counts(text, goto, fail, out, len(pats))))
    assert got == {
        "scan": 3,
        "scan slow": 2,
        "fast": 2,
        "fast key": 1,
        # "an s" fires where a scan is followed by " s": the first
        # "scan slow" and the final "scan slow" (the middle scan is
        # followed by " fast")
        "an s": 2,
    }


def test_aho_corasick_self_overlapping_pattern_counts_all():
    """ALL-match semantics: the bordered pattern 'aa' occurs 3 times
    in 'aaaa' (positions 0,1,2) — the automaton must count overlaps,
    which is exactly why the oracle query plants borderless patterns."""
    from kafka_spark_streaming_app_spark.operators.multipattern import (
        build_aho_corasick,
        scan_counts,
    )

    goto, fail, out = build_aho_corasick(["aa"])
    assert scan_counts("aaaa", goto, fail, out, 1) == [3]


def test_blocklist_patterns_are_borderless():
    """The oracle contract: every planted pattern must have NO proper
    prefix that is also a suffix, making self-overlap impossible and
    the SQL replace()-count exact."""
    from kafka_spark_streaming_app_spark.queries.text import (
        _BLOCKLIST_PATTERNS,
    )

    for p in _BLOCKLIST_PATTERNS:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], f"pattern {p!r} has border {p[:k]!r}"


def test_multipattern_scan_emits_full_grid(spark, sf_smoke):
    """Every (doc, pattern) pair appears, zero matches included."""
    from kafka_spark_streaming_app_spark.operators.multipattern import (
        multipattern_scan,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(25)
    pats = ["scan", "zz never zz"]
    rows = multipattern_scan(docs, pats).collect()
    assert len(rows) == 50
    zero = [r for r in rows if r["pattern"] == "zz never zz"]
    assert all(r["n_matches"] == 0 for r in zero) and len(zero) == 25


def test_soundex_classic_vectors_and_blocking(spark, sf_smoke):
    """Spark's soundex must produce the published American-Soundex
    vectors (incl. the H/W transparency cases the oracle re-derives),
    and the blocking query's pair counts must be n*(n-1)/2."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark import registry

    df = spark.createDataFrame(
        [(n,) for n in (
            "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
            "Pfister", "Honeyman", "Hwang", "Lee",
        )],
        "w string",
    )
    got = {r["w"]: r["s"] for r in df.select("w", F.soundex("w").alias("s")).collect()}
    assert got == {
        "Robert": "R163", "Rupert": "R163",
        "Ashcraft": "A261", "Ashcroft": "A261",
        "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Hwang": "H520", "Lee": "L000",
    }
    registry.load_all()
    rows = registry.QUERIES["phonetic_blocking_soundex"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        n = r["n_words"]
        assert r["n_candidate_pairs"] == n * (n - 1) // 2
