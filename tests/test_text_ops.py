

def test_readability_scores_match_python_re(spark, sf_smoke):
    """readability_scores vs an independent `re`-module recount of
    words, sentences and vowel-group syllables, with the Flesch /
    FK formulas recomputed in plain Python (exact equality: same
    IEEE expression tree)."""
    import re

    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    got = {
        r.doc_id: r
        for r in registry.QUERIES["readability_scores"](
            spark, sf_smoke
        ).collect()
    }
    assert len(got) == len(docs)
    for _, d in docs.head(25).iterrows():
        txt = re.sub(r"\s+", " ", (d["text"] or "").lower().strip())
        words = txt.split(" ")
        nw = len(words)
        ns = max(1, len(re.findall(r"[.!?]+", txt)))
        nsyl = sum(
            max(1, len(re.findall(r"[aeiouy]+", w))) for w in words
        )
        r = got[d["doc_id"]]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (nw, ns, nsyl)
        assert r.flesch_ease == 206.835 - 1.015 * (nw / ns) - 84.6 * (
            nsyl / nw
        )
        assert r.fk_grade == 0.39 * (nw / ns) + 11.8 * (nsyl / nw) - 15.59


def test_jaro_winkler_literature_cases():
    """The classic record-linkage literature values (Winkler 1990 /
    common test vectors), plus the DuckDB empty-string convention."""
    from kafka_spark_streaming_app_spark.operators.text import (
        jaro_similarity,
        jaro_winkler_similarity,
    )

    assert abs(jaro_similarity("martha", "marhta") - 0.9444444444) < 1e-9
    assert abs(jaro_winkler_similarity("martha", "marhta") - 0.9611111111) < 1e-9
    assert abs(jaro_winkler_similarity("dixon", "dicksonx") - 0.8133333333) < 1e-9
    assert abs(jaro_winkler_similarity("dwayne", "duane") - 0.84) < 1e-9
    assert jaro_winkler_similarity("abc", "abc") == 1.0
    assert jaro_winkler_similarity("ab", "ba") == 0.0  # no matches in window
    assert jaro_winkler_similarity("", "") == 0.0  # DuckDB/RapidFuzz convention
    assert jaro_winkler_similarity("a", "") == 0.0
    # transposed halves share matches but all transposed
    assert abs(jaro_similarity("CRATE", "TRACE") - 0.7333333333) < 1e-9


def test_jaro_winkler_bit_exact_vs_duckdb_sample():
    """Differential test against DuckDB's native implementation over
    random short strings — bit-exact, no tolerance."""
    import random

    import duckdb

    from kafka_spark_streaming_app_spark.operators.text import (
        jaro_winkler_similarity,
    )

    rng = random.Random(13)
    con = duckdb.connect()
    for _ in range(400):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        s1 = "".join(rng.choice("abcdef ") for _ in range(n1))
        s2 = "".join(rng.choice("abcdef ") for _ in range(n2))
        ref = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert jaro_winkler_similarity(s1, s2) == ref, (s1, s2)
