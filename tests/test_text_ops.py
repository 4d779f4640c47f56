

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
