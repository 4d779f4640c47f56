"""Corpus-hygiene queries: Gopher-style repetition metrics, C4-style
boilerplate n-gram scoring, and benchmark-contamination scanning —
driver-facing wrappers over operators/corpus.py with exact DuckDB
oracles.

The benchmark partition for the contamination scan is synthesized
deterministically (``doc_id % 20 == 0`` → 5% of the corpus plays the
held-out eval set) so both engines agree on it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import TOKENS_SQL, shingles_sql
from ..operators.corpus import (
    boilerplate_ngrams,
    contamination_check,
    repetition_metrics,
)
from ..registry import query
from ..sources.batch import load_table

_WORDS = TOKENS_SQL.format(x="text")

# --- repetition metrics -----------------------------------------------------

_REPETITION_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           len({_WORDS}) AS n_tokens,
           len(list_distinct({_WORDS})) AS n_distinct_tokens,
           {shingles_sql("text", 2)} AS grams
    FROM documents
),
gram_counts AS (
    SELECT doc_id, gram, count(*) AS cnt
    FROM (SELECT doc_id, unnest(grams) AS gram FROM base)
    GROUP BY doc_id, gram
),
gram_agg AS (
    SELECT doc_id, sum(cnt) AS total, max(cnt) AS top,
           count(*) AS n_distinct_grams
    FROM gram_counts GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(b.n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
       CASE WHEN b.n_tokens > 0
            THEN 1.0 - b.n_distinct_tokens / CAST(b.n_tokens AS DOUBLE)
            ELSE 0.0 END AS dup_word_frac,
       CASE WHEN g.total > 0
            THEN g.top / CAST(g.total AS DOUBLE)
            ELSE 0.0 END AS top_bigram_frac,
       CASE WHEN g.total > 0
            THEN 1.0 - g.n_distinct_grams / CAST(g.total AS DOUBLE)
            ELSE 0.0 END AS dup_bigram_frac
FROM base b LEFT JOIN gram_agg g USING (doc_id)
"""


@query("repetition_metrics", _REPETITION_ORACLE)
def repetition_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition statistics (duplicate-word fraction,
    top-bigram share, duplicate-bigram fraction) — the Gopher §A1.1
    quality filters. One explode + two same-key aggregations; the
    doc-level token stats ride the groupBy keys, so there is no join
    back to the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # testdata is one parquet row group; spread the tokenize (see
    # operators/corpus.py on why production leaves this None)
    rep = repetition_metrics(
        docs, rebalance_partitions=spark.sparkContext.defaultParallelism
    )
    return rep.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("bigint").alias("n_distinct_tokens"),
        "dup_word_frac",
        "top_bigram_frac",
        "dup_bigram_frac",
    )


# --- boilerplate n-grams ----------------------------------------------------

_B_N, _B_MIN_DOCS = 5, 2

_BOILER_ORACLE = f"""
WITH grams AS (
    SELECT DISTINCT doc_id, gram AS g
    FROM (SELECT doc_id, unnest({shingles_sql("text", _B_N)}) AS gram
          FROM documents)
),
hot AS (
    SELECT g FROM grams GROUP BY g HAVING count(*) >= {_B_MIN_DOCS}
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(h.g) AS BIGINT) AS n_boiler,
       count(h.g) / CAST(count(*) AS DOUBLE) AS boiler_frac
FROM grams c LEFT JOIN hot h ON c.g = h.g
GROUP BY c.doc_id
"""


@query("boilerplate_ngrams", _BOILER_ORACLE)
def boilerplate_ngrams_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate scoring: a 5-gram present in ≥2 distinct
    documents is boilerplate; every document is scored by the fraction
    of its distinct 5-grams that are boilerplate. The join key is the
    64-bit xxhash64 of the gram — gram strings never shuffle (the
    oracle joins raw strings; match counts are hash-agnostic)."""
    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_ngrams(
        docs,
        n=_B_N,
        min_docs=_B_MIN_DOCS,
        rebalance_partitions=spark.sparkContext.defaultParallelism,
    )


# --- benchmark contamination ------------------------------------------------

_C_N, _C_THRESHOLD = 3, 0.5

_CONTAM_ORACLE = f"""
WITH flagged AS (
    SELECT doc_id, text, doc_id % 20 = 0 AS bench FROM documents
),
bgrams AS (
    SELECT DISTINCT gram AS g
    FROM (SELECT unnest({shingles_sql("text", _C_N)}) AS gram
          FROM flagged WHERE bench)
),
cgrams AS (
    SELECT DISTINCT doc_id, gram AS g
    FROM (SELECT doc_id, unnest({shingles_sql("text", _C_N)}) AS gram
          FROM flagged WHERE NOT bench)
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(b.g) AS BIGINT) AS n_hit,
       count(b.g) / CAST(count(*) AS DOUBLE) AS overlap_frac,
       count(b.g) / CAST(count(*) AS DOUBLE) >= {_C_THRESHOLD}
           AS contaminated
FROM cgrams c LEFT JOIN bgrams b ON c.g = b.g
GROUP BY c.doc_id
"""


@query("contamination_check", _CONTAM_ORACLE)
def contamination_check_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: every non-benchmark document
    scored by the fraction of its distinct trigrams that appear in the
    benchmark partition (doc_id % 20 == 0); ≥50% overlap flags the
    document for decontamination. Candidate and benchmark gram sets
    meet in a hash-keyed equi-join (build side = the benchmark's
    distinct grams — small by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    return contamination_check(
        docs,
        is_benchmark=F.col("doc_id") % 20 == 0,
        n=_C_N,
        flag_threshold=_C_THRESHOLD,
        rebalance_partitions=spark.sparkContext.defaultParallelism,
    )


# --- per-source KL divergence (data-mixing diagnostic) ----------------------
#
# KL(P_source || P_corpus) over token distributions — how far each
# source's language drifts from the mix, the number a data-mixing run
# watches when reweighting sources. Exactness discipline (the BM25 /
# PageRank pattern): each term is floor-quantized to integer
# nano-units, so the cross-token SUM — the only order-sensitive step —
# adds exact int64 values. The ln argument is built from one division
# of exact ≤2^53 integer products; every double op is a single IEEE
# rounding both engines reproduce.

_KL_ORACLE = f"""
WITH tok AS (
    SELECT source, unnest({TOKENS_SQL.format(x="text")}) AS tok
    FROM documents
),
stf AS (
    SELECT source, tok, count(*) AS tf FROM tok GROUP BY source, tok
),
stot AS (SELECT source, sum(tf) AS ts FROM stf GROUP BY source),
ctf AS (SELECT tok, sum(tf) AS ctf FROM stf GROUP BY tok),
ctot AS (SELECT sum(tf) AS tc FROM stf),
terms AS (
    SELECT s.source,
           CAST(floor(
               1e9 * (CAST(s.tf AS DOUBLE) / st.ts)
                   * ln((CAST(s.tf AS DOUBLE) * c2.tc)
                        / (CAST(st.ts AS DOUBLE) * c.ctf))
           ) AS BIGINT) AS term_u
    FROM stf s
    JOIN stot st ON st.source = s.source
    JOIN ctf c ON c.tok = s.tok
    CROSS JOIN ctot c2
)
SELECT source,
       CAST(sum(term_u) AS BIGINT) AS kl_nano,
       CAST(sum(term_u) AS DOUBLE) / 1e9 AS kl_nats
FROM terms
GROUP BY source
"""


@query("source_token_kl", _KL_ORACLE)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus token mix. One token
    explode feeds (source, token) counts behind a barrier; per-token
    corpus totals attach by token key, the two scalar totals broadcast.
    Every source present in the corpus has every one of its tokens in
    the corpus distribution, so no zero-denominator terms exist by
    construction."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.hashing import tokens as _tokens

    tok = docs.select("source", F.explode(_tokens("text")).alias("tok"))
    stf = (
        tok.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    stot = stf.groupBy("source").agg(F.sum("tf").alias("ts"))
    ctf = stf.groupBy("tok").agg(F.sum("tf").alias("ctf"))
    ctot = stf.agg(F.sum("tf").alias("tc"))
    terms = (
        stf.join(F.broadcast(stot), "source")
        .join(ctf, "tok")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            F.floor(
                F.lit(1e9)
                * (F.col("tf").cast("double") / F.col("ts"))
                * F.log(
                    (F.col("tf").cast("double") * F.col("tc"))
                    / (F.col("ts").cast("double") * F.col("ctf"))
                )
            )
            .cast("bigint")
            .alias("term_u"),
        )
    )
    return terms.groupBy("source").agg(
        F.sum("term_u").alias("kl_nano"),
        (F.sum("term_u").cast("double") / F.lit(1e9)).alias("kl_nats"),
    )


# --- n-gram novelty / memorization risk --------------------------------------

_NOVELTY_N = 5

_NOVELTY_ORACLE = f"""
WITH ds AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest({shingles_sql("text", _NOVELTY_N)}) AS shingle
        FROM documents
    )
),
freq AS (
    SELECT shingle, count(*) AS nd FROM ds GROUP BY shingle
),
per_doc AS (
    SELECT ds.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(CASE WHEN freq.nd > 1 THEN 1 END) AS BIGINT)
               AS n_shared
    FROM ds JOIN freq USING (shingle)
    GROUP BY ds.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_shingles, 0) AS n_shingles,
       coalesce(p.n_shared, 0) AS n_shared,
       CASE WHEN p.n_shingles > 0
            THEN round(1.0 - CAST(p.n_shared AS DOUBLE)
                           / CAST(p.n_shingles AS DOUBLE), 6)
       END AS novelty,
       coalesce(p.n_shared, 0) >= 5 AS dup_risk
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


@query("ngram_novelty", _NOVELTY_ORACLE)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty (the memorization-risk screen from
    the dedup literature — Lee et al.'s observation that repeated
    50-grams drive verbatim memorization, here at n=5 for the
    fixture's doc lengths): the fraction of a document's DISTINCT
    5-gram shingles that appear in no other document. novelty → 0
    flags heavily-duplicated boilerplate the exact/MinHash family
    then removes; ``dup_risk`` is the ≥5-shared-shingles triage flag.

    Dataflow: distinct (doc, shingle-of-doc) pairs, one shuffle on the
    shingle to count document frequency, one shuffle back on doc_id —
    the inverted-index shape shared with the BM25/winnowing family.
    Documents too short to have a 5-gram stay in the output (LEFT join
    from the corpus; novelty NULL, not silently dropped — the same
    no-implicit-data-loss rule as normalize_text). At 100 TB the
    shingle shuffle key would be h60(shingle) instead of the string
    (identical dataflow; string kept here so the oracle reads
    plainly), and the freq side is exactly the boilerplate_ngrams
    relation — the two queries share one scan in a fused pipeline."""
    from ..functions.hashing import word_shingles

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ds = (
        docs.select(
            "doc_id",
            F.explode(word_shingles("text", _NOVELTY_N)).alias("shingle"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    freq = ds.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    per_doc = (
        ds.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count(F.when(F.col("nd") > 1, 1)).cast("bigint")
                .alias("n_shared"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        F.when(
            F.col("n_shingles") > 0,
            F.round(
                1.0
                - F.col("n_shared").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ),
        ).alias("novelty"),
        (F.coalesce("n_shared", F.lit(0)) >= 5).alias("dup_risk"),
    )


# --- Vocabulary richness / coverage estimation ------------------------------

_VOCAB_ORACLE = f"""
WITH tok AS (
    SELECT lang, unnest({_WORDS}) AS w
    FROM documents
),
wc AS (
    SELECT lang, w, CAST(count(*) AS BIGINT) AS c
    FROM tok GROUP BY 1, 2
),
g AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS d_observed,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
    FROM wc GROUP BY lang
)
SELECT lang, n_tokens, d_observed, f1, f2,
       round(d_observed
             + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)), 6)
           AS chao1_estimate,
       round(CAST(f1 AS DOUBLE) / n_tokens, 6) AS good_turing_unseen_mass,
       round(CAST(d_observed AS DOUBLE)
             / (d_observed
                + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))), 6)
           AS vocab_coverage
FROM g
ORDER BY lang
"""


@query("vocab_coverage_estimate", _VOCAB_ORACLE)
def vocab_coverage_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness and coverage per language — the corpus-
    growth question ('how much vocabulary is still unseen, and is
    more crawling worth it?') answered with the two classical
    nonparametric estimators: bias-corrected Chao1 richness
    D + f₁(f₁−1)/(2(f₂+1)) (a lower bound on true vocabulary size
    from singleton/doubleton counts alone) and the Good-Turing
    unseen-probability mass f₁/N (the probability the NEXT token is
    a brand-new word — the quantity Good-Turing smoothing
    redistributes). vocab_coverage = D/Chao1 is the tokenizer-
    corpus sufficiency gauge: low coverage on a language says its
    vocabulary is undersampled and tokenizer_fertility there will
    degrade on real data. One scan, one (lang, word) count, a 5-row
    fold — exact integers, two final divisions; the bias-corrected
    form keeps f₂ = 0 finite. Identical SQL text on both engines
    aside from the tokenizer (DataFrame twin below); pure-Python
    Counter pin in tests/test_properties.py."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.hashing import tokens

    wc = (
        docs.select("lang", F.explode(tokens("text")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    g = wc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_observed"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    chao1 = F.col("d_observed") + F.col("f1").cast("double") * (
        F.col("f1") - 1
    ) / (2.0 * (F.col("f2") + 1))
    return g.select(
        "lang", "n_tokens", "d_observed", "f1", "f2",
        F.round(chao1, 6).alias("chao1_estimate"),
        F.round(
            F.col("f1").cast("double") / F.col("n_tokens"), 6
        ).alias("good_turing_unseen_mass"),
        F.round(
            F.col("d_observed").cast("double") / chao1, 6
        ).alias("vocab_coverage"),
    ).orderBy("lang")


# --- group fairness audit of the quality filter ------------------------------

_FAIR_LONG = 300  # n_chars threshold for the proxy "substantive" label


def _fairness_oracle() -> str:
    from .corpus_prep import _QUALITY_ORACLE

    return f"""
WITH q AS (
    SELECT doc_id, keep FROM ({_QUALITY_ORACLE})
),
j AS (
    SELECT d.lang, q.keep, d.n_chars >= {_FAIR_LONG} AS is_long
    FROM documents d JOIN q ON q.doc_id = d.doc_id
),
overall AS (
    SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS rate_all
    FROM j
),
per AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN is_long THEN 1 ELSE 0 END) AS BIGINT)
               AS n_long,
           CAST(sum(CASE WHEN keep AND is_long THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep_long,
           CAST(sum(CASE WHEN keep AND NOT is_long THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep_short
    FROM j
    GROUP BY lang
)
SELECT lang, n, n_keep,
       round(CAST(n_keep AS DOUBLE) / n, 6) AS keep_rate,
       round(CAST(n_keep AS DOUBLE) / n - overall.rate_all, 6)
           AS parity_gap,
       round(CASE WHEN n_long > 0
                  THEN CAST(n_keep_long AS DOUBLE) / n_long END, 6)
           AS tpr_proxy,
       round(CASE WHEN n - n_long > 0
                  THEN CAST(n_keep_short AS DOUBLE) / (n - n_long) END, 6)
           AS fpr_proxy
FROM per, overall
"""


@query("group_fairness_metrics", _fairness_oracle())
def group_fairness_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the quality filter across languages:
    per-language keep rate, demographic-parity gap vs the overall
    rate, and equalized-odds proxies (TPR/FPR against the
    length-based 'substantive document' proxy label, n_chars >= 300)
    — the release gate that catches a quality classifier silently
    de-selecting a language before the corpus ships. One scan through
    the (already codegen'd) quality logit + one cells-proportional
    aggregation; the overall rate is a broadcast one-row join."""
    from .corpus_prep import quality_score

    docs = load_table(spark, sf_dir, "documents")
    j = quality_score(docs).select("doc_id", "keep").join(
        docs.select(
            "doc_id", "lang", (F.col("n_chars") >= _FAIR_LONG).alias(
                "is_long"
            )
        ),
        "doc_id",
    )
    overall = j.agg(
        (
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("rate_all")
    )
    per = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep"),
        F.sum(F.when(F.col("is_long"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_long"),
        F.sum(F.when(F.col("keep") & F.col("is_long"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep_long"),
        F.sum(F.when(F.col("keep") & ~F.col("is_long"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep_short"),
    )
    return per.crossJoin(F.broadcast(overall)).select(
        "lang",
        "n",
        "n_keep",
        F.round(F.col("n_keep").cast("double") / F.col("n"), 6).alias(
            "keep_rate"
        ),
        F.round(
            F.col("n_keep").cast("double") / F.col("n")
            - F.col("rate_all"),
            6,
        ).alias("parity_gap"),
        F.round(
            F.when(
                F.col("n_long") > 0,
                F.col("n_keep_long").cast("double") / F.col("n_long"),
            ),
            6,
        ).alias("tpr_proxy"),
        F.round(
            F.when(
                F.col("n") - F.col("n_long") > 0,
                F.col("n_keep_short").cast("double")
                / (F.col("n") - F.col("n_long")),
            ),
            6,
        ).alias("fpr_proxy"),
    )


# Flesch readability: the classic vowel-group syllable heuristic
# (maximal [aeiouy]+ runs per word, min 1) — deterministic and
# regex-identical in Java and RE2, so the per-doc counts and the
# derived scores (same IEEE expression tree) hash bit-exact.
_READABILITY_ORACLE = f"""
WITH base AS (
    SELECT doc_id, lang, {_WORDS} AS words,
           greatest(1, len(regexp_extract_all(
               lower(coalesce(text, '')), '[.!?]+'))) AS n_sentences
    FROM documents
),
syl AS (
    SELECT doc_id, lang, n_sentences,
           len(words) AS n_words,
           list_sum(list_transform(words,
               w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))))
               AS n_syllables
    FROM base
)
SELECT doc_id, lang,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
           AS flesch_ease,
       0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
           + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59
           AS fk_grade
FROM syl
"""


@query("readability_scores", _READABILITY_ORACLE)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability scoring (Flesch reading ease +
    Flesch-Kincaid grade) — a standard quality-filter feature for
    training-corpus curation, next to the length/stopword heuristics
    of `quality_classifier`. Syllables use the deterministic
    vowel-group heuristic (maximal [aeiouy]+ runs per word, floor 1);
    sentences count [.!?]+ runs (floor 1). Everything is a scan-side
    projection — regexp counts and a higher-order sum fold, zero
    shuffles, zero Python — so at 100 TB this is a single
    map-partitions pass that pipelines with any downstream filter."""
    from ..functions.hashing import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        tokens("text").alias("words"),
        F.greatest(
            F.lit(1),
            F.size(
                F.regexp_extract_all(
                    F.lower(F.coalesce(F.col("text"), F.lit(""))),
                    F.lit("[.!?]+"),
                    0,
                )
            ),
        ).alias("n_sentences"),
    )
    syl = base.select(
        "doc_id",
        "lang",
        "n_sentences",
        F.size("words").alias("n_words"),
        F.expr(
            "aggregate(words, 0,"
            " (acc, w) -> acc + greatest(1,"
            "   size(regexp_extract_all(w, '[aeiouy]+', 0))))"
        ).alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return syl.select(
        "doc_id",
        "lang",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade"
        ),
    )
