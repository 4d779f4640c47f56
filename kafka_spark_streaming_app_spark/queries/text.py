"""Text-analysis queries over ``documents`` (north-star extension
scope): quality stats, token counting, language ID, fingerprints."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import NORMALIZE_SQL, TOKENS_SQL, h60_sql
from ..operators.text import (
    STOPWORDS,
    fingerprints,
    language_id,
    text_stats,
    token_counts,
)
from ..registry import query
from ..sources.batch import load_table

_NORM = NORMALIZE_SQL.format(x="text")
_WORDS = TOKENS_SQL.format(x="text")


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_STATS_ORACLE = f"""
WITH d AS (
    SELECT
        doc_id,
        {_NORM} AS norm,
        {_WORDS} AS words
    FROM documents
),
m AS (
    SELECT
        doc_id,
        len(words) AS n_tokens,
        length(norm) AS n_chars,
        length(norm) - length(regexp_replace(norm, '[^\\w\\s]', '', 'g')) AS n_punct,
        len(list_filter(words, w -> w IN ({_in_list(STOPWORDS["en"])}))) AS n_stop,
        len(list_distinct(words)) AS n_distinct
    FROM d
)
SELECT
    doc_id,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(n_chars AS BIGINT) AS n_chars_norm,
    CASE WHEN n_tokens > 0
         THEN CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens
         ELSE 0.0 END AS avg_word_len,
    CASE WHEN n_tokens > 0
         THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END AS type_token_ratio,
    CASE WHEN n_tokens > 0
         THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
    CASE WHEN n_chars > 0
         THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio
FROM m
"""


@query("text_stats", _STATS_ORACLE)
def text_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length / diversity / stopword /
    punctuation ratios) — the standard pre-filter feature set."""
    return text_stats(load_table(spark, sf_dir, "documents"))


_TOKEN_ORACLE = f"""
SELECT
    doc_id,
    CAST(len({_WORDS}) AS BIGINT) AS n_words,
    CAST(len(regexp_extract_all({_NORM}, '[a-z0-9]{{1,4}}')) AS BIGINT) AS n_subwords
FROM documents
"""


@query("token_counts", _TOKEN_ORACLE)
def token_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace word count + BPE-ish greedy subword count."""
    return token_counts(load_table(spark, sf_dir, "documents"))


_LANG_SCORES = "\n    UNION ALL\n".join(
    f"    SELECT doc_id, '{lang}' AS lang_guess, "
    f"len(list_filter(words, w -> w IN ({_in_list(words_)}))) AS score FROM d"
    for lang, words_ in sorted(STOPWORDS.items())
)

_LANG_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS words FROM documents),
scores AS (
{_LANG_SCORES}
)
SELECT doc_id, lang_guess, CAST(score AS BIGINT) AS score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, lang_guess) AS rn
    FROM scores
) WHERE rn = 1
"""


@query("language_id", _LANG_ORACLE)
def language_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID with deterministic argmax."""
    return language_id(load_table(spark, sf_dir, "documents"))


_FP_ORACLE = f"""
SELECT
    doc_id,
    md5({_NORM}) AS fp_md5,
    {h60_sql(_NORM)} AS fp_h60,
    md5(substr({_NORM}, 1, 80)) AS fp_prefix
FROM documents
"""


@query("doc_fingerprints", _FP_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content + prefix fingerprints (md5 hex, 60-bit int)."""
    return fingerprints(load_table(spark, sf_dir, "documents"))
