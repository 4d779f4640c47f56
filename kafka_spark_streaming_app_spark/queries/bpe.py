"""BPE merge training as a distributed dataflow.

Classic byte-pair-encoding training (Sennrich et al. 2016): split
words into symbols, repeatedly (1) count adjacent symbol pairs across
the corpus weighted by word frequency, (2) take the most frequent
pair, (3) greedily merge its left-to-right occurrences. Three
iterations are unrolled here (the structure is the loop body; vocab
size is just the iteration count).

Cross-engine exactness:

- symbol sequences ride as strings with a ``chr(31)`` (unit
  separator) delimiter on both ends of every symbol, and the greedy
  merge is ``replace('<s>a<s>b<s>' -> '<s>ab<s>')`` applied TWICE —
  string replace is left-to-right non-overlapping in BOTH engines,
  but back-to-back occurrences (abab) share a delimiter, so one pass
  merges alternating occurrences and a second pass merges the
  now-isolated leftovers; two passes provably reach the BPE fixpoint
  (merging cannot create new occurrences of the same pair, and true
  symbol-overlaps like aaa are correctly left half-merged);
- pair supports are exact integer sums (word_freq per adjacent pair,
  overlaps counted — the classic count);
- the argmax pair is deterministic via (support DESC, pair ASC).

Scale posture: the corpus collapses to a (word, freq) table first —
BPE cost is vocabulary-sized, not corpus-sized (the standard trick).
Each iteration is one explode + one aggregation + a 1-row broadcast
of the winning pair back onto the vocab; the vocab table is barriered
per iteration so the chain stays shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import TOKENS_SQL, tokens
from ..registry import query
from ..sources.batch import load_table

_SEP = "\x1f"
_ITERS = 3



def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """Explode each symbol sequence into weighted adjacent pairs."""
    syms = F.filter(
        F.split(F.col("seq"), _SEP), lambda x: x != F.lit("")
    )
    withs = vocab.select("freq", syms.alias("syms"))
    pairs = withs.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").alias("support"))


def _best_pair(pairs: DataFrame) -> DataFrame:
    return pairs.orderBy(
        F.desc("support"), F.asc("a"), F.asc("b")
    ).limit(1)


def _initial_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains(_SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            F.concat(
                F.lit(_SEP),
                F.regexp_replace(F.col("word"), "(.)", "$1" + _SEP),
            ).alias("seq"),
            "freq",
        )
        .localCheckpoint(eager=False)
    )


def _train(vocab: DataFrame, iters: int) -> tuple[list, DataFrame]:
    """Run ``iters`` BPE steps; return (per-step merge rows, the vocab
    with ALL merges applied)."""
    merges = []
    for step in range(1, iters + 1):
        best = _best_pair(_adjacent_pairs(vocab)).localCheckpoint(
            eager=False
        )
        merges.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.concat("a", "b").alias("merged"),
                "support",
            )
        )
        pat = F.concat(F.lit(_SEP), "a", F.lit(_SEP), "b", F.lit(_SEP))
        rep = F.concat(F.lit(_SEP), "a", "b", F.lit(_SEP))
        # TWICE: back-to-back occurrences share a delimiter, so one
        # non-overlapping pass merges alternating occurrences; the
        # leftovers are isolated and the second pass reaches fixpoint
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                "word",
                F.replace(F.replace(F.col("seq"), pat, rep), pat, rep)
                .alias("seq"),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
    return merges, vocab


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first three BPE merges from the corpus. Per
    iteration: weighted adjacent-pair counts over the (word, freq)
    vocab (explode + one aggregation), deterministic argmax (1 row,
    broadcast), then the greedy left-to-right merge applied to every
    sequence as a plain string replace — the merge rule and the SQL
    function have identical semantics, which is what makes real BPE
    oracle-checkable."""
    merges, _ = _train(_initial_vocab(spark, sf_dir), _ITERS)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def _chain_sql(iters: int) -> str:
    """Generate the w/v0/p_k/m_k/v_k CTE chain (word carried through)
    up to v{iters} — the SQL twin of :func:`_train`."""
    parts = [
        f"""w AS (
    SELECT tok AS word, count(*) AS freq
    FROM (
        SELECT unnest({TOKENS_SQL.format(x="text")}) AS tok FROM documents
    )
    WHERE tok <> '' AND NOT contains(tok, chr(31))
    GROUP BY tok
)""",
        """v0 AS (
    SELECT word,
           chr(31) || regexp_replace(word, '(.)', '\\1' || chr(31), 'g')
               AS seq,
           freq
    FROM w
)""",
    ]
    for k in range(1, iters + 1):
        prev = f"v{k - 1}"
        parts.append(f"""p{k} AS (
    SELECT a, b, CAST(sum(freq) AS BIGINT) AS support
    FROM (
        SELECT freq, syms[i] AS a, syms[i + 1] AS b
        FROM (
            SELECT freq,
                   list_filter(string_split(seq, chr(31)), x -> x <> '')
                       AS syms
            FROM {prev}
        ), LATERAL (SELECT unnest(range(1, len(syms))) AS i)
    )
    GROUP BY a, b
)""")
        parts.append(
            f"m{k} AS (SELECT a, b, support FROM p{k} "
            f"ORDER BY support DESC, a, b LIMIT 1)"
        )
        pat = (
            f"chr(31) || (SELECT a FROM m{k}) || chr(31) "
            f"|| (SELECT b FROM m{k}) || chr(31)"
        )
        rep = (
            f"chr(31) || (SELECT a FROM m{k}) "
            f"|| (SELECT b FROM m{k}) || chr(31)"
        )
        parts.append(f"""v{k} AS (
    SELECT word,
           replace(replace(seq, {pat}, {rep}), {pat}, {rep}) AS seq,
           freq
    FROM {prev}
)""")
    return "WITH " + ",\n".join(parts)


_BPE_ORACLE = (
    _chain_sql(_ITERS)
    + """
SELECT 1 AS step, a AS left_sym, b AS right_sym, a || b AS merged, support
FROM m1
UNION ALL
SELECT 2, a, b, a || b, support FROM m2
UNION ALL
SELECT 3, a, b, a || b, support FROM m3
"""
)


_BPE_TOKENIZE_ORACLE = (
    _chain_sql(_ITERS)
    + f""",
wc AS (
    SELECT word,
           len(list_filter(string_split(seq, chr(31)), x -> x <> ''))
               AS n_sym
    FROM v{_ITERS}
),
tok AS (
    SELECT doc_id, unnest({TOKENS_SQL.format(x="text")}) AS tok
    FROM documents
)
SELECT doc_id,
       count(*) AS n_words,
       CAST(sum(wc.n_sym) AS BIGINT) AS n_bpe_tokens
FROM tok JOIN wc ON wc.word = tok.tok
GROUP BY doc_id
"""
)


def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE INFERENCE at corpus scale: apply the learned merges and
    count resulting tokens per document. The tokenizer is a per-WORD
    table (symbol count after all merges), so corpus-wide tokenization
    is a word-keyed join — the vocab is tiny next to the corpus and
    broadcasts; no per-document Python, no re-segmentation work per
    occurrence of the same word."""
    _, final_vocab = _train(_initial_vocab(spark, sf_dir), _ITERS)
    syms = F.filter(
        F.split(F.col("seq"), _SEP), lambda x: x != F.lit("")
    )
    wc = final_vocab.select(
        "word", F.size(syms).alias("n_sym")
    )
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("word")
    )
    return (
        tok.join(F.broadcast(wc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )


# registration happens after the oracle builders above exist
query("bpe_train_merges", _BPE_ORACLE)(bpe_train_merges)
query("bpe_tokenize_counts", _BPE_TOKENIZE_ORACLE)(bpe_tokenize_counts)


_FERTILITY_ORACLE = (
    _chain_sql(_ITERS)
    + f""",
wc AS (
    SELECT word,
           len(list_filter(string_split(seq, chr(31)), x -> x <> ''))
               AS n_sym
    FROM v{_ITERS}
),
tok AS (
    SELECT lang, unnest({TOKENS_SQL.format(x="text")}) AS tok
    FROM documents
),
g AS (
    SELECT lang,
           count(*) AS n_words,
           CAST(sum(wc.n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(strlen(tok.tok)) AS BIGINT) AS n_bytes,
           CAST(sum(length(tok.tok)) AS BIGINT) AS n_chars
    FROM tok JOIN wc ON wc.word = tok.tok
    GROUP BY lang
)
SELECT lang, n_words, n_bpe_tokens, n_bytes, n_chars,
       round(CAST(n_bpe_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
           AS fertility,
       round(CAST(n_bytes AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE), 6)
           AS bytes_per_token,
       round(CAST(n_chars AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE), 6)
           AS chars_per_token
FROM g
ORDER BY lang
"""
)


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: subword tokens per word
    (fertility), UTF-8 bytes per token, and characters per token under
    the corpus-trained BPE merges. This is the standard multilingual-
    tokenizer equity metric (mBERT/XLM-R literature): a language with
    fertility ≫ 1 pays more sequence length per sentence, so a
    training-mix designer re-balances either the tokenizer corpus or
    the sampling weights. Fertility here is exactly
    Σ n_sym(word)/Σ 1 over word OCCURRENCES (not vocabulary types),
    via the same broadcast word→symbol-count join as
    bpe_tokenize_counts — one explode + one tiny-key shuffle after the
    vocabulary-sized training dataflow; byte counts use octet_length
    (Spark) / strlen (DuckDB), both UTF-8 byte semantics."""
    _, final_vocab = _train(_initial_vocab(spark, sf_dir), _ITERS)
    syms = F.filter(
        F.split(F.col("seq"), _SEP), lambda x: x != F.lit("")
    )
    wc = final_vocab.select("word", F.size(syms).alias("n_sym"))
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tokens("text")).alias("word"))
    g = (
        tok.join(F.broadcast(wc), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.octet_length("word")).cast("bigint").alias("n_bytes"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
    )
    toks = F.col("n_bpe_tokens").cast("double")
    return g.select(
        "lang", "n_words", "n_bpe_tokens", "n_bytes", "n_chars",
        F.round(toks / F.col("n_words").cast("double"), 6).alias("fertility"),
        F.round(F.col("n_bytes").cast("double") / toks, 6)
            .alias("bytes_per_token"),
        F.round(F.col("n_chars").cast("double") / toks, 6)
            .alias("chars_per_token"),
    ).orderBy("lang")


query("tokenizer_fertility", _FERTILITY_ORACLE)(tokenizer_fertility)
