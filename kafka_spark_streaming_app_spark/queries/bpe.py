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


# --- WordPiece-style greedy longest-match tokenizer --------------------------

_WP_MAXLEN = 4   # piece length cap
_WP_TOPV = 40    # multi-char vocab budget
_WP_STEPS = 8    # >= max word length in the corpus (guarded in Spark)


def _wp_oracle() -> str:
    steps = []
    for i in range(1, _WP_STEPS + 1):
        p = i - 1
        steps.append(f""",
m{i} AS (
    SELECT word, freq, pos, piece, form, len(piece) AS pl FROM (
        SELECT f.word, f.freq, f.pos, v.piece, v.form,
               row_number() OVER (PARTITION BY f.word, f.pos
                                  ORDER BY len(v.piece) DESC) AS rk
        FROM f{p} f JOIN vocab v
          ON v.form = (CASE WHEN f.pos = 1 THEN 'start' ELSE 'cont' END)
         AND v.piece = substr(f.word, f.pos, len(v.piece))
    ) WHERE rk = 1
),
f{i} AS (
    SELECT word, freq, pos + pl AS pos FROM m{i}
    WHERE pos + pl <= len(word)
)""")
    emits = "\nUNION ALL\n".join(
        f"SELECT word, freq, form, piece FROM m{i}"
        for i in range(1, _WP_STEPS + 1)
    )
    return f"""
WITH words AS (
    SELECT w AS word, count(*) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(x="text")}) AS w FROM documents
    ) WHERE w <> ''
    GROUP BY w
),
cand AS (
    SELECT form, piece, sum(freq) AS wt FROM (
        SELECT CASE WHEN p = 1 THEN 'start' ELSE 'cont' END AS form,
               substr(word, CAST(p AS INTEGER), CAST(l AS INTEGER)) AS piece,
               freq
        FROM words,
             unnest(range(1, len(word) + 1)) AS t1(p),
             unnest(range(1, {_WP_MAXLEN + 1})) AS t2(l)
        WHERE p + l - 1 <= len(word)
    ) GROUP BY form, piece
),
multi AS (
    SELECT form, piece FROM (
        SELECT *, row_number() OVER (
            ORDER BY wt DESC, len(piece) DESC, form, piece) AS rk
        FROM cand WHERE len(piece) >= 2
    ) WHERE rk <= {_WP_TOPV}
),
vocab AS (
    SELECT form, piece FROM cand WHERE len(piece) = 1
    UNION
    SELECT form, piece FROM multi
),
f0 AS (SELECT word, freq, 1 AS pos FROM words){"".join(steps)},
emits AS (
{emits}
)
SELECT form, piece,
       CAST(count(DISTINCT word) AS BIGINT) AS n_words,
       CAST(sum(freq) AS BIGINT) AS total_uses
FROM emits
GROUP BY form, piece
"""


@query("wordpiece_greedy_tokenize", _wp_oracle())
def wordpiece_greedy_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style tokenizer trained and applied IN the engine:
    vocab = every observed single character (in word-start and
    continuation forms — guarantees greedy always consumes, no UNK)
    plus the top-40 multi-char substrings (length 2-4) by
    corpus-frequency weight; tokenization is greedy LONGEST-MATCH
    from the left, the WordPiece/BERT inference rule (vs BPE's
    merge-order rule — `bpe_tokenize_counts` — the two production
    tokenizer families side by side). Output: per (form, piece) the
    distinct words using it and its freq-weighted total uses.

    Scale shape: the corpus collapses to (word, freq) first (the BPE
    trick — everything after is vocabulary-sized, not corpus-sized);
    candidate pieces are one explode+aggregate; the greedy loop is
    max-word-length broadcast-join steps over the shrinking (word,
    pos) frontier. The global vocab-ranking window operates on piece
    cardinality (the documented vocabulary-sized exemption). The
    unroll depth is guarded: words longer than 8 chars (_WP_STEPS)
    raise loudly rather than truncate silently."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(F.col("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    max_len = words.agg(F.max(F.length("word"))).first()[0]
    if max_len is not None and max_len > _WP_STEPS:
        raise ValueError(
            f"wordpiece_greedy_tokenize: corpus has a {max_len}-char "
            f"word but the greedy unroll covers {_WP_STEPS} steps — "
            "raise _WP_STEPS (and the oracle unroll) rather than "
            "truncating words silently"
        )
    cand = (
        words.select(
            "word",
            "freq",
            F.posexplode(
                F.sequence(F.lit(1), F.length("word"))
            ).alias("_i", "p"),
        )
        .select(
            "word",
            "freq",
            "p",
            F.explode(F.sequence(F.lit(1), F.lit(_WP_MAXLEN))).alias("l"),
        )
        .filter(F.col("p") + F.col("l") - 1 <= F.length("word"))
        .select(
            F.when(F.col("p") == 1, F.lit("start"))
            .otherwise(F.lit("cont"))
            .alias("form"),
            F.substring(F.col("word"), F.col("p"), F.col("l")).alias(
                "piece"
            ),
            "freq",
        )
        .groupBy("form", "piece")
        .agg(F.sum("freq").alias("wt"))
    )
    wv = Window.orderBy(
        F.desc("wt"),
        F.desc(F.length("piece")),
        F.asc("form"),
        F.asc("piece"),
    )
    multi = (
        cand.filter(F.length("piece") >= 2)
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _WP_TOPV)
        .select("form", "piece")
    )
    vocab = (
        cand.filter(F.length("piece") == 1)
        .select("form", "piece")
        .union(multi)
        .distinct()
        .localCheckpoint(eager=False)
    )
    frontier = words.select("word", "freq", F.lit(1).alias("pos"))
    emits = []
    wm = Window.partitionBy("word", "pos").orderBy(
        F.desc(F.length("piece"))
    )
    for _ in range(_WP_STEPS):
        matched = (
            frontier.join(
                F.broadcast(vocab),
                (
                    F.col("form")
                    == F.when(F.col("pos") == 1, F.lit("start")).otherwise(
                        F.lit("cont")
                    )
                )
                & (
                    F.col("piece")
                    == F.substring(
                        F.col("word"), F.col("pos"), F.length("piece")
                    )
                ),
            )
            .withColumn("rk", F.row_number().over(wm))
            .filter(F.col("rk") == 1)
            .select(
                "word",
                "freq",
                "pos",
                "form",
                "piece",
                F.length("piece").alias("pl"),
            )
            .localCheckpoint(eager=False)
        )
        emits.append(matched.select("word", "freq", "form", "piece"))
        frontier = matched.filter(
            F.col("pos") + F.col("pl") <= F.length("word")
        ).select(
            "word", "freq", (F.col("pos") + F.col("pl")).alias("pos")
        )
    all_emits = emits[0]
    for e in emits[1:]:
        all_emits = all_emits.unionByName(e)
    return all_emits.groupBy("form", "piece").agg(
        F.count_distinct("word").cast("bigint").alias("n_words"),
        F.sum("freq").cast("bigint").alias("total_uses"),
    )


# --- Viterbi (DP-optimal) segmentation over the SAME WordPiece vocab ---------
# The third production tokenizer family: BPE applies merge order,
# WordPiece applies greedy longest-match, SentencePiece-style
# inference applies dynamic programming over the whole word. Here the
# DP minimizes piece count (uniform edge cost) with a deterministic
# (np, path) tie-break, over exactly the vocab wordpiece_greedy builds
# — so the two queries contrast greedy vs optimal on identical inputs
# (greedy is provably suboptimal on e.g. vocab {ab,bcd,a}, word
# "abcd": 3 pieces greedy vs 2 optimal).


def _viterbi_oracle() -> str:
    steps = []
    for i in range(1, _WP_STEPS + 1):
        p = i - 1
        steps.append(f""",
e{i} AS (
    SELECT f.word, f.freq, f.pos + len(v.piece) AS pos, f.np + 1 AS np,
           f.path || CASE WHEN f.pos = 0 THEN '' ELSE ' ' END ||
           CASE WHEN f.pos = 0 THEN v.piece ELSE '##' || v.piece END AS path
    FROM f{p} f JOIN vocab v
      ON v.form = (CASE WHEN f.pos = 0 THEN 'start' ELSE 'cont' END)
     AND v.piece = substr(f.word, f.pos + 1, len(v.piece))
),
f{i} AS (
    SELECT word, freq, pos, np, path FROM (
        SELECT *, row_number() OVER (PARTITION BY word, pos
                                     ORDER BY np, path) AS rk
        FROM (SELECT * FROM f{p} UNION ALL SELECT * FROM e{i})
    ) WHERE rk = 1
)""")
    return f"""
WITH words AS (
    SELECT w AS word, count(*) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(x="text")}) AS w FROM documents
    ) WHERE w <> ''
    GROUP BY w
),
cand AS (
    SELECT form, piece, sum(freq) AS wt FROM (
        SELECT CASE WHEN p = 1 THEN 'start' ELSE 'cont' END AS form,
               substr(word, CAST(p AS INTEGER), CAST(l AS INTEGER)) AS piece,
               freq
        FROM words,
             unnest(range(1, len(word) + 1)) AS t1(p),
             unnest(range(1, {_WP_MAXLEN + 1})) AS t2(l)
        WHERE p + l - 1 <= len(word)
    ) GROUP BY form, piece
),
multi AS (
    SELECT form, piece FROM (
        SELECT *, row_number() OVER (
            ORDER BY wt DESC, len(piece) DESC, form, piece) AS rk
        FROM cand WHERE len(piece) >= 2
    ) WHERE rk <= {_WP_TOPV}
),
vocab AS (
    SELECT form, piece FROM cand WHERE len(piece) = 1
    UNION
    SELECT form, piece FROM multi
),
f0 AS (SELECT word, freq, 0 AS pos, 0 AS np, '' AS path
       FROM words){"".join(steps)}
SELECT word, CAST(freq AS BIGINT) AS freq,
       CAST(np AS INTEGER) AS n_pieces, path AS segmentation
FROM f{_WP_STEPS} WHERE pos = len(word)
"""


@query("viterbi_segmentation", _viterbi_oracle())
def viterbi_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-OPTIMAL subword segmentation (SentencePiece-style Viterbi
    inference): per corpus word, the minimum-piece segmentation over
    the same single-char + top-40-multi vocab wordpiece_greedy builds,
    with a deterministic (piece-count, path) tie-break applied
    identically at every DP state in both engines. The corpus
    collapses to (word, freq) first, so the DP frontier is
    vocabulary-sized x word positions regardless of corpus scale; each
    of the max-word-length rounds is one broadcast join + one
    per-(word, pos) min-reduce; the unroll depth guard raises loudly
    on longer words rather than truncating."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(F.col("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    max_len = words.agg(F.max(F.length("word"))).first()[0]
    if max_len is not None and max_len > _WP_STEPS:
        raise ValueError(
            f"viterbi_segmentation: corpus has a {max_len}-char word "
            f"but the DP unroll covers {_WP_STEPS} steps — raise "
            "_WP_STEPS (and the oracle unroll) rather than truncating"
        )
    cand = (
        words.select(
            "word",
            "freq",
            F.posexplode(F.sequence(F.lit(1), F.length("word"))).alias(
                "_i", "p"
            ),
        )
        .select(
            "word",
            "freq",
            "p",
            F.explode(F.sequence(F.lit(1), F.lit(_WP_MAXLEN))).alias("l"),
        )
        .filter(F.col("p") + F.col("l") - 1 <= F.length("word"))
        .select(
            F.when(F.col("p") == 1, F.lit("start"))
            .otherwise(F.lit("cont"))
            .alias("form"),
            F.substring(F.col("word"), F.col("p"), F.col("l")).alias("piece"),
            "freq",
        )
        .groupBy("form", "piece")
        .agg(F.sum("freq").alias("wt"))
    )
    wv = Window.orderBy(
        F.desc("wt"), F.desc(F.length("piece")), F.asc("form"), F.asc("piece")
    )
    multi = (
        cand.filter(F.length("piece") >= 2)
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _WP_TOPV)
        .select("form", "piece")
    )
    vocab = (
        cand.filter(F.length("piece") == 1)
        .select("form", "piece")
        .union(multi)
        .distinct()
        .localCheckpoint(eager=False)
    )
    states = words.select(
        "word",
        "freq",
        F.lit(0).alias("pos"),
        F.lit(0).alias("np"),
        F.lit("").alias("path"),
    )
    wm = Window.partitionBy("word", "pos").orderBy(F.asc("np"), F.asc("path"))
    for _ in range(_WP_STEPS):
        ext = states.join(
            F.broadcast(vocab),
            (
                F.col("form")
                == F.when(F.col("pos") == 0, F.lit("start")).otherwise(
                    F.lit("cont")
                )
            )
            & (
                F.col("piece")
                == F.substring(
                    F.col("word"), F.col("pos") + 1, F.length("piece")
                )
            ),
        ).select(
            "word",
            "freq",
            (F.col("pos") + F.length("piece")).alias("pos"),
            (F.col("np") + 1).alias("np"),
            F.concat(
                F.col("path"),
                F.when(F.col("pos") == 0, F.lit("")).otherwise(F.lit(" ")),
                F.when(F.col("pos") == 0, F.col("piece")).otherwise(
                    F.concat(F.lit("##"), F.col("piece"))
                ),
            ).alias("path"),
        )
        states = (
            states.unionByName(ext)
            .withColumn("rk", F.row_number().over(wm))
            .filter(F.col("rk") == 1)
            .drop("rk")
            .localCheckpoint(eager=False)
        )
    return states.filter(F.col("pos") == F.length("word")).select(
        "word",
        F.col("freq").cast("bigint").alias("freq"),
        F.col("np").cast("int").alias("n_pieces"),
        F.col("path").alias("segmentation"),
    )
