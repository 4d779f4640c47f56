"""Text-analysis queries over ``documents`` (north-star extension
scope): quality stats, token counting, language ID, fingerprints."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import NORMALIZE_SQL, TOKENS_SQL, h60_sql, shingles_sql
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


# --- hashing-trick retrieval (BoW vectors without a trained embedder) -------

_HT_DIM = 32
_HT_TOKEN_BUCKET = h60_sql("tok") + f" % {_HT_DIM}"

_HASHING_TOPK_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({TOKENS_SQL.format(x="text")}) AS tok
    FROM documents
),
bucketed AS (
    SELECT doc_id, {_HT_TOKEN_BUCKET} AS b, count(*) AS cnt
    FROM tok GROUP BY doc_id, {_HT_TOKEN_BUCKET}
),
vec AS (
    SELECT d.doc_id, list(CAST(coalesce(bk.cnt, 0) AS DOUBLE) ORDER BY i.i) AS v
    FROM (SELECT DISTINCT doc_id FROM bucketed) d
    CROSS JOIN range(0, {_HT_DIM}) i(i)
    LEFT JOIN bucketed bk ON bk.doc_id = d.doc_id AND bk.b = i.i
    GROUP BY d.doc_id
),
n AS (
    SELECT doc_id, v,
           sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
    FROM vec
),
q AS (
    SELECT doc_id AS query_id, v AS qv, norm AS qnorm FROM n
    WHERE doc_id < 5
),
scored AS (
    SELECT q.query_id, c.doc_id AS corpus_id,
           round(list_inner_product(q.qv, c.v) / (q.qnorm * c.norm), 6)
               AS cosine
    FROM n c, q WHERE c.doc_id <> q.query_id
)
SELECT query_id, corpus_id, cosine, rank FROM (
    SELECT *,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


@query("text_hashing_topk", _HASHING_TOPK_ORACLE)
def text_hashing_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text retrieval WITHOUT a trained embedder: hashing-trick
    bag-of-words vectors (token → h60 % 32 bucket counts, the
    HashingTF construction) + cosine top-5 through the same
    brute-force top-k operator the embedding queries use. One explode
    → (doc, bucket) count aggregation → row-local array reassembly
    via map lookup; integer counts make the vectors exact, so the
    whole retrieval is hash-checked cross-engine."""
    from pyspark.sql import functions as F

    from ..functions.hashing import h60, tokens
    from ..operators.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).select("doc_id", (h60(F.col("tok")) % _HT_DIM).alias("b"))
    counts = t.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("cnt"))
    vec = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("m")
    ).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_HT_DIM - 1)),
            lambda i: F.coalesce(
                F.element_at("m", i.cast("bigint")), F.lit(0)
            ).cast("double"),
        ).alias("v"),
    )
    queries_df = vec.filter(F.col("doc_id") < 5)
    out = brute_force_topk(
        vec, queries_df, k=5, id_col="doc_id", vec_col="v"
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# --- BM25 retrieval (inverted-index shape, fixed-point scoring) -------------
#
# k1 = 1.2, b = 0.75. The per-term denominator tf + k1*(1-b+b*dl/avgdl)
# is multiplied through by 10*L (L = total corpus tokens, avgdl = L/N):
#
#     contrib = idf_u * (22 * L * tf) // (10*L*tf + 3*L + 9*dl*N)
#
# so every per-term contribution is an exact BIGINT once idf is
# quantized to idf_u = floor(1e6 * ln((2(N-df)+1)/(2df+1) + 1)) — the
# repo's floor-scaled-integer discipline (see copurchase_pagerank):
# ranking compares exact integers, never engine-rounded doubles. The
# production path at 100 TB swaps the exact integers for plain doubles
# (and this fixture's int64 headroom note goes away with them).

# Shared BM25 scored-CTE block: the inverted-index dataflow up to
# (query_id, corpus_id, score_u) — reused by the top-k query and the
# reciprocal-rank-fusion hybrid retriever.
_BM25_SCORED_CTES = f"""tok AS (
    SELECT doc_id, unnest({TOKENS_SQL.format(x="text")}) AS tok
    FROM documents
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok
),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n, sum(dl) AS l FROM dl),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
q AS (
    SELECT doc_id AS query_id, tok FROM tf WHERE doc_id < 3
),
contrib AS (
    SELECT q.query_id, tf.doc_id AS corpus_id,
           CAST(floor(1000000.0 * ln(
               (2.0 * (s.n - dfreq.df) + 1.0) / (2.0 * dfreq.df + 1.0)
               + 1.0
           )) AS BIGINT)
           * (22 * s.l * tf.tf)
           // (10 * s.l * tf.tf + 3 * s.l + 9 * dl.dl * s.n) AS c
    FROM q
    JOIN tf ON tf.tok = q.tok AND tf.doc_id <> q.query_id
    JOIN dl ON dl.doc_id = tf.doc_id
    JOIN dfreq ON dfreq.tok = q.tok
    CROSS JOIN stats s
),
scored AS (
    SELECT query_id, corpus_id, sum(c) AS score_u
    FROM contrib GROUP BY query_id, corpus_id
)"""

_BM25_ORACLE = f"""
WITH {_BM25_SCORED_CTES}
SELECT query_id, corpus_id,
       CAST(score_u AS DOUBLE) / 1000000.0 AS score,
       rank
FROM (
    SELECT *,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_u DESC, corpus_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


def _bm25_scored(spark: SparkSession, sf_dir: str):
    """(query_id, corpus_id, score_u): the BM25 inverted-index
    dataflow up to integer scores — shared by `text_bm25_topk` and
    `rrf_hybrid_retrieval` (mirrors `_BM25_SCORED_CTES`)."""
    from pyspark.sql import functions as F

    from ..functions.hashing import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # one tf subtree feeds four consumers — barrier it so the plan
    # doesn't re-expand the corpus scan per consumer
    tf = tf.localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    q = tf.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    idf_u = F.floor(
        F.lit(1000000.0)
        * F.log(
            (2.0 * (F.col("n") - F.col("df")) + 1.0)
            / (2.0 * F.col("df") + 1.0)
            + 1.0
        )
    ).cast("bigint")
    contrib = (
        tf.join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            F.col("doc_id").alias("corpus_id"),
            (
                idf_u
                * (F.lit(22) * F.col("l") * F.col("tf"))
            ).alias("num"),
            (
                F.lit(10) * F.col("l") * F.col("tf")
                + F.lit(3) * F.col("l")
                + F.lit(9) * F.col("dl") * F.col("n")
            ).alias("den"),
        )
        .select(
            "query_id", "corpus_id", F.expr("num div den").alias("c")
        )
    )
    return contrib.groupBy("query_id", "corpus_id").agg(
        F.sum("c").alias("score_u")
    )


@query("text_bm25_topk", _BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 retrieval as the INVERTED-INDEX dataflow: the tf
    table (one row per posting) is the index, queries fan out via a
    term-keyed equi-join against it — never a doc×doc product; df and
    dl attach by key, corpus-wide N/L constants by broadcast of a
    1-row aggregate. Scoring is floor-scaled integer BM25 (k1=1.2,
    b=0.75) so the ranking is an exact-integer sort cross-engine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), "corpus_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "corpus_id",
            (F.col("score_u").cast("double") / 1000000.0).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- winnowing fingerprints (MOSS) ------------------------------------------
#
# Word 3-gram rolling hashes, window w=4: each window of 4 consecutive
# gram hashes contributes its minimum (leftmost on ties), and the
# distinct selected (hash, position) pairs are the document's
# fingerprints — the MOSS guarantee that any shared run of ≥ w+k-1
# tokens yields at least one shared fingerprint. Hash and position are
# packed into one BIGINT (30-bit hash · 2^31 + position) so the
# min-with-tie-break is a plain integer window MIN on both engines.

_WINNOW_W = 4
_H30 = 1 << 30
_POS_SCALE = 1 << 31

_WINNOW_ORACLE = f"""
WITH d AS (
    SELECT doc_id, {shingles_sql("text", 3)} AS sh FROM documents
),
g AS (
    SELECT doc_id, p.p - 1 AS pos,
           ({h60_sql("sh[p.p]")} % {_H30}) * {_POS_SCALE} + p.p - 1 AS pack
    FROM d, LATERAL (SELECT unnest(range(1, len(sh) + 1)) AS p) p
),
w AS (
    SELECT doc_id, pos,
           min(pack) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                           AND {_WINNOW_W - 1} FOLLOWING) AS wmin,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM g
)
SELECT DISTINCT doc_id,
       wmin // {_POS_SCALE} AS fp,
       CAST(wmin % {_POS_SCALE} AS BIGINT) AS fp_pos
FROM w
WHERE pos <= greatest(n - {_WINNOW_W}, 0)
"""


@query("winnow_fingerprints", _WINNOW_ORACLE)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    local-minimum selection over a sliding window of gram hashes. One
    explode + ONE doc-keyed shuffle (both window functions share the
    partition/order), then distinct — no joins, no corpus-wide state;
    the selected-fingerprint density is ~2/(w+1) of grams regardless
    of corpus size."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.hashing import h60, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    # tokenize+md5 dominates; a single-row-group corpus file would run
    # it in ONE task. Repartitioning BY doc_id moves the window's
    # required exchange BEFORE the explode — same single shuffle, but
    # shingling/hashing now runs at full parallelism (the corpus-op
    # rebalance convention, here free because the window wanted this
    # partitioning anyway).
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    g = docs.select(
        "doc_id", F.posexplode(word_shingles("text", 3)).alias("pos", "gram")
    ).select(
        "doc_id",
        "pos",
        ((h60(F.col("gram")) % _H30) * _POS_SCALE + F.col("pos")).alias(
            "pack"
        ),
    )
    wspec = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    nspec = Window.partitionBy("doc_id")
    sel = g.select(
        "doc_id",
        "pos",
        F.min("pack").over(wspec).alias("wmin"),
        F.count(F.lit(1)).over(nspec).alias("n"),
    ).filter(
        F.col("pos") <= F.greatest(F.col("n") - _WINNOW_W, F.lit(0))
    )
    return sel.select(
        "doc_id",
        F.expr(f"wmin div {_POS_SCALE}").alias("fp"),
        (F.col("wmin") % _POS_SCALE).cast("bigint").alias("fp_pos"),
    ).distinct()


# --- URL/domain analytics ---------------------------------------------------

_HOST_RE = "https?://([^/]+)"

_DOMAIN_ORACLE = f"""
WITH synth AS (
    SELECT doc_id, n_chars,
           'https://' || CASE CAST(doc_id % 7 AS INTEGER)
               WHEN 0 THEN 'shop' WHEN 1 THEN 'news' WHEN 2 THEN 'blog'
               WHEN 3 THEN 'docs' WHEN 4 THEN 'forum' WHEN 5 THEN 'wiki'
               ELSE 'mail' END
           || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
    FROM documents
)
SELECT regexp_extract(url, '{_HOST_RE}', 1) AS host,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM synth
GROUP BY host
"""


@query("url_domain_stats", _DOMAIN_ORACLE)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus accounting (the crawl-side ledger behind
    per-source caps): host extracted with the same regex on both
    engines from deterministically synthesized URLs, per-host doc
    count + exact character totals (avg = one division of exact
    integers). One scan, one aggregation."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.element_at(
            F.array(
                *[
                    F.lit(s)
                    for s in (
                        "shop", "news", "blog", "docs", "forum", "wiki",
                        "mail",
                    )
                ]
            ),
            (did % 7).cast("int") + 1,
        ),
        F.lit(".example.com/p/"),
        did.cast("string"),
    )
    synth = docs.select("doc_id", "n_chars", url.alias("url"))
    return synth.select(
        F.regexp_extract("url", _HOST_RE, 1).alias("host"), "n_chars"
    ).groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "avg_chars"
        ),
    )


# --- positional-index phrase search -----------------------------------------

_PHRASE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {TOKENS_SQL.format(x="text")} AS w FROM documents
),
post AS (
    SELECT doc_id, i AS pos, w[i] AS tok
    FROM t, unnest(range(1, len(w) + 1)) AS r(i)
),
tri AS (
    SELECT p1.tok AS w1, p2.tok AS w2, p3.tok AS w3,
           count(*) AS n_occurrences,
           count(DISTINCT p1.doc_id) AS n_docs
    FROM post p1
    JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
    JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
    GROUP BY 1, 2, 3
),
top AS (
    SELECT * FROM tri
    ORDER BY n_docs DESC, n_occurrences DESC, w1, w2, w3 LIMIT 1
),
hits AS (
    SELECT p1.doc_id, p1.pos
    FROM post p1
    JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
    JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
    JOIN top ON p1.tok = top.w1 AND p2.tok = top.w2 AND p3.tok = top.w3
)
SELECT h.doc_id, h.pos,
       (SELECT w1 || ' ' || w2 || ' ' || w3 FROM top) AS phrase
FROM hits h
ORDER BY h.doc_id, h.pos
"""


@query("phrase_search_positional", _PHRASE_ORACLE)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search on a POSITIONAL inverted index — the
    retrieval face BM25's bag-of-words cannot express: postings are
    (doc, pos, token) rows, and a 3-word phrase is two adjacency
    equi-joins on (doc, pos+1). The searched phrase is the corpus's
    own hottest trigram (deterministic argmax), so the query is
    non-vacuous at every SF. Scale: postings shuffle once on the
    (doc) key for the adjacency joins; the 1-row phrase broadcast
    prunes p1/p2/p3 by token before joining — at 100 TB the token
    filter pushes into the postings scan exactly like any selective
    dimension."""
    from pyspark.sql import functions as F

    from ..functions.hashing import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents")
    post = docs.select(
        "doc_id",
        F.posexplode(_tokens("text")).alias("pos0", "tok"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    ).localCheckpoint(eager=False)  # postings feed mining AND search

    p1, p2, p3 = post.alias("p1"), post.alias("p2"), post.alias("p3")
    adjacency = p1.join(
        p2,
        (F.col("p2.doc_id") == F.col("p1.doc_id"))
        & (F.col("p2.pos") == F.col("p1.pos") + 1),
    ).join(
        p3,
        (F.col("p3.doc_id") == F.col("p1.doc_id"))
        & (F.col("p3.pos") == F.col("p1.pos") + 2),
    )
    tri = adjacency.groupBy(
        F.col("p1.tok").alias("w1"),
        F.col("p2.tok").alias("w2"),
        F.col("p3.tok").alias("w3"),
    ).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col("p1.doc_id")).alias("n_docs"),
    )
    top = tri.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), "w1", "w2", "w3"
    ).limit(1)
    hits = adjacency.join(
        F.broadcast(top),
        (F.col("p1.tok") == F.col("w1"))
        & (F.col("p2.tok") == F.col("w2"))
        & (F.col("p3.tok") == F.col("w3")),
    )
    return hits.select(
        F.col("p1.doc_id").alias("doc_id"),
        F.col("p1.pos").alias("pos"),
        F.concat_ws(" ", "w1", "w2", "w3").alias("phrase"),
    ).orderBy("doc_id", "pos")


# --- content-defined chunking + sub-document dedup --------------------------

_CDC_MOD = 16  # E[chunk] ~ 16 words: boundary where gram hash % 16 == 0

_CHUNK_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {TOKENS_SQL.format(x="text")} AS w FROM documents
),
post AS (
    SELECT doc_id, i AS pos, w[i] AS word,
           CASE WHEN i <= len(w) - 2 THEN
               {h60_sql("array_to_string(w[i:i+2], ' ')")} % {_CDC_MOD} = 0
           ELSE FALSE END AS boundary
    FROM t, unnest(range(1, len(w) + 1)) AS r(i)
),
numbered AS (
    SELECT doc_id, pos, word,
           sum(CASE WHEN boundary THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
    FROM post
),
chunks AS (
    SELECT doc_id, chunk_id,
           md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash,
           count(*) AS n_words
    FROM numbered GROUP BY doc_id, chunk_id
)
SELECT chunk_hash,
       CAST(min(n_words) AS BIGINT) AS n_words,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences,
       min(doc_id) AS first_doc
FROM chunks
GROUP BY chunk_hash
HAVING count(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
"""


@query("content_chunk_dedup", _CHUNK_ORACLE)
def content_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/borg/dedup-store trick at
    word granularity): a chunk boundary opens wherever the rolling
    3-gram hash ≡ 0 (mod 16), so boundaries survive insertions — two
    nearly-identical documents still produce mostly IDENTICAL chunks,
    unlike fixed-width splitting where one edit shifts every window.
    Chunks shared by ≥2 documents are the sub-document duplication a
    storage layer dedups and a corpus pipeline flags (the planted
    near-dup pairs and boilerplate heads both surface here).

    Dataflow: one posexplode, boundary flags row-local from the gram
    hash, chunk ids via a doc-keyed cumulative window (one shuffle),
    chunk reassembly by the same key, then a hash-keyed dedup count —
    every stage linear in tokens at any corpus size."""
    from pyspark.sql import functions as F

    from ..operators.text import content_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = content_chunks(docs, mod=_CDC_MOD)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.min("n_words").cast("bigint").alias("n_words"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_hash")
    )


# --- reciprocal-rank-fusion hybrid retrieval --------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al.)

_RRF_ORACLE = f"""
WITH {_BM25_SCORED_CTES},
bmr AS (
    SELECT query_id, corpus_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_u DESC, corpus_id) AS bm25_rank
    FROM scored
),
bm AS (SELECT * FROM bmr WHERE bm25_rank <= 20),
n0 AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS norm
    FROM embeddings
),
n AS (SELECT * FROM n0 WHERE norm > 0),
csr AS (
    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm)
                            DESC, c.vec_id) AS cos_rank
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 3
),
cs AS (SELECT * FROM csr WHERE cos_rank <= 20),
fused AS (
    SELECT coalesce(bm.query_id, cs.query_id) AS query_id,
           coalesce(bm.corpus_id, cs.corpus_id) AS corpus_id,
           CAST(bm.bm25_rank AS BIGINT) AS bm25_rank,
           CAST(cs.cos_rank AS BIGINT) AS cos_rank,
           coalesce(1.0 / ({_RRF_K} + bm.bm25_rank), 0.0)
           + coalesce(1.0 / ({_RRF_K} + cs.cos_rank), 0.0) AS rrf
    FROM bm FULL OUTER JOIN cs
      ON bm.query_id = cs.query_id AND bm.corpus_id = cs.corpus_id
)
SELECT query_id, corpus_id, bm25_rank, cos_rank,
       round(rrf, 6) AS rrf, CAST(rn AS BIGINT) AS rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf DESC, corpus_id) AS rn
    FROM fused
) WHERE rn <= 10
"""


@query("rrf_hybrid_retrieval", _RRF_ORACLE)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval fused with reciprocal-rank
    fusion (RRF, k=60) — the standard RAG-stack merge of a BM25
    inverted-index ranking and an embedding cosine ranking: score =
    Σ 1/(k + rank_leg) over the legs that retrieved the document.
    Rank-based fusion needs NO score normalization across legs, which
    is exactly why production search stacks use it. Both legs'
    rankings are exact-integer (BM25) or deterministic-double
    (cosine) sorts; the fusion is a full-outer join of two
    20-row-per-query lists, so the fused stage costs nothing at any
    corpus size — scale lives in the legs (inverted index + ANN)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.similarity import brute_force_topk

    scored = _bm25_scored(spark, sf_dir)
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), "corpus_id"
    )
    bm = (
        scored.withColumn("bm25_rank", F.row_number().over(wb))
        .filter(F.col("bm25_rank") <= 20)
        .select(
            "query_id",
            "corpus_id",
            F.col("bm25_rank").cast("bigint").alias("bm25_rank"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cs = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=20
    ).select(
        "query_id",
        "corpus_id",
        F.col("rank").cast("bigint").alias("cos_rank"),
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("bm25_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("cos_rank")), F.lit(0.0)
    )
    fused = bm.join(cs, ["query_id", "corpus_id"], "full_outer").select(
        "query_id", "corpus_id", "bm25_rank", "cos_rank", rrf.alias("rrf")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), "corpus_id"
    )
    return (
        fused.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "corpus_id",
            "bm25_rank",
            "cos_rank",
            F.round("rrf", 6).alias("rrf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- PMI collocations --------------------------------------------------------

_PMI_MIN_COUNT = 10
_PMI_TOPK = 20

# Shared scalar text: PMI = ln(c12·T / (c1·c2)) from exact integer
# counts (probabilities never materialize), floor-quantized at 1e-9 so
# the ranking is an exact-integer sort.
_PMI_Q = (
    "CAST(floor(1e9 * ln((CAST(c12 AS DOUBLE) * tt)"
    " / (CAST(c1 AS DOUBLE) * c2))) AS BIGINT)"
)

_PMI_ORACLE = f"""
WITH w AS (
    SELECT {TOKENS_SQL.format(x="text")} AS ws FROM documents
),
bg AS (
    SELECT ws[i] AS w1, ws[i + 1] AS w2
    FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) r
    WHERE len(ws) >= 2
),
p AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
    FROM bg GROUP BY w1, w2
),
c AS (
    SELECT w1, w2, c12,
           CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
           CAST(sum(c12) OVER (PARTITION BY w2) AS BIGINT) AS c2,
           CAST(sum(c12) OVER () AS BIGINT) AS tt
    FROM p
)
SELECT w1, w2, c12, {_PMI_Q} AS pmi_q,
       round({_PMI_Q} / 1e9, 6) AS pmi
FROM c
WHERE c12 >= {_PMI_MIN_COUNT}
ORDER BY pmi_q DESC, w1, w2
LIMIT {_PMI_TOPK}
"""


@query("pmi_collocations", _PMI_ORACLE)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: the top-20 adjacent bigrams by
    pointwise mutual information (min count 10) — the
    classic corpus-linguistics tool for finding multiword expressions
    ("new york"-style units) that tokenizers and phrase-aware dedup
    want to treat atomically. All three marginals are window sums over
    the AGGREGATED bigram table (one gram-keyed shuffle for the
    counts; the window passes run on distinct bigrams, not
    occurrences), PMI is 1e-9-quantized ln of exact integer counts so
    the ranking is an exact-integer sort, and the top-k compiles to
    TakeOrderedAndProject."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.hashing import tokens

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select(
            F.lag("w", 1).over(wdoc).alias("w1"), F.col("w").alias("w2")
        )
        .filter(F.col("w1").isNotNull())
    )
    p = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c = p.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(Window.partitionBy("w1")).cast("bigint").alias("c1"),
        F.sum("c12").over(Window.partitionBy("w2")).cast("bigint").alias("c2"),
        F.sum("c12")
        .over(Window.partitionBy(F.lit(1)))
        .cast("bigint")
        .alias("tt"),
    )
    return (
        c.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(_PMI_Q).alias("pmi_q"),
            F.round(F.expr(_PMI_Q) / F.lit(1e9), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi_q"), "w1", "w2")
        .limit(_PMI_TOPK)
    )


# --- TextTiling topic segmentation ------------------------------------------

# Hearst's TextTiling, exactly: consecutive 10-token blocks, lexical
# cosine at each internal gap (exact integer dot/norms, 1e6-floor
# quantized cosine), depth score = (left-peak − sim) + (right-peak −
# sim) via two directional running-max windows, and a boundary
# wherever depth exceeds the doc's μ_depth − σ_depth/2 (the paper's
# threshold). Every per-doc reduction is over quantized int64 terms.
_TILE_BLOCK = 10

_TILE_ORACLE_NOTE = "oracle is DuckDB-specific (tokenizer); see below"

from ..functions.hashing import TOKENS_SQL as _TT_TOKENS_SQL

_TILE_WORDS = _TT_TOKENS_SQL.format(x="text")

_TEXTTILE_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, (i - 1) // {_TILE_BLOCK} AS blk, ws[i] AS w
    FROM (SELECT doc_id, {_TILE_WORDS} AS ws FROM documents),
         LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) r
),
cnt AS (
    SELECT doc_id, blk, w, CAST(count(*) AS BIGINT) AS c
    FROM tok GROUP BY 1, 2, 3
),
norms AS (
    SELECT doc_id, blk, CAST(sum(c * c) AS BIGINT) AS nn
    FROM cnt GROUP BY 1, 2
),
dots AS (
    SELECT a.doc_id, a.blk AS gap,
           CAST(sum(a.c * b.c) AS BIGINT) AS dot
    FROM cnt a JOIN cnt b
      ON b.doc_id = a.doc_id AND b.blk = a.blk + 1 AND b.w = a.w
    GROUP BY 1, 2
),
gaps AS (
    SELECT n1.doc_id, n1.blk AS gap,
           CAST(floor(1000000.0 * coalesce(d.dot, 0)
                      / sqrt(CAST(n1.nn AS DOUBLE) * n2.nn))
                AS BIGINT) AS sim_q
    FROM norms n1
    JOIN norms n2 ON n2.doc_id = n1.doc_id AND n2.blk = n1.blk + 1
    LEFT JOIN dots d ON d.doc_id = n1.doc_id AND d.gap = n1.blk
),
depth AS (
    SELECT doc_id, gap, sim_q,
           (max(sim_q) OVER (PARTITION BY doc_id ORDER BY gap
                             ROWS UNBOUNDED PRECEDING) - sim_q)
           + (max(sim_q) OVER (PARTITION BY doc_id ORDER BY gap
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) - sim_q)
               AS depth_q
    FROM gaps
),
stats AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(depth_q) AS DECIMAL(38,0)) AS sd,
           CAST(sum(CAST(depth_q AS DECIMAL(38,0)) * depth_q)
                AS DECIMAL(38,0)) AS sdd,
           CAST(sum(sim_q) AS DECIMAL(38,0)) AS ssim
    FROM depth GROUP BY doc_id
),
marks AS (
    SELECT d.doc_id, d.gap, d.depth_q,
           CAST(d.depth_q AS DOUBLE) >
               (CAST(s.sd AS DOUBLE) / s.n_gaps
                - sqrt(greatest(CAST(0 AS DOUBLE),
                       CAST(s.sdd AS DOUBLE) / s.n_gaps
                       - (CAST(s.sd AS DOUBLE) / s.n_gaps)
                         * (CAST(s.sd AS DOUBLE) / s.n_gaps))) / 2)
               AS is_boundary
    FROM depth d JOIN stats s ON s.doc_id = d.doc_id
)
SELECT s.doc_id,
       s.n_gaps + 1 AS n_blocks,
       s.n_gaps,
       -- exact integer micro-units: round() here can land on a .5
       -- boundary (Spark HALF_UP vs DuckDB half-even flipped a hash)
       CAST(CAST(s.ssim AS BIGINT) // s.n_gaps AS BIGINT) AS mean_sim_micro,
       CAST(coalesce(sum(CASE WHEN m.is_boundary THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_boundaries,
       coalesce(string_agg(CASE WHEN m.is_boundary
                                THEN CAST(m.gap AS STRING) END,
                           ',' ORDER BY m.gap), '') AS boundaries_csv
FROM stats s LEFT JOIN marks m ON m.doc_id = s.doc_id
GROUP BY s.doc_id, s.n_gaps, s.ssim
"""


@query("texttiling_segmentation", _TEXTTILE_ORACLE)
def texttiling_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic segmentation (Hearst 1997) — the classic
    unsupervised document segmenter a chunking pipeline upgrades to
    when fixed-width chunks cut topics in half: lexical cosine
    between consecutive 10-token blocks, a DEPTH score per gap (how
    far similarity dips below its running peaks on both sides — two
    directional cummax windows, no self-join), and boundaries where
    depth exceeds the document's μ − σ/2 (the paper's threshold).
    The emitted boundary LIST is hash-checked, not just counts.
    Exactness: integer dot/norm arithmetic, 1e6-quantized cosines,
    per-doc moments as exact integer sums. Dataflow: one explode,
    one (doc, block, token) count, the adjacent-block join on
    (doc, blk+1, token) equi-keys, and doc-keyed windows — every
    stage sharded by doc_id. The Spark side is an independent
    DataFrame implementation of the same algebra."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.hashing import tokens

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "w")
    ).select(
        "doc_id", (F.col("pos") / _TILE_BLOCK).cast("int").alias("blk"), "w"
    )
    cnt = tok.groupBy("doc_id", "blk", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)
    norms = cnt.groupBy("doc_id", "blk").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("nn")
    )
    b = cnt.select(
        F.col("doc_id").alias("bdoc"),
        F.col("blk").alias("bblk"),
        F.col("w").alias("bw"),
        F.col("c").alias("bc"),
    )
    dots = (
        cnt.join(
            b,
            (F.col("bdoc") == F.col("doc_id"))
            & (F.col("bblk") == F.col("blk") + 1)
            & (F.col("bw") == F.col("w")),
        )
        .groupBy("doc_id", F.col("blk").alias("gap"))
        .agg(F.sum(F.col("c") * F.col("bc")).cast("bigint").alias("dot"))
    )
    n2 = norms.select(
        F.col("doc_id").alias("ndoc"),
        F.col("blk").alias("nblk"),
        F.col("nn").alias("nn2"),
    )
    gaps = (
        norms.join(
            n2,
            (F.col("ndoc") == F.col("doc_id"))
            & (F.col("nblk") == F.col("blk") + 1),
        )
        .join(
            dots,
            (dots["doc_id"] == norms["doc_id"])
            & (dots["gap"] == norms["blk"]),
            "left",
        )
        .select(
            norms["doc_id"].alias("doc_id"),
            norms["blk"].alias("gap"),
            F.floor(
                F.lit(1000000.0)
                * F.coalesce(F.col("dot"), F.lit(0))
                / F.sqrt(F.col("nn").cast("double") * F.col("nn2"))
            )
            .cast("bigint")
            .alias("sim_q"),
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy("gap")
    left_peak = F.max("sim_q").over(
        wdoc.rowsBetween(Window.unboundedPreceding, 0)
    )
    right_peak = F.max("sim_q").over(
        wdoc.rowsBetween(0, Window.unboundedFollowing)
    )
    depth = gaps.withColumn(
        "depth_q",
        (left_peak - F.col("sim_q")) + (right_peak - F.col("sim_q")),
    ).localCheckpoint(eager=False)
    stats = depth.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("depth_q").cast("decimal(38,0)").alias("sd"),
        F.sum(F.col("depth_q").cast("decimal(38,0)") * F.col("depth_q"))
        .cast("decimal(38,0)")
        .alias("sdd"),
        F.sum("sim_q").cast("decimal(38,0)").alias("ssim"),
    )
    mean_d = F.col("sd").cast("double") / F.col("n_gaps")
    var_d = F.greatest(
        F.lit(0.0),
        F.col("sdd").cast("double") / F.col("n_gaps") - mean_d * mean_d,
    )
    marks = depth.join(stats, "doc_id").withColumn(
        "is_boundary",
        F.col("depth_q").cast("double") > mean_d - F.sqrt(var_d) / 2,
    )
    return (
        marks.groupBy("doc_id", "n_gaps", "ssim")
        .agg(
            F.sum(F.when(F.col("is_boundary"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boundaries"),
            F.coalesce(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("is_boundary"),
                                    F.struct(
                                        F.col("gap"),
                                        F.col("gap")
                                        .cast("string")
                                        .alias("g"),
                                    ),
                                )
                            )
                        ),
                        lambda s: s["g"],
                    ),
                ),
                F.lit(""),
            ).alias("boundaries_csv"),
        )
        .select(
            "doc_id",
            (F.col("n_gaps") + 1).cast("bigint").alias("n_blocks"),
            "n_gaps",
            F.expr("CAST(CAST(ssim AS BIGINT) div n_gaps AS BIGINT)").alias(
                "mean_sim_micro"
            ),
            "n_boundaries",
            "boundaries_csv",
        )
    )


# --- TextRank keyword scores -------------------------------------------------


def _textrank_oracle() -> str:
    from ..functions.hashing import TOKENS_SQL as _TOK
    from .analytics import _PR_SCALE_SQL, _pr_iter_sql

    return f"""
WITH toks AS (
    SELECT {_TOK.format(x="text")} AS w FROM documents
),
adj AS (
    SELECT w[i] AS a, w[i + 1] AS b
    FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i)
    WHERE w[i] <> '' AND w[i + 1] <> '' AND w[i] <> w[i + 1]
),
e0 AS (
    SELECT CASE WHEN a < b THEN a ELSE b END AS u,
           CASE WHEN a < b THEN b ELSE a END AS v
    FROM adj GROUP BY 1, 2
),
edges AS (
    SELECT u AS src, v AS dst FROM e0
    UNION ALL
    SELECT v AS src, u AS dst FROM e0
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT node, deg, n,
        CAST(floor({_PR_SCALE_SQL} / n) AS BIGINT) AS prs FROM deg, nn),
{_pr_iter_sql("pr0", "pr1")},
{_pr_iter_sql("pr1", "pr2")}
SELECT node AS word, CAST(prs AS DOUBLE) / {_PR_SCALE_SQL} AS textrank
FROM pr2
"""


@query("textrank_keywords", _textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau): PageRank over the
    word co-occurrence graph (adjacent normalized tokens, symmetrized,
    unweighted) — corpus keywords by graph centrality rather than raw
    frequency, the unsupervised keyword-extraction standard. Reuses
    the exact fixed-point `pagerank` operator (2^40 floor-scaled
    integer mass, one edge⋈rank join + aggregation per iteration);
    the co-occurrence edge build is one scan + one distinct-pair
    aggregation (row-local zip of adjacent tokens, no shuffle before
    the pair groupBy). The oracle unrolls the identical iterations
    over the identical edge CTE."""
    from ..functions.hashing import tokens
    from ..operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    pairs = docs.select(
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.zip_with(
                    F.slice(w, 1, F.size(w) - 1),
                    F.slice(w, 2, F.size(w) - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ).otherwise(
                F.array().cast("array<struct<a:string,b:string>>")
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    e0 = (
        pairs.filter(
            (F.col("a") != "") & (F.col("b") != "") & (F.col("a") != F.col("b"))
        )
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    return pagerank(edges, damping=0.85, iters=2).select(
        F.col("node").alias("word"), F.col("pr").alias("textrank")
    )


# --- blocklist-scale multi-pattern scan (Aho-Corasick) ------------------------
#
# Borderless patterns only (no proper prefix that is also a suffix):
# self-overlap is then impossible, so DuckDB's non-overlapping
# replace()-count provably equals the automaton's all-match count.
# The set deliberately nests patterns ("scan" ends inside every
# "scan slow" match; "fast" inside "fast key") — a scanner without
# output/failure links undercounts those and cannot hash-match.
_BLOCKLIST_PATTERNS = (
    "scan",
    "scan slow",
    "table",
    "fast",
    "fast key",
    "value",
    "big",
    "agg row",
    "the line",
    "merge",
    "customer query",
    "qq never occurs zz",
)

_BLOCKLIST_VALUES = ", ".join(f"('{p}')" for p in _BLOCKLIST_PATTERNS)

_MULTIPATTERN_ORACLE = f"""
WITH pats AS (SELECT * FROM (VALUES {_BLOCKLIST_VALUES}) AS t(pattern)),
m AS (
    SELECT d.source, p.pattern,
           CAST((length(d.text) - length(replace(d.text, p.pattern, '')))
                // length(p.pattern) AS BIGINT) AS c
    FROM documents d, pats p
)
SELECT source, pattern,
       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_matched,
       CAST(sum(c) AS BIGINT) AS total_matches
FROM m
GROUP BY source, pattern
"""


@query("blocklist_multipattern_scan", _MULTIPATTERN_ORACLE)
def blocklist_multipattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering at corpus scale: ONE Aho-Corasick automaton
    over all patterns (size ∝ pattern bytes, shipped in the closure),
    one pass per document (O(corpus + matches), independent of pattern
    count) inside an Arrow-batched mapInPandas stage — vs the
    O(patterns × corpus) per-pattern scan the oracle runs. Emits
    per-(source, pattern) matched-doc and total ALL-match counts;
    never-matching patterns keep their zero rows (the full grid is
    emitted per doc, no re-join)."""
    from ..operators.multipattern import multipattern_scan

    docs = load_table(spark, sf_dir, "documents")
    hits = multipattern_scan(docs, _BLOCKLIST_PATTERNS)
    return hits.groupBy("source", "pattern").agg(
        F.sum((F.col("n_matches") > 0).cast("bigint"))
        .cast("bigint")
        .alias("docs_matched"),
        F.sum("n_matches").cast("bigint").alias("total_matches"),
    )


# --- phonetic blocking (Soundex) ----------------------------------------------
#
# Entity-resolution blocking by phonetic key: candidate pairs are
# generated within soundex blocks instead of all-pairs — the classic
# cheap blocking key for person/merchant name matching. Spark's
# built-in ``soundex()`` implements full American Soundex INCLUDING
# the H/W-transparency rule (verified: Ashcraft->A261, Pfister->P236,
# Tymczak->T522, Hwang->H520); the oracle reimplements the whole
# algorithm from scratch in SQL (per-character explode, H/W rows
# dropped from the comparison sequence so lag() sees through them,
# vowels resetting via code 0), so the two derivations cross-check
# each other letter by letter.

_SOUNDEX_ORACLE = """
WITH w AS (
    SELECT DISTINCT lower(word) AS w
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    WHERE regexp_matches(word, '^[A-Za-z]+$')
),
chars AS (
    SELECT w, p, upper(substr(w, CAST(p AS INTEGER), 1)) AS ch
    FROM (SELECT w, unnest(range(1, length(w) + 1)) AS p FROM w)
),
coded AS (
    SELECT w, p,
           CASE WHEN ch IN ('B','F','P','V') THEN 1
                WHEN ch IN ('C','G','J','K','Q','S','X','Z') THEN 2
                WHEN ch IN ('D','T') THEN 3
                WHEN ch = 'L' THEN 4
                WHEN ch IN ('M','N') THEN 5
                WHEN ch = 'R' THEN 6
                ELSE 0 END AS code,
           ch IN ('H','W') AS is_hw
    FROM chars
),
seq AS (
    SELECT w, p, code,
           lag(code) OVER (PARTITION BY w ORDER BY p) AS prev_code
    FROM coded WHERE NOT is_hw
),
digits AS (
    SELECT w, code,
           row_number() OVER (PARTITION BY w ORDER BY p) AS rn
    FROM seq
    WHERE p > 1 AND code != 0
      AND (prev_code IS NULL OR prev_code != code)
),
sdx AS (
    SELECT w.w,
           rpad(upper(substr(w.w, 1, 1)) ||
                coalesce(string_agg(CAST(d.code AS VARCHAR), ''
                                    ORDER BY d.rn), ''),
                4, '0') AS code
    FROM w LEFT JOIN (SELECT * FROM digits WHERE rn <= 3) d
      ON d.w = w.w
    GROUP BY w.w
)
SELECT code,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs,
       min(w) AS sample_word
FROM sdx
GROUP BY code
"""


@query("phonetic_blocking_soundex", _SOUNDEX_ORACLE)
def phonetic_blocking_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex blocking over the part-name vocabulary: per phonetic
    code, the block size and the within-block candidate-pair count an
    ER pass would verify (vs n² all-pairs). Spark side is the
    built-in ``soundex()`` (JVM, codegen); the oracle re-derives every
    code from the raw algorithm — the H/W transparency, vowel resets,
    adjacent-code collapse, and 4-char padding all hash-checked."""
    part = load_table(spark, sf_dir, "part")
    words = (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.col("word").rlike("^[A-Za-z]+$"))
        .select(F.lower(F.col("word")).alias("w"))
        .distinct()
    )
    n = F.count(F.lit(1))
    return (
        words.select("w", F.soundex("w").alias("code"))
        .groupBy("code")
        .agg(
            n.cast("bigint").alias("n_words"),
            (n * (n - 1) / 2).cast("bigint").alias("n_candidate_pairs"),
            F.min("w").alias("sample_word"),
        )
    )
