"""Dedup queries over ``documents`` / ``embeddings`` (north-star
extension scope — the testdata plants 25 near-dup pairs at
Jaccard ≈ 0.99 and shared-prefix groups for exactly this).

Oracle strategy: every sketch uses the md5-derived h60 hash that DuckDB
reproduces bit-for-bit (functions/hashing.py), so even MinHash/SimHash
signatures are value-hash checked. The LSH pipeline's oracle is the
EXACT Jaccard pair set — i.e. the driver check also proves LSH recall
at the planted similarity level, not just determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import NORMALIZE_SQL, TOKENS_SQL, h60_sql, shingles_sql
from ..operators.dedup import (
    dedup_exact,
    embedding_near_dup_pairs,
    jaccard_pairs,
    jaccard_verify_candidates,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_sets,
    simhash_signatures,
)
from ..registry import query
from ..sources.batch import load_table

# --- exact dedup ----------------------------------------------------------

_EXACT_ORACLE = f"""
WITH all_docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
),
hashed AS (
    SELECT doc_id, md5({NORMALIZE_SQL.format(x="text")}) AS content_hash
    FROM all_docs
)
SELECT content_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
FROM hashed
GROUP BY content_hash
"""


@query("dedup_exact", _EXACT_ORACLE)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash. The corpus has no true
    exact dups, so the input is the corpus unioned with an id-shifted
    copy of itself — every group must collapse to n_dups=2 with the
    original id canonical."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return dedup_exact(docs.unionAll(shifted))


# --- exact n-gram Jaccard (also the LSH ground truth) ----------------------

_SHINGLES = shingles_sql("text", 3)

_JACCARD_ORACLE = f"""
WITH ds AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    )
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
    FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) AS jaccard
FROM common
JOIN sizes s1 ON s1.doc_id = id_a
JOIN sizes s2 ON s2.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.5
"""


@query("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) via shingle
    self-join — the brute-force ground truth."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(shingle_sets(docs, n=3), threshold=0.5)


@query("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12) + LSH(6 bands × 2) candidate generation, then exact
    Jaccard verification of candidates only. Oracle = the full exact
    pair set: the hash check proves LSH recall (P[miss] ≈ (1-J²)⁶,
    ~1e-10 at the planted J=0.99), while runtime stays
    candidate-proportional."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=12, shingle_n=3)
    candidates = lsh_candidate_pairs(sigs, num_hashes=12, band_size=2)
    return jaccard_verify_candidates(
        docs, candidates, shingle_n=3, threshold=0.5
    )


# --- connected components over the near-dup graph --------------------------

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE ds AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    )
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
pairs AS (
    SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ) p
    JOIN sizes s1 ON s1.doc_id = p.id_a
    JOIN sizes s2 ON s2.doc_id = p.id_b
    WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.5
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, r) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.src, rc.r FROM edges e JOIN reach rc ON e.dst = rc.node
),
cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
"""


@query("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the Jaccard ≥ 0.5
    pair graph (pairs via MinHash+LSH+verify, recall proven by
    `dedup_minhash_lsh`'s oracle), canonical = min doc_id per
    component; docs outside the graph are their own singleton cluster.
    The oracle computes true transitive closure with a recursive CTE —
    so this check proves the iterative min-label propagation reaches
    the exact fixpoint, chains included."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=12, shingle_n=3)
    candidates = lsh_candidate_pairs(sigs, num_hashes=12, band_size=2)
    pairs = jaccard_verify_candidates(
        docs, candidates, shingle_n=3, threshold=0.5
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    return docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )


# --- SimHash ---------------------------------------------------------------

_BITS = 32
_VOTE_TERMS = ", ".join(
    f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(_BITS)
)
_SIG_TERMS = " + ".join(
    f"CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for b in range(_BITS)
)

_SIMHASH_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({TOKENS_SQL.format(x="text")}) AS token FROM documents
),
th AS (SELECT doc_id, {h60_sql("token")} AS th FROM tok),
votes AS (SELECT doc_id, {_VOTE_TERMS} FROM th GROUP BY doc_id)
SELECT doc_id, CAST({_SIG_TERMS} AS BIGINT) AS simhash FROM votes
"""


@query("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document (term-frequency-weighted
    bit majority vote). Near-dup docs differ in O(1) bits; bucketing /
    Hamming-ball search runs on this table."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs, bits=_BITS)


# --- embedding near-dup ----------------------------------------------------

_EMB_ORACLE = """
WITH n AS (
    SELECT
        vec_id,
        label,
        embedding::DOUBLE[] AS v,
        sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
    FROM embeddings
)
SELECT
    a.vec_id AS id_a,
    b.vec_id AS id_b,
    a.label AS label,
    round(list_inner_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
FROM n a
JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_inner_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.4
"""


@query("dedup_embedding_cosine", _EMB_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.4 within label blocks
    (blocking stands in for the LSH bucketing used at scale; see
    operators/similarity.py for the unblocked ANN path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4)
