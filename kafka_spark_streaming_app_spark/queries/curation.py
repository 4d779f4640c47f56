"""The end-to-end curation pipeline — the composition this engine
exists for: quality-filter → exact-dedup → fuzzy-dedup → token-budget
accounting, as ONE oracle-checked dataflow.

Survivor policy for fuzzy pairs: drop the higher id of each verified
near-dup pair (the standard cheap policy; full connected-components
needs iteration and changes survivors only for chains, which the
planted pairs don't form)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import NORMALIZE_SQL, TOKENS_SQL, shingles_sql
from ..operators.dedup import (
    jaccard_verify_candidates,
    lsh_candidate_pairs,
    minhash_signatures,
)
from ..operators.text import SUBWORD_PATTERN
from ..registry import query
from ..sources.batch import load_table

_NORM = NORMALIZE_SQL.format(x="text")
_WORDS = TOKENS_SQL.format(x="text")
_SHINGLES = shingles_sql("text", 3)
_SUBWORD = SUBWORD_PATTERN

_CURATE_ORACLE = f"""
WITH stats AS (
    SELECT
        doc_id,
        lang,
        len({_WORDS}) AS n_tokens,
        len(list_distinct({_WORDS})) AS n_distinct,
        len(regexp_extract_all({_NORM}, '{_SUBWORD}')) AS n_subwords,
        md5({_NORM}) AS content_hash
    FROM documents
),
quality AS (
    SELECT * FROM stats
    WHERE n_tokens >= 25
      AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.35
),
exact_canon AS (
    SELECT min(doc_id) AS doc_id FROM quality GROUP BY content_hash
),
ds AS (
    -- shingles over QUALITY SURVIVORS only: pairing against already-
    -- discarded docs would both waste the dominant join cost and drop
    -- a surviving doc whose only near-dup failed the quality filter
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT d.doc_id, unnest({_SHINGLES}) AS shingle
        FROM documents d JOIN quality q ON d.doc_id = q.doc_id
    )
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
fuzzy_drop AS (
    SELECT DISTINCT id_b AS doc_id FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ) p
    JOIN sizes s1 ON s1.doc_id = p.id_a
    JOIN sizes s2 ON s2.doc_id = p.id_b
    WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.5
)
SELECT
    q.doc_id,
    q.lang,
    CAST(q.n_tokens AS BIGINT) AS n_tokens,
    CAST(q.n_subwords AS BIGINT) AS n_subwords
FROM quality q
JOIN exact_canon e ON q.doc_id = e.doc_id
WHERE q.doc_id NOT IN (SELECT doc_id FROM fuzzy_drop)
"""


@query("curate_documents", _CURATE_ORACLE)
def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter (length + lexical diversity) → exact dedup
    (md5 canonical) → fuzzy dedup (Jaccard ≥ 0.5 pair survivors) →
    per-doc token accounting. One declarative dataflow; Catalyst fuses
    the stat projections into the scan and the dedup joins follow the
    same plans audited in test_plans.py."""
    from ..functions.hashing import normalize_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    norm = normalize_text("text")
    stats = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.regexp_extract_all(norm, F.lit(_SUBWORD), 0)).alias(
            "n_subwords"
        ),
        F.md5(norm).alias("content_hash"),
    )
    # lazy localCheckpoint barrier: quality feeds THREE branches (exact
    # canon, the fuzzy-dedup semi-join, and the final projection) — the
    # barrier materializes the filtered stats once instead of
    # re-running the scan+regex stats pipeline per reference (the
    # un-barriered plan scanned documents.parquet 82 times)
    quality = stats.filter(
        (F.col("n_tokens") >= 25)
        & (F.col("n_distinct").cast("double") / F.col("n_tokens") >= 0.35)
    ).localCheckpoint(eager=False)
    exact_canon = quality.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    # fuzzy-pair only the quality survivors (see oracle comment).
    # Scale path: MinHash+LSH candidate generation (hot-bucket capped)
    # then exact Jaccard on candidates ONLY — never the all-pairs
    # shingle self-join (quadratic on boilerplate shingles). The oracle
    # stays the exact pair set, so the driver check also proves LSH
    # recall at the planted similarity level.
    quality_docs = docs.join(quality.select("doc_id"), "doc_id", "left_semi")
    sigs = minhash_signatures(quality_docs, num_hashes=12, shingle_n=3)
    candidates = lsh_candidate_pairs(
        sigs, num_hashes=12, band_size=2, max_bucket_size=64
    )
    fuzzy_drop = (
        jaccard_verify_candidates(
            quality_docs, candidates, shingle_n=3, threshold=0.5
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.join(exact_canon, "doc_id", "left_semi")
        .join(fuzzy_drop, "doc_id", "left_anti")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_subwords").cast("bigint").alias("n_subwords"),
        )
    )


# --- best-in-cluster canonical selection ------------------------------------

from .dedup import _CLUSTERS_ORACLE

_KEEP_BEST_ORACLE = f"""
WITH clusters AS (
    SELECT * FROM ({_CLUSTERS_ORACLE})
),
q AS (
    SELECT doc_id,
           CASE WHEN len({_WORDS}) > 0
                THEN CAST(len(list_distinct({_WORDS})) AS DOUBLE)
                     / len({_WORDS})
                ELSE 0.0 END AS quality
    FROM documents
)
SELECT c.doc_id, c.cluster_id, q.quality,
       (row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY q.quality DESC, c.doc_id)) = 1 AS keep
FROM clusters c JOIN q ON q.doc_id = c.doc_id
ORDER BY c.doc_id
"""


@query("dedup_keep_best", _KEEP_BEST_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection done RIGHT for a training corpus: within
    each near-dup cluster (connected components over the LSH pair
    graph) keep the HIGHEST-QUALITY member (lexical diversity, ties to
    the smaller id) — not the arbitrary min-id. Singleton clusters
    keep their only member, so exactly one keep=true per cluster.
    The oracle reuses the recursive-CTE transitive closure plus the
    same argmax, so the driver hash checks clustering AND the keep
    policy. Scale posture: the cluster stage's (banded LSH + label
    propagation); the argmax is one cluster-keyed window."""
    from .dedup import dedup_clusters

    from ..functions.hashing import tokens

    cc = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    quality = (
        F.when(
            F.size(toks) > 0,
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
        )
        .otherwise(F.lit(0.0))
        .alias("quality")
    )
    q = docs.select("doc_id", quality)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        cc.join(q, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "quality", "keep")
        .orderBy("doc_id")
    )
