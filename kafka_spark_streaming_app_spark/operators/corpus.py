"""Corpus-level quality and contamination operators for training-data
pipelines: per-document repetition metrics (Gopher-style), corpus-wide
boilerplate n-gram detection (C4-style), and benchmark-contamination
checks (n-gram overlap against a held-out evaluation set).

These extend the reference app's data-quality surface (it has none —
its pipeline stops at fraud-flag filters, ecommerce_streaming.py:66-79)
with the document-hygiene stages a large-scale LLM data pipeline runs
before training.

Scale notes (100 TB posture):
- Every operator here is explode → hash-keyed groupBy/join. The
  shuffle rows carry a 64-bit xxhash64 gram hash + doc id, never gram
  strings or document bodies. The hash value never leaves the engine
  (only match counts do), so the DuckDB oracles join raw gram strings
  and stay hash-agnostic — no md5 tax for cross-engine parity here.
- ``repetition_metrics`` carries the row-local token stats through the
  gram groupBy as grouping keys (they are functionally dependent on
  doc_id), so the whole operator is ONE explode and TWO reduce-side
  aggregations on the same doc_id key — no join back to the corpus.
- ``boilerplate_ngrams`` / ``contamination_check`` join per-doc gram
  sets against a corpus-wide hot/benchmark gram set on the gram hash —
  an equi-join whose build side is the (much smaller) distinct-gram
  table; AQE broadcasts it when it fits, shuffles otherwise. No
  all-pairs document comparison anywhere.
- ``rebalance_partitions`` exists because tokenization runs at scan
  parallelism: few-row-group local fixtures need one spreading
  shuffle; a many-file production corpus must leave it None.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens, word_shingles


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rebalance_partitions: int | None = None,
) -> DataFrame:
    """Gopher-style repetition statistics per document.

    Returns one row per input document:
    - ``n_tokens`` / ``n_distinct_tokens`` and ``dup_word_frac``
      (fraction of token instances that are repeats of an earlier
      token — ``1 - distinct/total``),
    - ``top_bigram_frac`` (share of bigram instances taken by the
      single most frequent bigram),
    - ``dup_bigram_frac`` (fraction of bigram instances that are
      repeats).

    High values of any of these mark machine-generated or boilerplate
    text (Rae et al., "Scaling Language Models: ... Gopher", §A1.1).

    Documents with fewer than 2 tokens keep a row (explode_outer) with
    zeroed bigram fractions.

    ``rebalance_partitions``: tokenization dominates this operator and
    runs at SCAN parallelism; a corpus stored in few parquet row
    groups (this sandbox's single-file testdata) tokenizes on one
    task. Passing a width inserts one round-robin shuffle of the raw
    docs before the explode (measured 4.7× here). Leave None at
    production scale — a many-file corpus already scans wide, and
    re-shuffling 100 TB of text to "rebalance" it would be the
    bottleneck.
    """
    if rebalance_partitions:
        df = df.repartition(rebalance_partitions)
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        word_shingles(text_col, 2).alias("grams"),
    )
    # grouping by the doc-level stats (functionally dependent on the
    # doc id) carries them to the final agg without a join; the gram
    # shuffles as a 64-bit hash, null-preserved so the explode_outer
    # empty-doc row stays countable (xxhash64 alone maps NULL to the
    # seed, not NULL)
    per_gram = (
        base.select(
            id_col,
            "n_tokens",
            "n_distinct_tokens",
            F.explode_outer("grams").alias("gram"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct_tokens",
            F.when(
                F.col("gram").isNotNull(), F.xxhash64(F.col("gram"))
            ).alias("gram"),
        )
        .groupBy(id_col, "n_tokens", "n_distinct_tokens", "gram")
        .agg(F.count("gram").alias("cnt"))
    )
    # when-guards (not coalesce): double 0/0 is NaN in Spark but NULL
    # in other engines — never emit either
    total = F.sum("cnt")
    return per_gram.groupBy(id_col, "n_tokens", "n_distinct_tokens").agg(
        F.when(
            F.col("n_tokens") > 0,
            F.lit(1.0)
            - F.col("n_distinct_tokens")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        F.when(total > 0, F.max("cnt") / total.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            total > 0, F.lit(1.0) - F.count("gram") / total.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def _doc_grams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    rebalance_partitions: int | None = None,
) -> DataFrame:
    """Distinct (doc, gram-hash) pairs — the per-document n-gram set.

    The hash is codegen-native ``xxhash64`` (measured ~2× faster
    end-to-end than the md5-derived h60 on these queries): the hash
    VALUE never leaves the engine — downstream only compares/counts
    matches — so the DuckDB oracles join raw gram strings instead and
    stay hash-agnostic (same counts modulo 2^-64 collisions).
    """
    if rebalance_partitions:
        df = df.repartition(rebalance_partitions)
    return (
        df.select(
            F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
        )
        .select(id_col, F.xxhash64(F.col("gram")).alias("g"))
        .distinct()
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    materialize: bool = True,
    rebalance_partitions: int | None = None,
) -> DataFrame:
    """C4-style boilerplate detection: an n-gram occurring in
    ``min_docs``-or-more DISTINCT documents is boilerplate; each
    document is scored by the fraction of its distinct n-grams that
    are boilerplate (``boiler_frac``).

    Returns (doc_id, n_grams, n_boiler, boiler_frac) for every
    document that has at least one n-gram.

    ``materialize`` puts a lazy ``localCheckpoint`` barrier on the
    per-doc gram set: it feeds BOTH the hot-gram count and the join
    back, and without the barrier Spark re-expands the explode +
    distinct subtree (and the corpus scan under it) once per
    reference.
    """
    grams = _doc_grams(df, text_col, id_col, n, rebalance_partitions)
    if materialize:
        grams = grams.localCheckpoint(eager=False)
    hot = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("g", F.lit(True).alias("is_boiler"))
    )
    joined = grams.join(hot, "g", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("is_boiler").alias("n_boiler"),
        (F.count("is_boiler") / F.count(F.lit(1)).cast("double")).alias(
            "boiler_frac"
        ),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 5,
    materialize: bool = True,
) -> DataFrame:
    """C4-style line-level deduplication: a LINE (newline-delimited)
    occurring in ``max_docs``-or-more DISTINCT documents is boilerplate
    (nav bars, cookie banners, footers) and is removed from every
    document; the remaining lines are reassembled in order.

    Returns (doc_id, n_lines, n_kept, cleaned_text) — one row per
    document, ``cleaned_text`` is the kept lines joined by ``\\n``
    (empty string when everything was boilerplate).

    Scale shape: one bounded explode (lines per doc), one groupBy on a
    64-bit line hash to count distinct documents (shuffle rows carry
    hash + doc id, never line text... except the line itself rides
    along for reassembly — at 100 TB split this into a distinct
    (hash → n_docs) build side like :func:`boilerplate_ngrams` and
    join it back; here the single pass keeps the plan to exactly two
    shuffles), then one groupBy back on the doc id. No all-pairs
    comparison; no driver materialization.
    """
    lines = df.select(
        F.col(id_col),
        # coalesce: a null-text doc must keep its output row (as one
        # empty line), not silently vanish from the cleaned corpus
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("li", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    if materialize:
        # feeds both the hot-line count and the reassembly join
        lines = lines.localCheckpoint(eager=False)
    hot = (
        lines.select(id_col, "lh")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= max_docs)
        .select("lh", F.lit(True).alias("is_boiler"))
    )
    tagged = lines.join(hot, "lh", "left")
    kept_struct = F.when(
        F.col("is_boiler").isNull(), F.struct("li", "line")
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(kept_struct).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s.line
            ),
            "\n",
        ).alias("cleaned_text"),
    )


def contamination_check(
    df: DataFrame,
    is_benchmark,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    flag_threshold: float = 0.5,
    rebalance_partitions: int | None = None,
) -> DataFrame:
    """Benchmark-contamination scan: score every NON-benchmark document
    by the fraction of its distinct n-grams that also occur anywhere in
    the benchmark partition (``is_benchmark`` is a boolean Column over
    ``df``). Documents at or above ``flag_threshold`` overlap are
    flagged ``contaminated`` — the decontamination stage drops them
    before training so evaluation stays honest.

    Returns (doc_id, n_grams, n_hit, overlap_frac, contaminated) for
    every candidate document with at least one n-gram.
    """
    flagged = df.withColumn("_bench", is_benchmark)
    bench_grams = (
        _doc_grams(
            flagged.filter(F.col("_bench")), text_col, id_col, n,
            rebalance_partitions,
        )
        .select("g")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    cand = _doc_grams(
        flagged.filter(~F.col("_bench")), text_col, id_col, n,
        rebalance_partitions,
    )
    joined = cand.join(bench_grams, "g", "left")
    frac = F.count("_hit") / F.count(F.lit(1)).cast("double")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_hit"),
        frac.alias("overlap_frac"),
        (frac >= flag_threshold).alias("contaminated"),
    )
