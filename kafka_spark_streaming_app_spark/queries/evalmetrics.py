"""Classifier-evaluation metrics over the corpus quality filter —
the acceptance harness a data pipeline runs before trusting a filter
model to gate a 100 TB crawl: ROC-AUC (threshold-free ranking power),
confusion/precision/recall/F1 at the deployed threshold, and a
calibration table (does the score mean what it claims per bin).

Joins the existing eval family (`ann_recall_eval`,
`ranking_metrics_eval`, `cohens_kappa`): every metric reduces to
exact integer sufficient statistics in ONE scan — AUC via doubled
midranks (the `mann_whitney_u` trick: AUC = U/(n₁n₀)), F1 as a single
division of counts — so the driver hash checks the metric arithmetic
itself, not a tolerance band.

Gold labels are the deterministic length-based judgment also used by
`cohens_kappa` (n_chars >= 300): a stand-in for human labels that
both engines derive identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import quality_score
from ..registry import query
from ..sources.batch import load_table
from .corpus_prep import _QUALITY_ORACLE

_GOLD = "n_chars >= 300"

# quality_logit is the same double on both engines (linear expression
# over identical operands); floor-scaling to 1e9 integers makes the
# rank domain integer so midranks are exact
_SCORE_INT = "CAST(floor(quality_logit * 1e9) AS BIGINT)"

_AUC_ORACLE = (
    "WITH q AS (" + _QUALITY_ORACLE + "),\n"
    + f"""
lab AS (
    SELECT {_SCORE_INT} AS s,
           CASE WHEN d.{_GOLD} THEN 1 ELSE 0 END AS y
    FROM q JOIN documents d USING (doc_id)
),
h AS (
    SELECT s, count(*) AS c, sum(y) AS c1
    FROM lab GROUP BY s
),
cum AS (
    SELECT s, c, c1,
           sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum_c
    FROM h
),
agg AS (
    SELECT sum(c1 * (2 * cum_c - c + 1)) AS r1_doubled,
           sum(c1) AS n1,
           sum(c - c1) AS n0
    FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n_pos,
       CAST(n0 AS BIGINT) AS n_neg,
       CAST(r1_doubled - n1 * (n1 + 1) AS BIGINT) AS u_doubled,
       round(CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE)
             / CAST(2 * n1 * n0 AS DOUBLE), 6) AS auc
FROM agg
"""
)


@query("roc_auc_quality", _AUC_ORACLE)
def roc_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the quality classifier's score against the gold
    length label, computed as the Mann-Whitney statistic over a SCORE
    HISTOGRAM: group by (floor-scaled integer) score once, cumulative
    counts give every tied group its doubled midrank, and
    AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) emerges from pure int64 sums with
    one final division. Never ranks row-by-row: the shuffle is
    distinct-score-sized, so a 100 TB corpus with a few million
    distinct quantized scores costs one small-key aggregation —
    the `mann_whitney_u` histogram discipline applied to classifier
    eval. Doubled midrank of a tied block ending at cumulative
    position cum with c members is (2·cum − c + 1). (The fixture's
    quality score is strongly ANTI-correlated with the length label —
    AUC ≈ 0.08 at sf0.01; the direction is a property of the label
    stand-in, the exact metric arithmetic is the deliverable.)"""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality_logit")
    lab = q.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        F.expr(_SCORE_INT).alias("s"),
        F.when(F.expr(_GOLD), F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    h = lab.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("c1")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "c", "c1", F.sum("c").over(w).alias("cum_c")
    )
    agg = cum.agg(
        F.sum(F.col("c1") * (2 * F.col("cum_c") - F.col("c") + 1)).alias(
            "r1_doubled"
        ),
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n0"),
    )
    u = F.col("r1_doubled") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        F.col("n1").cast("bigint").alias("n_pos"),
        F.col("n0").cast("bigint").alias("n_neg"),
        u.cast("bigint").alias("u_doubled"),
        F.round(
            u.cast("double")
            / (2 * F.col("n1") * F.col("n0")).cast("double"),
            6,
        ).alias("auc"),
    )


_CONF_ORACLE = (
    "WITH q AS (" + _QUALITY_ORACLE + "),\n"
    + f"""
lab AS (
    SELECT CASE WHEN q.keep THEN 1 ELSE 0 END AS p,
           CASE WHEN d.{_GOLD} THEN 1 ELSE 0 END AS y
    FROM q JOIN documents d USING (doc_id)
),
c AS (
    SELECT sum(p * y) AS tp, sum(p * (1 - y)) AS fp,
           sum((1 - p) * y) AS fn, sum((1 - p) * (1 - y)) AS tn
    FROM lab
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
           AS precision_,
       round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall_,
       round(CAST(2 * tp AS DOUBLE)
             / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
FROM c
"""
)


@query("classifier_confusion_f1", _CONF_ORACLE)
def classifier_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 of the deployed
    keep-threshold against the gold label: four int64 sums in one
    scan, each metric one division (F1 in its 2TP/(2TP+FP+FN) form —
    no intermediate precision·recall product to round)."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "keep")
    lab = q.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        F.when(F.col("keep"), F.lit(1)).otherwise(F.lit(0)).alias("p"),
        F.when(F.expr(_GOLD), F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    c = lab.agg(
        F.sum(F.col("p") * F.col("y")).alias("tp"),
        F.sum(F.col("p") * (1 - F.col("y"))).alias("fp"),
        F.sum((1 - F.col("p")) * F.col("y")).alias("fn"),
        F.sum((1 - F.col("p")) * (1 - F.col("y"))).alias("tn"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return c.select(
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("tn").cast("bigint").alias("tn"),
        F.round(d("tp") / (d("tp") + d("fp")), 6).alias("precision_"),
        F.round(d("tp") / (d("tp") + d("fn")), 6).alias("recall_"),
        F.round(
            (2 * d("tp")) / (2 * d("tp") + d("fp") + d("fn")), 6
        ).alias("f1"),
    )


# calibration: fixed-width logit bins (quarter-logit), per-bin
# positive rate vs mean score — integer bin keys, exact counts, two
# final divisions
_CAL_ORACLE = (
    "WITH q AS (" + _QUALITY_ORACLE + "),\n"
    + f"""
lab AS (
    SELECT CAST(floor(q.quality_logit * 4) AS BIGINT) AS bin,
           {_SCORE_INT} AS s,
           CASE WHEN d.{_GOLD} THEN 1 ELSE 0 END AS y
    FROM q JOIN documents d USING (doc_id)
)
SELECT bin,
       count(*) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos,
       round(CAST(sum(s) AS DOUBLE) / 1e9 / count(*), 6)
           AS mean_score
FROM lab GROUP BY bin ORDER BY bin
"""
)


@query("calibration_bins", _CAL_ORACLE)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: quarter-logit score bins × (empirical
    positive rate, mean score) — the calibration check run before a
    score threshold is treated as a probability. Bin keys and score
    sums are exact integers; the two ratios are final divisions."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality_logit")
    lab = q.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        F.floor(F.col("quality_logit") * 4).cast("bigint").alias("bin"),
        F.expr(_SCORE_INT).alias("s"),
        F.when(F.expr(_GOLD), F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    return (
        lab.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pos"),
            F.round(
                F.sum("s").cast("double") / F.lit(1e9) / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
        )
        .orderBy("bin")
    )


# --- Brier score decomposition (Murphy) --------------------------------------

# Per-row forecast probability p = σ(quality_logit), quantized to an
# exact 1e-9 integer (the libm-exp discipline); every downstream sum
# is exact DECIMAL/int64, and the per-bin float terms of the Murphy
# decomposition are re-quantized before the (bins-bounded) final sum.
_BRIER_P_Q = (
    "CAST(floor(1e9 * (1.0 / (1.0 + exp(0.0 - quality_logit))))"
    " AS BIGINT)"
)
_BRIER_REL_T = (
    "CAST(floor(1e9 * (n_k * ((CAST(sp AS DOUBLE) / n_k / 1e9)"
    " - CAST(sy AS DOUBLE) / n_k)"
    " * ((CAST(sp AS DOUBLE) / n_k / 1e9) - CAST(sy AS DOUBLE) / n_k)))"
    " AS BIGINT)"
)
_BRIER_RES_T = (
    "CAST(floor(1e9 * (n_k * ((CAST(sy AS DOUBLE) / n_k)"
    " - CAST(gy AS DOUBLE) / gn)"
    " * ((CAST(sy AS DOUBLE) / n_k) - CAST(gy AS DOUBLE) / gn)))"
    " AS BIGINT)"
)
_BRIER_WB_T = (
    "CAST(floor(1e9 * ((CAST(spp AS DOUBLE) / 1e18)"
    " - n_k * (CAST(sp AS DOUBLE) / n_k / 1e9)"
    " * (CAST(sp AS DOUBLE) / n_k / 1e9))) AS BIGINT)"
)
# within-bin forecast-label covariance: the term the textbook Murphy
# decomposition drops by assuming constant forecasts per bin; with
# varying p it completes the EXACT identity
# Brier = REL − RES + UNC + WB − 2·WCOV.
_BRIER_WC_T = (
    "CAST(floor(1e9 * ((CAST(spy AS DOUBLE) / 1e9)"
    " - n_k * (CAST(sp AS DOUBLE) / n_k / 1e9)"
    " * (CAST(sy AS DOUBLE) / n_k))) AS BIGINT)"
)

_BRIER_ORACLE = (
    "WITH q AS (" + _QUALITY_ORACLE + "),\n"
    + f"""
lab AS (
    SELECT CAST(floor(q.quality_logit * 4) AS BIGINT) AS bin,
           {_BRIER_P_Q} AS pq,
           CASE WHEN d.{_GOLD} THEN 1 ELSE 0 END AS y
    FROM q JOIN documents d USING (doc_id)
),
b AS (
    SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(CAST(pq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp,
           CAST(sum(CAST(pq * pq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spp,
           CAST(sum(CAST(pq * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spy
    FROM lab GROUP BY bin
),
tot AS (
    SELECT CAST(sum(n_k) AS BIGINT) AS gn,
           CAST(sum(sy) AS BIGINT) AS gy,
           CAST(sum(sp) AS DECIMAL(38,0)) AS gp,
           CAST(sum(spp) AS DECIMAL(38,0)) AS gpp,
           CAST(sum(spy) AS DECIMAL(38,0)) AS gpy
    FROM b
),
terms AS (
    SELECT CAST(sum({_BRIER_REL_T}) AS BIGINT) AS rel_q,
           CAST(sum({_BRIER_RES_T}) AS BIGINT) AS res_q,
           CAST(sum({_BRIER_WB_T}) AS BIGINT) AS wb_q,
           CAST(sum({_BRIER_WC_T}) AS BIGINT) AS wc_q
    FROM b, tot
)
SELECT t.gn AS n,
       round((CAST(t.gpp AS DOUBLE) / 1e18
              - 2.0 * (CAST(t.gpy AS DOUBLE) / 1e9)
              + CAST(t.gy AS DOUBLE)) / t.gn, 6) AS brier,
       round(CAST(x.rel_q AS DOUBLE) / 1e9 / t.gn, 6) AS reliability,
       round(CAST(x.res_q AS DOUBLE) / 1e9 / t.gn, 6) AS resolution,
       round((CAST(t.gy AS DOUBLE) / t.gn)
             * (1.0 - CAST(t.gy AS DOUBLE) / t.gn), 6) AS uncertainty,
       round(CAST(x.wb_q AS DOUBLE) / 1e9 / t.gn, 6) AS within_bin,
       round(CAST(x.wc_q AS DOUBLE) / 1e9 / t.gn, 6) AS within_cov
FROM tot t, terms x
"""
)


@query("brier_decomposition", _BRIER_ORACLE)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the calibrated
    quality forecast p = σ(quality_logit) against the length gold
    label: Brier = reliability − resolution + uncertainty +
    within-bin variance − 2·within-bin covariance (the EXACT identity
    when forecasts vary inside bins — the textbook three-term form
    assumes constant per-bin forecasts; pinned in pytest). Reliability isolates miscalibration,
    resolution the forecast's discriminative power, uncertainty the
    label's irreducible variance — the standard forecast-quality
    triptych beyond a single AUC number. One scan to the bin
    statistics (exact DECIMAL sums of 1e-9-quantized probabilities);
    the decomposition itself runs over the bounded bin table."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality_logit")
    lab = q.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        F.floor(F.col("quality_logit") * 4).cast("bigint").alias("bin"),
        F.expr(_BRIER_P_Q).alias("pq"),
        F.when(F.expr(_GOLD), F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    b = lab.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("sy"),
        F.expr(
            "CAST(sum(CAST(pq AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("sp"),
        F.expr(
            "CAST(sum(CAST(pq * pq AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("spp"),
        F.expr(
            "CAST(sum(CAST(pq * y AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("spy"),
    )
    b = b.localCheckpoint(eager=False)
    tot = b.agg(
        F.sum("n_k").cast("bigint").alias("gn"),
        F.sum("sy").cast("bigint").alias("gy"),
        F.expr("CAST(sum(sp) AS DECIMAL(38,0))").alias("gp"),
        F.expr("CAST(sum(spp) AS DECIMAL(38,0))").alias("gpp"),
        F.expr("CAST(sum(spy) AS DECIMAL(38,0))").alias("gpy"),
    )
    terms = (
        b.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.expr(_BRIER_REL_T)).cast("bigint").alias("rel_q"),
            F.sum(F.expr(_BRIER_RES_T)).cast("bigint").alias("res_q"),
            F.sum(F.expr(_BRIER_WB_T)).cast("bigint").alias("wb_q"),
            F.sum(F.expr(_BRIER_WC_T)).cast("bigint").alias("wc_q"),
        )
    )
    gn = F.col("gn").cast("double")
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            F.col("gn").alias("n"),
            F.round(
                (
                    F.col("gpp").cast("double") / F.lit(1e18)
                    - F.lit(2.0) * (F.col("gpy").cast("double") / F.lit(1e9))
                    + F.col("gy").cast("double")
                )
                / gn,
                6,
            ).alias("brier"),
            F.round(
                F.col("rel_q").cast("double") / F.lit(1e9) / gn, 6
            ).alias("reliability"),
            F.round(
                F.col("res_q").cast("double") / F.lit(1e9) / gn, 6
            ).alias("resolution"),
            F.round(
                (F.col("gy").cast("double") / gn)
                * (F.lit(1.0) - F.col("gy").cast("double") / gn),
                6,
            ).alias("uncertainty"),
            F.round(
                F.col("wb_q").cast("double") / F.lit(1e9) / gn, 6
            ).alias("within_bin"),
            F.round(
                F.col("wc_q").cast("double") / F.lit(1e9) / gn, 6
            ).alias("within_cov"),
        )
    )


# --- corpus BLEU + ROUGE-N (generation-eval metrics) -------------------------

# Deterministic candidate: the reference with ~20% of token positions
# deleted (h60('bleu|'doc'|'pos) % 5 == 0, 0-based pos) — a synthetic
# "model output" both engines derive identically, short enough that
# the brevity-penalty branch is genuinely exercised.
from ..functions.hashing import TOKENS_SQL, h60_sql

_BLEU_WORDS = TOKENS_SQL.format(x="text")
_BLEU_DROP = h60_sql(
    "('bleu|' || CAST(doc_id AS VARCHAR) || '|' || CAST(i - 1 AS VARCHAR))"
)


def _duck_grams(arr: str, n: int) -> str:
    """DuckDB fragment: multiset of n-grams of a token list."""
    return (
        f"CASE WHEN len({arr}) >= {n} THEN "
        f"list_transform(range(1, len({arr}) - {n} + 2), "
        f"i -> array_to_string(({arr})[i:i + {n - 1}], ' ')) "
        f"ELSE [] END"
    )


def _bleu_oracle() -> str:
    parts = [
        f"""w AS (
    SELECT doc_id, source, {_BLEU_WORDS} AS ref FROM documents
)""",
        f"""c AS (
    SELECT doc_id, source, ref,
           list_filter(ref, (x, i) -> ({_BLEU_DROP} % 5) <> 0) AS cand
    FROM w
)""",
        """lens AS (
    SELECT source,
           CAST(sum(len(ref)) AS BIGINT) AS r_tokens,
           CAST(sum(len(cand)) AS BIGINT) AS c_tokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY source
)""",
    ]
    for n in range(1, 5):
        parts.append(f"""cg{n} AS (
    SELECT source, doc_id, g, count(*) AS cc FROM (
        SELECT source, doc_id, unnest({_duck_grams("cand", n)}) AS g
        FROM c
    ) GROUP BY 1, 2, 3
)""")
        parts.append(f"""rg{n} AS (
    SELECT source, doc_id, g, count(*) AS rc FROM (
        SELECT source, doc_id, unnest({_duck_grams("ref", n)}) AS g
        FROM c
    ) GROUP BY 1, 2, 3
)""")
        parts.append(f"""m{n} AS (
    SELECT source, CAST(sum(least(cc, rc)) AS BIGINT) AS matched
    FROM cg{n} JOIN rg{n} USING (source, doc_id, g) GROUP BY source
)""")
        parts.append(f"""t{n} AS (
    SELECT source,
           CAST(sum(greatest(len(cand) - {n} + 1, 0)) AS BIGINT) AS total_c,
           CAST(sum(greatest(len(ref) - {n} + 1, 0)) AS BIGINT) AS total_r
    FROM c GROUP BY source
)""")
    sel_p = ",\n       ".join(
        f"round(CAST(m{n}.matched AS DOUBLE) / t{n}.total_c, 6) AS p{n}"
        for n in range(1, 5)
    )
    lnsum = " + ".join(
        f"CAST(floor(1e9 * ln(CAST(m{n}.matched AS DOUBLE)"
        f" / t{n}.total_c)) AS BIGINT)"
        for n in range(1, 5)
    )
    joins = "\n".join(
        f"JOIN m{n} USING (source) JOIN t{n} USING (source)"
        for n in range(1, 5)
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT source, n_docs, c_tokens, r_tokens,
       {sel_p},
       round(CAST(m1.matched AS DOUBLE) / t1.total_r, 6) AS rouge1_recall,
       round(CAST(m2.matched AS DOUBLE) / t2.total_r, 6) AS rouge2_recall,
       round(CASE WHEN c_tokens < r_tokens
                  THEN exp(1.0 - CAST(r_tokens AS DOUBLE) / c_tokens)
                  ELSE 1.0 END
             * exp(CAST({lnsum} AS DOUBLE) / 4e9), 6) AS bleu
FROM lens
{joins}
ORDER BY source
"""
    )


_BLEU_ORACLE = _bleu_oracle()


@query("bleu_rouge_eval", _BLEU_ORACLE)
def bleu_rouge_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-4 (clipped n-gram precisions + brevity penalty,
    Papineni et al.) and ROUGE-1/2 recall per source — the
    generation-eval metrics a data pipeline computes when scoring a
    model's outputs against references at corpus scale. References
    are the documents; candidates are a deterministic ~20%-deletion
    corruption (so the brevity-penalty branch is real: c < r in every
    source). All sufficient statistics are exact integers — clipped
    matches Σ min(count_cand, count_ref) per (doc, n-gram) via an
    inner join of the two multiset-count relations (min with an
    absent side is 0, so no outer join), candidate/reference n-gram
    totals from lengths — and BLEU's geometric mean goes through
    1e-9 floor-quantized ln (the trigram_perplexity libm discipline)
    so both engines combine identical integers. Dataflow: one scan
    builds both token arrays row-locally; each n is a gram-keyed
    count + join + per-source fold (map-side combined); nothing
    quadratic. numpy-free pure-Python corpus-BLEU pin in
    tests/test_properties.py."""
    from ..functions.hashing import h60, tokens

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ref = tokens("text")
    drop = lambda x, i: (  # noqa: E731
        h60(
            F.concat(
                F.lit("bleu|"),
                F.col("doc_id").cast("string"),
                F.lit("|"),
                i.cast("string"),
            )
        )
        % 5
        != 0
    )
    c = docs.select(
        "doc_id",
        "source",
        ref.alias("ref"),
        F.filter(ref, drop).alias("cand"),
    ).localCheckpoint(eager=False)

    def grams(arr: str, n: int):
        cnt = F.size(F.col(arr)) - F.lit(n - 1)
        make = F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(F.col(arr), i, n)),
        )
        return F.when(cnt >= 1, make).otherwise(
            F.array().cast("array<string>")
        )

    lens = c.groupBy("source").agg(
        F.sum(F.size("ref")).cast("bigint").alias("r_tokens"),
        F.sum(F.size("cand")).cast("bigint").alias("c_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # n-gram denominators are pure length arithmetic — fold them
        # into the same pass instead of four extra aggregations
        *[
            F.sum(F.greatest(F.size(side) - (n - 1), F.lit(0)))
            .cast("bigint")
            .alias(f"total_{tag}{n}")
            for n in range(1, 5)
            for side, tag in (("cand", "c"), ("ref", "r"))
        ],
    )

    # ONE explode + ONE (source, doc, gram) shuffle for all four n and
    # both sides: every gram rides tagged with its n ("3|a b c"), the
    # candidate side counts in cc and the reference side in rc, and the
    # clipped match Σ min(cc, rc) collapses per (source, n). The naive
    # shape (8 explodes, 8 aggregations, 4 joins) benched 5.3 s at
    # sf0.1; this is the same algebra in one pass.
    def tag_fn(n: int):
        # NOT `lambda x, n=n`: F.transform passes the array INDEX as a
        # second lambda argument, which would silently clobber the
        # default and stringify a Column into the tag
        return lambda x: F.concat(F.lit(f"{n}|"), x)

    def tagged(arr: str):
        return F.concat(
            *[F.transform(grams(arr, n), tag_fn(n)) for n in range(1, 5)]
        )

    ex = c.select(
        "source",
        "doc_id",
        F.explode(
            F.concat(
                F.transform(
                    tagged("cand"),
                    lambda x: F.struct(
                        x.alias("g"),
                        F.lit(1).alias("cc"),
                        F.lit(0).alias("rc"),
                    ),
                ),
                F.transform(
                    tagged("ref"),
                    lambda x: F.struct(
                        x.alias("g"),
                        F.lit(0).alias("cc"),
                        F.lit(1).alias("rc"),
                    ),
                ),
            )
        ).alias("e"),
    )
    per_gram = ex.groupBy(
        "source", "doc_id", F.col("e.g").alias("g")
    ).agg(
        F.sum("e.cc").alias("cc"),
        F.sum("e.rc").alias("rc"),
    )
    matched = (
        per_gram.withColumn(
            "n", F.substring("g", 1, 1).cast("int")
        )
        .groupBy("source")
        .pivot("n", [1, 2, 3, 4])
        .agg(F.sum(F.least("cc", "rc")).cast("bigint"))
    )
    for n in range(1, 5):
        matched = matched.withColumnRenamed(str(n), f"matched{n}")
    out = lens.join(matched, "source")
    ln_terms = [
        F.floor(
            F.lit(1e9)
            * F.log(
                F.col(f"matched{n}").cast("double") / F.col(f"total_c{n}")
            )
        ).cast("bigint")
        for n in range(1, 5)
    ]
    lnsum = ln_terms[0] + ln_terms[1] + ln_terms[2] + ln_terms[3]
    bp = F.when(
        F.col("c_tokens") < F.col("r_tokens"),
        F.exp(
            1.0 - F.col("r_tokens").cast("double") / F.col("c_tokens")
        ),
    ).otherwise(F.lit(1.0))
    sel = ["source", "n_docs", "c_tokens", "r_tokens"]
    sel += [
        F.round(
            F.col(f"matched{n}").cast("double") / F.col(f"total_c{n}"), 6
        ).alias(f"p{n}")
        for n in range(1, 5)
    ]
    sel += [
        F.round(
            F.col("matched1").cast("double") / F.col("total_r1"), 6
        ).alias("rouge1_recall"),
        F.round(
            F.col("matched2").cast("double") / F.col("total_r2"), 6
        ).alias("rouge2_recall"),
        F.round(
            bp * F.exp(lnsum.cast("double") / F.lit(4e9)), 6
        ).alias("bleu"),
    ]
    return out.select(*sel).orderBy("source")


# --- team-draft interleaving (online ranker A/B evaluation) ------------------

_IL_DEPTH = 10   # per-ranker candidate depth
_IL_ROUNDS = 5   # interleaved depth = 2 * rounds


def _interleave_oracle() -> str:
    from ..functions.hashing import h60_sql

    coin = h60_sql(
        "('il|' || CAST(query_id AS VARCHAR) || '|' || CAST(r AS VARCHAR))"
    )
    rounds = []
    for r in range(1, _IL_ROUNDS + 1):
        p = r - 1
        rounds.append(f""",
avA{r} AS MATERIALIZED (
    SELECT la.* FROM la WHERE NOT EXISTS (
        SELECT 1 FROM sel{p} s
        WHERE s.query_id = la.query_id AND s.corpus_id = la.corpus_id)
),
avB{r} AS MATERIALIZED (
    SELECT lb.* FROM lb WHERE NOT EXISTS (
        SELECT 1 FROM sel{p} s
        WHERE s.query_id = lb.query_id AND s.corpus_id = lb.corpus_id)
),
bA{r} AS MATERIALIZED (
    SELECT query_id, corpus_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rank_a) AS rn
        FROM avA{r}) WHERE rn = 1
),
bB{r} AS MATERIALIZED (
    SELECT query_id, corpus_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rank_b) AS rn
        FROM avB{r}) WHERE rn = 1
),
first{r} AS MATERIALIZED (
    SELECT c.query_id,
           CASE WHEN c.c = 0 THEN a.corpus_id ELSE b.corpus_id END
               AS corpus_id,
           CASE WHEN c.c = 0 THEN 'A' ELSE 'B' END AS team
    FROM (SELECT query_id, c FROM coins WHERE r = {r}) c
    JOIN bA{r} a ON a.query_id = c.query_id
    JOIN bB{r} b ON b.query_id = c.query_id
),
sA{r} AS MATERIALIZED (
    SELECT query_id, corpus_id FROM (
        SELECT v.query_id, v.corpus_id,
               row_number() OVER (PARTITION BY v.query_id
                                  ORDER BY v.rank_a) AS rn
        FROM avA{r} v JOIN first{r} f
          ON f.query_id = v.query_id AND v.corpus_id <> f.corpus_id
    ) WHERE rn = 1
),
sB{r} AS MATERIALIZED (
    SELECT query_id, corpus_id FROM (
        SELECT v.query_id, v.corpus_id,
               row_number() OVER (PARTITION BY v.query_id
                                  ORDER BY v.rank_b) AS rn
        FROM avB{r} v JOIN first{r} f
          ON f.query_id = v.query_id AND v.corpus_id <> f.corpus_id
    ) WHERE rn = 1
),
second{r} AS (
    SELECT f.query_id,
           CASE WHEN f.team = 'A' THEN sb.corpus_id
                ELSE sa.corpus_id END AS corpus_id,
           CASE WHEN f.team = 'A' THEN 'B' ELSE 'A' END AS team
    FROM first{r} f
    JOIN sA{r} sa ON sa.query_id = f.query_id
    JOIN sB{r} sb ON sb.query_id = f.query_id
),
sel{r} AS MATERIALIZED (
    SELECT * FROM sel{p}
    UNION ALL SELECT query_id, corpus_id, team FROM first{r}
    UNION ALL SELECT query_id, corpus_id, team FROM second{r}
)""")
    return f"""
WITH n AS MATERIALIZED (
    SELECT
        vec_id, label,
        embedding::DOUBLE[] AS v,
        sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
            AS norm
    FROM embeddings
    WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0
),
q AS MATERIALIZED (
    SELECT vec_id AS query_id, label AS qlabel, v AS qv, norm AS qnorm
    FROM n WHERE vec_id < 5
),
la AS MATERIALIZED (
    SELECT query_id, corpus_id, rank_a FROM (
        SELECT q.query_id, c.vec_id AS corpus_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY round(list_inner_product(q.qv, c.v)
                                  / (q.qnorm * c.norm), 6) DESC,
                            c.vec_id) AS rank_a
        FROM n c, q WHERE c.vec_id <> q.query_id
    ) WHERE rank_a <= {_IL_DEPTH}
),
lb AS MATERIALIZED (
    SELECT query_id, corpus_id, rank_b FROM (
        SELECT q.query_id, c.vec_id AS corpus_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY round(list_inner_product(q.qv, c.v), 6) DESC,
                            c.vec_id) AS rank_b
        FROM n c, q WHERE c.vec_id <> q.query_id
    ) WHERE rank_b <= {_IL_DEPTH}
),
coins AS MATERIALIZED (
    SELECT query_id, r, {coin} % 2 AS c
    FROM q, unnest(range(1, {_IL_ROUNDS + 1})) AS t(r)
),
sel0 AS MATERIALIZED (
    SELECT CAST(NULL AS BIGINT) AS query_id,
           CAST(NULL AS BIGINT) AS corpus_id,
           CAST(NULL AS VARCHAR) AS team
    WHERE false
){"".join(rounds)}
SELECT s.query_id,
       CAST(sum(CASE WHEN s.team = 'A' AND cn.label = cq.qlabel
                     THEN 1 ELSE 0 END) AS BIGINT) AS clicks_a,
       CAST(sum(CASE WHEN s.team = 'B' AND cn.label = cq.qlabel
                     THEN 1 ELSE 0 END) AS BIGINT) AS clicks_b,
       CASE WHEN sum(CASE WHEN s.team = 'A' AND cn.label = cq.qlabel
                          THEN 1 ELSE 0 END)
               > sum(CASE WHEN s.team = 'B' AND cn.label = cq.qlabel
                          THEN 1 ELSE 0 END) THEN 'A'
            WHEN sum(CASE WHEN s.team = 'A' AND cn.label = cq.qlabel
                          THEN 1 ELSE 0 END)
               < sum(CASE WHEN s.team = 'B' AND cn.label = cq.qlabel
                          THEN 1 ELSE 0 END) THEN 'B'
            ELSE 'tie' END AS winner
FROM sel{_IL_ROUNDS} s
JOIN n cn ON cn.vec_id = s.corpus_id
JOIN q cq ON cq.query_id = s.query_id
GROUP BY s.query_id
"""


@query("ab_interleaving_eval", _interleave_oracle())
def ab_interleaving_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team-draft interleaving (Radlinski et al.): ranker A (cosine)
    vs ranker B (raw dot product) merged per query by alternating
    team picks — the per-round first-picker coin is md5-derived, so
    both engines draft the identical list — then a deterministic
    click model (clicked iff corpus label == query label) credits
    each team and declares the per-query winner. This is the ONLINE
    ranker-comparison harness (sensitivity ~10-100x a separate A/B
    split) beside `ips_offline_eval`'s logged-bandit estimator and
    `ranking_metrics_eval`'s offline metrics. Construction cost: ONE
    window pass computes both rank lists (distributed, one corpus
    scan), then the team draft runs on the driver over the
    candidate-bounded state (|queries| × 2 × depth rows — independent
    of corpus size) with the md5 coin replicated exactly (r12); click
    credit stays in Spark."""
    from ..functions.vectors import cosine as _cos, dot as _dot
    from ..operators.similarity import with_vector_norm

    emb = load_table(spark, sf_dir, "embeddings")
    nv = with_vector_norm(emb).select("vec_id", "label", "v", "norm")
    qs = nv.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = nv.join(
        F.broadcast(qs), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("corpus_id"),
        _cos(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")).alias(
            "cos_s"
        ),
        F.round(_dot(F.col("qv"), F.col("v")), 6).alias("dot_s"),
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("cos_s"), F.asc("corpus_id")
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.desc("dot_s"), F.asc("corpus_id")
    )
    # Perf (r12): the drafting state is CANDIDATE-bounded (|queries| x
    # 2 x _IL_DEPTH rows at any corpus size — the docstring's own
    # scale argument), so the two top-k lists are collected in ONE
    # distributed job (both ranks in a single window pass instead of
    # two checkpointed passes) and the round-robin draft runs on the
    # driver with identical pick semantics; the r11 shape unrolled the
    # draft into ~30 tiny anti-join/window stages over <=100 rows —
    # pure per-stage scheduling cost. Click credit stays in Spark.
    ranked = (
        scored.withColumn("rank_a", F.row_number().over(wa))
        .withColumn("rank_b", F.row_number().over(wb))
        .filter(
            (F.col("rank_a") <= _IL_DEPTH)
            | (F.col("rank_b") <= _IL_DEPTH)
        )
        .select("query_id", "corpus_id", "rank_a", "rank_b")
    )
    rows = ranked.collect()
    list_a: dict = {}
    list_b: dict = {}
    for row in sorted(rows, key=lambda r: (r["query_id"], r["rank_a"])):
        if row["rank_a"] <= _IL_DEPTH:
            list_a.setdefault(row["query_id"], []).append(
                row["corpus_id"]
            )
    for row in sorted(rows, key=lambda r: (r["query_id"], r["rank_b"])):
        if row["rank_b"] <= _IL_DEPTH:
            list_b.setdefault(row["query_id"], []).append(
                row["corpus_id"]
            )

    from ..functions.hashing import h60_py

    def _coin(q: int, r: int) -> int:
        # pmod(h60('il|q|r'), 2) — the shared h60 definition's Python
        # face, so a change to h60/h60_sql cannot silently
        # desynchronize the draft coins from the oracle's
        return h60_py(f"il|{q}|{r}") % 2

    sel_rows: list = []  # (query_id, corpus_id, team)
    taken: dict = {}
    for r in range(1, _IL_ROUNDS + 1):
        for q in sorted(set(list_a) | set(list_b)):
            got = taken.setdefault(q, set())
            av_a = [c for c in list_a.get(q, []) if c not in got]
            av_b = [c for c in list_b.get(q, []) if c not in got]
            if not av_a or not av_b:
                continue  # the Spark shape's inner joins drop the query
            if _coin(q, r) == 0:
                fid, team1 = av_a[0], "A"
            else:
                fid, team1 = av_b[0], "B"
            sel_rows.append((q, fid, team1))
            got.add(fid)
            s_a = next((c for c in av_a if c != fid), None)
            s_b = next((c for c in av_b if c != fid), None)
            if s_a is None or s_b is None:
                continue  # second pick needs both lists non-exhausted
            sid, team2 = (s_b, "B") if team1 == "A" else (s_a, "A")
            sel_rows.append((q, sid, team2))
            got.add(sid)
    sel = spark.createDataFrame(
        sel_rows, "query_id bigint, corpus_id bigint, team string"
    )
    labeled = (
        sel.join(
            nv.select(F.col("vec_id").alias("corpus_id"), "label"),
            "corpus_id",
        )
        .join(
            F.broadcast(qs.select("query_id", "qlabel")), "query_id"
        )
        .select(
            "query_id",
            "team",
            (F.col("label") == F.col("qlabel")).alias("clicked"),
        )
    )
    ca = F.sum(
        F.when(F.col("team") == "A", F.col("clicked").cast("int")).otherwise(
            0
        )
    )
    cb = F.sum(
        F.when(F.col("team") == "B", F.col("clicked").cast("int")).otherwise(
            0
        )
    )
    return labeled.groupBy("query_id").agg(
        ca.cast("bigint").alias("clicks_a"),
        cb.cast("bigint").alias("clicks_b"),
        F.when(ca > cb, F.lit("A"))
        .when(ca < cb, F.lit("B"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    )
