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
