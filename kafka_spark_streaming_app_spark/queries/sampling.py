"""Deterministic distributed sampling — the fixed-size selection
steps a training-data pipeline runs between curation and training:
an exact-k uniform sample (eval holdouts, human-review batches) and
an exact Neyman-allocated stratified sample (variance-optimal audits
across heterogeneous strata).

Both are rank-based: a Carter-Wegman integer hash gives every row a
deterministic pseudorandom key, and "sample k" becomes "k smallest
keys" — the scalable form of reservoir sampling. Spark executes it as
per-partition partial top-k merged on the driver (TakeOrderedAndProject
— no global sort, no shuffle of the corpus) or per-stratum
WindowGroupLimit; both engines replay the identical arithmetic, so the
SAMPLE ITSELF is value-hash checked, not just its size.

Complements the existing selection family: `source_cap_sample` (cap
per domain), `importance_sample_quality` (quality-proportional),
`language_rebalance` (mixture reshaping) — this module is the
fixed-SIZE exact-count corner of that space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.batch import load_table

# Carter-Wegman multiply-mod-prime uniform (the bootstrap_ci_mean
# convention, mlstats.py): pure int64 — doc_id ≤ 6e11 times A ≤ 1.3e7
# stays under 8e18 — so both engines compute bit-identical keys.
_P = 2147483647
_A = 10_460_353  # odd, md5("reservoir")-derived, ≤ 1.3e7
_C = 1_779_033_703 % _P
_KEY_SQL = f"((doc_id * {_A} + {_C}) % {_P})"

_RESERVOIR_K = 100

_RESERVOIR_ORACLE = f"""
SELECT doc_id, lang, source, n_chars,
       CAST({_KEY_SQL} AS BIGINT) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT {_RESERVOIR_K}
"""


@query("reservoir_sample_exact", _RESERVOIR_ORACLE)
def reservoir_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample without replacement: k smallest
    Carter-Wegman keys, ties broken by doc_id. `df.sample()` gives a
    BINOMIAL size (±√k jitter) and RDD-level `takeSample` collects
    through the driver; rank-based selection gives the exact count
    with a one-pass distributed plan — Spark compiles the
    orderBy+limit into TakeOrderedAndProject (per-partition top-k,
    k-row merge on the driver; asserted in the plan suite), which is
    the same partial-reservoir-then-merge a hand-written distributed
    reservoir performs. At 100 TB: each task keeps a k-row heap over
    its split; only n_tasks·k rows ever move."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(_KEY_SQL).cast("bigint").alias("sample_key"),
        )
        .orderBy("sample_key", "doc_id")
        .limit(_RESERVOIR_K)
    )


_STRAT_K = 200

# Neyman allocation n_h ∝ N_h·σ_h, integer-exact largest-remainder
# rounding. σ_h uses the exact integer power sums (Σx, Σx²) per
# stratum; sqrt is IEEE-correctly-rounded so N_h·σ_h is the same
# double on both engines, then floor(·*1e6) moves allocation into
# pure int64 arithmetic (div/mod), where largest-remainder
# apportionment is engine-exact.
_STRAT_ORACLE = f"""
WITH s AS (
    SELECT lang,
           count(*) AS n_h,
           CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(sum(CAST(n_chars AS DECIMAL(38,0))
                    * CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS sxx
    FROM documents GROUP BY lang
),
w AS (
    SELECT lang, n_h,
           CAST(floor(n_h * sqrt(greatest(sxx / n_h - (sx / n_h) * (sx / n_h),
                                          0.0)) * 1e6) AS BIGINT) AS wt
    FROM s
),
tot AS (SELECT sum(wt) AS wsum FROM w),
base AS (
    SELECT lang, n_h, wt,
           CAST(({_STRAT_K} * wt) // wsum AS BIGINT) AS n_base,
           CAST(({_STRAT_K} * wt) % wsum AS BIGINT) AS rem
    FROM w, tot
),
leftover AS (
    SELECT CAST({_STRAT_K} - sum(n_base) AS BIGINT) AS extra FROM base
),
alloc AS (
    SELECT lang, n_h,
           n_base + CASE WHEN row_number()
                              OVER (ORDER BY rem DESC, lang) <= extra
                         THEN 1 ELSE 0 END AS n_alloc
    FROM base, leftover
),
ranked AS (
    SELECT d.doc_id, d.lang, d.n_chars, a.n_alloc,
           row_number() OVER (
               PARTITION BY d.lang
               ORDER BY {_KEY_SQL}, d.doc_id) AS rn
    FROM documents d JOIN alloc a USING (lang)
)
SELECT doc_id, lang, n_chars, CAST(n_alloc AS BIGINT) AS n_alloc
FROM ranked WHERE rn <= n_alloc
ORDER BY lang, doc_id
"""


@query("stratified_sample_neyman", _STRAT_ORACLE)
def stratified_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified sample: Neyman allocation
    n_h ∝ N_h·σ_h(n_chars) over language strata, rounded to EXACTLY
    k=200 total by integer largest-remainder apportionment, then the
    n_h smallest-keyed docs per stratum. The allocation arithmetic is
    int64 end-to-end after one IEEE sqrt (floor-scaled weights, div/
    mod apportionment) so both engines agree to the row. Plan shape:
    one scan for the per-stratum power sums (a stratum-count-sized
    table, broadcast back), then one per-stratum window whose
    rank<=n filter Spark executes as WindowGroupLimit — per-partition
    partial top-k per stratum, never a full stratum sort."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(F.col("n_chars").cast("decimal(38,0)"))
        .cast("double")
        .alias("sx"),
        F.sum(
            F.col("n_chars").cast("decimal(38,0)")
            * F.col("n_chars").cast("decimal(38,0)")
        )
        .cast("double")
        .alias("sxx"),
    )
    var = F.greatest(
        F.col("sxx") / F.col("n_h")
        - (F.col("sx") / F.col("n_h")) * (F.col("sx") / F.col("n_h")),
        F.lit(0.0),
    )
    # w is stratum-cardinality-sized but feeds tot, base, leftover and
    # alloc — barrier it so the corpus power-sum aggregation runs once
    w = s.select(
        "lang",
        "n_h",
        F.floor(F.col("n_h") * F.sqrt(var) * F.lit(1e6))
        .cast("bigint")
        .alias("wt"),
    ).localCheckpoint(eager=False)
    tot = w.agg(F.sum("wt").alias("wsum"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_h",
        "wt",
        F.expr(f"({_STRAT_K} * wt) div wsum").cast("bigint").alias("n_base"),
        F.expr(f"({_STRAT_K} * wt) % wsum").cast("bigint").alias("rem"),
    )
    leftover = base.agg(
        (F.lit(_STRAT_K) - F.sum("n_base")).cast("bigint").alias("extra")
    )
    w_rem = Window.orderBy(F.desc("rem"), F.asc("lang"))
    alloc = (
        base.crossJoin(F.broadcast(leftover))
        .withColumn(
            "n_alloc",
            F.col("n_base")
            + F.when(
                F.row_number().over(w_rem) <= F.col("extra"), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .select("lang", "n_alloc")
    )
    w_key = Window.partitionBy("lang").orderBy(
        F.expr(_KEY_SQL), F.col("doc_id")
    )
    # the literal rn <= k conjunct is redundant (n_alloc <= k by
    # construction) but it is what lets Catalyst insert a
    # WindowGroupLimit: per-partition top-k per stratum BEFORE the
    # stratum window's sort — the column-valued n_alloc bound alone
    # cannot be pushed
    ranked = (
        docs.join(F.broadcast(alloc), "lang")
        .withColumn("rn", F.row_number().over(w_key))
        .filter(
            (F.col("rn") <= F.lit(_STRAT_K))
            & (F.col("rn") <= F.col("n_alloc"))
        )
    )
    return ranked.select(
        "doc_id", "lang", "n_chars", F.col("n_alloc").cast("bigint")
    ).orderBy("lang", "doc_id")


# --- weighted sampling without replacement (Efraimidis–Spirakis) ------------

_WES_K = 100
# Distinct CW multiplier so the weighted sample is independent of the
# uniform reservoir's keys (same convention: md5("weighted")-derived
# odd A ≤ 1.3e7 keeps doc_id·A in int64).
_WES_A = 11_698_327
_WES_C = 2_773_480_762 % _P
_WES_KEY_SQL = f"((doc_id * {_WES_A} + {_WES_C}) % {_P})"
# Efraimidis–Spirakis: select the k largest u^(1/w). Ranking by the
# monotone transform ln(u)/w avoids pow() entirely; ln is floor-
# quantized at 1e-12 (the km_survival libm discipline) so the ORDER BY
# key is an exact int64 on both engines, ties broken by doc_id.
# u = (cw_key + 1)/P ∈ (0, 1] — ln never sees 0.
_WES_RANK_SQL = (
    f"CAST(floor(1e12 * (ln((CAST({_WES_KEY_SQL} AS DOUBLE) + 1.0)"
    f" / {_P}) / n_chars)) AS BIGINT)"
)

_WES_ORACLE = f"""
SELECT doc_id, lang, source, n_chars,
       {_WES_RANK_SQL} AS es_key_q
FROM documents
WHERE n_chars > 0
ORDER BY es_key_q DESC, doc_id
LIMIT {_WES_K}
"""


@query("weighted_sample_es", _WES_ORACLE)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k sample WITHOUT replacement with probability ∝ weight
    (n_chars — longer documents carry more training tokens, so
    token-proportional selection is the natural corpus subsample):
    Efraimidis–Spirakis one-pass keys u^(1/w), ranked by the monotone
    transform ln(u)/w so no pow() is needed, with the ln
    floor-quantized to an exact int64 ORDER BY key. Spark compiles
    the orderBy+limit into TakeOrderedAndProject (per-partition k-row
    heap + driver merge of n_tasks·k rows — no global sort), the same
    distributed shape as `reservoir_sample_exact`, which this
    generalizes from uniform to weighted. The SAMPLE ITSELF
    hash-checks cross-engine, not just its size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(_WES_RANK_SQL).alias("es_key_q"),
        )
        .orderBy(F.desc("es_key_q"), "doc_id")
        .limit(_WES_K)
    )
