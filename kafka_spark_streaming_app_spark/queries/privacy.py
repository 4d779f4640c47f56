"""Privacy-preserving release operators over the TPC-H-ish tables
(north-star extension scope — a training-data pipeline that PUBLISHES
aggregates or shares corpora needs a release gate, not just PII
scrubbing of the text itself; complements `pii_scrub`).

Cross-engine exactness: the DP noise is DERIVED noise — the inverse
Laplace CDF applied to an md5-derived uniform per released cell (the
`h60` discipline), so both engines draw the identical "sample" and the
driver hash-checks the whole release. Production swaps the hash seed
for a secret per-release seed; the mechanism and its calibration are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql
from ..registry import query
from ..sources.batch import load_table

# --- differentially-private noisy counts ------------------------------------

_DP_EPS = "1.0"   # epsilon, as SQL literal text (identical both engines)
_DP_SPACE = "1152921504606846976.0"  # 2^60

_DP_ORACLE = f"""
WITH counts AS (
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
),
seeded AS (
    SELECT o_orderpriority, n,
           (CAST({h60_sql("('dp|' || o_orderpriority)")} AS DOUBLE) + 0.5)
               / {_DP_SPACE} AS u
    FROM counts
),
noised AS (
    SELECT o_orderpriority, n, u,
           CAST(floor((0.0 - (1.0 / {_DP_EPS}))
                      * (CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END)
                      * ln(1.0 - 2.0 * abs(u - 0.5)) + 0.5) AS BIGINT)
               AS noise
    FROM seeded
)
SELECT o_orderpriority,
       n + noise AS noisy_count,
       noise,
       round(u, 6) AS u
FROM noised
"""


@query("dp_noisy_release", _DP_ORACLE)
def dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    epsilon = 1, sensitivity 1): per-priority order counts plus
    integer noise drawn by inverse Laplace CDF from a per-cell
    md5-derived uniform — u = (h60('dp|'+key)+0.5)/2^60 can never hit
    exactly 0, 1/2, or 1, so ln() never sees 0. floor(x+0.5) (not
    round()) keeps the integerization identical cross-engine. One
    aggregation + per-cell scalar math: release cost is
    cells-proportional at any table size. The noise column is
    exposed for the oracle/audit; a real release drops it and seeds
    the hash with a secret."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    u = (
        h60(F.concat(F.lit("dp|"), F.col("o_orderpriority"))).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    seeded = counts.select("o_orderpriority", "n", u.alias("u"))
    eps = float(_DP_EPS)
    noise = F.floor(
        (F.lit(0.0) - (F.lit(1.0) / F.lit(eps)))
        * F.when(F.col("u") < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("u") - F.lit(0.5)))
        + F.lit(0.5)
    ).cast("bigint")
    return seeded.select(
        "o_orderpriority",
        (F.col("n") + noise).alias("noisy_count"),
        noise.alias("noise"),
        F.round("u", 6).alias("u"),
    )


# --- k-anonymity / l-diversity audit ----------------------------------------

_KANON_K = 5
_LDIV_L = 3

_KANON_ORACLE = f"""
WITH cells AS (
    SELECT c_nationkey, c_mktsegment,
           count(*) AS n,
           count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
               AS n_sensitive_bands
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment,
       CAST(n AS BIGINT) AS n,
       CAST(n_sensitive_bands AS BIGINT) AS n_sensitive_bands,
       n >= {_KANON_K} AS k_anonymous,
       n_sensitive_bands >= {_LDIV_L} AS l_diverse,
       n < {_KANON_K} OR n_sensitive_bands < {_LDIV_L} AS must_suppress
FROM cells
"""


@query("k_anonymity_audit", _KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate audit over the quasi-identifier cell
    (nation, market segment): cell size (k-anonymity, k=5) and
    distinct sensitive-attribute bands (l-diversity over
    1000-unit account-balance bands, l=3); cells failing either
    must be suppressed or generalized before release. One
    aggregation over the identified table — the audit is
    cell-proportional, and the same cell table drives the
    generalization loop (coarsen, re-audit) in production."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint")
        ).alias("n_sensitive_bands"),
    )
    return cells.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_sensitive_bands").cast("bigint").alias(
            "n_sensitive_bands"
        ),
        (F.col("n") >= _KANON_K).alias("k_anonymous"),
        (F.col("n_sensitive_bands") >= _LDIV_L).alias("l_diverse"),
        (
            (F.col("n") < _KANON_K)
            | (F.col("n_sensitive_bands") < _LDIV_L)
        ).alias("must_suppress"),
    )


# --- right-to-be-forgotten erasure audit --------------------------------------

_ERASE_ORACLE = """
WITH victims AS (
    SELECT DISTINCT user_id FROM events
    WHERE user_id IS NOT NULL AND user_id % 29 = 0
),
ev AS (
    SELECT e.*, v.user_id IS NOT NULL AS erased
    FROM events e LEFT JOIN victims v ON e.user_id = v.user_id
)
SELECT
    CAST((SELECT count(*) FROM victims) AS BIGINT) AS n_subjects,
    CAST(coalesce(sum(CASE WHEN erased THEN 1 END), 0) AS BIGINT)
        AS n_rows_erased,
    CAST(count(*) AS BIGINT) AS n_rows_before,
    round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
          / 100.0, 2) AS value_before,
    round(CAST(sum(CASE WHEN NOT erased
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 100.0, 2) AS value_after,
    round(CAST(coalesce(sum(CASE WHEN erased
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             END), 0) AS DOUBLE)
          / CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE),
          6) AS value_share_erased
FROM ev
"""


@query("user_erasure_audit", _ERASE_ORACLE)
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a deterministic
    erasure cohort (every 29th user), how many event rows would a
    cascade delete remove and how much aggregate value drifts — the
    report a privacy/compliance pipeline produces BEFORE executing a
    GDPR/CCPA deletion, so downstream metric owners can sign off. One
    broadcast semi-join flag + one pass of conditional aggregates
    (exact integer cents throughout); at scale the victims table is
    the broadcast side and the audit cost is one fact scan — the
    delete itself then runs as partition-pruned anti-join rewrites."""
    ev = load_table(spark, sf_dir, "events")
    victims = (
        ev.filter(
            F.col("user_id").isNotNull() & (F.col("user_id") % 29 == 0)
        )
        .select("user_id")
        .distinct()
    )
    flagged = ev.join(
        F.broadcast(victims.withColumnRenamed("user_id", "vid")),
        F.col("user_id") == F.col("vid"),
        "left",
    ).withColumn("erased", F.col("vid").isNotNull())
    n_subjects = victims.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects")
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    agg = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("erased"), 1)), F.lit(0))
        .cast("bigint")
        .alias("n_rows_erased"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows_before"),
        F.sum(cents).alias("cb"),
        F.sum(F.when(~F.col("erased"), cents).otherwise(F.lit(0))).alias(
            "ca"
        ),
        F.coalesce(F.sum(F.when(F.col("erased"), cents)), F.lit(0)).alias(
            "ce"
        ),
    )
    return n_subjects.crossJoin(F.broadcast(agg)).select(
        "n_subjects",
        "n_rows_erased",
        "n_rows_before",
        F.round(F.col("cb").cast("double") / 100.0, 2).alias(
            "value_before"
        ),
        F.round(F.col("ca").cast("double") / 100.0, 2).alias(
            "value_after"
        ),
        F.round(
            F.col("ce").cast("double") / F.col("cb").cast("double"), 6
        ).alias("value_share_erased"),
    )


# --- t-closeness (EMD over ordered sensitive bands) --------------------------
# The third release gate: k-anonymity bounds cell size, l-diversity
# bounds distinct sensitive values, t-closeness bounds how far a
# cell's sensitive DISTRIBUTION drifts from the global one — the gate
# that catches a 5-member cell whose members are all in the top
# balance band. For ordered categories the Earth Mover's Distance is
# sum_i |cum_p_i - cum_q_i| / (m - 1); cross-multiplying by
# n_cell * N keeps every cumulative term an exact integer, so the
# only float op is one final division (IEEE-identical both engines).
_TCLOSE_T_NUM = 35  # threshold t = 0.35
_TCLOSE_ORACLE = """
WITH ident AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
    FROM customer
),
gband AS (
    SELECT band, count(*) AS gn FROM ident GROUP BY band
),
tot AS (SELECT count(*) AS n_total, count(DISTINCT band) AS m FROM ident),
cells AS (
    SELECT c_nationkey, c_mktsegment, count(*) AS n_cell
    FROM ident GROUP BY c_nationkey, c_mktsegment
),
grid AS (
    SELECT c.c_nationkey, c.c_mktsegment, c.n_cell, g.band, g.gn,
           coalesce(x.cn, 0) AS cn
    FROM cells c
    CROSS JOIN gband g
    LEFT JOIN (
        SELECT c_nationkey, c_mktsegment, band, count(*) AS cn
        FROM ident GROUP BY c_nationkey, c_mktsegment, band
    ) x USING (c_nationkey, c_mktsegment, band)
),
cums AS (
    SELECT c_nationkey, c_mktsegment, n_cell, band,
           sum(cn) OVER (PARTITION BY c_nationkey, c_mktsegment
                         ORDER BY band) AS cum_c,
           sum(gn) OVER (PARTITION BY c_nationkey, c_mktsegment
                         ORDER BY band) AS cum_g
    FROM grid
),
emd AS (
    SELECT c_nationkey, c_mktsegment, n_cell,
           sum(abs(cum_c * t.n_total - cum_g * n_cell)) AS emd_num
    FROM cums, tot t
    GROUP BY c_nationkey, c_mktsegment, n_cell
)
SELECT e.c_nationkey, e.c_mktsegment,
       CAST(e.n_cell AS BIGINT) AS n_cell,
       round(CAST(e.emd_num AS DOUBLE)
             / CAST(e.n_cell * t.n_total * (t.m - 1) AS DOUBLE), 6) AS t_emd,
       (e.emd_num * 100 <= 35 * e.n_cell * t.n_total * (t.m - 1))
           AS t_close
FROM emd e, tot t
ORDER BY c_nationkey, c_mktsegment
"""


@query("t_closeness_audit", _TCLOSE_ORACLE)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release gate over the (nation, market segment)
    quasi-identifier: per cell, the ordered-category Earth Mover's
    Distance between the cell's account-balance-band distribution and
    the global one, integer-exact via cross-multiplied cumulative
    counts (the t <= 0.35 verdict is a pure integer comparison; the
    reported t is the only float, one IEEE division). Cell and band
    cardinalities bound everything after the two grouping passes, so
    the audit is cells x bands regardless of table size."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    ident = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
    )
    glob = ident.groupBy("band").agg(F.count(F.lit(1)).alias("gn"))
    tot = ident.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_distinct("band").alias("m"),
    )
    cells = ident.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cell")
    )
    cell_band = ident.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("cn")
    )
    grid = (
        cells.crossJoin(F.broadcast(glob))
        .join(cell_band, ["c_nationkey", "c_mktsegment", "band"], "left")
        .fillna(0, subset=["cn"])
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("band")
    cums = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "n_cell",
        F.sum("cn").over(w).alias("cum_c"),
        F.sum("gn").over(w).alias("cum_g"),
    )
    emd = (
        cums.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_cell", "n_total", "m")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c") * F.col("n_total")
                    - F.col("cum_g") * F.col("n_cell")
                )
            ).alias("emd_num")
        )
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_cell").cast("bigint").alias("n_cell"),
        F.round(
            F.col("emd_num").cast("double")
            / (
                F.col("n_cell") * F.col("n_total") * (F.col("m") - 1)
            ).cast("double"),
            6,
        ).alias("t_emd"),
        (
            F.col("emd_num") * 100
            <= F.lit(_TCLOSE_T_NUM)
            * F.col("n_cell")
            * F.col("n_total")
            * (F.col("m") - 1)
        ).alias("t_close"),
    ).orderBy("c_nationkey", "c_mktsegment")
