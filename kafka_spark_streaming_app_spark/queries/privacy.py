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
