"""Alert/fraud queries (reference F2-F5 filters + E1 CASE classifier,
SURVEY.md §2.4/§2.6) mapped onto the driver's ``events`` table:

- ``total_amount``   → ``value``      (threshold 300 ≈ the >1000 rule)
- ``location``       → ``event_type`` (IN-list rule on 'error')
- ``is_fraud_simulation`` → derived ``user_id % 10 = 0`` flag
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.alerts import detect_fraud
from ..registry import query
from ..sources.batch import load_table

_FRAUD_ORACLE = """
WITH flagged AS (
    SELECT *, (user_id % 10 = 0) AS is_fraud_simulation FROM events
)
SELECT
    event_id,
    user_id,
    value,
    event_type,
    ts,
    CASE
        WHEN value > 300 THEN 'HIGH_VALUE_ORDER'
        WHEN event_type IN ('error') THEN 'SUSPICIOUS_LOCATION'
        WHEN is_fraud_simulation THEN 'FRAUD_SIMULATION'
        ELSE 'UNKNOWN'
    END AS alert_type
FROM flagged
WHERE value > 300 OR event_type IN ('error') OR is_fraud_simulation
"""


@query("fraud_alerts", _FRAUD_ORACLE)
def fraud_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive fraud filter + first-match-wins alert classifier
    (reference ecommerce_streaming.py:87-107)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "is_fraud_simulation", F.col("user_id") % 10 == 0
    )
    return detect_fraud(
        events,
        select_cols=["event_id", "user_id", "value", "event_type", "ts"],
        amount_col="value",
        amount_threshold=300.0,
        location_col="event_type",
        suspicious_locations=("error",),
        flag_col="is_fraud_simulation",
    )


# Sketch values are engine-specific (cross-engine HLL never matches),
# but the sketch's ERROR BOUND is checkable: the query emits the exact
# distinct count plus a boolean asserting |HLL − exact| within 4 sigma
# of the configured rsd (0.05 default → 20%) with a small-cardinality
# floor. The oracle emits the exact count and literal TRUE — if the
# sketch ever drifts outside its contract, the driver hash flips red.
_APPROX_TOL_ORACLE = """
WITH expanded AS (
    SELECT
        make_timestamp(((CAST(floor(epoch(ts) / 30) AS BIGINT) - s.k) * 30) * 1000000)
            AS window_start,
        e.*
    FROM events e
    CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) s
)
SELECT
    window_start,
    window_start + INTERVAL 60 SECOND AS window_end,
    event_type,
    count(DISTINCT user_id) AS unique_customers,
    true AS hll_within_tolerance
FROM expanded
GROUP BY window_start, window_end, event_type
"""


@query("windowed_agg_approx", _APPROX_TOL_ORACLE)
def windowed_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION flagship twin: approx_count_distinct (HLL++) with a
    TOLERANCE oracle — the HLL value itself is engine-specific, so the
    query computes both sketch and exact distinct in one aggregation
    and hash-checks that the sketch honors its rsd error contract
    (SURVEY.md §2.5 A4)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.window(F.col("ts"), "1 minute", "30 seconds").alias("window"),
        "event_type",
    ).agg(
        F.approx_count_distinct("user_id").alias("hll_u"),
        F.count_distinct(F.col("user_id")).alias("unique_customers"),
    )
    tol = F.greatest(F.lit(4.0), F.lit(4 * 0.05) * F.col("unique_customers"))
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "unique_customers",
        (
            F.abs(F.col("hll_u") - F.col("unique_customers")) <= tol
        ).alias("hll_within_tolerance"),
    )
