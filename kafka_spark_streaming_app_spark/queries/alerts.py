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


@query("windowed_agg_approx")
def windowed_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION flagship twin: approx_count_distinct (HLL++) instead
    of the oracle's exact distinct — sketch values are engine-specific
    so this entry is rows-only checked (SURVEY.md §2.5 A4)."""
    from ..operators.windowed import windowed_aggregation

    events = load_table(spark, sf_dir, "events")
    return windowed_aggregation(
        events,
        window_duration="1 minute",
        slide_duration="30 seconds",
        exact_distinct=False,
        stabilize_sums=False,
    )
