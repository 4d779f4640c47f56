"""Rule-based alert detection & classification.

Re-expresses the reference's fraud-detection branch
(``create_fraud_detection``, reference ``ecommerce_streaming.py:87-107``):

1. a disjunctive filter (F2 numeric threshold | F3 IN-list | F4 boolean
   flag — SURVEY.md §2.4),
2. a first-match-wins ``when/when/otherwise`` CASE classifier (E1),
3. a narrow alert projection (P7).

Both steps are pure column expressions — no UDFs, fully
whole-stage-codegen'd, and the filter is pushed to the parquet scan by
Catalyst in batch mode. At 100 TB this operator is scan-bound, exactly
as it should be: no shuffle, no state (in streaming it is a stateless
map/filter over each micro-batch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fraud_predicate(
    amount_col: str = "total_amount",
    amount_threshold: float = 1000.0,
    location_col: str = "location",
    suspicious_locations: Sequence[str] = ("XX", "YY", "ZZ"),
    flag_col: str = "is_fraud_simulation",
) -> Column:
    """The reference's 3-rule disjunction (ecommerce_streaming.py:90-94):
    high value OR suspicious location OR simulation flag."""
    return (
        (F.col(amount_col) > F.lit(amount_threshold))
        | F.col(location_col).isin(list(suspicious_locations))
        | (F.col(flag_col) == F.lit(True))
    )


def classify_alert_type(
    amount_col: str = "total_amount",
    amount_threshold: float = 1000.0,
    location_col: str = "location",
    suspicious_locations: Sequence[str] = ("XX", "YY", "ZZ"),
    flag_col: str = "is_fraud_simulation",
) -> Column:
    """First-match-wins CASE chain (ecommerce_streaming.py:102-105).
    Branch priority is semantic: HIGH_VALUE_ORDER wins over
    SUSPICIOUS_LOCATION wins over FRAUD_SIMULATION."""
    return (
        F.when(F.col(amount_col) > F.lit(amount_threshold), F.lit("HIGH_VALUE_ORDER"))
        .when(
            F.col(location_col).isin(list(suspicious_locations)),
            F.lit("SUSPICIOUS_LOCATION"),
        )
        .when(F.col(flag_col) == F.lit(True), F.lit("FRAUD_SIMULATION"))
        .otherwise(F.lit("UNKNOWN"))
    )


def detect_fraud(
    df: DataFrame,
    select_cols: Sequence[str],
    **rule_kwargs,
) -> DataFrame:
    """Filter to fraudulent rows and attach ``alert_type`` — the full
    reference operator (filter + classify + narrow projection)."""
    return (
        df.filter(fraud_predicate(**rule_kwargs))
        .withColumn("alert_type", classify_alert_type(**rule_kwargs))
        .select(*select_cols, "alert_type")
    )
