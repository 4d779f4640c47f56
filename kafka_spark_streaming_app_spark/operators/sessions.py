"""Sessionization: gap-based session windows.

``F.session_window(ts, gap)`` — events of the same key whose gaps are
strictly less than ``gap`` merge into one session spanning
[first_event, last_event + gap). Works identically in batch and
streaming (streaming needs a watermark; state is evicted once the
watermark passes a session's end).

Scale: one shuffle on the grouping key; session merging happens inside
the aggregation operator. Skewed keys (bot users with millions of
events) are the hazard — cap events-per-key upstream or pre-aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windowed import stabilized_sum


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    amount_col: str = "value",
    stabilize_sums: bool = True,
) -> DataFrame:
    """Per-key session aggregation: session bounds, event count, total.

    Output: *keys, session_start, session_end (= last event + gap),
    n_events, total_value.
    """
    total = (
        stabilized_sum(amount_col) if stabilize_sums else F.sum(F.col(amount_col))
    )
    agg = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        total.alias("total_value"),
    )
    return agg.select(
        *keys,
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        "n_events",
        "total_value",
    )
