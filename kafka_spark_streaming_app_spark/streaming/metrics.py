"""Structured streaming observability.

The reference monitors by eyeballing a console sink
(``ecommerce_streaming.py:135-142``); the engine replaces that with
``Dataset.observe`` metrics — named aggregates evaluated per
micro-batch and delivered through the streaming listener / progress
events, costing one pass over rows already in flight (no extra query,
no extra sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_throughput_metrics(
    df: DataFrame,
    name: str = "engine_metrics",
    amount_col: str | None = "total_amount",
    ts_col: str | None = "event_timestamp",
) -> DataFrame:
    """Attach per-micro-batch metrics: row count, null-amount count,
    amount total, and event-time bounds. Read them from
    ``StreamingQuery.lastProgress["observedMetrics"][name]`` or a
    ``StreamingQueryListener``."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if amount_col:
        metrics += [
            F.sum(F.col(amount_col)).alias("amount_total"),
            F.count(F.when(F.col(amount_col).isNull(), 1)).alias("n_null_amount"),
        ]
    if ts_col:
        metrics += [
            F.min(F.col(ts_col)).alias("min_event_time"),
            F.max(F.col(ts_col)).alias("max_event_time"),
        ]
    return df.observe(name, *metrics)
