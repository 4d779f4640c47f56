"""Windowed-aggregation queries (reference flagship, SURVEY.md §2.5).

The DuckDB oracle expands the sliding window by cross-joining each
event with slide offsets k ∈ {0, 1}: ``window()`` with duration 60 s /
slide 30 s assigns event time t to the two epoch-aligned starts
``floor(t/30)*30`` and ``floor(t/30)*30 - 30`` — the same alignment
Spark uses (windows are aligned to the epoch, reference window spec at
ecommerce_streaming.py:69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.windowed import windowed_aggregation
from ..registry import query
from ..sources.batch import load_table

_SLIDING_ORACLE = """
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
    count(*) AS order_count,
    CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_revenue,
    CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) / count(*) AS avg_order_value,
    count(DISTINCT user_id) AS unique_customers,
    max(value) AS max_order_value,
    min(value) AS min_order_value
FROM expanded
GROUP BY window_start, window_end, event_type
"""


@query("windowed_agg_sliding", _SLIDING_ORACLE)
def windowed_agg_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship: 1-min window / 30-s slide × event_type with
    the A1-A6 aggregate set (exact-distinct twin for the oracle)."""
    events = load_table(spark, sf_dir, "events")
    return windowed_aggregation(
        events,
        ts_col="ts",
        keys=("event_type",),
        amount_col="value",
        user_col="user_id",
        window_duration="1 minute",
        slide_duration="30 seconds",
        exact_distinct=True,
        stabilize_sums=True,
    )


_TUMBLING_ORACLE = """
SELECT
    make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) * 300) * 1000000)
        AS window_start,
    make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 + 300) * 1000000)
        AS window_end,
    event_type,
    count(*) AS order_count,
    CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_revenue,
    CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) / count(*) AS avg_order_value,
    count(DISTINCT user_id) AS unique_customers,
    max(value) AS max_order_value,
    min(value) AS min_order_value
FROM events
GROUP BY window_start, window_end, event_type
"""


@query("windowed_agg_tumbling", _TUMBLING_ORACLE)
def windowed_agg_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window variant (5-minute buckets)."""
    events = load_table(spark, sf_dir, "events")
    return windowed_aggregation(
        events,
        window_duration="5 minutes",
        slide_duration=None,
        exact_distinct=True,
        stabilize_sums=True,
    )


_HAVING_ORACLE = """
WITH agg AS (
    SELECT
        make_timestamp((CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400) * 1000000)
            AS window_start,
        event_type,
        count(*) AS order_count,
        CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_revenue
    FROM events
    GROUP BY window_start, event_type
)
SELECT * FROM agg WHERE order_count > 5
"""


@query("windowed_agg_having", _HAVING_ORACLE)
def windowed_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter — reference F6 HAVING shape
    (ecommerce_streaming.py:85)."""
    from pyspark.sql import functions as F

    from ..operators.windowed import stabilized_sum

    events = load_table(spark, sf_dir, "events")
    agg = (
        events.groupBy(
            F.window("ts", "1 day").alias("window"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            stabilized_sum("value").alias("total_revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "order_count",
            "total_revenue",
        )
    )
    return agg.filter(F.col("order_count") > 5)
