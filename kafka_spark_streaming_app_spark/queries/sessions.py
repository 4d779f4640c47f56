"""Sessionization query: Spark ``session_window`` vs the classic
lag-gap-cumsum SQL construction in DuckDB — two entirely different
algorithms that must agree exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sessions import sessionize
from ..registry import query
from ..sources.batch import load_table

# Session semantics: a gap >= the duration starts a new session; the
# session end is last_event + gap (Spark's session_window contract).
_SESSION_ORACLE = """
WITH ordered AS (
    SELECT
        user_id,
        ts,
        value,
        CASE
            WHEN lag(ts) OVER w IS NULL THEN 1
            WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
            ELSE 0
        END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT *,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM ordered
)
SELECT
    user_id,
    min(ts) AS session_start,
    max(ts) + INTERVAL 30 MINUTE AS session_end,
    count(*) AS n_events,
    CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, session_id
"""


@query("sessionize_users", _SESSION_ORACLE)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based (30 min) user sessions over the events stream table."""
    events = load_table(spark, sf_dir, "events")
    return sessionize(
        events, ts_col="ts", keys=("user_id",), gap="30 minutes"
    )
