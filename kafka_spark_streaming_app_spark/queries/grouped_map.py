"""Grouped-map applyInPandas query with an exact SQL oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.grouped import grouped_rank_pandas
from ..registry import query
from ..sources.batch import load_table

_GROUPED_RANK_ORACLE = """
SELECT
    event_type,
    event_id,
    value,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS group_rank
FROM events
"""


@query("grouped_rank_pandas", _GROUPED_RANK_ORACLE)
def grouped_rank_pandas_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ranking computed INSIDE pandas (grouped-map
    applyInPandas) — integer outputs with deterministic tie-break equal
    SQL row_number exactly, proving the grouped Python path end-to-end."""
    events = load_table(spark, sf_dir, "events")
    return grouped_rank_pandas(
        events, group_col="event_type", order_col="value", tie_col="event_id"
    )
