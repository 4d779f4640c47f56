"""Grouped-map applyInPandas query with an exact SQL oracle."""

from __future__ import annotations

import pandas as pd

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


# --- grouped-AGG pandas UDF (Arrow UDAF) ------------------------------------
#
# The third pandas-UDF face (scalar and grouped-map are covered
# elsewhere): a GROUPED_AGG pandas_udf — whole group in, one scalar
# out, Arrow-batched. Exactness discipline: inputs are converted to
# exact int64 (price cents, integral quantities) BEFORE the UDF, the
# UDF reduces in integer space, and the only doubles are one multiply
# and one divide of exact integers — so the Python aggregation is
# bit-identical to the SQL oracle regardless of partition order.

_WAVG_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        / (100.0 * sum(CAST(l_quantity AS BIGINT))) AS wavg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("grouped_wavg_pandas", _WAVG_ORACLE)
def grouped_wavg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per (returnflag, linestatus)
    computed by a GROUPED_AGG ``pandas_udf`` — the Arrow UDAF path.
    Plans as a regular hash aggregate (partial batches stream through
    Python per group), shuffling only the group keys."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(cents: pd.Series, qty: pd.Series) -> float:
        num = int((cents * qty).sum())
        den = int(qty.sum())
        return num / (100.0 * den) if den else 0.0

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        wavg("cents", "qty").alias("wavg_price")
    )


# --- grouped-map applyInArrow (the Arrow-native grouped face) ---------------

_ARROW_CENTER_ORACLE = """
WITH t AS (
    SELECT event_type, event_id,
           CAST(round(value * 100, 0) AS BIGINT) AS vc
    FROM events WHERE value IS NOT NULL
),
o AS (
    SELECT event_type,
           min(CASE WHEN rn = (n - 1) // 2 + 1 THEN vc END) AS m_lo,
           min(CASE WHEN rn = n // 2 + 1 THEN vc END) AS m_hi
    FROM (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY vc, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM t
    ) GROUP BY event_type
)
SELECT t.event_type, t.event_id, t.vc,
       CAST(2 * t.vc - (o.m_lo + o.m_hi) AS BIGINT) AS dev2_from_median
FROM t JOIN o USING (event_type)
"""


@query("grouped_median_center_arrow", _ARROW_CENTER_ORACLE)
def grouped_median_center_arrow_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group median-centering computed INSIDE pyarrow
    (grouped-map ``applyInArrow`` — the Arrow-native grouped face,
    completing the UDF matrix: scalar pandas_udf, GROUPED_AGG,
    applyInPandas, mapInPandas, mapInArrow, applyInPandasWithState,
    and now grouped applyInArrow). Exact contract: the output is
    2·v − (m_lo + m_hi) over the two middle order statistics in
    integer cents, so the Python/Arrow path is hash-identical to the
    SQL window-rank oracle with no interpolation-formula exposure.
    (The oracle ranks by (vc, event_id) for a deterministic window,
    but m_lo/m_hi depend only on the sorted VALUES — ties make the
    order-statistic value unique even when ranks aren't — so the
    Arrow side's value-only sort provably agrees.)"""
    from ..operators.grouped import grouped_median_center_arrow

    events = load_table(spark, sf_dir, "events").filter(
        "value IS NOT NULL"
    )
    import pyspark.sql.functions as F

    t = events.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
    )
    return grouped_median_center_arrow(
        t, group_col="event_type", id_col="event_id", cents_col="vc"
    )
