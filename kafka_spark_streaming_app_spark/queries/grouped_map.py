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
