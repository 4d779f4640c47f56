"""Grouped-map Pandas-UDF operators (applyInPandas).

The per-group Python stage: Spark shuffles rows by key, hands each
group to pandas as one DataFrame, and reassembles the output — the
shape for per-group model scoring, per-entity resampling, or any
group-local algorithm that wants the whole group in memory. Keep
groups bounded (a hot key's group must fit an executor); salt or
pre-aggregate skewed keys first (operators/skew.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

def grouped_rank_pandas(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tie_col: str,
) -> DataFrame:
    """Grouped-map ``applyInPandas`` demonstrator: per-group ordinal
    rank computed in pandas (sort + arange). Integer output with a
    deterministic tie-break, so it is exactly oracle-checkable against
    SQL row_number — the shape any per-group Python model-scoring stage
    follows."""
    # output schema mirrors the INPUT column types (hard-coding types
    # would break any df whose columns aren't the fixture's types)
    in_types = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(group_col, in_types[group_col], True),
            T.StructField(tie_col, in_types[tie_col], True),
            T.StructField(order_col, in_types[order_col], True),
            T.StructField("group_rank", T.LongType(), True),
        ]
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [order_col, tie_col], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["group_rank"] = pdf.index + 1
        return pdf[[group_col, tie_col, order_col, "group_rank"]]

    return (
        df.select(group_col, tie_col, order_col)
        .groupBy(group_col)
        .applyInPandas(rank_group, schema=out_schema)
    )
