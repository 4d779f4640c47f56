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


def grouped_median_center_arrow(
    df: DataFrame, group_col: str, id_col: str, cents_col: str
) -> DataFrame:
    """Grouped-map ``applyInArrow``: the Arrow-native face of the
    per-group Python stage (whole group arrives as ONE pyarrow.Table,
    no pandas materialization — the zero-copy path for wide/binary
    group payloads). Computes each row's deviation from its group
    median on an exact integer contract: dev2 = 2·v − (m_lo + m_hi),
    twice the deviation from the (possibly half-integer) median, so
    every output is an exact int64 that SQL reproduces regardless of
    either engine's quantile interpolation (m_lo/m_hi are the two
    middle ORDER STATISTICS, not an interpolated value)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    in_types = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(group_col, in_types[group_col], True),
            T.StructField(id_col, in_types[id_col], True),
            T.StructField(cents_col, T.LongType(), True),
            T.StructField("dev2_from_median", T.LongType(), True),
        ]
    )

    def center(table: "pa.Table") -> "pa.Table":
        v = table.column(cents_col)
        sorted_v = pc.array_sort_indices(v)
        n = len(v)
        lo = v.take(pa.array([sorted_v[(n - 1) // 2].as_py()])).to_pylist()[0]
        hi = v.take(pa.array([sorted_v[n // 2].as_py()])).to_pylist()[0]
        dev2 = pc.subtract(pc.multiply(v, pa.scalar(2, pa.int64())),
                           pa.scalar(lo + hi, pa.int64()))
        return pa.table(
            {
                group_col: table.column(group_col),
                id_col: table.column(id_col),
                cents_col: v,
                "dev2_from_median": dev2,
            }
        )

    return (
        df.select(group_col, id_col, cents_col)
        .groupBy(group_col)
        .applyInArrow(center, schema=out_schema)
    )
