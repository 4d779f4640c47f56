"""Table profiling: per-column cardinality/null audit.

The first operator anyone runs against a new 100 TB table. One pass
per column batch (Spark evaluates all aggregates in a single scan when
composed as one agg row, then unpivoted), exact counts (the production
twin swaps count_distinct for approx_count_distinct to stay single-pass
at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """(column, n_rows, n_nonnull, n_distinct) per column — exact by
    default, sketched with ``approx=True``."""
    distinct = F.approx_count_distinct if approx else F.count_distinct
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.col(c)).alias(f"__nn_{c}") for c in df.columns],
        *[distinct(F.col(c)).alias(f"__nd_{c}") for c in df.columns],
    )
    per_col = None
    for c in df.columns:
        row = agg.select(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        per_col = row if per_col is None else per_col.unionAll(row)
    return per_col
