"""As-of join: for each left row, the single most recent right row at
or before the left timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). Composition used
here (semantics-exact, scale-sane):

    left ⋈ right ON key AND right.ts <= left.ts        (range join)
      → row_number() PARTITION BY (left row id) ORDER BY right.ts DESC
      → keep rank 1

The range join is the standard fallback; its cost is bounded by
(left × matching right-rows per key). At 100 TB with dense right sides,
bucketize time (join on key + time-bucket, probe current & previous
bucket) to cap the fan-out, or use ``applyInPandas`` with
``pd.merge_asof`` per key partition — both preserve these semantics;
this module implements the declarative form Catalyst can optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Attach the latest ``right`` row (by ``right_ts``) at or before
    each left row's ``left_ts`` for the same key. Ties on right_ts
    break deterministically on the first right column."""
    r = right.select(
        F.col(right_key).alias("_rk"), F.col(right_ts).alias("_rts"), *right_cols
    )
    joined = left.join(
        r,
        (F.col(left_key) == F.col("_rk")) & (F.col("_rts") <= F.col(left_ts)),
        how,
    )
    w = Window.partitionBy(left_id).orderBy(
        F.desc("_rts"), *[F.asc(c) for c in right_cols[:1]]
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_rk")
        .withColumnRenamed("_rts", f"asof_{right_ts}")
    )
