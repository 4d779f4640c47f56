"""Null-handling semantics: coalesce / nullif / null-safe equality /
null-aware aggregation — the correctness corners every engine must get
right. Nulls are injected deterministically (the testdata itself is
null-free)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.batch import load_table

_NULLS_ORACLE = """
WITH withnulls AS (
    SELECT
        event_id,
        CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
        CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS et
    FROM events
)
SELECT
    event_id,
    coalesce(v, -1.0) AS v_filled,
    nullif(et, 'click') AS et_no_click,
    (v IS NOT DISTINCT FROM NULL) AS v_is_null,
    CASE WHEN et IS NULL AND v IS NULL THEN 'both'
         WHEN et IS NULL THEN 'et_only'
         WHEN v IS NULL THEN 'v_only'
         ELSE 'neither' END AS null_shape
FROM withnulls
"""


@query("null_handling", _NULLS_ORACLE)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / null-safe comparison / CASE over injected
    nulls."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise(F.col("event_type"))
        .alias("et"),
    )
    return ev.select(
        "event_id",
        F.coalesce(F.col("v"), F.lit(-1.0)).alias("v_filled"),
        F.nullif(F.col("et"), F.lit("click")).alias("et_no_click"),
        F.col("v").eqNullSafe(F.lit(None).cast("double")).alias("v_is_null"),
        F.when(F.col("et").isNull() & F.col("v").isNull(), "both")
        .when(F.col("et").isNull(), "et_only")
        .when(F.col("v").isNull(), "v_only")
        .otherwise("neither")
        .alias("null_shape"),
    )


_NULL_AGG_ORACLE = """
WITH withnulls AS (
    SELECT
        event_type,
        CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
    FROM events
)
SELECT
    event_type,
    count(*) AS n_rows,
    count(v) AS n_nonnull,
    CAST(sum(CAST(v AS DECIMAL(25,4))) AS DOUBLE) AS sum_v,
    CAST(sum(CAST(v AS DECIMAL(25,4))) AS DOUBLE) / count(v) AS avg_v
FROM withnulls
GROUP BY event_type
"""


@query("null_aware_aggregation", _NULL_AGG_ORACLE)
def null_aware_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) vs count(col) and null-skipping sum/avg."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.sum(F.col("v").cast("decimal(25,4)")).cast("double").alias("sum_v"),
    )
    return agg.select(
        "event_type",
        "n_rows",
        "n_nonnull",
        "sum_v",
        (F.col("sum_v") / F.col("n_nonnull")).alias("avg_v"),
    )
