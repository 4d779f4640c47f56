"""Pivot / unpivot (wide↔long reshaping).

Spark's ``groupBy().pivot()`` plans as a single hash aggregation with
conditional aggregates (given an explicit value list — always provide
one at scale, otherwise Spark runs an extra distinct job to discover
values). The DuckDB oracle expresses the same thing with FILTERed
aggregates; unpivot uses Spark's native ``unpivot`` vs DuckDB UNPIVOT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.batch import load_table

_STATUSES = ["F", "O", "P"]

_PIVOT_ORACLE = """
SELECT
    o_orderpriority,
    CAST(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(25,4)) END)
         AS DECIMAL(25,4)) AS DOUBLE) AS total_F,
    CAST(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(25,4)) END)
         AS DECIMAL(25,4)) AS DOUBLE) AS total_O,
    CAST(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(25,4)) END)
         AS DECIMAL(25,4)) AS DOUBLE) AS total_P
FROM orders
GROUP BY o_orderpriority
"""


@query("pivot_status_revenue", _PIVOT_ORACLE)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: order revenue by priority × status via conditional
    aggregates — ONE shuffle. (Spark's native ``groupBy().pivot()``
    plans a two-phase aggregation — two Exchanges — because it first
    aggregates by (group, pivot) then pivots the reduced rows; with a
    known small value list the conditional form halves the shuffles.
    Equivalence with native pivot is tested in tests/test_pivots.py.)"""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.sum(
                F.when(
                    F.col("o_orderstatus") == s,
                    F.col("o_totalprice").cast("decimal(25,4)"),
                )
            )
            .cast("double")
            .alias(f"total_{s}")
            for s in _STATUSES
        ]
    )


_UNPIVOT_ORACLE = """
SELECT c_custkey, metric, CAST(value AS DOUBLE) AS value
FROM (
    SELECT
        c_custkey,
        c_acctbal AS acctbal,
        CAST(c_nationkey AS DOUBLE) AS nation
    FROM customer
)
UNPIVOT (value FOR metric IN (acctbal, nation))
"""


@query("unpivot_customer_metrics", _UNPIVOT_ORACLE)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long unpivot (melt): two numeric columns → (metric, value) rows."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nation"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nation"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- explicit grouping sets -------------------------------------------------

_GROUPING_SETS_ORACLE = """
SELECT
    o_orderstatus,
    o_orderpriority,
    count(*) AS n_orders,
    CAST(sum(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total_price,
    CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("grouping_sets_orders", _GROUPING_SETS_ORACLE)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube: two disjoint
    single-column rollups + grand total in ONE Expand + hash agg pass)
    with grouping_id disambiguating which set produced each row (a
    NULL status row could otherwise be a real NULL group)."""
    from ..operators.windowed import stabilized_sum

    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        stabilized_sum("o_totalprice").alias("total_price"),
        F.grouping_id().cast("bigint").alias("gid"),
    )
