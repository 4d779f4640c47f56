"""Profiling query: per-column audit of the orders table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import profile_columns
from ..registry import query
from ..sources.batch import load_table

_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
       count(o_orderkey) AS n_nonnull, count(DISTINCT o_orderkey) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(o_custkey), count(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(o_orderstatus), count(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(o_totalprice), count(DISTINCT o_totalprice) FROM orders
UNION ALL
SELECT 'o_orderdate', count(*), count(o_orderdate), count(DISTINCT o_orderdate) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(o_orderpriority), count(DISTINCT o_orderpriority) FROM orders
"""


@query("profile_orders", _PROFILE_ORACLE)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column (rows, non-null, distinct) profile — the
    new-dataset audit."""
    return profile_columns(load_table(spark, sf_dir, "orders"))
