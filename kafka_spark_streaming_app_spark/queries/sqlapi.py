"""SQL string interface: the engine's ``spark.sql`` surface.

The reference never uses ``spark.sql`` (SURVEY.md §2.8); a complete
engine must. These queries register the testdata as temp views and run
ANSI SQL that is *textually identical* to the DuckDB oracle — CTEs,
IN / NOT EXISTS subqueries, CASE, date arithmetic — demonstrating the
parser/analyzer surface, not just the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.batch import register_views

_SEGMENT_SQL = """
WITH seg AS (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
SELECT
    o_orderpriority,
    count(*) AS n_orders,
    CAST(sum(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM seg)
GROUP BY o_orderpriority
"""


@query("sql_cte_in_subquery", _SEGMENT_SQL)
def sql_cte_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + IN-subquery, same text on both engines."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SEGMENT_SQL)


_NOT_EXISTS_SQL = """
SELECT p.p_brand, count(*) AS n_parts
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48
)
GROUP BY p.p_brand
"""


@query("sql_not_exists", _NOT_EXISTS_SQL)
def sql_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (anti-join decorrelation), same text on
    both engines."""
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(_NOT_EXISTS_SQL)


_CASE_DATE_SQL = """
SELECT
    CASE
        WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 'old'
        WHEN o_orderdate < TIMESTAMP '2000-01-01' THEN 'mid'
        ELSE 'recent'
    END AS era,
    o_orderstatus,
    count(*) AS n,
    min(o_orderdate) AS first_order,
    max(o_orderdate) AS last_order
FROM orders
GROUP BY era, o_orderstatus
"""


@query("sql_case_date_buckets", _CASE_DATE_SQL)
def sql_case_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE buckets over timestamps + min/max date aggregates."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_CASE_DATE_SQL)


_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE succ AS (
    SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_key,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
),
chain(o_custkey, o_orderkey, next_key, chain_pos) AS (
    SELECT o_custkey, o_orderkey, next_key, 1 FROM succ WHERE rn = 1
    UNION ALL
    SELECT /*+ BROADCAST(c) */ s.o_custkey, s.o_orderkey, s.next_key,
           c.chain_pos + 1
    FROM chain c JOIN succ s
      ON s.o_custkey = c.o_custkey AND s.o_orderkey = c.next_key
)
SELECT o_custkey, o_orderkey, CAST(chain_pos AS BIGINT) AS chain_pos
FROM chain
"""


@query("sql_recursive_order_chain", _RECURSIVE_CHAIN_SQL)
def sql_recursive_order_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE), same text on both
    engines: walk each customer's order history front-to-back along
    lead()-built successor links — anchor is the first order, each
    iteration joins the next. The successor graph is a union of linear
    chains (acyclic by construction), so UNION ALL recursion
    terminates at the longest per-customer history — Spark's
    iterative execution depth is max-orders-per-customer, not table
    size, and each step is an equi-join on (custkey, orderkey).

    The ``BROADCAST(c)`` hint broadcasts the recursion FRONTIER —
    one row per still-active customer, strictly shrinking — so each
    iteration streams ``succ`` through a broadcast-hash join instead
    of re-shuffling it; measured 11.5 -> 7.9 s warm at sf0.1.

    Spark-side only (the DuckDB oracle keeps the single recursive
    text), the windowed successor table is materialized ONCE behind a
    lazy ``localCheckpoint`` before the recursion starts: recursive
    CTEs are re-planned per step with no cross-iteration
    materialization, so inlining ``succ`` re-ran the full sort-window
    over orders at every depth (measured 18 s isolated at sf0.1;
    checkpointing the 3-column successor table cuts the per-iteration
    work to a broadcast-hash probe of the cached rows). At 100 TB the
    checkpoint is one shuffle-free columnar write of 3 columns,
    strictly cheaper than depth x windowed rescans. The non-recursive
    production twin for this result is a single ``row_number()``
    window, which is what ``window_functions_orders`` exercises."""
    register_views(spark, sf_dir, ("orders",))
    succ = spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               lead(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                   AS next_key,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
        """
    ).localCheckpoint(eager=False)
    succ.createOrReplaceTempView("succ_materialized")
    return spark.sql(
        """
        WITH RECURSIVE chain(o_custkey, o_orderkey, next_key, chain_pos) AS (
            SELECT o_custkey, o_orderkey, next_key, 1
            FROM succ_materialized WHERE rn = 1
            UNION ALL
            SELECT /*+ BROADCAST(c) */ s.o_custkey, s.o_orderkey, s.next_key,
                   c.chain_pos + 1
            FROM chain c JOIN succ_materialized s
              ON s.o_custkey = c.o_custkey AND s.o_orderkey = c.next_key
        )
        SELECT o_custkey, o_orderkey, CAST(chain_pos AS BIGINT) AS chain_pos
        FROM chain
        """
    )


_LATERAL_TOPK_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice, t.rk
FROM customer c,
LATERAL (
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@query("sql_lateral_topk", _LATERAL_TOPK_SQL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (same text on both engines): the
    top-2 orders per customer as a per-row dependent subplan —
    Catalyst decorrelates it into the window-rank-filter plan rather
    than executing per-row; deterministic via the orderkey tiebreak."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_TOPK_SQL)
