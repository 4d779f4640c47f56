"""Additional TPC-H query shapes adapted to the testdata's columns —
each exercises a distinct optimizer pattern: scalar-subquery
decorrelation (Q2), EXISTS semi-join with derived predicates (Q4),
CASE-bucketed conditional counting (Q12), percentage-of-total over a
join (Q14), HAVING-gated IN subquery (Q18), and CUBE grouping sets.

Decimal discipline (see queries/relational.py): plain 2-decimal columns
sum through DECIMAL(25,4); double products through DECIMAL(27,10) then
a LOSSLESS downcast to DECIMAL(25,6) before the double cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windowed import stabilized_sum
from ..registry import query
from ..sources.batch import load_table


def _rev_sum(expr):
    return (
        F.sum(expr.cast("decimal(27,10)")).cast("decimal(25,6)").cast("double")
    )


# --- Q2 shape: correlated scalar subquery (min within group) -------------

_Q2_ORACLE = """
SELECT p.p_partkey, p.p_name, p.p_brand, p.p_retailprice
FROM part p
WHERE p.p_retailprice = (
    SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""


@query("q2_min_price_per_brand", _Q2_ORACLE)
def q2_min_price_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Q2's min-supplycost pattern):
    Catalyst decorrelates it into an aggregate + join — same SQL text
    runs on both engines."""
    from ..sources.batch import register_views

    register_views(spark, sf_dir, ("part",))
    return spark.sql(_Q2_ORACLE)


# --- Q4 shape: EXISTS with derived time predicate --------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
"""


@query("q4_late_shipment_priority", _Q4_ORACLE)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join whose predicate correlates both
    relations (shipdate vs orderdate + 90 days)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --- Q12 shape: conditional counting by bucket ------------------------------

_Q12_ORACLE = """
SELECT
    l_linestatus,
    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT)
        AS high_line_count,
    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT)
        AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@query("q12_priority_line_counts", _Q12_ORACLE)
def q12_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + CASE-bucketed conditional sums."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q14 shape: percentage-of-total over a join ----------------------------

_Q14_ORACLE = """
SELECT
    100.0 * CAST(CAST(sum(CASE WHEN p.p_type LIKE 'STANDARD%'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,10))
                 ELSE CAST(0 AS DECIMAL(27,10)) END) AS DECIMAL(25,6)) AS DOUBLE)
        / CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,10)))
               AS DECIMAL(25,6)) AS DOUBLE)
        AS standard_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-07-01'
"""


@query("q14_type_revenue_pct", _Q14_ORACLE)
def q14_type_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape (promo-revenue %): conditional revenue share over a
    fact⋈dim join, single global aggregate."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,10)"
    )
    zero = F.lit(0).cast("decimal(27,10)")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    agg = joined.agg(
        F.sum(F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(zero))
        .cast("decimal(25,6)")
        .cast("double")
        .alias("std_rev"),
        F.sum(rev).cast("decimal(25,6)").cast("double").alias("total_rev"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("std_rev") / F.col("total_rev")).alias(
            "standard_revenue_pct"
        )
    )


# --- Q18 shape: HAVING-gated IN subquery -----------------------------------

_Q18_ORACLE = """
SELECT c.c_name, o.o_orderkey, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
"""


@query("q18_large_volume_orders", _Q18_ORACLE)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN subquery whose inner query is itself a grouped
    HAVING aggregate (planned as agg → semi-join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        # no broadcast hint on customer (largest dimension) — AQE decides
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(stabilized_sum("l_quantity").alias("total_qty"))
    )


# --- CUBE grouping sets ------------------------------------------------------

_CUBE_ORACLE = """
SELECT
    o_orderstatus,
    o_orderpriority,
    count(*) AS n_orders,
    CAST(sum(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_orders", _CUBE_ORACLE)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE (all 2^n grouping sets in one Expand + hash agg)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        stabilized_sum("o_totalprice").alias("total_price"),
    )
