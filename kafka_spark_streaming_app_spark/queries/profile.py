"""Profiling query: per-column audit of the orders table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# --- constraint audit (deequ/dbt-test shape) --------------------------------

_AUDIT_ORACLE = """
SELECT 'orders_pk_unique' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_fk_customer',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'events_value_nonnegative',
       CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'documents_text_not_null',
       CAST(count(CASE WHEN text IS NULL THEN 1 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lineitem_qty_range',
       CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
            AS BIGINT)
FROM lineitem
"""


@query("data_quality_audit", _AUDIT_ORACLE)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over the warehouse (the deequ/dbt-test shape):
    key uniqueness, two referential-integrity checks (anti-join
    counts), a value-range check, and not-null checks — one row per
    constraint with its violation count (0 = pass). Each check is a
    single aggregate or anti-join over one table; the union is a
    plan-parallel batch of independent small jobs, which is exactly
    how a nightly data-contract gate runs at 100 TB (per-partition
    scoping composes the same way)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
        )

    pk = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "n_violations"
        )
    )
    fk_li = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == orders.o_orderkey,
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n_violations"))
    )
    fk_o = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n_violations"))
    )
    ev = events.agg(
        F.count(F.when(F.col("value") < 0, 1)).alias("n_violations")
    )
    dn = documents.agg(
        F.count(F.when(F.col("text").isNull(), 1)).alias("n_violations")
    )
    qty = lineitem.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("n_violations")
    )
    return (
        check("orders_pk_unique", pk)
        .unionByName(check("lineitem_fk_orders", fk_li))
        .unionByName(check("orders_fk_customer", fk_o))
        .unionByName(check("events_value_nonnegative", ev))
        .unionByName(check("documents_text_not_null", dn))
        .unionByName(check("lineitem_qty_range", qty))
    )


# --- categorical column profiling: entropy + Gini ---------------------------
#
# The CBO/data-quality statistics for categorical columns: cardinality,
# Shannon entropy, and Gini impurity per profiled column. Exactness:
# Gini = 1 - sum(c^2)/N^2 is one division of exact integers; entropy
# terms are floor-quantized to nano-nats (the KL/BM25 discipline) so
# the cross-category sum adds exact int64.

def _entropy_block(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(tu) AS DOUBLE) / 1e9 AS entropy_nats,
       1.0 - CAST(sum(CAST(c AS DECIMAL(15,0)) * CAST(c AS DECIMAL(15,0)))
                  AS DOUBLE)
           / (CAST(sum(c) AS DOUBLE) * sum(c)) AS gini
FROM (
    SELECT c,
           CAST(floor(1e9 * (CAST(c AS DOUBLE) / t)
                * ln(CAST(t AS DOUBLE) / c)) AS BIGINT) AS tu
    FROM (
        SELECT count(*) AS c FROM events GROUP BY {col}
    ), (SELECT count(*) AS t FROM events)
)
"""


_ENTROPY_ORACLE = "\nUNION ALL\n".join(
    _entropy_block(c) for c in ("event_type", "user_id")
)


@query("categorical_entropy", _ENTROPY_ORACLE)
def categorical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column categorical statistics (cardinality, entropy, Gini)
    — one groupBy per profiled column, 1-row total broadcast, unioned.
    The skew diagnostic a planner or data-quality gate reads: low
    entropy relative to log(cardinality) flags hot keys before they
    hit a join."""
    ev = load_table(spark, sf_dir, "events")
    outs = []
    for col in ("event_type", "user_id"):
        counts = ev.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        total = counts.agg(F.sum("c").alias("t"))
        term = (
            counts.crossJoin(F.broadcast(total))
            .select(
                "c",
                "t",
                F.floor(
                    F.lit(1e9)
                    * (F.col("c").cast("double") / F.col("t"))
                    * F.log(F.col("t").cast("double") / F.col("c"))
                )
                .cast("bigint")
                .alias("tu"),
            )
        )
        outs.append(
            term.agg(
                F.count(F.lit(1)).alias("n_distinct"),
                (F.sum("tu").cast("double") / F.lit(1e9)).alias(
                    "entropy_nats"
                ),
                (
                    F.lit(1.0)
                    # c^2 through DECIMAL: int64 sum(c*c) overflows at
                    # c ~ 3e9 rows/category (ANSI abort or silent wrap
                    # vs DuckDB's exact hugeint) — decimal(15)^2 sums
                    # exactly to decimal(38) on both engines
                    - F.sum(
                        F.col("c").cast("decimal(15,0)")
                        * F.col("c").cast("decimal(15,0)")
                    ).cast("double")
                    / (
                        F.sum("c").cast("double")
                        * F.sum("c")
                    )
                ).alias("gini"),
            ).select(
                F.lit(col).alias("column_name"),
                "n_distinct",
                "entropy_nats",
                "gini",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
