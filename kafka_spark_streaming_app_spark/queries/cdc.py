"""Change-data-capture application: MERGE a keyed change feed into a
snapshot with latest-wins semantics — the lakehouse ``MERGE INTO``
shape (upsert + delete) expressed as pure DataFrame ops so it runs on
plain parquet.

The change feed is derived deterministically from ``orders`` (every
3rd order updates its customer's balance, every 19th order key is a
delete, every 23rd lands on an unknown key to exercise inserts), so
both engines see the identical feed and the oracle can replay the
merge in SQL; all four merge paths are populated at sf0.01.

Scale posture: one window over the change feed keyed by the merge key
(picks the latest change per key — a keyed shuffle, never global), one
full-outer join against the snapshot on the same key. At 100 TB both
stages share the merge-key partitioning, and the snapshot side is the
natural bucketing candidate (see ``bucketed_join_segments``) so the
recurring nightly merge joins shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.batch import load_table

_CDC_ORACLE = """
WITH changes AS (
    SELECT
        o_custkey + CASE WHEN o_orderkey % 23 = 0 THEN 1000000 ELSE 0 END
            AS c_custkey,
        o_orderkey AS seq,
        CASE WHEN o_orderkey % 19 = 0 THEN 'D' ELSE 'U' END AS op,
        o_totalprice AS new_bal
    FROM orders
    WHERE o_orderkey % 3 = 0
),
latest AS (
    SELECT c_custkey, op, new_bal FROM (
        SELECT *, row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY seq DESC) AS rn
        FROM changes
    ) WHERE rn = 1
)
SELECT
    COALESCE(b.c_custkey, l.c_custkey) AS c_custkey,
    CASE WHEN l.op = 'U' THEN l.new_bal ELSE b.c_acctbal END AS c_acctbal,
    b.c_mktsegment,
    CASE
        WHEN l.c_custkey IS NULL THEN 'kept'
        WHEN b.c_custkey IS NULL THEN 'inserted'
        ELSE 'updated'
    END AS change_type
FROM customer b
FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
WHERE COALESCE(l.op, 'U') <> 'D'
ORDER BY c_custkey
"""


@query("cdc_upsert_latest", _CDC_ORACLE)
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a keyed change feed to the customer snapshot, latest
    change per key winning: updates overwrite the balance, deletes
    drop the row, changes for unknown keys insert, untouched rows are
    kept. One merge-key window + one full-outer join — MERGE INTO
    without a table format. ``change_type`` makes the merge audit-able
    (and the oracle hash checks all four paths: kept / updated /
    inserted / delete-dropped)."""
    orders = load_table(spark, sf_dir, "orders")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    # every 23rd order's change lands on an unknown key → insert path;
    # only every 3rd order emits a change so untouched customers
    # exercise the kept path
    changes = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        (
            F.col("o_custkey")
            + F.when(F.col("o_orderkey") % 23 == 0, F.lit(1000000)).otherwise(
                F.lit(0)
            )
        ).alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 19 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice").alias("new_bal"),
    )
    w = Window.partitionBy("c_custkey").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "op", "new_bal")
    )
    b = base.alias("b")
    l = latest.alias("l")
    merged = b.join(
        l, F.col("b.c_custkey") == F.col("l.c_custkey"), "full_outer"
    )
    return (
        merged.filter(F.coalesce(F.col("l.op"), F.lit("U")) != "D")
        .select(
            F.coalesce(F.col("b.c_custkey"), F.col("l.c_custkey")).alias(
                "c_custkey"
            ),
            F.when(F.col("l.op") == "U", F.col("l.new_bal"))
            .otherwise(F.col("b.c_acctbal"))
            .alias("c_acctbal"),
            F.col("b.c_mktsegment").alias("c_mktsegment"),
            F.when(F.col("l.c_custkey").isNull(), F.lit("kept"))
            .when(F.col("b.c_custkey").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("change_type"),
        )
        .orderBy("c_custkey")
    )
