"""As-of join query: each event picks up the user's most recent order
at or before the event time. The oracle mirrors the exact
range-join + ranked-dedup semantics (deterministic tie-break on
o_orderkey) rather than DuckDB's native ASOF JOIN, whose tie behavior
on equal timestamps is unspecified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import as_of_join
from ..registry import query
from ..sources.batch import load_table

_ASOF_ORACLE = """
WITH j AS (
    SELECT
        e.event_id, e.ts, e.user_id, e.value,
        o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM events e
    LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
),
r AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY event_id
               ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC NULLS LAST
           ) AS rn
    FROM j
)
SELECT
    event_id, ts, user_id, value,
    o_orderkey, o_totalprice,
    o_orderdate AS asof_o_orderdate
FROM r WHERE rn = 1
"""


@query("asof_join_latest_order", _ASOF_ORACLE)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (events → latest prior order per user): range join +
    per-event ranked dedup, the declarative composition for an operator
    Spark lacks natively."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    orders = load_table(spark, sf_dir, "orders")
    return as_of_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_id="event_id",
        right_cols=["o_orderkey", "o_totalprice"],
    )
