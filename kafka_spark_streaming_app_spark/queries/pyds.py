"""Driver-facing query over the custom Python DataSource
(sources/pyds.py): read the ``wire_replay`` connector in batch, run
the REAL ingestion path (parse_and_clean), and hash-check the typed
result against a DuckDB oracle that regenerates the identical payload
stream from ``range(n)`` — proving the connector's partitioned
generation, the JSON round-trip, and the parse path in one check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60_sql
from ..registry import query
from ..schemas import ORDER_SCHEMA
from ..streaming.pipeline import parse_and_clean

_ROWS = 2000


def _h(tag: str) -> str:
    return h60_sql(f"('{tag}|' || CAST(i AS VARCHAR))")


# the reference's 5-product catalog, as CASE arms over h60('prod|i')%5
_CATALOG_CASE = {
    "product_id": ("'P001'", "'P002'", "'P003'", "'P004'", "'P005'"),
    "product_name": (
        "'MacBook Pro'",
        "'Nike Shoes'",
        "'Coffee Maker'",
        "'Headphones'",
        "'Backpack'",
    ),
    "category": (
        "'Electronics'",
        "'Clothing'",
        "'Home'",
        "'Electronics'",
        "'Accessories'",
    ),
    "price": (
        "CAST(999.99 AS DOUBLE)",
        "CAST(199.99 AS DOUBLE)",
        "CAST(299.99 AS DOUBLE)",
        "CAST(399.99 AS DOUBLE)",
        "CAST(249.99 AS DOUBLE)",
    ),
}


def _case(field: str) -> str:
    arms = " ".join(
        f"WHEN {k} THEN {v}"
        for k, v in enumerate(_CATALOG_CASE[field])
    )
    return f"CASE {_h('prod')} % 5 {arms} END"


_LOC_CASE = (
    f"CASE {_h('loc')} % 5 WHEN 0 THEN 'US' WHEN 1 THEN 'UK' "
    "WHEN 2 THEN 'DE' WHEN 3 THEN 'JP' ELSE 'XX' END"
)

_PYDS_ORACLE = f"""
SELECT
    'order_' || CAST(i AS VARCHAR) AS order_id,
    'user_' || CAST({_h("u")} % 100 AS VARCHAR) AS user_id,
    {_case("product_id")} AS product_id,
    {_case("product_name")} AS product_name,
    {_case("category")} AS category,
    {_case("price")} AS price,
    CAST({_h("q")} % 5 + 1 AS INTEGER) AS quantity,
    {_case("price")} * CAST({_h("q")} % 5 + 1 AS INTEGER) AS total_amount,
    {_LOC_CASE} AS location,
    TIMESTAMP '2024-01-01 10:00:00' + to_milliseconds(i * 500)
        AS event_timestamp,
    CAST({_h("f")} % 10 = 0 AS BOOLEAN) AS is_fraud_simulation
FROM range(0, {_ROWS}) t(i)
"""


@query("pyds_wire_orders", _PYDS_ORACLE)
def pyds_wire_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of the wire_replay Python DataSource through
    parse_and_clean. The oracle rebuilds every payload field from
    range(n) via the same h60 derivations, so a hash match proves the
    connector end to end (partitioned generation included — 8 input
    partitions feed this read)."""
    from ..sources.pyds import register_wire_replay

    register_wire_replay(spark)
    raw = (
        spark.read.format("wire_replay")
        .option("rows", _ROWS)
        .option("numPartitions", 8)
        .load()
    )
    parsed = parse_and_clean(raw, ORDER_SCHEMA, watermark=None)
    return parsed.select(
        "order_id",
        "user_id",
        "product_id",
        "product_name",
        "category",
        "price",
        "quantity",
        "total_amount",
        "location",
        "event_timestamp",
        "is_fraud_simulation",
    )
