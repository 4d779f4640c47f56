"""Explicit schemas.

The reference declares its one wire schema explicitly and never infers
(reference ``ecommerce_streaming.py:21-36``); we keep that rule for every
stream: explicit StructType, all-nullable, money as ``double`` (NOT
decimal — oracle parity requires preserving the reference's semantics,
see SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's 12-column order schema, field-for-field
# (reference ecommerce_streaming.py:23-36).
ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("product_id", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),  # ISO-8601 string on the wire
        T.StructField("event_type", T.StringType(), True),
        T.StructField("is_fraud_simulation", T.BooleanType(), True),
    ]
)

# Driver testdata `events` table (TESTDATA.md / FIXTURES.md §4) — the
# batch stand-in for the order stream: ts→event_timestamp,
# value→total_amount, event_type→category-like key.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# props is a JSON string column; its declared parse schema.
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# All tables the driver materializes per scale factor.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
