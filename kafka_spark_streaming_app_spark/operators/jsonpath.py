"""JSON wire-format operators.

The reference's ingestion boundary is JSON-in / JSON-out:
``from_json`` parse with a permissive declared schema (null-fill
missing fields, drop extras, NULL struct on malformed — reference
``ecommerce_streaming.py:58``), struct star-flattening (``:59``), and
``to_json(struct('*'))`` serialization for the alert sink (``:122``).

All built-in expressions — at 100 TB the parse cost is vectorized
JVM-side (Jackson inside codegen), never Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    keep: list[str] | None = None,
) -> DataFrame:
    """``from_json`` + star-flatten, the reference's
    ``parse_and_clean_data`` core (ecommerce_streaming.py:57-59).

    Missing fields null-fill, extra fields drop, malformed rows yield a
    NULL struct (whose flattened columns are all NULL) — the declared
    permissive-schema semantics of SURVEY.md §1.2.
    """
    parsed = df.withColumn("_data", F.from_json(F.col(json_col), schema))
    passthrough = keep if keep is not None else []
    return parsed.select("_data.*", *passthrough)


def serialize_json(df: DataFrame, value_alias: str = "value") -> DataFrame:
    """Row → JSON string, the Kafka-sink wire format
    (``to_json(struct("*"))``, ecommerce_streaming.py:122)."""
    return df.select(F.to_json(F.struct("*")).alias(value_alias))
