"""JSON wire-path queries (reference P2/P3/E4/E5, SURVEY.md §2.3/§2.6)
exercised on the ``events.props`` JSON string column."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.jsonpath import parse_json_column, serialize_json
from ..registry import query
from ..schemas import EVENT_PROPS_SCHEMA
from ..sources.batch import load_table

_PARSE_ORACLE = """
SELECT
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
    event_id
FROM events
"""


@query("json_parse_props", _PARSE_ORACLE)
def json_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with declared schema + struct star-flatten
    (ecommerce_streaming.py:57-59): missing fields null-fill, extras
    drop, malformed → NULL."""
    events = load_table(spark, sf_dir, "events")
    return parse_json_column(events, "props", EVENT_PROPS_SCHEMA, keep=["event_id"])


_JSON_AGG_ORACLE = """
WITH parsed AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
    FROM events
)
SELECT
    k % 10 AS k_bucket,
    count(*) AS n,
    CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value
FROM parsed
GROUP BY k_bucket
"""


@query("json_parse_agg", _JSON_AGG_ORACLE)
def json_parse_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a parsed JSON field — the full ingest-then-agg
    path (parse → derive → groupBy)."""
    from ..operators.windowed import stabilized_sum

    events = load_table(spark, sf_dir, "events")
    parsed = parse_json_column(events, "props", EVENT_PROPS_SCHEMA, keep=["value"])
    return (
        parsed.withColumn("k_bucket", F.col("k") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stabilized_sum("value").alias("total_value"),
        )
    )


_SERIALIZE_ORACLE = """
SELECT CAST(to_json(struct_pack(event_id := event_id, event_type := event_type))
            AS VARCHAR) AS value
FROM events
"""


@query("json_serialize", _SERIALIZE_ORACLE)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row → JSON string, the Kafka alert-sink wire format
    (to_json(struct('*')), ecommerce_streaming.py:122)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    return serialize_json(events)


_PARSE_CLEAN_ORACLE = """
WITH stringed AS (
    SELECT
        event_id,
        CASE WHEN event_id % 100 = 0 THEN 'not-a-timestamp'
             ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_str
    FROM events
)
SELECT event_id, try_cast(ts_str AS TIMESTAMP) AS event_timestamp
FROM stringed
WHERE try_cast(ts_str AS TIMESTAMP) IS NOT NULL
"""


@query("parse_clean_timestamps", _PARSE_CLEAN_ORACLE)
def parse_clean_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-string → timestamp conversion with malformed-row drop
    (reference parse_and_clean_data, ecommerce_streaming.py:61-62:
    to_timestamp + isNotNull filter). Corrupts every 100th row to
    exercise the failure path; uses try_to_timestamp because Spark 4
    ANSI mode makes bare to_timestamp throw on malformed input."""
    events = load_table(spark, sf_dir, "events")
    stringed = events.select(
        "event_id",
        F.when(F.col("event_id") % 100 == 0, F.lit("not-a-timestamp"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .alias("ts_str"),
    )
    return stringed.select(
        "event_id",
        F.try_to_timestamp(F.col("ts_str")).alias("event_timestamp"),
    ).filter(F.col("event_timestamp").isNotNull())


# --- VARIANT (Spark 4 semi-structured type) ---------------------------------

_VARIANT_ORACLE = """
SELECT event_id,
       user_id AS uid,
       event_type AS etype,
       value AS v0,
       event_id % 7 AS v1
FROM events
"""


@query("variant_extract", _VARIANT_ORACLE)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT round-trip: a nested JSON payload (object +
    array) synthesized from the event columns is parsed with
    ``parse_json`` into a VariantType and re-extracted with typed
    ``variant_get`` paths. The oracle recomputes the expected values
    directly from the source columns, so a hash match proves the
    variant encode/decode + path navigation end to end (the payload's
    doubles survive because Java's shortest-round-trip double→string
    is parse-exact).

    VARIANT is the schema-on-read path for semi-structured columns at
    scale: one binary column, no schema declaration, per-path typed
    extraction pushed into the scan."""
    events = load_table(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit(',"type":"'),
        F.col("event_type"),
        F.lit('"},"vals":['),
        F.col("value").cast("string"),
        F.lit(","),
        (F.col("event_id") % 7).cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(payload)
    return events.select(
        "event_id",
        F.variant_get(v, "$.user.id", "bigint").alias("uid"),
        F.variant_get(v, "$.user.type", "string").alias("etype"),
        F.variant_get(v, "$.vals[0]", "double").alias("v0"),
        F.variant_get(v, "$.vals[1]", "bigint").alias("v1"),
    )


_MALFORMED_ORACLE = """
WITH c AS (
    SELECT event_id,
           CASE WHEN event_id % 7 = 0
                THEN substr(props, 1, length(props) - 2)
                ELSE props END AS s
    FROM events
)
SELECT event_id,
       NOT json_valid(s) AS is_malformed,
       CASE WHEN json_valid(s)
            THEN CAST(json_extract_string(s, '$.k') AS BIGINT) END AS k
FROM c
"""


@query("json_malformed_audit", _MALFORMED_ORACLE)
def json_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record accounting on the wire path: every 7th event's
    JSON payload is deterministically truncated (planted corruption,
    same on both engines), parsed PERMISSIVE with a
    columnNameOfCorruptRecord sidecar — corrupt rows are FLAGGED and
    keep their raw payload for a quarantine sink instead of silently
    null-filling. The audit row set (id, is_malformed, parsed field)
    hash-matches DuckDB's json_valid view of the same corruption."""
    events = load_table(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    parsed = events.select(
        "event_id",
        F.from_json(
            corrupted,
            "k bigint, _corrupt string",
            {"columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p._corrupt").isNotNull().alias("is_malformed"),
        F.col("p.k").alias("k"),
    )
