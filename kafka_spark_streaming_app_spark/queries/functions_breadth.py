"""Scalar-function breadth: string / date / array-explode families.

The reference touches only a handful of scalar functions (SURVEY.md
§2.6); a usable engine needs the standard library. Each family is one
oracle-checked query over the shared testdata. Functions chosen are
exactly cross-engine-deterministic (no libm transcendentals whose last
ulp differs; day-of-week avoided — Spark and DuckDB number weekdays
differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.batch import load_table

_STRING_ORACLE = """
SELECT
    p_partkey,
    upper(p_brand) AS brand_upper,
    lower(p_type) AS type_lower,
    substr(p_name, 1, 10) AS name_prefix,
    length(p_name) AS name_len,
    replace(p_type, ' ', '_') AS type_snake,
    lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
    concat_ws('|', p_brand, p_type) AS brand_type,
    levenshtein(p_brand, 'Brand#00') AS brand_dist,
    contains(p_name, 'red') AS has_red,
    starts_with(p_type, 'STANDARD') AS is_standard
FROM part
"""


@query("string_functions", _STRING_ORACLE)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library: case, substring, pad, replace, concat_ws,
    levenshtein, contains/startswith."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#00"))
        .cast("bigint")
        .alias("brand_dist"),
        F.contains(F.col("p_name"), F.lit("red")).alias("has_red"),
        F.startswith(F.col("p_type"), F.lit("STANDARD")).alias("is_standard"),
    )


_DATE_ORACLE = """
SELECT
    o_orderkey,
    CAST(year(o_orderdate) AS BIGINT) AS order_year,
    CAST(month(o_orderdate) AS BIGINT) AS order_month,
    CAST(day(o_orderdate) AS BIGINT) AS order_day,
    CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
    date_trunc('month', o_orderdate) AS month_start,
    o_orderdate + INTERVAL 90 DAY AS due_date,
    CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
        AS days_since_epoch_start
FROM orders
"""


@query("date_functions", _DATE_ORACLE)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library: parts extraction, truncation, interval
    arithmetic, datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


# Power-of-two fixed-point: float32 values in this corpus need at most
# 43 binary fraction digits (measured; min |x| ≈ 1.3e-6), so x·2^48 is
# an EXACT integer-valued double → cast to bigint loses nothing and
# truncate-vs-round cast semantics can't diverge. int64 sums are exact;
# int64→double conversion is IEEE-identical in both engines; dividing
# by 2^48 rescales losslessly. (Decimal-based stabilization ties on
# binary fractions with probability ~2^-13 per row — measured failure.)
_SCALE_2_48 = float(2**48)

_EXPLODE_ORACLE = f"""
WITH dims AS (
    SELECT
        vec_id,
        generate_subscripts(embedding, 1) - 1 AS dim,
        unnest(embedding)::DOUBLE AS x
    FROM embeddings
)
SELECT
    dim,
    count(*) AS n,
    CAST(sum(CAST(x * {_SCALE_2_48:.1f} AS BIGINT)) AS DOUBLE) / {_SCALE_2_48:.1f}
        AS sum_x,
    CAST(sum(CAST(x * {_SCALE_2_48:.1f} AS BIGINT)) AS DOUBLE) / {_SCALE_2_48:.1f}
        / count(*) AS mean_x,
    max(x) AS max_x,
    min(x) AS min_x
FROM dims
GROUP BY dim
"""


@query("array_explode_dim_stats", _EXPLODE_ORACLE)
def array_explode_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over the embedding arrays → per-dimension corpus
    statistics (the feature-distribution audit an embedding pipeline
    runs before training). Float values are summed as exact 2^48
    fixed-point integers (see _SCALE_2_48 note) for order-independent,
    tie-free cross-engine exactness."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("dim", F.col("xf").cast("double").alias("x"))
    scaled = (F.col("x") * F.lit(_SCALE_2_48)).cast("bigint")
    agg = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("sum_scaled"),
        F.max("x").alias("max_x"),
        F.min("x").alias("min_x"),
    )
    sum_x = F.col("sum_scaled").cast("double") / F.lit(_SCALE_2_48)
    return agg.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n",
        sum_x.alias("sum_x"),
        (sum_x / F.col("n")).alias("mean_x"),
        "max_x",
        "min_x",
    )


# --- map functions ----------------------------------------------------------

_MAP_ORACLE = """
WITH entries AS (
    SELECT event_id, 'type' AS key, event_type AS value FROM events
    UNION ALL
    SELECT event_id, 'user', CAST(user_id AS VARCHAR) FROM events
    UNION ALL
    SELECT event_id, 'bucket', CAST(event_id % 16 AS VARCHAR) FROM events
)
SELECT event_id, key, value FROM entries
"""


@query("map_functions", _MAP_ORACLE)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build a map<string,string> per row
    (create_map), explode it to (key, value) entries — the map-column
    family the rest of the suite doesn't touch. DuckDB has no MAP
    over heterogeneous sources, so the oracle states the semantics
    directly as the union of the entries; the order-insensitive driver
    hash makes the two shapes comparable."""
    events = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit("bucket"), (F.col("event_id") % 16).cast("string"),
    )
    return events.select(
        "event_id", F.explode(m).alias("key", "value")
    )


# --- XML round-trip ---------------------------------------------------------

_XML_ORACLE = """
SELECT
    event_id,
    event_type AS x_type,
    CAST(user_id AS BIGINT) AS x_user,
    CAST(event_id % 16 AS BIGINT) AS x_bucket
FROM events
ORDER BY event_id
"""


@query("xml_roundtrip_extract", _XML_ORACLE)
def xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion face (Spark 4 ``to_xml``/``from_xml``): each event
    serializes to an XML fragment, parses back through the XML reader
    path, and the extracted fields must equal the originals — the
    ``json_serialize`` round-trip discipline applied to the second
    wire format (DuckDB has no XML, so the oracle states the expected
    field values directly). Both directions are row-local codegen/
    StaxXmlParser work — zero shuffle."""
    events = load_table(spark, sf_dir, "events")
    xml = events.select(
        "event_id",
        F.to_xml(
            F.struct(
                F.col("event_type").alias("x_type"),
                F.col("user_id").alias("x_user"),
                (F.col("event_id") % 16).alias("x_bucket"),
            ),
            {"rowTag": "ev"},
        ).alias("payload"),
    )
    parsed = xml.select(
        "event_id",
        F.from_xml(
            "payload", "x_type string, x_user bigint, x_bucket bigint"
        ).alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.x_type").alias("x_type"),
        F.col("p.x_user").alias("x_user"),
        F.col("p.x_bucket").alias("x_bucket"),
    ).orderBy("event_id")


# --- collation-aware grouping (Spark 4 collations) --------------------------

_COLLATE_ORACLE = """
WITH mixed AS (
    SELECT CASE WHEN event_id % 2 = 1
                THEN upper(event_type[1]) || event_type[2:]
                ELSE event_type END AS name
    FROM events
)
SELECT lower(name) AS name_ci, count(*) AS n
FROM mixed
GROUP BY lower(name)
ORDER BY name_ci
"""


@query("collated_group_counts", _COLLATE_ORACLE)
def collated_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware aggregation (Spark 4 collations): event types
    are re-cased on odd ids, then grouped under UTF8_LCASE — the
    engine's collation support must merge the case variants exactly
    like the oracle's explicit lower() grouping. The visible key is
    lower()ed because a case-insensitive group's representative is
    engine-chosen. Collation comparisons stay row-local — the group-by
    shuffle is the only exchange."""
    events = load_table(spark, sf_dir, "events")
    mixed = events.select(
        F.when(F.col("event_id") % 2 == 1, F.initcap("event_type"))
        .otherwise(F.col("event_type"))
        .alias("name")
    )
    return (
        mixed.groupBy(F.collate(F.col("name"), "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("k").cast("string")).alias("name_ci"), "n")
        .orderBy("name_ci")
    )
