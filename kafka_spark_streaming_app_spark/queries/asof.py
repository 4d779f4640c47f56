"""As-of join query: each event picks up the user's most recent order
at or before the event time. The oracle mirrors the exact
range-join + ranked-dedup semantics (deterministic tie-break on
o_orderkey) rather than DuckDB's native ASOF JOIN, whose tie behavior
on equal timestamps is unspecified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import as_of_join
from ..operators.windowed import stabilized_sum
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


_INTERVAL_ORACLE = """
SELECT
    a.event_type AS first_type,
    b.event_type AS next_type,
    count(*) AS n_pairs,
    CAST(sum(CAST(b.value AS DECIMAL(25,4))) AS DOUBLE) AS next_value_total
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.event_type, b.event_type
"""


@query("interval_join_event_pairs", _INTERVAL_ORACLE)
def interval_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval join: per user, every follow-up event within 10
    minutes of an earlier event (ALL pairs in the band, vs as-of's
    latest-only), rolled up by (first, next) event type — the
    funnel/attribution primitive.

    Scale shape: the equi key (user_id) makes this a plain shuffle
    hash/SMJ join with the time band evaluated as a join-side range
    predicate (never a cross join); both sides shuffle once on the
    key, skew handled by AQE. This is exactly the plan Structured
    Streaming uses for stream-stream interval joins (tested in
    test_streaming_joins.py) — the batch twin is its oracle-checkable
    face.
    """
    events = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_type", "value"
    )
    a = events.alias("a")
    b = events.alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    from ..operators.windowed import stabilized_sum

    return joined.groupBy(
        F.col("a.event_type").alias("first_type"),
        F.col("b.event_type").alias("next_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        stabilized_sum(F.col("b.value")).alias("next_value_total"),
    )


# --- time-spine gap fill (hypertable-style forward fill) --------------------

_GAP_FILL_ORACLE = """
WITH bounds AS (
    SELECT user_id,
           date_trunc('day', min(ts)) AS d0,
           date_trunc('day', max(ts)) AS d1
    FROM events GROUP BY user_id
),
spine AS (
    SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
    FROM bounds
),
j AS (
    SELECT s.user_id, s.day, e.event_id, e.value,
           row_number() OVER (
               PARTITION BY s.user_id, s.day
               ORDER BY e.ts DESC, e.event_id
           ) AS rn
    FROM spine s
    JOIN events e
      ON e.user_id = s.user_id
     AND e.ts <= s.day + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND
)
SELECT user_id, day,
       event_id AS last_event_id,
       value AS filled_value
FROM j WHERE rn = 1
"""


@query("time_spine_gap_fill", _GAP_FILL_ORACLE)
def time_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill: a daily time spine per user (from
    each user's first to last event day, generated in-plan — no
    driver-side date math) forward-filled with the user's most recent
    event at or before each day's end via the as-of join. Days with no
    activity still get a row carrying the last known value — the
    downsample-and-fill shape time-series stores special-case, here as
    a declarative sequence-explode + as-of composition Catalyst
    optimizes like any other plan."""
    events = load_table(spark, sf_dir, "events")
    spine = (
        events.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("d0"),
            F.date_trunc("day", F.max("ts")).alias("d1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
        .withColumn(
            "day_end",
            F.col("day")
            + F.expr("interval 1 day")
            - F.expr("interval 1 microsecond"),
        )
        .withColumn(
            "_sid",
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("|"),
                F.col("day").cast("string"),
            ),
        )
    )
    filled = as_of_join(
        spine,
        events.select("user_id", "ts", "event_id", "value"),
        left_key="user_id",
        right_key="user_id",
        left_ts="day_end",
        right_ts="ts",
        left_id="_sid",
        right_cols=["event_id", "value"],
        how="inner",
    )
    return filled.select(
        "user_id",
        "day",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("filled_value"),
    )


# --- bucketed range join (NO equi key) --------------------------------------
#
# Correlating a fact stream with interval windows that share NO equi
# key (incident windows, deploy windows, promo periods) is the shape
# Catalyst plans as a nested-loop product. The scalable rewrite is
# time BUCKETING: explode each interval into the 30-minute buckets it
# covers, equi-join facts to buckets, then apply the exact range
# residual — O(facts + intervals x buckets) with a real hash join.
# The oracle is the NAIVE range join, so the hash check proves the
# bucketing rewrite exact (boundary buckets, empty windows included).

_BUCKETED_RANGE_ORACLE = """
WITH b AS (SELECT min(ts) AS t0 FROM events),
inc AS (
    SELECT r.i AS incident_id,
           date_trunc('hour', t0) + r.i * INTERVAL 2 HOUR AS start_ts
    FROM b, range(0, 10) r(i)
)
SELECT inc.incident_id,
       inc.start_ts,
       count(e.ts) AS n_events,
       coalesce(CAST(sum(CAST(e.value AS DECIMAL(25,4))) AS DOUBLE), 0.0)
           AS total_value
FROM inc
LEFT JOIN events e
  ON e.ts >= inc.start_ts
 AND e.ts < inc.start_ts + INTERVAL 25 MINUTE
GROUP BY inc.incident_id, inc.start_ts
"""


@query("range_join_bucketed", _BUCKETED_RANGE_ORACLE)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval correlation via time bucketing: ten synthetic
    25-minute incident windows (2 h apart from the corpus start hour)
    joined to events on the 30-minute BUCKET equi key + exact range
    residual — never a nested-loop product; empty windows survive via
    the final left join back to the incident table."""
    events = load_table(spark, sf_dir, "events")

    def bucket(col):
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(col) / 1800).cast("bigint") * 1800
        )

    inc = (
        events.agg(F.min("ts").alias("t0"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("incident_id"),
            F.date_trunc("hour", F.col("t0")).alias("h0"),
        )
        .select(
            "incident_id",
            F.expr("h0 + incident_id * INTERVAL 2 HOUR").alias("start_ts"),
        )
        .select(
            "incident_id",
            "start_ts",
            F.expr("start_ts + INTERVAL 25 MINUTE").alias("end_ts"),
        )
        .localCheckpoint(eager=False)
    )
    covered = inc.select(
        "incident_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                bucket(F.col("start_ts")),
                bucket(F.col("end_ts")),
                F.expr("INTERVAL 30 MINUTE"),
            )
        ).alias("bstart"),
    )
    ev = events.select("ts", "value", bucket(F.col("ts")).alias("bstart"))
    hits = (
        ev.join(F.broadcast(covered), "bstart")
        .filter(
            (F.col("ts") >= F.col("start_ts"))
            & (F.col("ts") < F.col("end_ts"))
        )
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stabilized_sum("value").alias("_tv"),
        )
    )
    return (
        inc.join(hits, "incident_id", "left")
        .select(
            "incident_id",
            "start_ts",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("_tv"), F.lit(0.0)).alias("total_value"),
        )
    )
