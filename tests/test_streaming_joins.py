"""Streaming operator breadth beyond the reference: stream-stream
interval join, streaming dropDuplicates, streaming session windows.
All rows-only / assertion-checked (no batch SQL oracle exists for
watermark-gated semantics)."""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.streaming.pipeline import write_memory_stream


def _write_lines(dir_: str, name: str, rows: list[dict]) -> None:
    path = os.path.join(dir_, name)
    with open(path + ".tmp", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    os.rename(path + ".tmp", path)


def _json_stream(spark, src: str, schema: str):
    return spark.readStream.schema(schema).json(src)


def test_stream_stream_interval_join(spark):
    """Orders ⋈ payments within a 10-minute event-time interval —
    the canonical stream-stream join (state bounded by watermarks +
    the interval condition)."""
    orders_dir = tempfile.mkdtemp(prefix="ss_orders_")
    pays_dir = tempfile.mkdtemp(prefix="ss_pays_")
    _write_lines(
        orders_dir,
        "o.json",
        [
            {"order_id": "o1", "ots": "2024-01-01 10:00:00"},
            {"order_id": "o2", "ots": "2024-01-01 10:05:00"},
        ],
    )
    _write_lines(
        pays_dir,
        "p.json",
        [
            {"order_id": "o1", "pts": "2024-01-01 10:03:00"},   # within 10 min
            {"order_id": "o2", "pts": "2024-01-01 11:00:00"},   # too late
        ],
    )
    orders = (
        _json_stream(spark, orders_dir, "order_id string, ots string")
        .withColumn("ots", F.to_timestamp("ots"))
        .withWatermark("ots", "1 minute")
    )
    pays = (
        _json_stream(spark, pays_dir, "order_id string, pts string")
        .withColumn("pts", F.to_timestamp("pts"))
        .withWatermark("pts", "1 minute")
    )
    joined = orders.join(
        pays,
        (orders.order_id == pays.order_id)
        & (pays.pts >= orders.ots)
        & (pays.pts <= orders.ots + F.expr("INTERVAL 10 MINUTES")),
    ).select(orders.order_id, "ots", "pts")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = write_memory_stream(joined, name)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r["order_id"] for r in spark.table(name).collect()]
    assert got == ["o1"], f"interval join matched wrong orders: {got}"


def test_streaming_drop_duplicates_with_watermark(spark):
    """Streaming exact dedup: duplicate order_ids across micro-batches
    are suppressed while state is bounded by the watermark."""
    src = tempfile.mkdtemp(prefix="sdedup_")
    _write_lines(
        src,
        "b1.json",
        [
            {"order_id": "a", "ts": "2024-01-01 10:00:00"},
            {"order_id": "a", "ts": "2024-01-01 10:00:01"},
            {"order_id": "b", "ts": "2024-01-01 10:00:02"},
        ],
    )
    stream = (
        spark.readStream.schema("order_id string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["order_id"])
    )
    name = f"sd_{uuid.uuid4().hex[:8]}"
    q = write_memory_stream(stream, name)
    try:
        q.processAllAvailable()
        # duplicate re-sent in a later micro-batch — still suppressed
        _write_lines(src, "b2.json", [{"order_id": "a", "ts": "2024-01-01 10:01:00"},
                                      {"order_id": "c", "ts": "2024-01-01 10:01:01"}])
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["order_id"] for r in spark.table(name).collect())
    assert got == ["a", "b", "c"], f"streaming dedup failed: {got}"


def test_streaming_session_window(spark):
    """session_window in a streaming aggregation: sessions finalize in
    append mode once the watermark passes session end + gap."""
    src = tempfile.mkdtemp(prefix="ssess_")
    _write_lines(
        src,
        "b1.json",
        [
            {"user": "u1", "ts": "2024-01-01 10:00:00"},
            {"user": "u1", "ts": "2024-01-01 10:02:00"},   # same session (gap 2m < 5m)
            {"user": "u1", "ts": "2024-01-01 10:30:00"},   # new session
        ],
    )
    stream = (
        spark.readStream.schema("user string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 minute")
    )
    sessions = stream.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "user"
    ).agg(F.count(F.lit(1)).alias("n"))
    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = write_memory_stream(sessions, name, output_mode="append")
    try:
        q.processAllAvailable()
        # advance watermark far enough to close both sessions
        _write_lines(src, "b2.json", [{"user": "u2", "ts": "2024-01-01 12:00:00"}])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["user"], r["n"]) for r in spark.table(name).select("user", "n").collect()
    }
    assert ("u1", 2) in rows and ("u1", 1) in rows, f"sessions wrong: {rows}"


def test_drop_duplicates_within_watermark(spark):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    window are suppressed even when their event times differ (the
    practical streaming-dedup API — state expires with the watermark)."""
    src = tempfile.mkdtemp(prefix="ddww_")
    _write_lines(
        src,
        "b1.json",
        [
            {"order_id": "a", "ts": "2024-01-01 10:00:00"},
            {"order_id": "a", "ts": "2024-01-01 10:00:30"},  # dup, different ts
            {"order_id": "b", "ts": "2024-01-01 10:00:10"},
        ],
    )
    stream = (
        spark.readStream.schema("order_id string, ts string")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "5 minutes")
        .dropDuplicatesWithinWatermark(["order_id"])
    )
    name = f"ddww_{uuid.uuid4().hex[:8]}"
    q = write_memory_stream(stream, name)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["order_id"] for r in spark.table(name).collect())
    assert got == ["a", "b"], f"within-watermark dedup failed: {got}"


def test_full_outer_join_emits_complete_population(spark, sf_smoke):
    """With the flush sentinel lifting the final watermark, the full
    outer join must emit EVERY match, every unmatched view, and every
    unmatched purchase — and no sentinel rows."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    rows = registry.QUERIES["streaming_view_purchase_full_join"](
        spark, sf_smoke
    ).collect()
    assert all(r["user_id"] != -1 for r in rows)
    views = {r["view_event_id"] for r in rows if r["view_event_id"] is not None}
    purchases = {
        r["purchase_event_id"]
        for r in rows
        if r["purchase_event_id"] is not None
    }
    from kafka_spark_streaming_app_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_smoke, "events")
    n_views = ev.filter(F.col("event_type") == "view").count()
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    # complete population: every view id and every purchase id appears
    assert len(views) == n_views
    assert len(purchases) == n_purch
    # both NULL-padded populations are non-trivial
    assert any(r["purchase_event_id"] is None for r in rows)
    assert any(r["view_event_id"] is None for r in rows)
