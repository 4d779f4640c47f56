"""Custom stateful operator (applyInPandasWithState) and salted-join
skew mitigation."""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.skew import salted_join
from kafka_spark_streaming_app_spark.schemas import ORDER_SCHEMA
from kafka_spark_streaming_app_spark.sources.batch import load_table
from kafka_spark_streaming_app_spark.streaming.pipeline import (
    parse_and_clean,
    write_memory_stream,
)
from kafka_spark_streaming_app_spark.streaming.stateful import running_totals


def _write_orders(dir_: str, name: str, orders: list[tuple[str, float]]) -> None:
    path = os.path.join(dir_, name)
    with open(path + ".tmp", "w") as f:
        for user, amount in orders:
            f.write(
                json.dumps(
                    {
                        "order_id": f"{user}-{amount}",
                        "user_id": user,
                        "total_amount": amount,
                        "timestamp": "2024-01-01 10:00:00",
                    }
                )
                + "\n"
            )
    os.rename(path + ".tmp", path)


def test_running_totals_carries_state_across_batches(spark):
    src = tempfile.mkdtemp(prefix="state_src_")
    _write_orders(src, "b1.json", [("alice", 10.0), ("alice", 20.0), ("bob", 5.0)])
    raw = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
    orders = parse_and_clean(raw, ORDER_SCHEMA, watermark=None)
    totals = running_totals(orders)
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = write_memory_stream(totals, name, output_mode="update")
    try:
        q.processAllAvailable()
        _write_orders(src, "b2.json", [("alice", 100.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    # memory sink in update mode appends snapshots; the LAST alice row
    # must reflect state accumulated across both micro-batches
    rows = spark.table(name).collect()
    alice = [r for r in rows if r["user_id"] == "alice"]
    assert alice[-1]["n_orders"] == 3
    assert alice[-1]["total_spend"] == 130.0
    assert alice[-1]["max_order"] == 100.0
    bob = [r for r in rows if r["user_id"] == "bob"]
    assert bob[-1]["n_orders"] == 1 and bob[-1]["total_spend"] == 5.0


def test_salted_join_equals_plain_join(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    customer = load_table(spark, sf_smoke, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
            .cast("double")
            .alias("total"),
        )
    )
    salted = (
        salted_join(orders, customer, "o_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
            .cast("double")
            .alias("total"),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_category_spend_tracker_transform_with_state(spark):
    """Second-generation stateful API (transformWithStateInPandas):
    ValueState totals + MapState per-category counts must accumulate
    across micro-batches (distinct categories counted once).

    The TWS runtime speaks protobuf to its state server; skip (with
    the remediation) when google.protobuf is absent — same gating
    contract as the Kafka/lakehouse connectors."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs protobuf (pip install protobuf)",
    )
    from kafka_spark_streaming_app_spark.streaming.stateful import (
        category_spend_tracker,
    )

    src = tempfile.mkdtemp(prefix="tws_src_")

    def _write(name, rows):
        path = os.path.join(src, name)
        with open(path + ".tmp", "w") as f:
            for user, cat, amount in rows:
                f.write(
                    json.dumps(
                        {
                            "order_id": f"{user}-{cat}-{amount}",
                            "user_id": user,
                            "category": cat,
                            "total_amount": amount,
                            "timestamp": "2024-01-01 10:00:00",
                        }
                    )
                    + "\n"
                )
        os.rename(path + ".tmp", path)

    _write(
        "b1.json",
        [
            ("alice", "Electronics", 10.0),
            ("alice", "Clothing", 20.0),
            ("bob", "Home", 5.0),
        ],
    )
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        raw = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
        orders = parse_and_clean(raw, ORDER_SCHEMA, watermark=None)
        tracked = category_spend_tracker(orders)
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = write_memory_stream(tracked, name, output_mode="update")
        try:
            q.processAllAvailable()
            # Electronics repeats (not a new category), Home is new for alice
            _write(
                "b2.json",
                [("alice", "Electronics", 100.0), ("alice", "Home", 1.0)],
            )
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table(name).collect()
    finally:
        if old:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    alice = [r for r in rows if r["user_id"] == "alice"]
    assert alice[-1]["n_orders"] == 4
    assert alice[-1]["n_categories"] == 3
    assert alice[-1]["total_spend"] == 131.0
    bob = [r for r in rows if r["user_id"] == "bob"]
    assert bob[-1]["n_orders"] == 1 and bob[-1]["n_categories"] == 1
