"""Batch source formats: csv/json round-trips with explicit schemas,
lakehouse stub degradation."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.sources.batch import load_file, load_table


def test_csv_and_json_round_trip(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    schema = "event_id long, user_id long, event_type string, value double"
    want = sorted(map(tuple, events.collect()))

    csv_dir = tempfile.mkdtemp(prefix="src_csv_")
    events.write.mode("overwrite").option("header", "true").csv(csv_dir)
    got_csv = sorted(
        map(tuple, load_file(spark, csv_dir, "csv", schema, header="true").collect())
    )
    assert got_csv == want

    json_dir = tempfile.mkdtemp(prefix="src_json_")
    events.write.mode("overwrite").json(json_dir)
    got_json = sorted(
        map(tuple, load_file(spark, json_dir, "json", schema).collect())
    )
    assert got_json == want


def test_csv_without_schema_is_rejected(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        load_file(spark, "/tmp/nowhere", "csv")


def test_lakehouse_stub_raises_actionable_error(spark):
    from kafka_spark_streaming_app_spark.sources.lakehouse import read_lakehouse

    for fmt in ("delta", "iceberg"):
        try:
            df = read_lakehouse(spark, "/tmp/nowhere", fmt)
        except RuntimeError as exc:
            assert "--packages" in str(exc)
        else:  # connector present in some future env
            assert df is not None
    with pytest.raises(ValueError, match="unknown lakehouse"):
        read_lakehouse(spark, "/tmp/x", "hudi-ish")
