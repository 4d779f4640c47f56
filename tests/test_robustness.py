"""Edge-condition robustness: empty inputs, missing tables, repeated
query invocation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.dedup import (
    jaccard_pairs,
    minhash_signatures,
    shingle_sets,
)
from kafka_spark_streaming_app_spark.operators.windowed import windowed_aggregation
from kafka_spark_streaming_app_spark.sources.batch import load_table


def test_windowed_agg_on_empty_input(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events").filter(F.lit(False))
    out = windowed_aggregation(events)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields][:3] == [
        "window_start",
        "window_end",
        "event_type",
    ]


def test_minhash_on_empty_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, "one two three four")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, shingle_n=3)
    # docs 1 and 2 have < 3 tokens → no shingles → no signature rows
    assert [r["doc_id"] for r in sigs.select("doc_id").collect()] == [3]
    pairs = jaccard_pairs(shingle_sets(docs, n=3))
    assert pairs.count() == 0


def test_missing_table_raises_analysis_error(spark, sf_smoke):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        load_table(spark, sf_smoke, "not_a_table").count()


def test_queries_are_rerunnable(spark, sf_smoke):
    """Registry callables must be pure — same result on repeat calls
    (the driver may invoke more than once)."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    fn = registry.QUERIES["windowed_agg_sliding"]
    a = fn(spark, sf_smoke).count()
    b = fn(spark, sf_smoke).count()
    assert a == b > 0


def test_cdc_upsert_exercises_all_merge_paths(spark, sf_correctness):
    """kept / updated / inserted must all be present and deletes must
    shrink the snapshot — otherwise the merge test is vacuous."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    rows = registry.QUERIES["cdc_upsert_latest"](spark, sf_correctness).collect()
    kinds = {r["change_type"] for r in rows}
    assert kinds == {"kept", "updated", "inserted"}, kinds
    n_customers = (
        spark.read.parquet(f"{sf_correctness}/customer.parquet").count()
    )
    n_out_existing = sum(1 for r in rows if r["change_type"] != "inserted")
    assert n_out_existing < n_customers  # deletes actually dropped rows


def test_observation_metrics_ride_the_job(spark, sf_smoke):
    """df.observe(): pipeline health counters collected as a side
    effect of the job that already runs — no second scan, the way a
    100 TB pipeline audits itself. Metrics must match a directly
    computed aggregate."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.sources.batch import load_table

    events = load_table(spark, sf_smoke, "events")
    obs = Observation("health")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.sum(F.col("value").cast("decimal(25,4)")).alias("total_value"),
    )
    # the "real" job: any action over the observed frame
    n_purchases = observed.filter(F.col("event_type") == "purchase").count()
    got = obs.get
    want = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.sum(F.col("value").cast("decimal(25,4)")).alias("total_value"),
    ).collect()[0]
    assert got["n_rows"] == want["n_rows"] > 0
    assert got["n_negative"] == want["n_negative"] == 0
    assert got["total_value"] == want["total_value"]
    assert n_purchases > 0
