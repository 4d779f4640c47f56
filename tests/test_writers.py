"""Write-layout tests: partition pruning and bucketed shuffle-free joins."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.sources.batch import load_table
from kafka_spark_streaming_app_spark.sources.writers import (
    write_bucketed_table,
    write_partitioned_parquet,
)

from .test_plans import plan_str


def test_partitioned_write_prunes_on_read(spark, sf_smoke):
    out = tempfile.mkdtemp(prefix="part_out_")
    events = load_table(spark, sf_smoke, "events")
    write_partitioned_parquet(events, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = plan_str(back)
    # partition filter must be a PartitionFilters entry, not a data filter
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    want = events.filter(F.col("event_type") == "purchase").count()
    assert back.count() == want


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
    )
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b").hint("merge"), "o_orderkey"
    )
    plan = plan_str(joined)
    assert "Exchange" not in plan, (
        "bucketed-on-key join still shuffles:\n" + plan
    )
    # and it is still correct
    want = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()
    assert joined.count() == want
