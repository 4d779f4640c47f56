"""Native groupBy().pivot() must agree with the single-shuffle
conditional-aggregate pivot the query layer uses."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark import registry
from kafka_spark_streaming_app_spark.sources.batch import load_table

registry.load_all()


def test_native_pivot_matches_conditional_pivot(spark, sf_smoke):
    ours = {
        r["o_orderpriority"]: (r["total_F"], r["total_O"], r["total_P"])
        for r in registry.QUERIES["pivot_status_revenue"](spark, sf_smoke).collect()
    }
    native_df = (
        load_table(spark, sf_smoke, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,4)")).cast("double"))
    )
    native = {
        r["o_orderpriority"]: (r["F"], r["O"], r["P"])
        for r in native_df.collect()
    }
    assert ours == native
