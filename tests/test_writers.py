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


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_smoke):
    import glob
    import tempfile

    from kafka_spark_streaming_app_spark.sources.writers import (
        compact_parquet,
    )

    src = tempfile.mkdtemp(prefix="compact_src_")
    out = tempfile.mkdtemp(prefix="compact_out_")
    events = spark.read.parquet(f"{sf_smoke}/events.parquet")
    # simulate a streaming sink's small-file pathology: 40 tiny files
    events.repartition(40).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 40

    n = compact_parquet(spark, src, out, target_file_bytes=64 * 1024 * 1024)
    got_files = glob.glob(f"{out}/*.parquet")
    assert len(got_files) == n and n < 40
    want = sorted(r["event_id"] for r in events.collect())
    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == want


def test_sorted_write_produces_nonoverlapping_file_ranges(spark, sf_smoke):
    """Clustered layout contract: after range-partitioned sorted write,
    per-FILE [min, max] spans of the sort key must not overlap — this
    is exactly what makes parquet min/max statistics prune to one file
    for a point predicate."""
    import glob
    import tempfile

    import pyarrow.parquet as pq

    from kafka_spark_streaming_app_spark.sources.writers import (
        write_sorted_parquet,
    )

    out = tempfile.mkdtemp(prefix="sorted_out_")
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_sorted_parquet(orders, out, ["o_orderkey"], num_files=6)

    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index("o_orderkey")
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) == 6
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {spans}"
