"""Batch write paths: partitioned parquet and bucketed tables.

At 100 TB the write layout IS the read plan:

- **Partition by** low-cardinality pruning columns (date, category) so
  downstream scans prune directories before reading a byte. Dynamic
  partition overwrite makes re-runs idempotent per partition.
- **Bucket by** high-cardinality join/agg keys so repeated joins on
  that key are co-located and plan with ZERO exchange on the bucketed
  sides (asserted in tests/test_writers.py). Bucket count is a
  capacity decision: target ~100-200 MB per bucket file at production
  scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table; joins
    and aggregations on ``bucket_col`` between tables bucketed the same
    way skip their shuffle (and their sort, when sorted).

    Drops any existing table AND its orphaned warehouse directory first
    — the in-memory catalog forgets tables between sessions while their
    warehouse files persist, and Spark refuses to reuse the location.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
