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
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table; joins and
    aggregations on ``bucket_col`` between tables bucketed the same
    way skip their shuffle (and their sort, when sorted).

    With ``path`` the table is external at that location (callers that
    must control where bytes land, e.g. a temp fixture); otherwise it
    is managed in the warehouse directory. Drops any existing table AND
    its orphaned warehouse directory first — the in-memory catalog
    forgets tables between sessions while their warehouse files
    persist, and Spark refuses to reuse the location.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    if path is None:
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if warehouse:
            shutil.rmtree(
                f"{warehouse.rstrip('/')}/{table.lower()}", ignore_errors=True
            )
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~``target_file_bytes`` output files.

    The small-file problem is the classic streaming-sink pathology at
    scale (a 10 s trigger writing 32 partitions creates ~276 K
    files/day): NameNode/listing pressure, per-file open cost, and
    row groups too small for effective column statistics. Compaction
    sizes output files by MEASURED input bytes (directory listing, no
    data read) and narrows the write with ``coalesce`` — one wide scan
    fused into a narrowed write, NO shuffle (coalesce merges input
    splits in place; a ``repartition`` here would round-robin every
    byte through an exchange just to change the file count).

    ``target_file_bytes`` is an on-disk compressed-size target: input
    sizes are compressed parquet and the rewrite re-compresses, so
    output files land near the target (modulo encoding differences) —
    set it to the desired FILE size, not the in-memory row size.

    Returns the number of output files requested. Production runs this
    per partition directory (so compaction itself prunes), writes to a
    temp dir and atomically swaps — here the caller owns the swap.
    """
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_sorted_parquet(
    df: DataFrame, path: str, sort_cols: list[str], num_files: int
) -> None:
    """Range-partitioned, within-file-sorted parquet — the clustered
    layout that makes parquet min/max row-group statistics selective:
    a point/range predicate on ``sort_cols`` prunes to one file's
    row groups instead of matching every file's full value range.
    (Linear clustering on the leading column; multi-dimensional
    workloads use space-filling curves — same write shape, different
    sort key.)"""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
