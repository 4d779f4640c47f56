"""Bucket-partitioned foreachBatch state maintenance
(streaming/state.py): per-batch I/O proportional to touched buckets,
at-least-once replay protection, explicit missing-state detection.

The round-4 review flagged the previous pattern (read whole state →
union → overwrite whole directory) as O(total keys) per micro-batch;
these tests pin the fix: an incremental batch must leave untouched
bucket partitions' files byte-for-byte alone (same paths, sizes,
mtimes), and a replayed batch id must be a no-op even for a
non-idempotent additive merge.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.streaming.state import (
    merge_into_partitioned_state,
)


def _additive_merge(existing, part):
    if existing is None:
        return part
    return (
        existing.unionByName(part)
        .groupBy("bucket", "k")
        .agg(F.sum("c").alias("c"))
    )


def _bucket_files(state_dir: str, bucket) -> dict[str, tuple[int, float]]:
    """{relative path: (size, mtime)} for one bucket partition dir."""
    root = os.path.join(state_dir, f"bucket={bucket}")
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, n)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _part(spark, rows):
    return spark.createDataFrame(rows, "bucket int, k string, c bigint")


def test_incremental_batch_leaves_untouched_buckets_alone(spark, tmp_path):
    state_dir = str(tmp_path / "state" / "counts")

    applied = merge_into_partitioned_state(
        state_dir,
        0,
        _part(spark, [(0, "a", 1), (1, "b", 2), (2, "c", 3)]),
        _additive_merge,
        "bucket",
    )
    assert applied
    before_b1 = _bucket_files(state_dir, 1)
    before_b2 = _bucket_files(state_dir, 2)
    assert before_b1 and before_b2

    # batch 1 touches ONLY bucket 0
    applied = merge_into_partitioned_state(
        state_dir, 1, _part(spark, [(0, "a", 10)]), _additive_merge, "bucket"
    )
    assert applied
    # untouched bucket partitions: identical file sets, sizes, mtimes
    assert _bucket_files(state_dir, 1) == before_b1
    assert _bucket_files(state_dir, 2) == before_b2

    got = {
        (r.bucket, r.k): r.c
        for r in spark.read.parquet(state_dir).collect()
    }
    assert got == {(0, "a"): 11, (1, "b"): 2, (2, "c"): 3}


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once; a replayed id must not
    double-apply an additive (non-idempotent) merge."""
    state_dir = str(tmp_path / "state" / "counts")
    part = _part(spark, [(0, "a", 5)])
    assert merge_into_partitioned_state(
        state_dir, 7, part, _additive_merge, "bucket"
    )
    assert not merge_into_partitioned_state(
        state_dir, 7, part, _additive_merge, "bucket"
    )
    [row] = spark.read.parquet(state_dir).collect()
    assert row.c == 5  # not 10


def test_empty_batch_marks_applied_without_state_write(spark, tmp_path):
    state_dir = str(tmp_path / "state" / "counts")
    empty = _part(spark, []).filter(F.lit(False))
    assert merge_into_partitioned_state(
        state_dir, 3, empty, _additive_merge, "bucket"
    )
    assert not os.path.isdir(state_dir) or not os.listdir(state_dir)
    # replay of the empty batch also skips
    assert not merge_into_partitioned_state(
        state_dir, 3, empty, _additive_merge, "bucket"
    )


def test_corrupt_state_fails_loudly_instead_of_resetting(spark, tmp_path):
    """The old bare `except Exception` treated ANY read failure as
    'no state yet', silently discarding accumulated state. A corrupt
    state file must now surface as an error."""
    state_dir = str(tmp_path / "state" / "counts")
    assert merge_into_partitioned_state(
        state_dir, 0, _part(spark, [(0, "a", 1)]), _additive_merge, "bucket"
    )
    # corrupt the committed parquet file in bucket 0
    root = os.path.join(state_dir, "bucket=0")
    victim = next(
        os.path.join(root, n)
        for n in os.listdir(root)
        if n.endswith(".parquet")
    )
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(Exception):
        merge_into_partitioned_state(
            state_dir,
            1,
            _part(spark, [(0, "a", 1)]),
            _additive_merge,
            "bucket",
        )
