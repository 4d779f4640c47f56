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


def test_non_local_state_root_fails_fast(spark, tmp_path):
    """Driver-local os calls silently see 'nothing there' for remote
    URIs — hdfs://... must raise, not quietly replace accumulated
    state with one batch's contribution (round-5 advice)."""
    part = _part(spark, [(0, "a", 1)])
    with pytest.raises(ValueError, match="URI scheme"):
        merge_into_partitioned_state(
            "hdfs://nn:8020/state/counts", 0, part, _additive_merge, "bucket"
        )
    with pytest.raises(ValueError, match="URI scheme"):
        merge_into_partitioned_state(
            "s3a://bucket/state", 0, part, _additive_merge, "bucket"
        )
    # explicit applied_dir is validated too
    with pytest.raises(ValueError, match="URI scheme"):
        merge_into_partitioned_state(
            str(tmp_path / "state"),
            0,
            part,
            _additive_merge,
            "bucket",
            applied_dir="s3a://bucket/_applied",
        )


def test_partial_commit_retry_does_not_double_apply(spark, tmp_path):
    """A dynamic partition overwrite is not atomic across partition
    dirs: a crash mid-write can commit SOME touched buckets. The retry
    must detect the per-partition _applied_batch stamp and skip the
    already-committed buckets (round-5 advice: the at-least-once
    window is wider than commit→marker for additive merges)."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        APPLIED_BATCH_COL,
        applied_marker_dir,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "counts")
    assert merge_into_partitioned_state(
        state_dir,
        0,
        _part(spark, [(0, "a", 1), (1, "b", 2)]),
        _additive_merge,
        "bucket",
    )

    # Simulate a crashed batch 1 (+10 to bucket 0, +20 to bucket 1)
    # whose overwrite committed ONLY bucket 0: declare intent, then
    # replace bucket 0's partition with the merged, stamped rows the
    # crashed attempt would have written.
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    os.makedirs(marker_root, exist_ok=True)
    open(os.path.join(marker_root, "batch-1.intent"), "w").close()
    (
        _part(spark, [(0, "a", 11)])
        .withColumn(APPLIED_BATCH_COL, F.lit(1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(state_dir)
    )

    # The foreachBatch retry of batch 1 delivers the full contribution.
    assert merge_into_partitioned_state(
        state_dir,
        1,
        _part(spark, [(0, "a", 10), (1, "b", 20)]),
        _additive_merge,
        "bucket",
    )
    got = {
        (r.bucket, r.k): r.c
        for r in read_state(spark, state_dir).collect()
    }
    # bucket 0 NOT double-applied (11, not 21); bucket 1 caught up
    assert got == {(0, "a"): 11, (1, "b"): 22}
    assert os.path.exists(os.path.join(marker_root, "batch-1"))
    assert not os.path.exists(os.path.join(marker_root, "batch-1.intent"))


def test_retired_bucket_is_restored_on_retry(spark, tmp_path):
    """The promotion commit retires a bucket (hidden rename) before
    moving its staged replacement in. A crash between the two renames
    leaves the bucket's live dir MISSING and its pre-batch state only
    in the retired copy — the retry must restore it (else an additive
    merge would rebuild the bucket from the batch contribution alone,
    losing accumulated state)."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        applied_marker_dir,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "counts")
    assert merge_into_partitioned_state(
        state_dir,
        0,
        _part(spark, [(0, "a", 1), (1, "b", 2)]),
        _additive_merge,
        "bucket",
    )

    # Simulate a crashed batch 1 that declared intent, retired bucket
    # 0, and died before moving the staged replacement in.
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    os.makedirs(marker_root, exist_ok=True)
    open(os.path.join(marker_root, "batch-1.intent"), "w").close()
    os.rename(
        os.path.join(state_dir, "bucket=0"),
        os.path.join(state_dir, ".retired-batch-1-bucket=0"),
    )

    assert merge_into_partitioned_state(
        state_dir,
        1,
        _part(spark, [(0, "a", 10), (1, "b", 20)]),
        _additive_merge,
        "bucket",
    )
    got = {
        (r.bucket, r.k): r.c
        for r in read_state(spark, state_dir).collect()
    }
    # bucket 0's pre-batch count (1) survived the crash window
    assert got == {(0, "a"): 11, (1, "b"): 22}
    assert not any(
        e.startswith(".retired-") for e in os.listdir(state_dir)
    )
    assert os.path.exists(os.path.join(marker_root, "batch-1"))


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


def _compact_merge(existing, part):
    if existing is None:
        return part
    from pyspark.sql import functions as F  # noqa: F811

    return (
        existing.unionByName(part)
        .groupBy("k")
        .agg(F.sum("c").alias("c"))
    )


def _cpart(spark, rows):
    return spark.createDataFrame(rows, "k string, c bigint")


def test_compact_state_merges_and_skips_replays(spark, tmp_path):
    from kafka_spark_streaming_app_spark.streaming.state import (
        merge_into_compact_state,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "sketch")
    assert merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1), ("b", 2)]), _compact_merge
    )
    assert merge_into_compact_state(
        state_dir, 1, _cpart(spark, [("a", 10)]), _compact_merge
    )
    # replay of batch 1 must be a no-op for the non-idempotent merge
    assert not merge_into_compact_state(
        state_dir, 1, _cpart(spark, [("a", 10)]), _compact_merge
    )
    got = {r.k: r.c for r in read_state(spark, state_dir).collect()}
    assert got == {"a": 11, "b": 2}


def test_compact_state_restores_retired_dir_on_retry(spark, tmp_path):
    """Crash between retire and move-in: the live state dir is missing
    and the pre-batch state survives only in the hidden retired copy —
    the retry must restore it before merging."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        applied_marker_dir,
        merge_into_compact_state,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "sketch")
    assert merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1), ("b", 2)]), _compact_merge
    )
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    open(os.path.join(marker_root, "batch-1.intent"), "w").close()
    os.rename(
        state_dir, str(tmp_path / "state" / ".sketch.retired-batch-1")
    )

    assert merge_into_compact_state(
        state_dir, 1, _cpart(spark, [("a", 10)]), _compact_merge
    )
    got = {r.k: r.c for r in read_state(spark, state_dir).collect()}
    assert got == {"a": 11, "b": 2}
    assert not os.path.exists(os.path.join(marker_root, "batch-1.intent"))


def test_compact_state_detects_completed_swap_on_retry(spark, tmp_path):
    """Crash after the swap but before the done-marker: the live state
    carries this batch's _applied_batch stamp (the swap is
    all-or-nothing), so the retry must NOT re-apply the additive
    merge."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        APPLIED_BATCH_COL,
        applied_marker_dir,
        merge_into_compact_state,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "sketch")
    assert merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1), ("b", 2)]), _compact_merge
    )
    # Simulate: batch 1's swap landed (state fully rewritten + stamped)
    # but the crash hit before marker promotion.
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    open(os.path.join(marker_root, "batch-1.intent"), "w").close()
    import shutil as _sh

    staged = str(tmp_path / "staged")
    (
        _cpart(spark, [("a", 11), ("b", 2)])
        .withColumn(APPLIED_BATCH_COL, F.lit(1))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(staged)
    )
    _sh.rmtree(state_dir)
    os.rename(staged, state_dir)

    assert merge_into_compact_state(
        state_dir, 1, _cpart(spark, [("a", 10)]), _compact_merge
    )
    got = {r.k: r.c for r in read_state(spark, state_dir).collect()}
    assert got == {"a": 11, "b": 2}
    assert os.path.exists(os.path.join(marker_root, "batch-1"))
    assert not os.path.exists(os.path.join(marker_root, "batch-1.intent"))


def test_kmv_bottom_k_merge_is_order_independent_and_idempotent(
    spark, tmp_path
):
    """The streaming KMV sketch's merge algebra: bottom-k of merged
    bottom-k's equals bottom-k of the full set, for ANY batch split,
    and re-merging an already-merged batch changes nothing."""
    import random

    from kafka_spark_streaming_app_spark.streaming.state import (
        merge_into_compact_state,
        read_state,
    )

    rng = random.Random(7)
    rows = [("s1", rng.randrange(1, 10**9)) for _ in range(300)] + [
        ("s2", rng.randrange(1, 10**9)) for _ in range(40)
    ]
    K = 64

    def bottom_k(df):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("source").orderBy("h")
        return (
            df.select("source", "h")
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= K)
            .select("source", "h")
        )

    def merge(existing, part):
        if existing is None:
            return bottom_k(part)
        return bottom_k(existing.unionByName(part))

    def run(split_at, root):
        state = str(tmp_path / root / "sk")
        for bid, chunk in enumerate(
            (rows[:split_at], rows[split_at:])
        ):
            part = spark.createDataFrame(chunk, ["source", "h"])
            merge_into_compact_state(state, bid, bottom_k(part), merge)
        return {
            (r.source, r.h)
            for r in read_state(spark, state).collect()
        }

    a = run(50, "a")
    b = run(250, "b")
    expected = set()
    for src in ("s1", "s2"):
        hs = sorted({h for s, h in rows if s == src})[:K]
        expected |= {(src, h) for h in hs}
    assert a == expected
    assert b == expected
    # idempotence: re-merging the full set into final state is a no-op
    state = str(tmp_path / "a" / "sk")
    part = spark.createDataFrame(rows, ["source", "h"])
    merge_into_compact_state(state, 99, bottom_k(part), merge)
    again = {
        (r.source, r.h) for r in read_state(spark, state).collect()
    }
    assert again == expected


def test_dedup_ledger_merge_is_batch_order_independent(spark, tmp_path):
    """The streaming dedup ledger's mixed merge (MIN canonical id +
    additive count): any batch split and any arrival ORDER must yield
    the same final ledger — a doc's smallest id may arrive in a later
    batch (the wire replay is not time-ordered)."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.streaming.state import (
        merge_into_partitioned_state,
        read_state,
    )

    rows = [  # (bucket, content_hash, doc_id)
        (0, "h1", 7), (0, "h1", 3), (1, "h2", 5),
        (0, "h1", 9), (1, "h2", 1), (1, "h3", 4),
    ]

    def _merge(existing, part):
        if existing is None:
            return part
        return (
            existing.unionByName(part)
            .groupBy("bucket", "content_hash")
            .agg(
                F.min("canonical_id").alias("canonical_id"),
                F.sum("n_dups").alias("n_dups"),
            )
        )

    def run(batches, root):
        state = str(tmp_path / root / "ledger")
        for bid, chunk in enumerate(batches):
            part = (
                spark.createDataFrame(
                    chunk, "bucket int, content_hash string, doc_id long"
                )
                .groupBy("bucket", "content_hash")
                .agg(
                    F.min("doc_id").alias("canonical_id"),
                    F.count(F.lit(1)).alias("n_dups"),
                )
            )
            merge_into_partitioned_state(
                state, bid, part, _merge, "bucket"
            )
        return {
            (r.content_hash): (r.canonical_id, r.n_dups)
            for r in read_state(spark, state).collect()
        }

    a = run([rows[:2], rows[2:]], "a")
    b = run([rows[4:], rows[:4]], "b")          # reversed arrival
    c = run([rows], "c")                        # single batch
    expected = {"h1": (3, 3), "h2": (1, 2), "h3": (4, 1)}
    assert a == expected and b == expected and c == expected


def test_compact_state_writes_batch_sidecar(spark, tmp_path):
    """Every committed compact state carries the _applied_batch
    sidecar file (ridden in via the staged-dir swap), so crash
    recovery never depends on row stamps."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        merge_into_compact_state,
    )

    state_dir = str(tmp_path / "state" / "sketch")
    assert merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1)]), _compact_merge
    )
    sidecar = os.path.join(state_dir, "_applied_batch")
    assert os.path.exists(sidecar)
    assert open(sidecar).read().strip() == "0"
    assert merge_into_compact_state(
        state_dir, 1, _cpart(spark, [("a", 10)]), _compact_merge
    )
    assert open(sidecar).read().strip() == "1"


def test_compact_state_zero_row_swap_detected_via_sidecar(spark, tmp_path):
    """Crash after the swap but before the done-marker when merge_fn
    legitimately produced ZERO rows: there are no row stamps to find,
    so only the _applied_batch sidecar can prove the swap landed — the
    retry must skip, not double-apply (the latent double-apply the
    round-7 advice flagged)."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        APPLIED_BATCH_COL,
        applied_marker_dir,
        merge_into_compact_state,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "sketch")
    assert merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1), ("b", 2)]), _compact_merge
    )
    # Simulate batch 1: swap landed with an EMPTY merged state (plus
    # its sidecar, exactly what the staged write produces), crash
    # before the done-marker.
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    open(os.path.join(marker_root, "batch-1.intent"), "w").close()
    import shutil as _sh

    staged = str(tmp_path / "staged")
    (
        _cpart(spark, [])
        .withColumn(APPLIED_BATCH_COL, F.lit(1))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(staged)
    )
    with open(os.path.join(staged, "_applied_batch"), "w") as f:
        f.write("1")
    _sh.rmtree(state_dir)
    os.rename(staged, state_dir)

    assert merge_into_compact_state(
        state_dir, 1, _cpart(spark, [("a", 10)]), _compact_merge
    )
    # the additive contribution must NOT have been re-applied
    assert read_state(spark, state_dir).count() == 0
    assert os.path.exists(os.path.join(marker_root, "batch-1"))
    assert not os.path.exists(os.path.join(marker_root, "batch-1.intent"))


def test_replay_garbage_collects_committed_leftovers(spark, tmp_path):
    """A crash between the done-marker write and intent/staging
    cleanup leaves litter that the replay short-circuit used to
    preserve forever; the retry must remove it (partitioned mode)."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        applied_marker_dir,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "counts")
    part = _part(spark, [(0, "a", 1), (1, "b", 2)])
    assert merge_into_partitioned_state(
        state_dir, 0, part, _additive_merge, "bucket"
    )
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    # plant the litter a post-commit crash leaves behind
    intent = os.path.join(marker_root, "batch-0.intent")
    open(intent, "w").close()
    staging = str(tmp_path / "state" / ".counts.staging-batch-0")
    os.makedirs(os.path.join(staging, "bucket=0"))
    retired = os.path.join(state_dir, ".retired-batch-0-bucket=0")
    os.makedirs(retired)

    assert not merge_into_partitioned_state(
        state_dir, 0, part, _additive_merge, "bucket"
    )
    assert not os.path.exists(intent)
    assert not os.path.exists(staging)
    assert not os.path.exists(retired)
    got = {
        (r.bucket, r.k): r.c for r in read_state(spark, state_dir).collect()
    }
    assert got == {(0, "a"): 1, (1, "b"): 2}


def test_compact_replay_garbage_collects_committed_leftovers(
    spark, tmp_path
):
    """Same post-commit-crash litter, compact mode: stale intent and
    the whole-state retired dir are removed on the replay
    short-circuit."""
    from kafka_spark_streaming_app_spark.streaming.state import (
        applied_marker_dir,
        merge_into_compact_state,
        read_state,
    )

    state_dir = str(tmp_path / "state" / "sketch")
    assert merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1)]), _compact_merge
    )
    marker_root = applied_marker_dir(os.path.dirname(state_dir))
    intent = os.path.join(marker_root, "batch-0.intent")
    open(intent, "w").close()
    retired = str(tmp_path / "state" / ".sketch.retired-batch-0")
    os.makedirs(retired)

    assert not merge_into_compact_state(
        state_dir, 0, _cpart(spark, [("a", 1)]), _compact_merge
    )
    assert not os.path.exists(intent)
    assert not os.path.exists(retired)
    assert {r.k: r.c for r in read_state(spark, state_dir).collect()} == {
        "a": 1
    }


def test_ivm_two_state_replay_is_exactly_once(spark, tmp_path):
    """The streaming_ivm_agg ordering contract, pinned directly on the
    state primitives: deltas are computed from the PRE-merge key
    state, the additive aggregate commits FIRST, the keyed state
    second. A replay after a crash between the two commits (aggregate
    applied, keys not) must recompute identical deltas, skip the
    aggregate via its marker, and complete the key merge — the view
    stays exactly-once."""
    from pyspark.sql import functions as F  # noqa: F811

    from kafka_spark_streaming_app_spark.streaming.state import (
        merge_into_compact_state,
        merge_into_partitioned_state,
        read_state,
    )

    key_state = str(tmp_path / "keys" / "state")
    agg_state = str(tmp_path / "agg" / "state")

    def _key_merge(existing, part):
        base = part
        if existing is not None:
            base = existing.unionByName(part)
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy(F.desc("seq"))
        return (
            base.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def _agg_merge(existing, part):
        if existing is None:
            return part
        return (
            existing.unionByName(part)
            .groupBy("g")
            .agg(F.sum("d").alias("d"))
        )

    def apply_batch(batch_id, rows, crash_between=False):
        part = spark.createDataFrame(rows, "k bigint, seq bigint, c bigint")
        part = part.withColumn("bucket", F.pmod(F.col("k"), F.lit(4)))
        cur = None
        import os as _os

        if _os.path.isdir(key_state) and any(
            not e.startswith(("_", ".")) for e in _os.listdir(key_state)
        ):
            cur = read_state(spark, key_state).select(
                F.col("k").alias("sk"),
                F.col("seq").alias("sseq"),
                F.col("c").alias("sc"),
            )
        j = part.join(cur, part.k == cur.sk, "left") if cur is not None else (
            part.withColumn("sseq", F.lit(None).cast("bigint"))
            .withColumn("sc", F.lit(None).cast("bigint"))
        )
        j = j.filter(F.col("sseq").isNull() | (F.col("seq") > F.col("sseq")))
        j = j.localCheckpoint()
        deltas = (
            j.filter(F.col("sc").isNotNull())
            .select(F.lit("g0").alias("g"), (-F.col("sc")).alias("d"))
            .unionByName(
                j.select(F.lit("g0").alias("g"), F.col("c").alias("d"))
            )
            .groupBy("g")
            .agg(F.sum("d").alias("d"))
        )
        merge_into_compact_state(agg_state, batch_id, deltas, _agg_merge)
        if crash_between:
            return  # crash window: aggregate committed, keys not
        merge_into_partitioned_state(
            key_state,
            batch_id,
            j.select("k", "seq", "c", "bucket"),
            _key_merge,
            "bucket",
        )

    apply_batch(0, [(1, 1, 10), (2, 1, 20)])
    # batch 1 crashes after the aggregate commit
    apply_batch(1, [(1, 2, 100)], crash_between=True)
    # foreachBatch replays batch 1 in full
    apply_batch(1, [(1, 2, 100)])

    view = {r.g: r.d for r in read_state(spark, agg_state).collect()}
    keys = {r.k: r.c for r in read_state(spark, key_state).collect()}
    assert keys == {1: 100, 2: 20}
    assert view == {"g0": 120}  # 10+20, then -10+100 applied ONCE


def test_scd2_version_state_batch_order_independent(spark, tmp_path):
    """The version-table merge (streaming_scd2_build's shape) must
    produce the identical history regardless of how changes split
    into batches or arrive out of seq order — the chain is re-derived
    from the union per touched key, never blindly appended."""
    from pyspark.sql import Window

    def _bucket(df):
        return df.withColumn("bucket", F.pmod(F.xxhash64("k"), F.lit(4)))

    def _versioned(changes):
        w = Window.partitionBy("k").orderBy("seq")
        nxt = F.lead("seq").over(w)
        return changes.select(
            "k", "seq", "val",
            (nxt - 1).alias("effective_to"),
            nxt.isNull().alias("is_current"),
            F.row_number().over(w).alias("version_n"),
        )

    def _merge(existing, part):
        base = part.drop("bucket").select("k", "seq", "val")
        if existing is not None:
            base = existing.select("k", "seq", "val").unionByName(base)
        return _bucket(_versioned(base))

    changes = [
        (1, 10, "a"), (1, 30, "c"), (1, 20, "b"),
        (2, 5, "x"), (2, 50, "y"),
        (3, 7, "q"),
    ]

    def run(splits, root):
        state = str(tmp_path / root / "state")
        for bid, rows in enumerate(splits):
            part = _bucket(
                spark.createDataFrame(rows, "k long, seq long, val string")
            )
            merge_into_partitioned_state(
                state, bid, part, _merge, "bucket", shuffle_partitions=4
            )
        from kafka_spark_streaming_app_spark.streaming.state import read_state

        return sorted(
            (r["k"], r["seq"], r["effective_to"], r["is_current"],
             r["version_n"])
            for r in read_state(spark, state).collect()
        )

    # one batch; three batches; out-of-order (the 20-seq change for
    # key 1 arrives LAST and must re-slot as version 2 of 3)
    a = run([changes], "one")
    b = run([changes[:2], changes[2:4], changes[4:]], "three")
    c = run([[changes[1]], [changes[0], changes[3]],
             [changes[4], changes[5]], [changes[2]]], "ooo")
    assert a == b == c
    assert (1, 20, 29, False, 2) in a  # re-slotted middle version
    assert (1, 30, None, True, 3) in a


def test_bitmap_state_merge_is_order_independent_and_idempotent(
    spark, tmp_path
):
    """The bitmap rollup's OR-merge must give identical state under
    any batch split AND under re-application of a batch's own
    contribution (idempotence is what makes the crash window
    algebraically safe, not just marker-guarded)."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.streaming.state import (
        merge_into_compact_state,
        read_state,
    )

    def _merge(existing, part):
        if existing is None:
            return part
        return (
            existing.unionByName(part)
            .groupBy("g", "bkt")
            .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        )

    rows = [(i % 3, i * 37 % 211) for i in range(300)]

    def contribution(subset):
        return (
            spark.createDataFrame(subset, "g long, u long")
            .selectExpr(
                "g",
                "bitmap_bucket_number(u) AS bkt",
                "bitmap_bit_position(u) AS pos",
            )
            .groupBy("g", "bkt")
            .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        )

    def run(splits, name):
        # own parent dir per run: the applied-batch marker dir lives
        # NEXT TO the state dir, and sharing it across runs would
        # skip later runs' batch ids as replays
        state = str(tmp_path / name / "state")
        for bid, subset in enumerate(splits):
            merge_into_compact_state(
                state, bid, contribution(subset), _merge,
                shuffle_partitions=2,
            )
        return {
            (r["g"], r["bkt"]): bytes(r["bm"])
            for r in read_state(spark, state).collect()
        }

    one = run([rows], "one")
    three = run([rows[:100], rows[100:150], rows[150:]], "three")
    # idempotence: re-apply the middle slice's contribution on top
    dup = run(
        [rows[:100], rows[100:150], rows[100:150], rows[150:]], "dup"
    )
    assert one == three == dup
    # exact distinct per group from the state
    got = (
        spark.createDataFrame(
            [(g, b, bm) for (g, b), bm in one.items()],
            "g long, bkt long, bm binary",
        )
        .groupBy("g")
        .agg(F.expr("sum(bitmap_count(bm))").alias("n"))
        .collect()
    )
    exact = {g: len({u for gg, u in rows if gg == g}) for g in (0, 1, 2)}
    assert {r["g"]: r["n"] for r in got} == exact
