"""Bucket-partitioned, idempotent foreachBatch state maintenance.

The naive foreachBatch continuous-aggregate pattern (read the whole
state table, union the batch, re-aggregate, overwrite the whole
directory) has per-micro-batch I/O proportional to TOTAL state size.
For sketch-sized state (a few thousand (day, bin) rows) that is fine;
for key-cardinality-sized state (a CDC latest-change-per-key table
over a 100 TB key space) it makes every micro-batch cost a full
snapshot rewrite.

This module fixes both problems flagged in review:

* **Per-batch I/O ∝ touched keys, not total keys.** The state table
  is written ``partitionBy(bucket_col)`` (a stable hash bucket of the
  merge key, or a natural partition such as the event day). Each
  batch (1) derives the distinct buckets it touches — a driver-side
  collect of at most ``n_buckets`` partition VALUES, metadata not
  data, (2) reads the existing state with a literal ``isin`` filter
  so parquet partition pruning skips every untouched bucket, and
  (3) writes with dynamic partition overwrite
  (``partitionOverwriteMode=dynamic``) so only the touched partition
  directories are replaced. Untouched bucket files are never read,
  never rewritten.

* **At-least-once replays don't double-apply.** foreachBatch may
  re-invoke a batch after a failure. Each successful merge records a
  ``batch-<id>`` done-marker under ``<state_root>/_applied``; a
  replayed batch id returns without touching state.

* **Partial commits are reconciled per partition, not assumed away.**
  A dynamic partition overwrite is NOT atomic across partition
  directories: a crash mid-write can leave SOME touched partitions
  already containing the batch while others don't, and a markerless
  retry of an additive merge would double-add to the committed ones.
  Two mechanisms close this window exactly:

  - every state row carries an internal ``_applied_batch`` column
    stamped with the batch id that last rewrote its partition — the
    stamp commits atomically WITH the data, per partition;
  - an ``batch-<id>.intent`` marker is written immediately before the
    Spark write and promoted to the done-marker after it.

  A retry that finds the intent marker but no done-marker knows the
  previous attempt may have partially committed; it reads the touched
  partitions and EXCLUDES every bucket whose ``_applied_batch``
  already equals this batch id (those partitions hold the batch —
  rewriting them would double-apply an additive merge), merging only
  into the buckets the crashed attempt never committed. The clean
  path (no intent marker) pays no extra job for this. Readers use
  :func:`read_state`, which drops the internal column.

* **Non-local state roots fail fast.** Existence checks and markers
  use driver-local ``os`` calls (foreachBatch runs on the driver).
  Given an ``hdfs://``/``s3a://`` URI those calls would not error —
  they would silently report "no state", making ``merge_fn`` replace
  accumulated state with the batch contribution alone (data loss for
  additive merges) and replay markers would never fire. We therefore
  reject any URI-schemed path up front; routing markers through the
  Hadoop FileSystem client (``spark._jvm.org.apache.hadoop.fs``) is
  the documented extension point for object-store deployments, and a
  transactional table format (Delta/Iceberg ``txnAppId``/
  ``txnVersion``) replaces this module wholesale where available.

* **Missing state is detected, not inferred from an exception.** The
  first batch sees "no state yet" via an explicit existence check
  rather than a bare ``except Exception`` that would also swallow a
  genuine read failure (corrupt footer, permission error) and
  silently discard all accumulated state.
"""

from __future__ import annotations

import os
from typing import Callable, Optional
from urllib.parse import urlsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "merge_into_partitioned_state",
    "applied_marker_dir",
    "read_state",
    "APPLIED_BATCH_COL",
]

# Internal provenance column: the batch id that last rewrote the row's
# partition. Stamped on write, stripped by read_state() before state is
# handed back to query logic.
APPLIED_BATCH_COL = "_applied_batch"


def applied_marker_dir(state_root: str) -> str:
    return os.path.join(state_root, "_applied")


def _require_local(path: str, what: str) -> None:
    """Fail fast on URI-schemed paths: the marker/existence logic uses
    driver-local os calls, which silently see "nothing there" for
    hdfs://, s3a://, file:// etc. — turning a remote state root into
    data loss instead of an error."""
    scheme = urlsplit(path).scheme
    if scheme:
        raise ValueError(
            f"merge_into_partitioned_state: {what} {path!r} has URI "
            f"scheme {scheme!r}, but state existence checks and replay "
            "markers use driver-local filesystem calls; a remote root "
            "would silently read as empty (losing accumulated state) "
            "and markers would never fire. Use a driver-local path, or "
            "route the marker/existence checks through the Hadoop "
            "FileSystem client / a transactional table format for "
            "object-store state."
        )


def _state_exists(state_dir: str) -> bool:
    """True when a previous batch has committed state. Checks for the
    partition directories themselves (dynamic partition overwrite
    commits per-partition), not just the root dir which tempfile may
    have pre-created."""
    if not os.path.isdir(state_dir):
        return False
    return any(
        e for e in os.listdir(state_dir) if not e.startswith(("_", "."))
    )


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the persistent state table, stripping the internal
    provenance column. All query-level readers of state maintained by
    :func:`merge_into_partitioned_state` should use this instead of a
    raw ``spark.read.parquet``."""
    df = spark.read.parquet(state_dir)
    if APPLIED_BATCH_COL in df.columns:
        df = df.drop(APPLIED_BATCH_COL)
    return df


def merge_into_partitioned_state(
    state_dir: str,
    batch_id: int,
    part: DataFrame,
    merge_fn: Callable[[Optional[DataFrame], DataFrame], DataFrame],
    bucket_col: str,
    applied_dir: str | None = None,
) -> bool:
    """Merge one micro-batch's pre-aggregated contribution ``part``
    into the persistent state at ``state_dir``.

    ``part`` must already carry ``bucket_col`` (the partition column)
    and be pre-aggregated so that ``merge_fn(existing, part)`` yields
    the new state restricted to the touched buckets. ``merge_fn``
    receives ``None`` for ``existing`` on the first batch; when it
    receives a DataFrame, the internal provenance column has already
    been stripped.

    Returns True when the batch was applied, False when it was skipped
    as an already-applied replay.
    """
    _require_local(state_dir, "state_dir")
    marker_root = applied_dir or applied_marker_dir(
        os.path.dirname(state_dir)
    )
    _require_local(marker_root, "applied marker dir")
    marker = os.path.join(marker_root, f"batch-{batch_id}")
    intent = marker + ".intent"
    if os.path.exists(marker):
        return False

    spark = part.sparkSession
    # The batch contribution is referenced twice (touched-bucket list
    # + merge input); barrier it so the upstream micro-batch plan runs
    # once. The checkpoint is LAZY and the touched-bucket collect is
    # its materializing job — one job instead of checkpoint+collect
    # (per-trigger fixed costs are the whole price of this design at
    # small batch sizes, so every job counts).
    part = part.localCheckpoint(eager=False)
    touched = [
        r[0] for r in part.select(bucket_col).distinct().collect()
    ]  # ≤ n_buckets partition VALUES — pruning metadata, not data
    os.makedirs(marker_root, exist_ok=True)
    if not touched:
        open(marker, "w").close()
        return True

    if _state_exists(state_dir):
        existing = spark.read.parquet(state_dir).filter(
            F.col(bucket_col).isin(touched)
        )
    else:
        existing = None

    if (
        existing is not None
        and os.path.exists(intent)
        and APPLIED_BATCH_COL in existing.columns
    ):
        # A previous attempt at THIS batch declared intent but never
        # reached the done-marker: its dynamic partition overwrite may
        # have committed a subset of the touched partitions. Partitions
        # whose rows are stamped with this batch id already contain the
        # batch — exclude them so the retry cannot double-apply an
        # additive merge; merge only into the rest.
        committed = {
            r[0]
            for r in existing.filter(
                F.col(APPLIED_BATCH_COL) == batch_id
            )
            .select(bucket_col)
            .distinct()
            .collect()
        }
        if committed:
            touched = [b for b in touched if b not in committed]
            if not touched:
                open(marker, "w").close()
                os.remove(intent)
                return True
            part = part.filter(F.col(bucket_col).isin(touched))
            existing = existing.filter(F.col(bucket_col).isin(touched))

    if existing is not None and APPLIED_BATCH_COL in existing.columns:
        existing = existing.drop(APPLIED_BATCH_COL)
    merged = merge_fn(existing, part).withColumn(
        APPLIED_BATCH_COL, F.lit(batch_id)
    )
    # Declare intent BEFORE the non-atomic multi-partition commit so a
    # crashed attempt is distinguishable from a never-started one, then
    # barrier before overwriting partitions the merge read from, and
    # replace ONLY the touched partitions. One output file per bucket:
    # the state is compact by construction.
    open(intent, "w").close()
    (
        merged.repartition(bucket_col)
        .localCheckpoint(eager=True)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(bucket_col)
        .parquet(state_dir)
    )
    open(marker, "w").close()
    os.remove(intent)
    return True
