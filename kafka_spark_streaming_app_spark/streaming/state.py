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
  ``batch-<id>`` marker under ``<state_root>/_applied``; a replayed
  batch id returns without touching state. (The marker lands after
  the state commit, so the at-least-once window narrows to a crash
  between commit and marker — for idempotent merges such as
  latest-wins argmax even that window is harmless; for additive
  merges closing it entirely requires a transactional table format
  (Delta/Iceberg txn ids), which is exactly what those formats'
  ``txnAppId``/``txnVersion`` options exist for. The marker is
  written with plain ``os`` calls because foreachBatch runs on the
  driver; against object storage the same two calls go through the
  Hadoop FileSystem client.)

* **Missing state is detected, not inferred from an exception.** The
  first batch sees "no state yet" via an explicit existence check
  rather than a bare ``except Exception`` that would also swallow a
  genuine read failure (corrupt footer, permission error) and
  silently discard all accumulated state.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_into_partitioned_state", "applied_marker_dir"]


def applied_marker_dir(state_root: str) -> str:
    return os.path.join(state_root, "_applied")


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
    receives ``None`` for ``existing`` on the first batch.

    Returns True when the batch was applied, False when it was skipped
    as an already-applied replay.
    """
    marker_root = applied_dir or applied_marker_dir(
        os.path.dirname(state_dir)
    )
    marker = os.path.join(marker_root, f"batch-{batch_id}")
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
    if not touched:
        os.makedirs(marker_root, exist_ok=True)
        open(marker, "w").close()
        return True

    if _state_exists(state_dir):
        existing = spark.read.parquet(state_dir).filter(
            F.col(bucket_col).isin(touched)
        )
    else:
        existing = None
    merged = merge_fn(existing, part)
    # Barrier before overwriting partitions the merge read from, then
    # replace ONLY the touched partitions. One output file per bucket:
    # the state is compact by construction.
    (
        merged.repartition(bucket_col)
        .localCheckpoint(eager=True)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(bucket_col)
        .parquet(state_dir)
    )
    os.makedirs(marker_root, exist_ok=True)
    open(marker, "w").close()
    return True
