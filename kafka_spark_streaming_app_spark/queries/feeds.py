"""Shared memoized feed materializer for the streaming fixture
queries.

Several streaming operators (CDC merge, materialized-view upkeep,
the lakehouse sinks, funnels) replay a deterministic JSON-lines feed
as a file stream. The feed CONTENTS differ per family, but the
lifecycle is identical: derive a DataFrame from the sf tables,
materialize it once per (session, sf_dir) as N JSON files (N files →
several micro-batches under ``maxFilesPerTrigger``), clean up at
exit. This module owns that lifecycle once so each family supplies
only its derivation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_FEED_DIRS: dict[tuple, str] = {}


def materialize_feed(spark, sf_dir: str, kind: str, build,
                     files: int | None = 8, fmt: str = "json") -> str:
    """``build(spark, sf_dir) -> DataFrame``, written once per
    (session, sf_dir, kind) as ``files`` files (None = one per core,
    so the file-stream source's task-per-file parallelism matches the
    cluster); ``fmt`` is "json" (JSON-lines) or "text" (a single
    pre-serialized ``value`` column). Returns the directory. Memoized
    so every query replaying the same feed shares one
    materialization."""
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    src = _FEED_DIRS.get(key)
    if src is None or not os.path.isdir(src):
        src = tempfile.mkdtemp(prefix=f"{kind}_feed_")
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        n = files if files is not None else (
            spark.sparkContext.defaultParallelism
        )
        writer = build(spark, sf_dir).repartition(n).write.mode("overwrite")
        getattr(writer, fmt)(src)
        _FEED_DIRS[key] = src
    return src


def materialize_json_feed(spark, sf_dir: str, kind: str, build,
                          files: int = 8) -> str:
    return materialize_feed(spark, sf_dir, kind, build, files, "json")
