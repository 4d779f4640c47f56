"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a broker-less Kafka stand-in that replays the reference producer's
JSON wire format as a first-class ``spark.read.format("wire_replay")``
/ ``spark.readStream.format("wire_replay")`` source.

Unlike the file-replay harness (queries/streaming.py), this is a REAL
connector: Spark plans partitioned reads against it, the streaming
variant exposes offsets/commit like any exactly-once source, and no
files are materialized.

Every payload field derives from the row index through the
cross-engine h60 hash (functions/hashing.py), NOT a sequential RNG —
two consequences that matter:
- random access: partition [start, end) generates exactly its own
  rows, O(end-start), no prefix replay — the property that lets a
  1000-executor cluster read this source without coordination;
- oracle parity: DuckDB reconstructs the identical payload stream
  from ``range(n)`` (see queries/pyds.py), so the connector is
  hash-checked end to end.

Options: rows (end index), startRow (batch only: start index,
default 0), numPartitions, rowsPerBatch (stream only).
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# the reference's 5-product catalog (ecommerce_data_producer.py:48-54)
from ..tools.producer import CATALOG, LOCATIONS

_T0 = datetime(2024, 1, 1, 10, 0, 0)
_MS_BETWEEN = 500


def _h60(s: str) -> int:
    """Python twin of functions.hashing.h60 (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def wire_order_at(i: int) -> dict:
    """The i-th wire payload — a pure function of the index."""
    product = CATALOG[_h60(f"prod|{i}") % len(CATALOG)]
    quantity = _h60(f"q|{i}") % 5 + 1
    return {
        "order_id": f"order_{i}",
        "user_id": f"user_{_h60(f'u|{i}') % 100}",
        "product_id": product["product_id"],
        "product_name": product["product_name"],
        "category": product["category"],
        "price": product["price"],
        "quantity": quantity,
        "total_amount": product["price"] * quantity,
        "location": LOCATIONS[_h60(f"loc|{i}") % len(LOCATIONS)],
        "timestamp": (
            _T0 + timedelta(milliseconds=i * _MS_BETWEEN)
        ).strftime("%Y-%m-%d %H:%M:%S.%f"),
        "event_type": "order",
        "is_fraud_simulation": _h60(f"f|{i}") % 10 == 0,
    }


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _split(start: int, end: int, parts: int) -> list[_Range]:
    n = max(end - start, 0)
    if n == 0:
        return []
    parts = max(1, min(parts, n))
    step = -(-n // parts)
    return [
        _Range(s, min(s + step, end)) for s in range(start, end, step)
    ]


class _WireBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.start_row = int(options.get("startrow", 0))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> list[InputPartition]:
        # [startRow, rows): a half-open index window, so a caller can
        # produce the stream in staged waves (queries/minikafka.py)
        return _split(self.start_row, self.rows, self.num_partitions)

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (json.dumps(wire_order_at(i)),)


class _WireStreamReader(DataSourceStreamReader):
    """Offset = rows emitted so far; advances by rowsPerBatch per
    trigger until the ``rows`` cap, so ``processAllAvailable`` drains
    a finite deterministic stream (and a capless run is a real
    unbounded source)."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.rows_per_batch = int(options.get("rowsperbatch", 200))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.current = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self.current = min(self.current + self.rows_per_batch, self.rows)
        return {"offset": self.current}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return _split(start["offset"], end["offset"], self.num_partitions)

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (json.dumps(wire_order_at(i)),)

    def commit(self, end: dict) -> None:
        pass


# --------------------------------------------------------------------------
# Writer faces: the broker-less Kafka SINK twin. Two-phase commit over a
# shared filesystem: tasks write unique temp files and return commit
# messages; the DRIVER renames them into place (batch: all-or-nothing
# with optional truncate; streaming: per-batch manifest making replayed
# micro-batches idempotent — the exactly-once file-sink contract).
# Assumes a filesystem all tasks can reach (local[*] here; object store
# or DFS on a cluster — same protocol, that's the point of the design).
# --------------------------------------------------------------------------


class _WireCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_name: str, n_rows: int):
        self.tmp_path = tmp_path
        self.final_name = final_name
        self.n_rows = n_rows


def _write_part(path: str, iterator) -> _WireCommit:
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    tmp = os.path.join(path, f"_tmp_{name}")
    n = 0
    with open(tmp, "w") as f:
        for row in iterator:
            if row.value is None:
                # a JSON-lines file cannot represent NULL distinctly
                # from '' — fail fast instead of silently degrading
                # (Kafka-tombstone semantics need a keyed sink)
                raise ValueError(
                    "wire_replay sink requires non-null value strings"
                )
            f.write(row.value + "\n")
            n += 1
    return _WireCommit(tmp, name, n)


def _cleanup(messages) -> None:
    import contextlib
    import os

    for m in messages:
        if m is not None:
            with contextlib.suppress(OSError):
                os.remove(m.tmp_path)


class _WireBatchWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wire_replay sink requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator) -> _WireCommit:
        return _write_part(self.path, iterator)

    def commit(self, messages) -> None:
        import glob
        import os

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
        for m in messages:
            if m is not None:
                os.replace(
                    m.tmp_path, os.path.join(self.path, m.final_name)
                )

    def abort(self, messages) -> None:
        _cleanup(messages)


class _WireStreamWriter(DataSourceStreamWriter):
    """Exactly-once by DETERMINISTIC DESTINATIONS: batch ``b``'s task
    ``i`` always commits to ``part-b{b}-{i}.jsonl``, so a replayed
    micro-batch (same offsets → same deterministic content) atomically
    overwrites the same files instead of adding new ones — idempotent
    across EVERY crash window, including a crash between the renames
    and the manifest append (a uuid-named scheme double-writes there).
    The ``_batches.log`` manifest only short-circuits replayed work."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wire_replay sink requires a 'path' option")

    def write(self, iterator) -> _WireCommit:
        return _write_part(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        import os

        log = os.path.join(self.path, "_batches.log")
        committed = set()
        if os.path.exists(log):
            with open(log) as f:
                committed = {line.strip() for line in f if line.strip()}
        if str(batchId) in committed:
            _cleanup(messages)
            return
        for i, m in enumerate(messages):
            if m is not None:
                os.replace(
                    m.tmp_path,
                    os.path.join(
                        self.path, f"part-b{batchId:06d}-{i:04d}.jsonl"
                    ),
                )
        with open(log, "a") as f:
            f.write(f"{batchId}\n")

    def abort(self, messages, batchId: int) -> None:
        _cleanup(messages)


class WireReplayDataSource(DataSource):
    """``wire_replay``: batch + streaming JSON wire-format source AND
    sink (read: deterministic generator; write: two-phase-commit
    JSON-lines directory)."""

    @classmethod
    def name(cls) -> str:
        return "wire_replay"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:
        return _WireBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _WireStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError(
                f"wire_replay sink expects a 'value' string column, got {names}"
            )
        return _WireBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError(
                f"wire_replay sink expects a 'value' string column, got {names}"
            )
        return _WireStreamWriter(self.options)


def register_wire_replay(spark) -> None:
    """Idempotent registration of the wire_replay source."""
    spark.dataSource.register(WireReplayDataSource)
