"""Spark 4 Python DataSource streaming FROM an Iceberg table
(``spark.readStream.format("icebergstream").option("path", dir)``) —
``deltastream_ds``'s twin on the Iceberg metadata tree, so BOTH
lakehouse formats stream in and out of the engine symmetrically.

Offsets are SNAPSHOT ORDINALS (the snapshot's position in the
metadata's snapshot list — monotone where raw snapshot ids need not
be), checkpointed as ``{"ordinal": N, "snapshot_id": id}``; each
trigger plans the incremental APPEND scan between the two snapshot
ids (``iceberglog.incremental_append_files`` — manifests selected by
``added_snapshot_id``, O(manifests) metadata), one input partition
per added file, each task reading its own parquet via pyarrow
executor-side. Non-append snapshots in range gate loudly, exactly
like the real source without ``streaming-skip-overwrite-snapshots``.

Options: ``path``; ``startingSnapshotId`` (replay from AFTER the
named snapshot... pass the FIRST snapshot's id with
``inclusiveStarting=true`` semantics via startingOrdinal=0; default:
table head, new appends only)."""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _FileSlice(InputPartition):
    def __init__(self, path: str, fields):
        self.path = path
        self.fields = fields  # [(name, iceberg_type)] in schema order


# iceberg type -> the arrow type Spark's Python-DataSource arrow
# path expects for the corresponding catalyst type
_ARROW_TYPES = {
    "long": "int64", "int": "int32", "double": "float64",
    "string": "string", "boolean": "bool",
}


def _require_path(options: dict) -> str:
    p = options.get("path")
    if not p:
        raise ValueError("icebergstream requires the 'path' option")
    return p


def _snapshots(table_dir: str):
    import json

    from .iceberglog import _current_schema, _metadata_path

    meta = json.loads(open(_metadata_path(table_dir)).read())
    schema = _current_schema(meta)
    return meta["snapshots"], schema["fields"]


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.table_dir = _require_path(options)
        so = options.get("startingordinal")
        self.starting_ordinal = None if so is None else int(so)
        self._fields = None

    def _fields_now(self):
        if self._fields is None:
            _, fields = _snapshots(self.table_dir)
            self._fields = [(f["name"], f["type"]) for f in fields]
        return self._fields

    def initialOffset(self) -> dict:
        snaps, fields = _snapshots(self.table_dir)
        self._fields = [(f["name"], f["type"]) for f in fields]
        # ordinal N means "consumed through snapshots[N]"; -1 = none.
        # startingOrdinal=K replays snapshots[K:] (0 = full history);
        # default: table head, new appends only.
        if self.starting_ordinal is None:
            ordinal = len(snaps) - 1
        else:
            ordinal = self.starting_ordinal - 1
        sid = snaps[ordinal]["snapshot-id"] if ordinal >= 0 else -1
        return {"ordinal": ordinal, "snapshot_id": sid}

    def latestOffset(self) -> dict:
        snaps, _ = _snapshots(self.table_dir)
        return {
            "ordinal": len(snaps) - 1,
            "snapshot_id": snaps[-1]["snapshot-id"],
        }

    def commit(self, end: dict) -> None:
        pass

    def partitions(self, start: dict, end: dict) -> list:
        from .iceberglog import incremental_append_files

        lo, hi = int(start["ordinal"]), int(end["ordinal"])
        if hi <= lo:
            return []
        snaps, _ = _snapshots(self.table_dir)
        if lo >= 0:
            inc = incremental_append_files(
                self.table_dir,
                snaps[lo]["snapshot-id"],
                snaps[hi]["snapshot-id"],
            )
            files = inc["files"]
        else:
            # from before the first snapshot: full history = the
            # incremental scan from snapshot 0 plus snapshot 0's own
            # ADDED files — equivalently every append snapshot's adds
            first = snaps[0]["snapshot-id"]
            inc = incremental_append_files(
                self.table_dir, first, snaps[hi]["snapshot-id"]
            )
            from .iceberglog import snapshot_data_files

            base = snapshot_data_files(self.table_dir, first)
            files = sorted(set(inc["files"]) | set(base["files"]))
        fields = self._fields_now()
        return [_FileSlice(p, fields) for p in files]

    def read(self, partition: _FileSlice) -> Iterator:
        """Yield ``pyarrow.RecordBatch``es straight from the parquet
        read — no per-row Python boundary (see deltastream twin)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            partition.path, columns=[n for n, _ in partition.fields]
        )
        schema = pa.schema(
            [
                (n, pa.type_for_alias(_ARROW_TYPES[t]))
                for n, t in partition.fields
            ]
        )
        return iter(tbl.cast(schema).to_batches())


class IcebergStreamDataSource(DataSource):
    """``icebergstream``: stream an Iceberg table's appends."""

    @classmethod
    def name(cls) -> str:
        return "icebergstream"

    def schema(self) -> str:
        _, fields = _snapshots(_require_path(self.options))
        _MAP = {
            "long": "bigint", "int": "int", "double": "double",
            "string": "string", "boolean": "boolean",
        }
        cols = []
        for f in fields:
            if f["type"] not in _MAP:
                raise NotImplementedError(
                    f"iceberg type {f['type']!r} outside the "
                    "streaming subset"
                )
            cols.append(f"{f['name']} {_MAP[f['type']]}")
        return ", ".join(cols)

    def streamReader(self, schema) -> _IcebergStreamReader:
        return _IcebergStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )


def register_icebergstream(spark) -> None:
    spark.dataSource.register(IcebergStreamDataSource)
