"""Delta log-replay tests: snapshot semantics (compaction
tombstones, naive-listing double count), time travel, checkpoint
handoff including pre-checkpoint log truncation (the case where a
reader that ignores _last_checkpoint cannot recover), and guards."""

import glob
import json
import os

import pytest

from kafka_spark_streaming_app_spark.sources.deltalog import (
    DeltaFixtureWriter,
    read_delta_snapshot,
    snapshot_files,
)

_FIELDS = [("k", "long"), ("v", "string")]


def _rows(lo, hi, tag):
    return [{"k": i, "v": f"{tag}{i}"} for i in range(lo, hi)]


def _make_table(d):
    w = DeltaFixtureWriter(str(d), _FIELDS)
    w.commit(add_files=[("a0.parquet", _rows(0, 10, "a"))], first=True)
    w.commit(
        add_files=[("a1.parquet", _rows(0, 10, "a"))],
        remove_paths=["a0.parquet"],
    )  # compaction: a0 tombstoned but still on disk
    w.checkpoint()
    w.commit(add_files=[("b.parquet", _rows(10, 25, "b"))])
    return w


def test_snapshot_excludes_tombstoned_file(tmp_path, spark):
    _make_table(tmp_path)
    snap = snapshot_files(str(tmp_path))
    assert snap["version"] == 2
    assert snap["files"] == ["a1.parquet", "b.parquet"]
    # the tombstone is still on disk: naive listing would double-count
    on_disk = {os.path.basename(p)
               for p in glob.glob(str(tmp_path / "*.parquet"))}
    assert "a0.parquet" in on_disk
    df = read_delta_snapshot(spark, str(tmp_path))
    assert df.count() == 25
    assert df.filter("k < 10").count() == 10  # not 20


def test_time_travel_pins_versions(tmp_path, spark):
    _make_table(tmp_path)
    assert snapshot_files(str(tmp_path), 0)["files"] == ["a0.parquet"]
    assert snapshot_files(str(tmp_path), 1)["files"] == ["a1.parquet"]
    assert read_delta_snapshot(spark, str(tmp_path), 1).count() == 10
    with pytest.raises(ValueError, match="not in log"):
        snapshot_files(str(tmp_path), 9)


def test_checkpoint_survives_log_truncation(tmp_path, spark):
    """Delta permits deleting commits at or before the checkpoint;
    the snapshot must then START from the checkpoint state."""
    _make_table(tmp_path)
    os.remove(tmp_path / "_delta_log" / f"{0:020d}.json")
    os.remove(tmp_path / "_delta_log" / f"{1:020d}.json")
    snap = snapshot_files(str(tmp_path))
    assert snap["from_checkpoint"]
    assert snap["files"] == ["a1.parquet", "b.parquet"]
    assert read_delta_snapshot(spark, str(tmp_path)).count() == 25


def test_guards(tmp_path):
    with pytest.raises(ValueError, match="not a Delta table"):
        snapshot_files(str(tmp_path / "nope"))
    w = DeltaFixtureWriter(str(tmp_path), _FIELDS)
    w.commit(add_files=[("a.parquet", _rows(0, 3, "a"))], first=True)
    # partitioned metaData must gate loudly
    commit = tmp_path / "_delta_log" / f"{1:020d}.json"
    md = {
        "metaData": {
            "id": "x",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": []}
            ),
            "partitionColumns": ["day"],
            "configuration": {},
        }
    }
    commit.write_text(json.dumps(md) + "\n")
    with pytest.raises(NotImplementedError, match="partitioned"):
        snapshot_files(str(tmp_path))


def test_streaming_commit_is_idempotent_under_replay(tmp_path):
    """foreachBatch is at-least-once: replaying a batch id must not
    produce a second commit (the txn-action check, exactly the real
    Delta sink's dedup)."""
    import pandas as pd

    from kafka_spark_streaming_app_spark.queries.formats import (
        _delta_stream_commit,
    )

    pdf0 = pd.DataFrame(
        {"o_orderkey": [1, 2], "o_orderstatus": ["F", "O"],
         "o_orderpriority": ["1-URGENT"] * 2, "cents": [100, 200]}
    )
    _delta_stream_commit(str(tmp_path), pdf0, 0)
    _delta_stream_commit(str(tmp_path), pdf0, 0)  # replay
    log = sorted(os.listdir(tmp_path / "_delta_log"))
    assert log == [f"{0:020d}.json"]
    pdf1 = pdf0.assign(o_orderkey=[3, 4])
    _delta_stream_commit(str(tmp_path), pdf1, 1)
    _delta_stream_commit(str(tmp_path), pdf1, 1)  # replay of the compactor
    snap = snapshot_files(str(tmp_path))
    assert snap["files"] == [
        "batch-0-compacted.parquet", "batch-1.parquet"
    ]
    # the compacted original is tombstoned but still on disk
    assert os.path.exists(tmp_path / "batch-0.parquet")
    assert len(sorted(os.listdir(tmp_path / "_delta_log"))) == 2
