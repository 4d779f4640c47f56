"""Iceberg metadata-tree tests: snapshot resolution through real
Avro manifest lists/manifests, DELETED-entry semantics, time travel
by snapshot id, and loud gating of partitioned/foreign shapes."""

import json
import os

import pytest

from kafka_spark_streaming_app_spark.sources.iceberglog import (
    STATUS_ADDED,
    STATUS_DELETED,
    IcebergFixtureWriter,
    read_iceberg_snapshot,
    snapshot_data_files,
)

_FIELDS = [("k", "long"), ("v", "string")]


def _rows(lo, hi, tag):
    return [{"k": i, "v": f"{tag}{i}"} for i in range(lo, hi)]


def _make_table(d):
    w = IcebergFixtureWriter(str(d), _FIELDS)
    f0 = w.write_data_file("d0.parquet", _rows(0, 10, "a"))
    s1 = w.commit_snapshot([(STATUS_ADDED, f0)])
    f0r = w.write_data_file("d0r.parquet", _rows(0, 10, "a"))
    f1 = w.write_data_file("d1.parquet", _rows(10, 25, "b"))
    s2 = w.commit_snapshot(
        [(STATUS_DELETED, f0), (STATUS_ADDED, f0r), (STATUS_ADDED, f1)]
    )
    return w, s1, s2


def test_deleted_entries_are_excluded(tmp_path, spark):
    _, s1, s2 = _make_table(tmp_path)
    snap = snapshot_data_files(str(tmp_path))
    assert snap["snapshot_id"] == s2
    names = [os.path.basename(p) for p in snap["files"]]
    assert names == ["d0r.parquet", "d1.parquet"]
    # d0 is still on disk — status, not listing, defines the table
    assert os.path.exists(tmp_path / "data" / "d0.parquet")
    df = read_iceberg_snapshot(spark, str(tmp_path))
    assert df.count() == 25
    assert df.filter("k < 10").count() == 10  # not 20


def test_time_travel_by_snapshot_id(tmp_path, spark):
    _, s1, s2 = _make_table(tmp_path)
    snap = snapshot_data_files(str(tmp_path), s1)
    assert [os.path.basename(p) for p in snap["files"]] == ["d0.parquet"]
    assert read_iceberg_snapshot(spark, str(tmp_path), s1).count() == 10
    with pytest.raises(ValueError, match="not in table metadata"):
        snapshot_data_files(str(tmp_path), 99)


def test_manifests_are_real_avro(tmp_path):
    from kafka_spark_streaming_app_spark.operators.avrocodec import (
        read_container,
    )

    _make_table(tmp_path)
    manifests = [
        f for f in os.listdir(tmp_path / "metadata")
        if f.startswith("manifest-")
    ]
    assert manifests
    for m in manifests:
        out = read_container(open(tmp_path / "metadata" / m, "rb").read())
        assert out["schema"]["name"] == "manifest_entry"
        assert out["codec"] == "deflate"
        for e in out["records"]:
            assert e["data_file"]["file_format"] == "PARQUET"


def test_partitioned_table_gates_loudly(tmp_path):
    w, _, _ = _make_table(tmp_path)
    v = int(open(tmp_path / "metadata" / "version-hint.text").read())
    meta_path = tmp_path / "metadata" / f"v{v}.metadata.json"
    meta = json.loads(meta_path.read_text())
    meta["partition-specs"] = [
        {"spec-id": 0,
         "fields": [{"name": "day", "transform": "day", "source-id": 1,
                     "field-id": 1000}]}
    ]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(NotImplementedError, match="partitioned"):
        snapshot_data_files(str(tmp_path))
    with pytest.raises(ValueError, match="not an Iceberg table"):
        snapshot_data_files(str(tmp_path / "nope"))
