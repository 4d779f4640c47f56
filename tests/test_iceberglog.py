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


def test_unsupported_transform_gates_only_when_filtered(tmp_path):
    """Iceberg data files always CONTAIN their source columns, so an
    unfiltered read of a table with any transform is well-defined;
    only a filter that must APPLY an unsupported transform (here
    ``day``) gates toward the jar-backed path. bucket/truncate
    filters are first-class (see the transform sink tests)."""
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
    snap = snapshot_data_files(str(tmp_path))  # unfiltered: fine
    assert snap["files"]
    assert snap["partition_spec"] == [
        {"name": "day", "source": "k", "transform": "day"}
    ]
    with pytest.raises(NotImplementedError, match="transform 'day'"):
        snapshot_data_files(
            str(tmp_path), partition_filter={"k": 1}
        )
    with pytest.raises(ValueError, match="not an Iceberg table"):
        snapshot_data_files(str(tmp_path / "nope"))


# --- streaming committer (the write path) -----------------------------------


def _batch_df(spark, keys):
    return spark.createDataFrame(
        [(k, "F" if k % 2 else "O", "1-URGENT", k * 100) for k in keys],
        "o_orderkey long, o_orderstatus string, "
        "o_orderpriority string, cents long",
    ).coalesce(1)


def _commit_batch(spark, tmp_path, committer, keys, batch_id):
    from kafka_spark_streaming_app_spark.queries.formats import (
        _iceberg_stream_commit,
    )

    _iceberg_stream_commit(
        committer, str(tmp_path), _batch_df(spark, keys), batch_id
    )


def test_committer_is_idempotent_and_carries_manifests(tmp_path, spark):
    """Replaying a batch id must not create a second snapshot; a new
    snapshot's manifest list must carry the prior live manifests
    forward (incremental commit, O(batch) not O(table))."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _commit_batch(spark, tmp_path, c, [1, 2], 0)
    v_after_0 = open(tmp_path / "metadata" / "version-hint.text").read()
    _commit_batch(spark, tmp_path, c, [1, 2], 0)  # replay
    assert open(tmp_path / "metadata" / "version-hint.text").read() == v_after_0
    _commit_batch(spark, tmp_path, c, [3, 4], 2)  # even: plain append
    snap = snapshot_data_files(str(tmp_path))
    df = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in df.collect()) == [1, 2, 3, 4]
    # two manifests live: batch 0's carried forward + batch 2's
    from kafka_spark_streaming_app_spark.operators.avrocodec import (
        read_container,
    )

    v = open(tmp_path / "metadata" / "version-hint.text").read().strip()
    meta = json.loads(
        open(tmp_path / "metadata" / f"v{v}.metadata.json").read()
    )
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    ml = read_container(open(cur["manifest-list"], "rb").read())
    names = sorted(
        os.path.basename(r["manifest_path"]) for r in ml["records"]
    )
    assert names == ["manifest-b00000.avro", "manifest-b00002.avro"]


def test_compaction_leaves_tombstone_decoys(tmp_path, spark):
    """An odd batch compacts its predecessor: the removed parquet
    stays ON DISK (naive listing double-counts) while the metadata
    tree excludes it; the superseded manifest drops from the list."""
    import glob

    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _commit_batch(spark, tmp_path, c, [1, 2], 0)
    _commit_batch(spark, tmp_path, c, [3], 1)  # compacts batch 0
    on_disk = glob.glob(str(tmp_path / "data" / "**" / "*.parquet"),
                        recursive=True)
    snap = snapshot_data_files(str(tmp_path))
    assert len(on_disk) > len(snap["files"])  # decoys present
    df = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in df.collect()) == [1, 2, 3]
    # batch 0's original files are all tombstoned
    assert not any("batch-00000/" in f for f in snap["files"])
    assert any("batch-00000-compacted/" in f for f in snap["files"])


def test_committer_data_path_is_executor_side(tmp_path, spark):
    """Micro-batch DATA must never be materialized on the driver:
    footers only (record counts), never rows."""
    from unittest import mock

    from pyspark.sql import DataFrame as _DF

    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    patches = [
        mock.patch.object(
            _DF, name,
            side_effect=AssertionError(
                f"driver materialization via DataFrame.{name} on the "
                "iceberg sink data path"
            ),
        )
        for name in ("toPandas", "collect", "toLocalIterator")
    ]
    with patches[0], patches[1], patches[2]:
        _commit_batch(spark, tmp_path, c, [1, 2, 3], 0)
        _commit_batch(spark, tmp_path, c, [4], 1)
    assert read_iceberg_snapshot(spark, str(tmp_path)).count() == 4


def test_expire_snapshots_removes_only_unreachable(tmp_path, spark):
    """expire_snapshots drops expired snapshots' manifest lists,
    superseded manifests, and data files not live in any retained
    snapshot (tombstone decoys included); the current snapshot reads
    back identically, expired ids gate loudly, and files carried
    forward survive."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        expire_snapshots,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _commit_batch(spark, tmp_path, c, [1, 2], 0)
    _commit_batch(spark, tmp_path, c, [3], 1)   # compacts batch 0
    _commit_batch(spark, tmp_path, c, [4], 2)
    ids_before = [
        s["snapshot-id"]
        for s in json.loads(
            open(_vhint_meta(tmp_path)).read()
        )["snapshots"]
    ]
    before = sorted(
        r.o_orderkey for r in
        read_iceberg_snapshot(spark, str(tmp_path)).collect()
    )
    res = expire_snapshots(str(tmp_path), keep=1)
    # batch 0's original files were only live in expired snapshots
    assert any("batch-00000/" in p for p in res["deleted"])
    after = sorted(
        r.o_orderkey for r in
        read_iceberg_snapshot(spark, str(tmp_path)).collect()
    )
    assert after == before == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="not in table metadata"):
        snapshot_data_files(str(tmp_path), ids_before[0])
    # idempotent second run deletes nothing further
    assert expire_snapshots(str(tmp_path), keep=1)["deleted"] == []


def _vhint_meta(tmp_path):
    v = open(tmp_path / "metadata" / "version-hint.text").read().strip()
    return tmp_path / "metadata" / f"v{v}.metadata.json"


def test_partitioned_sink_prunes_at_manifest_level(tmp_path, spark):
    """Identity-partitioned commits: manifest entries carry the
    partition struct, partition_filter shrinks the file list before
    Spark lists anything, data files keep their partition columns,
    and non-identity transforms gate loudly."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(
        str(tmp_path), _ICEBERG_SINK_FIELDS, ("o_orderstatus",)
    )
    for b, keys in enumerate(([1, 2, 3], [4, 5])):
        _iceberg_stream_commit(
            c, str(tmp_path), _batch_df(spark, keys), b,
            ("o_orderstatus",),
        )
        _iceberg_stream_commit(  # replay: no-op
            c, str(tmp_path), _batch_df(spark, keys), b,
            ("o_orderstatus",),
        )
    full = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in full.collect()) == [1, 2, 3, 4, 5]
    pruned = read_iceberg_snapshot(
        spark, str(tmp_path), partition_filter={"o_orderstatus": "F"}
    )
    assert sorted(r.o_orderkey for r in pruned.collect()) == [1, 3, 5]
    assert all("o_orderstatus=F" in f for f in pruned.inputFiles())
    fsnap = snapshot_data_files(
        str(tmp_path), partition_filter={"o_orderstatus": "F"}
    )
    assert fsnap["partition_fields"] == ["o_orderstatus"]
    assert 0 < len(fsnap["files"]) < len(
        snapshot_data_files(str(tmp_path))["files"]
    )
    with pytest.raises(ValueError, match="non-partition columns"):
        snapshot_data_files(
            str(tmp_path), partition_filter={"nope": "x"}
        )
    # bucket transforms are now first-class: a filter against a spec
    # rewritten to bucket[4] compares the TRANSFORMED value ("F"
    # buckets to 3), so the original identity struct values no longer
    # match and the pruned set is empty — transform-aware planning,
    # not a string compare against the source value
    meta_path = _vhint_meta(tmp_path)
    meta = json.loads(open(meta_path).read())
    meta["partition-specs"][0]["fields"][0]["transform"] = "bucket[4]"
    open(meta_path, "w").write(json.dumps(meta))
    bsnap = snapshot_data_files(
        str(tmp_path), partition_filter={"o_orderstatus": "F"}
    )
    assert bsnap["files"] == []
    assert bsnap["partition_spec"][0]["transform"] == "bucket[4]"


def test_partitioned_commit_is_one_fanout_write_job(tmp_path, spark):
    """The production shape: a partitioned commit runs exactly ONE
    distributed write (partitionBy fanout over derived columns), not
    one job per partition value — at a 1000-value partition column
    the per-value loop is a job-count scale-killer."""
    from unittest import mock

    from pyspark.sql.readwriter import DataFrameWriter

    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(
        str(tmp_path), _ICEBERG_SINK_FIELDS, ("o_orderstatus",)
    )
    real_parquet = DataFrameWriter.parquet
    calls = []

    def counting(self, path, **kw):
        calls.append(path)
        return real_parquet(self, path, **kw)

    with mock.patch.object(DataFrameWriter, "parquet", counting):
        _iceberg_stream_commit(
            c, str(tmp_path), _batch_df(spark, [1, 2, 3, 4, 5]), 0,
            ("o_orderstatus",),
        )
    assert len(calls) == 1  # one fanout job for both partition values
    snap = snapshot_data_files(str(tmp_path))
    structs = set()
    from kafka_spark_streaming_app_spark.operators.avrocodec import (
        read_container,
    )
    import glob as _glob

    for m in _glob.glob(str(tmp_path / "metadata" / "manifest-*.avro")):
        for e in read_container(open(m, "rb").read())["records"]:
            structs.add(tuple(sorted(e["data_file"]["partition"].items())))
    assert structs == {
        (("o_orderstatus", "F"),), (("o_orderstatus", "O"),),
    }
    assert len(snap["files"]) >= 2


def test_multicolumn_and_transform_partitions(tmp_path, spark):
    """Multi-column spec mixing identity, truncate[1] (Catalyst
    substring) and bucket[4] (vectorized Murmur3): one fanout write,
    manifest structs carry all three transformed values, and filters
    on ANY source column — alone or compound — prune at the manifest
    level with the transform applied to the predicate."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        bucket_value,
    )

    spec = (
        "o_orderstatus",                      # identity
        ("o_orderpriority", "truncate[1]"),   # "1-URGENT" -> "1"
        ("o_orderkey", "bucket[4]"),
    )
    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS, spec)
    assert [f["name"] for f in c.partition_spec_fields] == [
        "o_orderstatus", "o_orderpriority_trunc", "o_orderkey_bucket",
    ]
    assert [f["transform"] for f in c.partition_spec_fields] == [
        "identity", "truncate[1]", "bucket[4]",
    ]
    keys = list(range(1, 11))
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, keys), 0, spec
    )
    full = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in full.collect()) == keys
    # data files keep ALL source columns (Iceberg, not hive layout)
    assert set(full.columns) == {
        "o_orderkey", "o_orderstatus", "o_orderpriority", "cents",
    }
    # bucket predicate: filter on the SOURCE value; the reader
    # transforms it and prunes to exactly that bucket's files
    k = 7
    pruned = read_iceberg_snapshot(
        spark, str(tmp_path), partition_filter={"o_orderkey": k}
    )
    got = [r.o_orderkey for r in pruned.collect()]
    assert k in got
    assert all(
        bucket_value(g, 4) == bucket_value(k, 4) for g in got
    )
    fsnap = snapshot_data_files(
        str(tmp_path), partition_filter={"o_orderkey": k}
    )
    assert 0 < len(fsnap["files"]) < len(
        snapshot_data_files(str(tmp_path))["files"]
    )
    # compound predicate across all three transforms
    both = read_iceberg_snapshot(
        spark, str(tmp_path),
        partition_filter={
            "o_orderstatus": "F",
            "o_orderpriority": "1-URGENT",
            "o_orderkey": k,
        },
    )
    assert sorted(r.o_orderkey for r in both.collect()) == [
        g for g in got if g % 2 == 1
    ]
    # truncate predicate alone: everything shares prefix "1"
    t = snapshot_data_files(
        str(tmp_path), partition_filter={"o_orderpriority": "1-URGENT"}
    )
    assert t["files"] == snapshot_data_files(str(tmp_path))["files"]


def test_bounds_based_file_skipping(tmp_path, spark):
    """Manifest entries carry lower/upper bounds (field-id-keyed
    binary single-value serialization in Avro key/value-record
    arrays, per spec); a range data_filter prunes the file list at
    the manifest level; entries without bounds are never excluded."""
    import struct

    from kafka_spark_streaming_app_spark.operators.avrocodec import (
        read_container,
    )
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, list(range(0, 50))), 0
    )
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, list(range(50, 100))), 2
    )
    # the manifest's bounds are real binary single-value bytes
    m = read_container(
        open(tmp_path / "metadata" / "manifest-b00000.avro", "rb").read()
    )
    entry = m["records"][0]["data_file"]
    lows = {e["key"]: e["value"] for e in entry["lower_bounds"]}
    highs = {e["key"]: e["value"] for e in entry["upper_bounds"]}
    # field 1 = o_orderkey (long, 8-byte LE)
    assert struct.unpack("<q", lows[1])[0] == 0
    assert struct.unpack("<q", highs[1])[0] == 49
    # field 2 = o_orderstatus (string, UTF-8)
    assert lows[2] == b"F" and highs[2] == b"O"
    full = snapshot_data_files(str(tmp_path))
    pruned = snapshot_data_files(
        str(tmp_path), data_filter={"o_orderkey": (60, 70)}
    )
    assert 0 < len(pruned["files"]) < len(full["files"])
    df = read_iceberg_snapshot(
        spark, str(tmp_path), data_filter={"o_orderkey": (60, 70)}
    ).filter("o_orderkey BETWEEN 60 AND 70")
    assert df.count() == 11
    # string-typed bounds prune too
    s = snapshot_data_files(
        str(tmp_path), data_filter={"o_orderstatus": ("Z", None)}
    )
    assert s["files"] == []
    with pytest.raises(ValueError, match="unknown columns"):
        snapshot_data_files(
            str(tmp_path), data_filter={"nope": (1, 2)}
        )


def test_schema_evolution_metadata_only(tmp_path, spark):
    """Add-column evolution: fresh field ids, schema history kept,
    current-schema-id resolves, pre-evolution files read as null for
    the new column, and bounds on the new column use the NEW id."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    fields = [("o_orderkey", "long"), ("o_orderstatus", "string"),
              ("o_orderpriority", "string"), ("cents", "long")]
    c = IcebergCommitter(str(tmp_path), fields)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [1, 2]), 0)
    c.evolve_schema([("region", "string")])
    assert c.schema["schema-id"] == 1
    assert c.schema["fields"][-1] == {
        "id": 5, "name": "region", "required": False, "type": "string",
    }
    df5 = spark.createDataFrame(
        [(3, "F", "1-URGENT", 300, "EU"), (4, "O", "1-URGENT", 400, "US")],
        "o_orderkey long, o_orderstatus string, o_orderpriority string,"
        " cents long, region string",
    ).coalesce(1)
    _iceberg_stream_commit(c, str(tmp_path), df5, 2)
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    assert meta["current-schema-id"] == 1
    assert [s["schema-id"] for s in meta["schemas"]] == [0, 1]
    df = read_iceberg_snapshot(spark, str(tmp_path))
    rows = {r.o_orderkey: r.region for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "EU", 4: "US"}
    # bounds for the evolved column key on the fresh field id
    pruned = snapshot_data_files(
        str(tmp_path), data_filter={"region": ("A", "F")}
    )
    # pre-evolution file has no region bounds -> kept; the evolved
    # file's [EU, US] overlaps [A, F]... EU <= F so kept too; tighten:
    gone = snapshot_data_files(
        str(tmp_path), data_filter={"region": ("A", "B")}
    )
    assert len(gone["files"]) < len(pruned["files"])


def test_incremental_append_scan_and_gates(tmp_path, spark):
    """added_snapshot_id-driven manifest selection: (from, to] yields
    exactly the appended rows; a compaction snapshot in the range
    gates loudly; ranges before it still read."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        incremental_append_files,
        read_iceberg_incremental,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [1, 2]), 0)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [3]), 2)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [4]), 4)
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    s0, s1, s2 = [s["snapshot-id"] for s in meta["snapshots"]]
    inc = read_iceberg_incremental(spark, str(tmp_path), s0)
    assert sorted(r.o_orderkey for r in inc.collect()) == [3, 4]
    mid = read_iceberg_incremental(spark, str(tmp_path), s0, s1)
    assert sorted(r.o_orderkey for r in mid.collect()) == [3]
    assert read_iceberg_incremental(
        spark, str(tmp_path), s2, s2
    ).count() == 0
    with pytest.raises(ValueError, match="not in table"):
        incremental_append_files(str(tmp_path), 999)
    # odd batch 5 compacts batch 4 -> overwrite snapshot in range
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [5]), 5)
    with pytest.raises(NotImplementedError, match="overwrite"):
        incremental_append_files(str(tmp_path), s0)
    ok = incremental_append_files(str(tmp_path), s0, s2)
    assert len(ok["files"]) == 2


def test_position_deletes_merge_on_read(tmp_path, spark):
    """Format v2 position deletes: the delete commit rewrites NO data
    file (on-disk parquet untouched), the reader anti-joins the
    (file_path, pos) pairs against the hidden row index, incremental
    append scans gate across the delete snapshot, and equality
    deletes (content=2) gate loudly."""
    import glob as _glob

    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        incremental_append_files,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, list(range(10))), 0
    )
    snap0 = snapshot_data_files(str(tmp_path))
    (data_file,) = snap0["files"]
    before = open(data_file, "rb").read()
    # delete rows at positions 1,3,5 (orderkeys 1,3,5 — coalesce(1)
    # keeps insertion order)
    entry = c.position_delete_entry(
        "pd-0.parquet", [(data_file, 1), (data_file, 3), (data_file, 5)]
    )
    c.commit(2, [entry], operation="delete")
    assert open(data_file, "rb").read() == before  # untouched
    snap = snapshot_data_files(str(tmp_path))
    assert snap["files"] == [data_file]
    assert len(snap["delete_files"]) == 1
    df = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in df.collect()) == [
        0, 2, 4, 6, 7, 8, 9,
    ]
    # the delete snapshot is not an append: incremental gates
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    s0 = meta["snapshots"][0]["snapshot-id"]
    with pytest.raises(NotImplementedError, match="delete"):
        incremental_append_files(str(tmp_path), s0)
    # time travel to the pre-delete snapshot still sees all rows
    assert read_iceberg_snapshot(spark, str(tmp_path), s0).count() == 10
    # equality deletes gate loudly
    m = _vhint_meta(tmp_path)
    # forge a content=2 entry by rewriting the delete entry's content
    from kafka_spark_streaming_app_spark.operators.avrocodec import (
        read_container,
        write_container,
    )

    dm = [
        p for p in _glob.glob(str(tmp_path / "metadata" / "manifest-*"))
        if "b00002" in p
    ][0]
    out = read_container(open(dm, "rb").read())
    out["records"][0]["data_file"]["content"] = 2
    open(dm, "wb").write(
        write_container(
            out["records"], out["schema"], bytes(range(16)),
            codec="deflate",
        )
    )
    # a content=2 entry WITHOUT equality_ids is malformed: loud error
    with pytest.raises(ValueError, match="equality_ids"):
        snapshot_data_files(str(tmp_path))
    # partitioned tables gate the delete writer itself
    cp = IcebergCommitter(
        str(tmp_path) + "_p", _ICEBERG_SINK_FIELDS, ("o_orderstatus",)
    )
    with pytest.raises(NotImplementedError, match="partitioned"):
        cp.position_delete_entry("x.parquet", [("f", 0)])


def test_changelog_inserts_deletes_and_gates(tmp_path, spark):
    """iceberg_changelog: appends are inserts, delete snapshots emit
    only NEWLY-deleted positions, windowed ranges work, rewrite
    snapshots gate."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        iceberg_changelog,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [1, 2]), 0)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [3, 4]), 2)
    snap = snapshot_data_files(str(tmp_path))
    f0 = sorted(snap["files"])[0]  # batch-00000 file (keys 1,2)
    e1 = c.position_delete_entry("pd-1.parquet", [(f0, 0)])  # key 1
    c.commit(4, [e1], operation="delete")
    # re-deleting key 1 plus newly deleting key 2
    e2 = c.position_delete_entry("pd-2.parquet", [(f0, 0), (f0, 1)])
    c.commit(6, [e2], operation="delete")
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    s = [x["snapshot-id"] for x in meta["snapshots"]]
    feed = iceberg_changelog(spark, str(tmp_path), s[0])
    got = sorted(
        (r._snapshot_id, r._change_type, r.o_orderkey)
        for r in feed.collect()
    )
    assert got == [
        (s[1], "insert", 3), (s[1], "insert", 4),
        (s[2], "delete", 1),
        (s[3], "delete", 2),   # key 1's re-delete is NOT repeated
    ]
    # windowed: only the second delete snapshot
    tail = iceberg_changelog(spark, str(tmp_path), s[2], s[3])
    assert [(r._change_type, r.o_orderkey) for r in tail.collect()] == [
        ("delete", 2)
    ]
    assert iceberg_changelog(spark, str(tmp_path), s[3], s[3]).count() == 0
    # a compaction snapshot gates
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [5]), 8)
    _iceberg_stream_commit(c, str(tmp_path), _batch_df(spark, [6]), 9)
    with pytest.raises(NotImplementedError, match="jar-backed"):
        iceberg_changelog(spark, str(tmp_path), s[0]).collect()
    assert iceberg_changelog(spark, str(tmp_path), s[0], s[3]).count() == 4


def test_v2_metadata_sequence_numbers_and_manifest_split(
    tmp_path, spark
):
    """IcebergCommitter emits format-version 2: last-sequence-number
    advances per commit, each snapshot records its sequence-number,
    a position-delete commit's manifest rides the manifest list with
    content=1 (v2 forbids mixing data and delete files in one
    manifest), and carried pre-v2 rows migrate with sequence 0."""
    from kafka_spark_streaming_app_spark.operators.avrocodec import (
        read_container,
    )
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, [1, 2, 3]), 0
    )
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 0
    assert meta["snapshots"][0]["sequence-number"] == 0
    (data_file,) = snapshot_data_files(str(tmp_path))["files"]
    entry = c.position_delete_entry("pd-0.parquet", [(data_file, 0)])
    c.commit(2, [entry], operation="delete")
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    assert meta["last-sequence-number"] == 1
    assert meta["snapshots"][-1]["sequence-number"] == 1
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    rows = read_container(
        open(cur["manifest-list"], "rb").read()
    )["records"]
    by_content = {r["content"]: r for r in rows}
    assert set(by_content) == {0, 1}
    assert by_content[1]["sequence_number"] == 1
    assert by_content[1]["min_sequence_number"] == 1
    assert by_content[0]["sequence_number"] == 0
    # the delete manifest holds ONLY content=1 entries
    dm = read_container(
        open(by_content[1]["manifest_path"], "rb").read()
    )["records"]
    assert all(e["data_file"]["content"] == 1 for e in dm)
    got = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in got.collect()) == [2, 3]


def test_int_bounds_are_four_bytes(tmp_path):
    """Iceberg single-value serialization: int bounds are 4-byte LE
    (the spec), long stays 8; unparseable foreign bounds keep the
    file instead of crashing the scan."""
    import struct

    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        _bound_from_bytes,
        _bound_to_bytes,
        _bounds_exclude,
    )

    assert _bound_to_bytes(7, "int") == struct.pack("<i", 7)
    assert _bound_to_bytes(7, "long") == struct.pack("<q", 7)
    assert _bound_from_bytes(struct.pack("<i", -3), "int") == -3
    # pre-fix tables stored int bounds as 8 bytes: still readable
    assert _bound_from_bytes(struct.pack("<q", 9), "int") == 9
    ntf = {"k": {"id": 1, "name": "k", "type": "int"}}
    df = {
        "lower_bounds": [{"key": 1, "value": b"\x01\x02\x03"}],
        "upper_bounds": [{"key": 1, "value": b"\x01\x02\x03"}],
    }
    # 3-byte garbage bounds: keep the file (prune-only contract)
    assert _bounds_exclude(df, {"k": (100, 200)}, ntf) is False
    ok = {
        "lower_bounds": [{"key": 1, "value": struct.pack("<i", 1)}],
        "upper_bounds": [{"key": 1, "value": struct.pack("<i", 5)}],
    }
    assert _bounds_exclude(ok, {"k": (100, 200)}, ntf) is True
    assert _bounds_exclude(ok, {"k": (3, 4)}, ntf) is False


def test_null_partition_value_roundtrip(tmp_path, spark):
    """Null partition source values: the fanout write spells them
    __HIVE_DEFAULT_PARTITION__, the manifest struct must record the
    NULL consistently with the reader's transform of a None filter
    value (spec: every transform maps null to null), so null-keyed
    partitions stay prunable."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = IcebergCommitter(
        str(tmp_path), _ICEBERG_SINK_FIELDS, ("o_orderstatus",)
    )
    df = spark.createDataFrame(
        [(1, "F", "p", 100), (2, None, "p", 200), (3, None, "p", 300)],
        "o_orderkey long, o_orderstatus string, "
        "o_orderpriority string, cents long",
    ).coalesce(1)
    _iceberg_stream_commit(
        c, str(tmp_path), df, 0, partition_by=("o_orderstatus",)
    )
    full = read_iceberg_snapshot(spark, str(tmp_path))
    assert sorted(r.o_orderkey for r in full.collect()) == [1, 2, 3]
    pruned = read_iceberg_snapshot(
        spark, str(tmp_path),
        partition_filter={"o_orderstatus": None},
    )
    assert sorted(r.o_orderkey for r in pruned.collect()) == [2, 3]
    fsnap = snapshot_data_files(
        str(tmp_path), partition_filter={"o_orderstatus": None}
    )
    all_files = snapshot_data_files(str(tmp_path))["files"]
    assert 0 < len(fsnap["files"]) < len(all_files)


def test_bucket_str_array_matches_scalar_and_spec(tmp_path, spark):
    """The vectorized string bucket (masked uint32 Murmur3 sweeps)
    must agree with the scalar spec implementation on the Iceberg
    Appendix-B string vector and on arbitrary lengths/scripts, and
    the string-bucket fanout sink must stay prunable end-to-end."""
    import random
    import string as _string

    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        bucket_str_array,
        bucket_value,
        murmur3_32,
    )

    # spec Appendix B: murmur3 of UTF-8 "iceberg" == 1210000089
    assert murmur3_32("iceberg".encode()) == 1210000089
    cases = ["iceberg", "", "a", "abc", "abcd", "ü", "日本語", "x" * 99]
    rng = random.Random(12)
    for _ in range(200):
        cases.append(
            "".join(
                rng.choice(_string.printable + "éü語")
                for _ in range(rng.randrange(0, 40))
            )
        )
    got = bucket_str_array([c.encode() for c in cases], 16)
    assert list(got) == [bucket_value(c, 16) for c in cases]
    # end-to-end: string bucket[N] partitioned sink prunes by source
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        snapshot_data_files,
    )

    c = IcebergCommitter(
        str(tmp_path), _ICEBERG_SINK_FIELDS,
        (("o_orderpriority", "bucket[4]"),),
    )
    df = spark.createDataFrame(
        [(k, "F", p, k * 100) for k, p in
         [(1, "1-URGENT"), (2, "2-HIGH"), (3, "3-MEDIUM"),
          (4, "4-LOW"), (5, "5-NONE")]],
        "o_orderkey long, o_orderstatus string, "
        "o_orderpriority string, cents long",
    ).coalesce(1)
    _iceberg_stream_commit(
        c, str(tmp_path), df, 0,
        partition_by=(("o_orderpriority", "bucket[4]"),),
    )
    full = snapshot_data_files(str(tmp_path))["files"]
    pruned = snapshot_data_files(
        str(tmp_path),
        partition_filter={"o_orderpriority": "1-URGENT"},
    )["files"]
    assert 0 < len(pruned) < len(full)
    got_rows = read_iceberg_snapshot(
        spark, str(tmp_path),
        partition_filter={"o_orderpriority": "1-URGENT"},
    ).collect()
    assert {r.o_orderpriority for r in got_rows} >= {"1-URGENT"}


def test_equality_deletes_merge_on_read(tmp_path, spark):
    """content=2 EQUALITY deletes: a delete file carrying VALUES for
    its equality_ids columns removes every matching row from data
    files with a strictly LOWER sequence number — later appends are
    untouched (spec scoping); merges with position deletes compose;
    the changelog gates loudly on equality-delete snapshots."""
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
        iceberg_changelog,
        incremental_append_files,
    )

    c = IcebergCommitter(str(tmp_path), _ICEBERG_SINK_FIELDS)
    # batch 0: keys 1..6 (odd = F, even = O)
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, [1, 2, 3, 4, 5, 6]), 0
    )
    e = c.equality_delete_entry(
        "eq-0.parquet", [{"o_orderstatus": "F"}], ["o_orderstatus"]
    )
    c.commit(2, [e], operation="delete")
    got = sorted(
        r.o_orderkey
        for r in read_iceberg_snapshot(spark, str(tmp_path)).collect()
    )
    assert got == [2, 4, 6]  # odd (F) rows deleted
    # an append AFTER the delete (higher sequence) is untouched,
    # including rows that would match the equality predicate
    _iceberg_stream_commit(
        c, str(tmp_path), _batch_df(spark, [7, 8]), 4
    )
    got2 = sorted(
        r.o_orderkey
        for r in read_iceberg_snapshot(spark, str(tmp_path)).collect()
    )
    assert got2 == [2, 4, 6, 7, 8]  # key 7 is F but survives
    # equality + position deletes compose
    snap = snapshot_data_files(str(tmp_path))
    f_new = sorted(
        p for p in snap["files"] if snap["file_seqs"][p] == 2
    )[0]
    pe = c.position_delete_entry("pd-0.parquet", [(f_new, 0)])
    c.commit(6, [pe], operation="delete")
    got3 = sorted(
        r.o_orderkey
        for r in read_iceberg_snapshot(spark, str(tmp_path)).collect()
    )
    assert got3 == [2, 4, 6, 8]
    # delete snapshots gate incremental append scans
    meta = json.loads(open(_vhint_meta(tmp_path)).read())
    s0 = meta["snapshots"][0]["snapshot-id"]
    with pytest.raises(NotImplementedError, match="delete"):
        incremental_append_files(str(tmp_path), s0)
    # changelog gates loudly across the equality-delete snapshot
    with pytest.raises(NotImplementedError, match="equality"):
        iceberg_changelog(spark, str(tmp_path), s0).collect()
    # unknown equality column gates at write time
    with pytest.raises(ValueError, match="not in schema"):
        c.equality_delete_entry("eq-x.parquet", [], ["ghost"])
    # partitioned tables gate the writer
    cp = IcebergCommitter(
        str(tmp_path) + "_p", _ICEBERG_SINK_FIELDS, ("o_orderstatus",)
    )
    with pytest.raises(NotImplementedError, match="partitioned"):
        cp.equality_delete_entry("x.parquet", [], ["o_orderstatus"])
