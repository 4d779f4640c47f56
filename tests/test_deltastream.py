"""deltastream source: version offsets, startingVersion semantics,
wave-incremental consumption, and the append-only gate."""

import pytest

from kafka_spark_streaming_app_spark.sources.deltastream_ds import (
    register_deltastream,
)


def _batch_df(spark, keys):
    return spark.createDataFrame(
        [(k, "F" if k % 2 else "O", "1-URGENT", k * 100) for k in keys],
        "o_orderkey long, o_orderstatus string, "
        "o_orderpriority string, cents long",
    ).coalesce(1)


def _commit(spark, d, keys, batch_id):
    from kafka_spark_streaming_app_spark.queries.formats import (
        _delta_stream_commit,
    )

    _delta_stream_commit(str(d), _batch_df(spark, keys), batch_id)


def test_streams_appends_in_waves(spark, tmp_path):
    """Waves committed WHILE the query runs each become their own
    micro-batch; startingVersion=0 replays history; the final state
    counts every row exactly once."""
    from pyspark.sql import functions as F

    _commit(spark, tmp_path, [1, 2], 0)
    register_deltastream(spark)
    raw = (
        spark.readStream.format("deltastream")
        .option("path", str(tmp_path))
        .option("startingVersion", "0")
        .load()
    )
    q = (
        raw.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("s"),
        )
        .writeStream.format("memory")
        .queryName("ds_sink")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        row = spark.table("ds_sink").collect()[0]
        assert (row.n, row.s) == (2, 3)
        _commit(spark, tmp_path, [3, 4, 5], 2)
        q.processAllAvailable()
        row = spark.table("ds_sink").collect()[0]
        assert (row.n, row.s) == (5, 15)
        # offsets advanced by VERSION
        import ast

        ends = [
            ast.literal_eval(p["sources"][0]["endOffset"])["version"]
            for p in q.recentProgress
            if p["sources"][0]["endOffset"]
        ]
        assert ends == sorted(ends) and ends[-1] == 1
    finally:
        q.stop()


def test_default_start_is_new_data_only(spark, tmp_path):
    """Without startingVersion the source starts at the table head —
    pre-existing history is NOT replayed (the real source's
    default)."""
    from pyspark.sql import functions as F

    _commit(spark, tmp_path, [1, 2, 3], 0)  # backlog
    register_deltastream(spark)
    raw = (
        spark.readStream.format("deltastream")
        .option("path", str(tmp_path))
        .load()
    )
    q = (
        raw.agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("ds_new_only")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("ds_new_only").collect()[0].n == 0
        _commit(spark, tmp_path, [4], 2)
        q.processAllAvailable()
        assert spark.table("ds_new_only").collect()[0].n == 1
    finally:
        q.stop()


def test_non_append_commit_gates_loudly(spark, tmp_path):
    """A deletion-vector commit inside the stream's range must fail
    the query with the append-only message, not silently skip."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.sources.deltalog import (
        delete_rows_by_position,
        snapshot_files,
    )

    _commit(spark, tmp_path, [1, 2], 0)
    register_deltastream(spark)
    raw = (
        spark.readStream.format("deltastream")
        .option("path", str(tmp_path))
        .load()
    )
    q = (
        raw.agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("ds_gate")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        (rel,) = snapshot_files(str(tmp_path))["files"]
        delete_rows_by_position(str(tmp_path), {rel: [0]})
        with pytest.raises(Exception, match="removes|append"):
            q.processAllAvailable()
            if q.exception():
                raise q.exception()
    finally:
        if q.isActive:
            q.stop()


# --- icebergstream: the Iceberg twin ------------------------------------------


def _iceberg_commit(spark, d, keys, batch_id, committer=None):
    from kafka_spark_streaming_app_spark.queries.formats import (
        _ICEBERG_SINK_FIELDS,
        _iceberg_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.iceberglog import (
        IcebergCommitter,
    )

    c = committer or IcebergCommitter(str(d), _ICEBERG_SINK_FIELDS)
    _iceberg_stream_commit(c, str(d), _batch_df(spark, keys), batch_id)
    return c


def test_icebergstream_waves_and_default_start(spark, tmp_path):
    """Snapshot-ordinal offsets: startingOrdinal=0 replays history,
    waves committed mid-query become their own micro-batches, and the
    DEFAULT start (no option) skips the backlog."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.sources.icebergstream_ds import (
        register_icebergstream,
    )

    c = _iceberg_commit(spark, tmp_path, [1, 2], 0)
    register_icebergstream(spark)
    raw = (
        spark.readStream.format("icebergstream")
        .option("path", str(tmp_path))
        .option("startingOrdinal", "0")
        .load()
    )
    q = (
        raw.agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .writeStream.format("memory")
        .queryName("is_sink")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        row = spark.table("is_sink").collect()[0]
        assert (row.n, row.s) == (2, 3)
        _iceberg_commit(spark, tmp_path, [3, 4, 5], 2, c)
        q.processAllAvailable()
        row = spark.table("is_sink").collect()[0]
        assert (row.n, row.s) == (5, 15)
    finally:
        q.stop()
    # default start: new appends only
    raw2 = (
        spark.readStream.format("icebergstream")
        .option("path", str(tmp_path))
        .load()
    )
    q2 = (
        raw2.agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("is_new_only")
        .outputMode("complete")
        .start()
    )
    try:
        q2.processAllAvailable()
        assert spark.table("is_new_only").collect()[0].n == 0
        _iceberg_commit(spark, tmp_path, [6], 4, c)
        q2.processAllAvailable()
        assert spark.table("is_new_only").collect()[0].n == 1
    finally:
        q2.stop()


def test_skip_change_commits_streams_past_deletes(tmp_path, spark):
    """skipChangeCommits (the real source's option): a compaction /
    delete commit in the range is ignored WHOLESALE (none of its adds
    stream) while later appends still arrive; without the option the
    same range gates loudly."""
    import pytest as _pytest

    from kafka_spark_streaming_app_spark.queries.formats import (
        _delta_stream_commit,
    )
    from kafka_spark_streaming_app_spark.sources.deltalog import (
        incremental_add_files,
    )
    from kafka_spark_streaming_app_spark.sources.deltastream_ds import (
        register_deltastream,
    )

    _delta_stream_commit(str(tmp_path), _batch_df(spark, [1, 2]), 0)
    # batch 1 appends AND compacts batch 0 (remove + re-add)
    _delta_stream_commit(str(tmp_path), _batch_df(spark, [3]), 1)
    _delta_stream_commit(str(tmp_path), _batch_df(spark, [4, 5]), 2)
    with _pytest.raises(NotImplementedError, match="skipChangeCommits"):
        incremental_add_files(str(tmp_path), 0)
    inc = incremental_add_files(
        str(tmp_path), 0, skip_change_commits=True
    )
    # the compaction commit contributes nothing; the pure append does
    assert all("batch-00002" in f for f in inc["files"])
    register_deltastream(spark)
    q = (
        spark.readStream.format("deltastream")
        .option("path", str(tmp_path))
        .option("startingVersion", 1)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("memory")
        .queryName("scc_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r.o_orderkey for r in spark.table("scc_sink").collect()
        )
        # commit 1 (the change commit) skipped wholesale; commit 2
        # streams
        assert got == [4, 5]
    finally:
        q.stop()
