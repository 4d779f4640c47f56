"""Batch source formats: csv/json round-trips with explicit schemas,
lakehouse stub degradation."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.sources.batch import load_file, load_table


def test_csv_and_json_round_trip(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    schema = "event_id long, user_id long, event_type string, value double"
    want = sorted(map(tuple, events.collect()))

    csv_dir = tempfile.mkdtemp(prefix="src_csv_")
    events.write.mode("overwrite").option("header", "true").csv(csv_dir)
    got_csv = sorted(
        map(tuple, load_file(spark, csv_dir, "csv", schema, header="true").collect())
    )
    assert got_csv == want

    json_dir = tempfile.mkdtemp(prefix="src_json_")
    events.write.mode("overwrite").json(json_dir)
    got_json = sorted(
        map(tuple, load_file(spark, json_dir, "json", schema).collect())
    )
    assert got_json == want


def test_csv_without_schema_is_rejected(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        load_file(spark, "/tmp/nowhere", "csv")


def test_lakehouse_stub_raises_actionable_error(spark):
    from kafka_spark_streaming_app_spark.sources.lakehouse import read_lakehouse

    for fmt in ("delta", "iceberg"):
        try:
            df = read_lakehouse(spark, "/tmp/nowhere", fmt)
        except RuntimeError as exc:
            assert "--packages" in str(exc)
        else:  # connector present in some future env
            assert df is not None
    with pytest.raises(ValueError, match="unknown lakehouse"):
        read_lakehouse(spark, "/tmp/x", "hudi-ish")


def test_avro_roundtrip_or_actionable_error(spark, sf_smoke):
    """Avro read/write round-trips when the spark-avro module is on
    the classpath, and degrades to a remediation error (never a raw
    ClassNotFoundException) when it is not."""
    import tempfile

    from kafka_spark_streaming_app_spark.sources.batch import load_table
    from kafka_spark_streaming_app_spark.sources.lakehouse import (
        read_avro,
        write_avro,
    )

    nation = load_table(spark, sf_smoke, "nation")
    out = tempfile.mkdtemp(prefix="avro_out_")
    try:
        write_avro(nation, out)
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        return
    back = read_avro(spark, out)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_wire_replay_batch_partitioned_generation(spark):
    """The custom Python DataSource must generate exactly its rows,
    partition-locally (random access, no prefix replay), and match the
    pure-python payload function."""
    import json

    from kafka_spark_streaming_app_spark.sources.pyds import (
        register_wire_replay,
        wire_order_at,
    )

    register_wire_replay(spark)
    df = (
        spark.read.format("wire_replay")
        .option("rows", 100)
        .option("numPartitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    got = sorted(
        (json.loads(r["value"]) for r in df.collect()),
        key=lambda o: o["order_id"],
    )
    want = sorted(
        (wire_order_at(i) for i in range(100)), key=lambda o: o["order_id"]
    )
    assert got == want


def test_wire_replay_stream_drains_in_micro_batches(spark):
    """The streaming face: offsets advance by rowsPerBatch up to the
    cap, processAllAvailable drains the finite stream, and every row
    arrives exactly once."""
    import uuid

    from kafka_spark_streaming_app_spark.sources.pyds import (
        register_wire_replay,
    )
    from kafka_spark_streaming_app_spark.streaming.pipeline import (
        write_memory_stream,
    )

    register_wire_replay(spark)
    stream = (
        spark.readStream.format("wire_replay")
        .option("rows", 500)
        .option("rowsPerBatch", 200)
        .option("numPartitions", 4)
        .load()
    )
    name = f"pyds_{uuid.uuid4().hex[:8]}"
    q = write_memory_stream(stream, name, output_mode="append")
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    out = spark.table(name)
    assert out.count() == 500
    assert out.select("value").distinct().count() == 500
    assert n_batches >= 3, f"expected >=3 non-empty micro-batches, got {n_batches}"


def test_orc_and_text_round_trip(spark, sf_smoke):
    """ORC round-trips with full type fidelity (columnar like parquet);
    the text source is the one-column raw-lines reader a corpus
    ingestion job starts from."""
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    want = sorted(map(tuple, events.collect()))

    orc_dir = tempfile.mkdtemp(prefix="src_orc_")
    events.write.mode("overwrite").orc(orc_dir)
    got_orc = sorted(map(tuple, load_file(spark, orc_dir, "orc").collect()))
    assert got_orc == want

    text_dir = tempfile.mkdtemp(prefix="src_text_")
    lines = events.select(
        F.concat_ws(
            "\t",
            F.col("event_id").cast("string"),
            F.col("event_type"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(text_dir)
    got_text = sorted(
        r["value"] for r in spark.read.text(text_dir).collect()
    )
    assert got_text == sorted(r["value"] for r in lines.collect())


def test_kafka_security_options_passthrough():
    """Generic SASL/TLS passthrough: values land verbatim under the
    connector's kafka. prefix; already-prefixed keys are kept as-is."""
    from kafka_spark_streaming_app_spark.sources.streams import (
        build_kafka_reader_options,
        kafka_security_options,
    )

    sec = kafka_security_options(
        security_protocol="SASL_SSL",
        sasl_mechanism="SCRAM-SHA-512",
        sasl_jaas_config="org.apache.kafka.common.security.scram.ScramLoginModule required;",
        extra={"ssl.truststore.location": "/tls/ts.jks", "kafka.ssl.protocol": "TLSv1.3"},
    )
    assert sec["kafka.security.protocol"] == "SASL_SSL"
    assert sec["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert sec["kafka.sasl.jaas.config"].endswith("required;")
    assert sec["kafka.ssl.truststore.location"] == "/tls/ts.jks"
    assert sec["kafka.ssl.protocol"] == "TLSv1.3"

    opts = build_kafka_reader_options(
        "broker:9096", "orders", options={"maxOffsetsPerTrigger": "500"},
        security=sec,
    )
    # defaults + subscribe survive, security lands verbatim, caller
    # overrides win last
    assert opts["kafka.bootstrap.servers"] == "broker:9096"
    assert opts["subscribe"] == "orders"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "500"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_producer_client_config_security():
    from kafka_spark_streaming_app_spark.tools.producer import (
        producer_client_config,
    )

    cfg = producer_client_config(
        "broker:9096",
        security_protocol="SASL_SSL",
        sasl_mechanism="PLAIN",
        sasl_username="svc",
        sasl_password="secret",
        extra={"request_timeout_ms": 30000},
    )
    assert cfg["bootstrap_servers"] == "broker:9096"
    assert cfg["acks"] == "all" and cfg["retries"] == 3
    assert cfg["security_protocol"] == "SASL_SSL"
    assert cfg["sasl_mechanism"] == "PLAIN"
    assert cfg["sasl_plain_username"] == "svc"
    assert cfg["sasl_plain_password"] == "secret"
    assert cfg["request_timeout_ms"] == 30000


def test_wire_replay_sink_batch_write_roundtrip(tmp_path, spark):
    """Batch writer face: two-phase commit (temp files renamed by the
    driver) — written rows read back exactly; overwrite truncates."""
    import json

    from kafka_spark_streaming_app_spark.sources.pyds import (
        register_wire_replay,
        wire_order_at,
    )

    register_wire_replay(spark)
    out = str(tmp_path / "wire_out")
    src = (
        spark.read.format("wire_replay")
        .option("rows", 60)
        .option("numPartitions", 3)
        .load()
    )
    src.write.format("wire_replay").option("path", out).mode("append").save()
    back = [json.loads(r["value"]) for r in spark.read.text(out).collect()]
    want = sorted(
        (wire_order_at(i) for i in range(60)), key=lambda o: o["order_id"]
    )
    assert sorted(back, key=lambda o: o["order_id"]) == want
    # no stray temp files survive commit
    assert not list(tmp_path.glob("wire_out/_tmp_*"))

    # overwrite replaces, never appends
    src.limit(0).write.format("wire_replay").option("path", out).mode(
        "overwrite"
    ).save()
    assert spark.read.text(out).count() == 0


def test_wire_replay_sink_rejects_wrong_schema(tmp_path, spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from kafka_spark_streaming_app_spark.sources.pyds import (
        register_wire_replay,
    )

    register_wire_replay(spark)
    df = spark.range(3).selectExpr("id AS not_value")
    with pytest.raises(Exception, match="value"):
        df.write.format("wire_replay").option(
            "path", str(tmp_path / "bad")
        ).mode("append").save()


def test_wire_replay_sink_streaming_exactly_once(tmp_path, spark):
    """Streaming writer face: the per-batch manifest commits each
    micro-batch once; a REPLAYED commit (same batchId) is discarded,
    so restarts cannot double-write."""
    import json
    import uuid

    from kafka_spark_streaming_app_spark.sources.pyds import (
        _WireCommit,
        _WireStreamWriter,
        register_wire_replay,
        wire_order_at,
    )

    register_wire_replay(spark)
    out = str(tmp_path / "stream_out")
    stream = (
        spark.readStream.format("wire_replay")
        .option("rows", 300)
        .option("rowsPerBatch", 100)
        .option("numPartitions", 2)
        .load()
    )
    q = (
        stream.writeStream.format("wire_replay")
        .option("path", out)
        .option(
            "checkpointLocation", str(tmp_path / f"ckpt_{uuid.uuid4().hex[:6]}")
        )
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = [
        json.loads(r["value"])
        for r in spark.read.text(out).filter("value != ''").collect()
    ]
    want = sorted(
        (wire_order_at(i) for i in range(300)), key=lambda o: o["order_id"]
    )
    assert sorted(back, key=lambda o: o["order_id"]) == want

    # replayed commit: same batchId again -> temp files discarded
    w = _WireStreamWriter({"path": out})

    class _Row:
        value = '{"replayed": true}'

    msg = w.write(iter([_Row()]))
    n_before = spark.read.text(out).count()
    with open(f"{out}/_batches.log") as f:
        replay_id = int(f.read().splitlines()[0])
    w.commit([msg], replay_id)
    assert spark.read.text(out).count() == n_before
    import glob

    assert not glob.glob(f"{out}/_tmp_*")


def test_csv_ingest_audit_matches_pandas(spark, sf_smoke):
    """csv_ingest_audit recomputed with pandas from the parquet events
    (same corruption rule): the Spark CSV reader's PERMISSIVE
    semantics — malformed field => row quarantined in _corrupt_record
    — must match the audit an engine that never saw the CSV derives.
    Also guards against a vacuous pass: the fixture must actually
    plant corrupt rows."""
    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    cents = (ev["value"] * 100).round()
    is_corrupt = (ev["event_id"] % 97 == 0) & ev["value"].notna()
    good = ~is_corrupt
    expected = (
        len(ev),
        int(is_corrupt.sum()),
        int((good & ev["user_id"].isna()).sum()),
        int(cents[good & ev["value"].notna()].sum()),
    )
    assert expected[1] > 0, "fixture planted no corrupt rows"

    [r] = registry.QUERIES["csv_ingest_audit"](spark, sf_smoke).collect()
    assert (r.n_rows, r.n_corrupt, r.n_null_user, r.sum_good_cents) == (
        expected
    )


def test_orc_roundtrip_agg_matches_parquet_twin(spark, sf_smoke):
    """The ORC round-trip aggregate equals the same aggregate computed
    straight off the parquet orders table — writer+reader lossless."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    registry.load_all()
    got = {
        r.o_orderpriority: (r.n_orders, r.revenue)
        for r in registry.QUERIES["orc_roundtrip_agg"](
            spark, sf_smoke
        ).collect()
    }
    twin = {
        r.o_orderpriority: (r.n, r.rev)
        for r in (
            load_table(spark, sf_smoke, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(
                    F.sum(
                        F.round(F.col("o_totalprice") * 100, 0).cast(
                            "bigint"
                        )
                    ).cast("double")
                    / 100.0,
                    2,
                ).alias("rev"),
            )
        ).collect()
    }
    assert got == twin
