"""Kafka message format v2 (RecordBatch): spec-pinned frame layout,
CRC-32C against the public Castagnoli test vector, gzip compression,
Produce v3 / Fetch v4 over the wire broker, and the DataSource
recordFormat/compression options end-to-end through Spark."""

import gzip
import io
import struct

import pytest

from kafka_spark_streaming_app_spark.sources.kafkarecords import (
    crc32c,
    decode_record_batches,
    encode_record_batch,
    read_varint,
    write_varint,
)
from kafka_spark_streaming_app_spark.sources.minikafka import (
    MiniKafkaBroker,
    MiniKafkaClient,
)


@pytest.fixture()
def broker():
    b = MiniKafkaBroker()
    b.create_topic("t", partitions=2)
    yield b
    b.close()


def test_crc32c_public_test_vector():
    # RFC 3720 §B.4 check value for "123456789"
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 bytes of zeros -> 0x8A9136AA (iSCSI test vector)
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_zigzag_varint_roundtrip():
    for n in (0, -1, 1, -64, 63, 64, -65, 300, 2**31, -(2**31), 2**62):
        b = io.BytesIO()
        write_varint(n, b)
        got, pos = read_varint(b.getvalue(), 0)
        assert (got, pos) == (n, len(b.getvalue()))
    # zigzag mapping itself, spec examples: 0->0, -1->1, 1->2, -2->3
    for n, z in ((0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03")):
        b = io.BytesIO()
        write_varint(n, b)
        assert b.getvalue() == z


def test_record_batch_v2_layout_is_spec_exact():
    """One uncompressed record batch written out BY HAND from the
    spec (baseOffset | batchLength | partitionLeaderEpoch | magic 2 |
    crc32c | attributes | lastOffsetDelta | timestamps | producer
    fields | recordCount | records) must equal the encoder's bytes."""
    # record: length attrs tsDelta offDelta keyLen key valLen val hdrs
    record = (
        b"\x12"      # length 9 (zigzag 18)
        b"\x00"      # record attributes
        b"\x00"      # timestampDelta 0
        b"\x00"      # offsetDelta 0
        b"\x02k"     # key length 1, "k"
        b"\x04hi"    # value length 2, "hi"
        b"\x00"      # headers 0
    )
    tail = (
        struct.pack(">h", 0)       # attributes: no compression
        + struct.pack(">i", 0)     # lastOffsetDelta
        + struct.pack(">q", -1)    # baseTimestamp
        + struct.pack(">q", -1)    # maxTimestamp
        + struct.pack(">q", -1)    # producerId
        + struct.pack(">h", -1)    # producerEpoch
        + struct.pack(">i", -1)    # baseSequence
        + struct.pack(">i", 1)     # recordCount
        + record
    )
    head = struct.pack(">iBI", 0, 2, crc32c(tail))
    expected = struct.pack(">qi", 5, len(head) + len(tail)) + head + tail
    assert encode_record_batch([(b"k", b"hi")], base_offset=5) == expected
    assert decode_record_batches(expected) == [(5, b"k", b"hi")]


def test_gzip_batch_roundtrip_and_corruption():
    msgs = [(None, f"m{i}".encode() * 20) for i in range(50)]
    plain = encode_record_batch(msgs)
    packed = encode_record_batch(msgs, compression="gzip")
    assert len(packed) < len(plain)  # gzip actually engaged
    assert decode_record_batches(packed) == decode_record_batches(plain)
    # the compressed payload really is gzip: attributes bit set and
    # the records section carries the gzip magic
    attrs = struct.unpack_from(">h", packed, 21)[0]
    assert attrs & 0x07 == 1
    assert packed[61:63] == b"\x1f\x8b"
    bad = bytearray(packed)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32C"):
        decode_record_batches(bytes(bad))
    with pytest.raises(NotImplementedError, match="zstd"):
        encode_record_batch(msgs, compression="zstd")


def test_snappy_batch_roundtrip_xerial_framed():
    """compression=snappy: attributes codec bits = 2 and the records
    section carries snappy-java's xerial stream magic — exactly the
    bytes a JVM producer emits."""
    msgs = [(None, f"m{i}".encode() * 20) for i in range(50)]
    plain = encode_record_batch(msgs)
    packed = encode_record_batch(msgs, compression="snappy")
    assert len(packed) < len(plain)
    assert decode_record_batches(packed) == decode_record_batches(plain)
    attrs = struct.unpack_from(">h", packed, 21)[0]
    assert attrs & 0x07 == 2
    assert packed[61:69] == b"\x82SNAPPY\x00"


def test_snappy_codec_spec_vectors_and_real_interop():
    """The from-scratch snappy block codec against hand-built
    format_description.txt vectors AND the real C++ snappy bundled
    with pyarrow, both directions."""
    import pyarrow as pa

    from kafka_spark_streaming_app_spark.operators.snappycodec import (
        compress,
        decompress,
        kafka_compress,
        kafka_decompress,
    )

    # literal: varint(5) + tag(len-1 << 2) + payload
    assert decompress(bytes([5, 4 << 2]) + b"hello") == b"hello"
    # overlapping copy = RLE: literal 'a' + copy-2 offset 1 len 9
    assert (
        decompress(
            bytes([10, 0 << 2]) + b"a" + bytes([0b10 | (8 << 2), 1, 0])
        )
        == b"a" * 10
    )
    # copy-1 form (tag 01): len 4, 11-bit offset 4
    assert (
        decompress(
            bytes([8, 3 << 2]) + b"abcd" + bytes([0b01, 4])
        )
        == b"abcdabcd"
    )
    import random

    rng = random.Random(3)
    real = pa.Codec("snappy")
    for case in (
        b"", b"x", b"hello world " * 500,
        bytes(rng.randrange(256) for _ in range(50000)),
        b"ab" * 30000,
    ):
        assert decompress(compress(case)) == case
        assert kafka_decompress(kafka_compress(case)) == case
        # our decoder reads real snappy; real snappy reads ours
        assert decompress(real.compress(case, asbytes=True)) == case
        assert (
            real.decompress(
                compress(case), decompressed_size=len(case),
                asbytes=True,
            )
            == case
        )
    # corruption gates loudly
    with pytest.raises(ValueError, match="snappy"):
        decompress(bytes([200, 4 << 2]) + b"hello")


def test_produce_v3_fetch_v4_over_the_wire(broker):
    """The modern client shape: gzip RecordBatch up via Produce v3,
    RecordBatch down via Fetch v4 — and the SAME log still serves v0
    fetches (the broker's down-conversion contract)."""
    with MiniKafkaClient(broker.bootstrap) as c:
        base = c.produce_v2(
            "t", 0,
            [(b"k%d" % i, b"v%d" % i) for i in range(30)],
            compression="gzip",
        )
        assert base == 0
        assert c.produce_v2("t", 0, [(None, b"tail")]) == 30
        hw, msgs = c.fetch_records("t", 0, 0)
        assert hw == 31 and len(msgs) == 31
        assert msgs[0] == (0, b"k0", b"v0")
        assert msgs[-1] == (30, None, b"tail")
        # offset-addressed mid-log v4 read
        hw, mid = c.fetch_records("t", 0, 29)
        assert mid[0][0] == 29
        # v0 fetch serves the same data (format generations share the log)
        hw0, v0msgs = c.fetch("t", 0, 0)
        assert hw0 == 31 and [m[2] for m in v0msgs][:2] == [b"v0", b"v1"]
        # max_bytes pagination still returns at least one record
        _, one = c.fetch_records("t", 0, 0, max_bytes=1)
        assert len(one) == 1


def test_fetch_v4_hand_assembled_frame(broker):
    """Fetch v4 request assembled by hand from the spec; the response
    throttle/header/lso/aborted layout parsed by hand too."""
    import socket

    with MiniKafkaClient(broker.bootstrap) as c:
        c.produce_v2("t", 1, [(None, b"x"), (None, b"y")])
    frame = (
        struct.pack(">h", 1)        # api_key Fetch
        + struct.pack(">h", 4)      # api_version 4
        + struct.pack(">i", 99)     # correlation_id
        + struct.pack(">h", 1) + b"t"  # client_id
        + struct.pack(">i", -1)     # replica_id
        + struct.pack(">i", 0)      # max_wait_ms
        + struct.pack(">i", 0)      # min_bytes
        + struct.pack(">i", 1 << 20)  # max_bytes (v3+)
        + struct.pack(">b", 0)      # isolation_level (v4+)
        + struct.pack(">i", 1)      # 1 topic
        + struct.pack(">h", 1) + b"t"
        + struct.pack(">i", 1)      # 1 partition
        + struct.pack(">i", 1)      # partition 1
        + struct.pack(">q", 0)      # fetch_offset
        + struct.pack(">i", 1 << 20)  # partition max_bytes
    )
    with socket.create_connection(("127.0.0.1", broker.port)) as s:
        s.sendall(struct.pack(">i", len(frame)) + frame)
        (size,) = struct.unpack(">i", s.recv(4))
        resp = b""
        while len(resp) < size:
            resp += s.recv(size - len(resp))
    assert struct.unpack(">i", resp[:4])[0] == 99   # correlation echo
    assert struct.unpack(">i", resp[4:8])[0] == 0   # throttle_time v1+
    assert struct.unpack(">i", resp[8:12])[0] == 1  # 1 topic
    assert resp[12:15] == struct.pack(">h", 1) + b"t"
    assert struct.unpack(">i", resp[15:19])[0] == 1  # 1 partition
    pid, err, hw, lso, naborted = struct.unpack(">ihqqi", resp[19:45])
    assert (pid, err, hw, lso, naborted) == (1, 0, 2, 2, 0)
    (nbytes,) = struct.unpack(">i", resp[45:49])
    assert decode_record_batches(resp[49 : 49 + nbytes]) == [
        (0, None, b"x"), (1, None, b"y"),
    ]


def test_transactional_produce_gates_loudly(broker):
    """A v3 produce with a non-null transactional_id answers
    UNSUPPORTED_VERSION per partition (this broker keeps no
    producer-id state) instead of silently dropping txn semantics."""
    from kafka_spark_streaming_app_spark.sources.minikafka import (
        API_PRODUCE,
        _Writer,
    )

    batch = encode_record_batch([(None, b"x")])
    body = (
        _Writer()
        .string("txn-1")
        .i16(1)
        .i32(1000)
        .array(
            [("t", [(0, batch)])],
            lambda ww, t: ww.string(t[0]).array(
                t[1],
                lambda w2, p: w2.i32(p[0]).i32(len(p[1])).raw(p[1]),
            ),
        )
        .value()
    )
    with MiniKafkaClient(broker.bootstrap) as c:
        r = c._request(API_PRODUCE, body, version=3)
        [(_, [(_, err, _base, _lat)])] = r.array(
            lambda rr: (
                rr.string(),
                rr.array(
                    lambda r2: (r2.i32(), r2.i16(), r2.i64(), r2.i64())
                ),
            )
        )
        assert err == 35  # UNSUPPORTED_VERSION
        assert c.offsets("t", 0, -1) == 0  # nothing was appended


def _register(spark):
    from kafka_spark_streaming_app_spark.sources.minikafka_ds import (
        MiniKafkaDataSource,
    )

    try:
        spark.dataSource.register(MiniKafkaDataSource)
    except Exception:
        pass  # already registered in this session


def test_spark_reads_v2_record_batches(spark, broker):
    """recordFormat=v2: every Spark task fetches its offset range as
    RecordBatch v2 frames; rows identical to the v0 read."""
    _register(spark)
    with MiniKafkaClient(broker.bootstrap) as c:
        for p in (0, 1):
            c.produce_v2(
                "t", p,
                [(b"k%d" % i, b"p%d-%d" % (p, i)) for i in range(40)],
                compression="gzip",
            )
    read = lambda fmt: (
        spark.read.format("minikafka")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "t")
        .option("recordFormat", fmt)
        .load()
    )
    v2 = read("v2")
    rows = sorted(
        (r.partition, r.offset, bytes(r.value)) for r in v2.collect()
    )
    assert len(rows) == 80
    assert rows[0] == (0, 0, b"p0-0") and rows[-1] == (1, 39, b"p1-39")
    v0rows = sorted(
        (r.partition, r.offset, bytes(r.value))
        for r in read("v0").collect()
    )
    assert rows == v0rows
    with pytest.raises(Exception, match="recordFormat|v0\\|v2"):
        read("v9").collect()


def test_spark_sink_gzip_compression(spark, broker):
    """compression.type=gzip on the sink: rows ride Produce v3 gzip
    batches from executor tasks; readback (either format) matches."""
    _register(spark)
    df = spark.createDataFrame(
        [(f"key{i}", f"value-{i}" * 10, i % 2) for i in range(60)],
        "key string, value string, partition int",
    )
    (
        df.write.format("minikafka")
        .mode("append")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "t")
        .option("compression.type", "gzip")
        .save()
    )
    got = sorted(
        bytes(r.value).decode()
        for r in (
            spark.read.format("minikafka")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "t")
            .option("recordFormat", "v2")
            .load()
        ).collect()
    )
    assert got == sorted(f"value-{i}" * 10 for i in range(60))


def test_spark_sink_snappy_compression(spark, broker):
    """compression.type=snappy on the sink: rows ride Produce v3
    snappy (xerial) batches from executor tasks; readback matches —
    the default compression of real producers now round-trips over
    the wire."""
    _register(spark)
    df = spark.createDataFrame(
        [(f"key{i}", f"value-{i}" * 10, i % 2) for i in range(60)],
        "key string, value string, partition int",
    )
    (
        df.write.format("minikafka")
        .mode("append")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "t")
        .option("compression.type", "snappy")
        .save()
    )
    got = sorted(
        bytes(r.value).decode()
        for r in (
            spark.read.format("minikafka")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "t")
            .option("recordFormat", "v2")
            .load()
        ).collect()
    )
    assert got == sorted(f"value-{i}" * 10 for i in range(60))


def test_lz4_batch_roundtrip_frame_format():
    """compression=lz4: attributes codec bits = 3 and the records
    section opens with the lz4 frame magic — what modern clients
    emit."""
    msgs = [(None, f"m{i}".encode() * 20) for i in range(50)]
    plain = encode_record_batch(msgs)
    packed = encode_record_batch(msgs, compression="lz4")
    assert len(packed) < len(plain)
    assert decode_record_batches(packed) == decode_record_batches(plain)
    attrs = struct.unpack_from(">h", packed, 21)[0]
    assert attrs & 0x07 == 3
    assert packed[61:65] == b"\x04\x22\x4d\x18"  # frame magic LE


def test_lz4_codec_spec_vectors_and_real_interop():
    """The from-scratch lz4 block + frame codec and xxHash32 against
    spec vectors AND the real lz4 bundled with pyarrow (lz4_raw for
    blocks, lz4 for frames), both directions — including LINKED
    frames whose matches reach into prior blocks."""
    import random

    import pyarrow as pa

    from kafka_spark_streaming_app_spark.operators.lz4codec import (
        block_compress,
        block_decompress,
        frame_compress,
        frame_decompress,
        xxhash32,
    )

    # xxHash32 known-answer vectors
    assert xxhash32(b"") == 0x02CC5D05
    assert xxhash32(b"Hello World") == 0xB1FD16EE
    # hand-built block: token(lit_len=5, ml=0) + "hello" (last
    # sequence is literals-only per spec)
    assert block_decompress(bytes([5 << 4]) + b"hello") == b"hello"
    # RLE via overlapping match: 1 literal + offset-1 match of 8
    assert (
        block_decompress(
            bytes([(1 << 4) | (8 - 4)]) + b"a" + b"\x01\x00"
        )
        == b"a" * 9
    )
    rng = random.Random(21)
    raw = pa.Codec("lz4_raw")
    frame = pa.Codec("lz4")
    for case in (
        b"", b"x", b"hello world " * 500,
        bytes(rng.randrange(256) for _ in range(50000)),
        b"ab" * 40000,
        bytes(rng.randrange(4) for _ in range(200000)),
    ):
        assert block_decompress(block_compress(case)) == case
        assert frame_decompress(frame_compress(case)) == case
        assert (
            frame_decompress(
                frame_compress(case, content_checksum=False)
            )
            == case
        )
        if case:
            assert (
                block_decompress(raw.compress(case, asbytes=True))
                == case
            )
            assert (
                raw.decompress(
                    block_compress(case),
                    decompressed_size=len(case), asbytes=True,
                )
                == case
            )
        assert (
            frame_decompress(frame.compress(case, asbytes=True))
            == case
        )
        assert (
            frame.decompress(
                frame_compress(case),
                decompressed_size=len(case), asbytes=True,
            )
            == case
        )
    # corruption gates loudly: bad magic, bad header checksum,
    # bad content checksum
    with pytest.raises(ValueError, match="magic"):
        frame_decompress(b"\x00\x00\x00\x00rest")
    good = bytearray(frame_compress(b"payload " * 100))
    good[6] ^= 0xFF  # header checksum byte
    with pytest.raises(ValueError, match="header checksum"):
        frame_decompress(bytes(good))
    good2 = bytearray(frame_compress(b"payload " * 100))
    good2[-1] ^= 0xFF  # content checksum
    with pytest.raises(ValueError, match="content checksum"):
        frame_decompress(bytes(good2))


def test_spark_sink_lz4_compression(spark, broker):
    """compression.type=lz4 end-to-end over the wire through Spark."""
    _register(spark)
    df = spark.createDataFrame(
        [(f"key{i}", f"value-{i}" * 10, i % 2) for i in range(60)],
        "key string, value string, partition int",
    )
    (
        df.write.format("minikafka")
        .mode("append")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "t")
        .option("compression.type", "lz4")
        .save()
    )
    got = sorted(
        bytes(r.value).decode()
        for r in (
            spark.read.format("minikafka")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "t")
            .option("recordFormat", "v2")
            .load()
        ).collect()
    )
    assert got == sorted(f"value-{i}" * 10 for i in range(60))
