"""Avro codec tests: the specification's own zigzag-varint examples
(independent of both coder directions), generic-reader subset
round-trips with both codecs, container tamper detection, and the
distributed Spark round-trip."""

import random

import pytest

from kafka_spark_streaming_app_spark.operators.avrocodec import (
    decode_long,
    decode_value,
    encode_long,
    encode_value,
    read_container,
    write_container,
)

_SCHEMA = {
    "type": "record",
    "name": "Rec",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"]},
    ],
}


def test_zigzag_varint_spec_examples():
    # the value/wire table printed in the Avro specification itself
    for n, wire in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"), (-65, b"\x81\x01"),
    ]:
        assert encode_long(n) == wire, n
        assert decode_long(wire, 0) == (n, len(wire))
    # 64-bit extremes survive
    for n in (2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert decode_long(encode_long(n), 0)[0] == n


def test_record_encoding_is_field_concatenation():
    rec = {"k": 1, "s": "ab", "d": 0.0, "b": True, "opt": None}
    wire = encode_value(rec, _SCHEMA)
    # long 1 -> 02 | string "ab" -> 04 61 62 | double 0.0 -> 8x00
    # | bool -> 01 | union branch 0 (null) -> 00
    assert wire == bytes(
        [0x02, 0x04, 0x61, 0x62] + [0] * 8 + [0x01, 0x00]
    )
    back, pos = decode_value(wire, 0, _SCHEMA)
    assert back == rec and pos == len(wire)


def test_container_roundtrip_both_codecs():
    rng = random.Random(7)
    recs = [
        {
            "k": rng.randint(-(10**15), 10**15),
            "s": "x" * rng.randint(0, 20),
            "d": rng.randint(-(10**6), 10**6) / 8.0,
            "b": rng.random() < 0.5,
            "opt": None if rng.random() < 0.5 else rng.randint(0, 99),
        }
        for _ in range(777)
    ]
    for codec in ("null", "deflate"):
        data = write_container(
            recs, _SCHEMA, bytes(range(16)), codec=codec,
            records_per_block=100,
        )
        out = read_container(data)
        assert out["records"] == recs
        assert out["codec"] == codec
        assert out["n_blocks"] == 8  # 7 full + 1 remainder
        assert out["schema"]["name"] == "Rec"
    # deflate must actually compress the redundant payload
    plain = write_container(recs, _SCHEMA, bytes(16), codec="null")
    packed = write_container(recs, _SCHEMA, bytes(16), codec="deflate")
    assert len(packed) < len(plain)


def test_container_tamper_detection():
    recs = [{"k": i, "s": "s", "d": 1.0, "b": False, "opt": None}
            for i in range(50)]
    data = bytearray(
        write_container(recs, _SCHEMA, bytes(range(16)), codec="null")
    )
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(data))
    with pytest.raises(ValueError, match="not an Avro"):
        read_container(b"PAR1" + bytes(32))


def test_unsupported_types_raise():
    with pytest.raises(NotImplementedError):
        encode_value(1.5, "float")
    with pytest.raises(ValueError):
        write_container([], _SCHEMA, b"short", codec="null")
    with pytest.raises(NotImplementedError):
        write_container([], _SCHEMA, bytes(16), codec="snappy")


def test_avro_roundtrip_agg_matches_direct_aggregate(spark, sf_smoke):
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    registry.load_all()
    got = {
        r.o_orderpriority: (r.n_orders, r.revenue)
        for r in registry.QUERIES["avro_roundtrip_agg"](
            spark, sf_smoke
        ).collect()
    }
    direct = {
        r.o_orderpriority: (r.n, round(r.cents / 100.0, 2))
        for r in load_table(spark, sf_smoke, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents"),
        )
        .collect()
    }
    assert got == {k: (n, float(rev)) for k, (n, rev) in direct.items()}


def test_dvcodec_public_vectors():
    """Z85 pinned to the ZeroMQ RFC 32 test vector; portable roaring
    roundtrips across container types incl. foreign run containers;
    RoaringBitmapArray carries 64-bit positions."""
    import struct

    from kafka_spark_streaming_app_spark.operators.dvcodec import (
        dv_deserialize,
        dv_inline,
        dv_positions,
        dv_serialize,
        roaring32_deserialize,
        roaring32_serialize,
        z85_decode,
        z85_encode,
    )

    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw
    for vals in ([], [0], [7, 65536 + 2], list(range(5000)),
                 list(range(0, 200000, 3))):
        enc = roaring32_serialize(vals)
        dec, end = roaring32_deserialize(enc)
        assert dec == sorted(set(vals)) and end == len(enc)
    # foreign run-container file (cookie 12347)
    runfile = (
        struct.pack("<HH", 12347, 0) + b"\x01"
        + struct.pack("<HH", 0, 10)
        + struct.pack("<H", 1) + struct.pack("<HH", 10, 10)
    )
    vals, _ = roaring32_deserialize(runfile)
    assert vals == list(range(10, 21))
    ps = [1, 3, (1 << 32) + 7, (1 << 33) + 1]
    assert dv_deserialize(dv_serialize(ps)) == sorted(ps)
    dv = dv_inline([5, 1, 3])
    assert dv["storageType"] == "i" and dv["cardinality"] == 3
    assert dv_positions(dv) == [1, 3, 5]
