"""TIFF codec tests: the PackBits specification's worked example (an
oracle independent of both coder directions), container round-trips
across byte orders / strip layouts / compression, malformed-input
guards, and the Spark end-to-end path."""

import random
import struct

import pytest

from kafka_spark_streaming_app_spark.operators.tiffcodec import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)

# The worked example from the PackBits specification (Apple TN1023):
# source row -> packed bytes, both directions pinned.
_PB_SRC = bytes(
    [0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
     0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
     0xAA, 0xAA, 0xAA, 0xAA]
)
_PB_PACKED = bytes(
    [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
     0x00, 0x2A, 0x22, 0xF7, 0xAA]
)


def test_packbits_spec_worked_example():
    assert packbits_encode(_PB_SRC) == _PB_PACKED
    assert packbits_decode(_PB_PACKED) == _PB_SRC


def test_packbits_edge_cases():
    assert packbits_encode(b"") == b""
    assert packbits_decode(b"") == b""
    # 128-marker is a decoder no-op
    assert packbits_decode(b"\x80\x00a") == b"a"
    # long run splits at 128
    run = b"z" * 300
    packed = packbits_encode(run)
    assert packbits_decode(packed) == run
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab")  # literal overruns
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe")  # repeat byte missing


def test_packbits_never_emits_the_noop_control():
    rng = random.Random(1)
    for _ in range(200):
        blob = bytes(rng.randrange(3) * 85 for _ in range(rng.randint(0, 400)))
        packed = packbits_encode(blob)
        # walk records: no control byte 0x80 may appear as a record head
        i = 0
        while i < len(packed):
            c = packed[i]
            assert c != 0x80
            i += (c + 2) if c < 128 else 2
        assert packbits_decode(packed) == blob


def test_container_roundtrip_both_endians_and_strips():
    rng = random.Random(4)
    for trial in range(60):
        w, h = rng.randint(1, 33), rng.randint(1, 25)
        px = [rng.randrange(256) for _ in range(w * h)]
        data = encode_tiff(
            px, w, h,
            big_endian=trial % 2 == 0,
            packbits=trial % 3 == 0,
            rows_per_strip=rng.choice([1, 3, 4, 1000]),
        )
        out = decode_tiff(data)
        assert out["pixels"] == px
        assert (out["width"], out["height"]) == (w, h)
        assert out["big_endian"] == (trial % 2 == 0)
        assert out["compression"] == (32773 if trial % 3 == 0 else 1)


def test_magic_and_unsupported_features_raise():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"GIF89a" + bytes(16))
    data = bytearray(encode_tiff([1, 2, 3, 4], 2, 2))
    # find the BitsPerSample entry (tag 258) and claim 16 bits
    (ifd_at,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_at)
    for i in range(n):
        at = ifd_at + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, at)
        if tag == 258:
            struct.pack_into("<H", data, at + 8, 16)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_tiff(bytes(data))


def test_synthesized_tiff_media_decodes(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _tiff_fixture,
        synthesize_tiff_media,
        tiff_pixel_stats,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(14)
    rows = tiff_pixel_stats(synthesize_tiff_media(docs)).collect()
    assert len(rows) == 14
    for r in rows:
        w, h, rps, px = _tiff_fixture(r["media_id"])
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_strips"] == (h + rps - 1) // rps
        assert r["compression"] == (32773 if r["media_id"] % 3 == 0 else 1)
        assert r["pixel_sum"] == sum(px)
        assert r["pixel_min"] == min(px)
        assert r["pixel_max"] == max(px)
