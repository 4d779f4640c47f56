"""FLAC codec tests: public CRC check vectors, hand-derived Rice and
frame bitstreams (worked out on paper from the format spec —
independent of both the encoder and the decoder), tamper detection,
round-trip matrices over every subframe type / decorrelation mode,
and the Spark end-to-end path."""

import hashlib
import random
import struct

import pytest

from kafka_spark_streaming_app_spark.operators.flaccodec import (
    _crc8,
    _crc16,
    _MsbBitReader,
    _MsbBitWriter,
    _read_subframe,
    _read_utf8_coded_number,
    _utf8_coded_number,
    decode_flac,
    encode_flac,
)


def test_crc_public_check_vectors():
    # CRC-8 poly 0x07 init 0 ("CRC-8/SMBUS") and CRC-16 poly 0x8005
    # init 0 unreflected ("CRC-16/UMTS aka BUYPASS") standard checks.
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8
    assert _crc8(b"") == 0 and _crc16(b"") == 0


def test_utf8_coded_number_roundtrip_and_wire():
    assert _utf8_coded_number(0) == b"\x00"
    assert _utf8_coded_number(0x7F) == b"\x7f"
    # 0x80 needs two bytes: 110xxxxx 10xxxxxx
    assert _utf8_coded_number(0x80) == b"\xc2\x80"
    assert _utf8_coded_number(0x7FF) == b"\xdf\xbf"
    assert _utf8_coded_number(0x800) == b"\xe0\xa0\x80"
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20):
        r = _MsbBitReader(_utf8_coded_number(n))
        assert _read_utf8_coded_number(r) == n


def test_hand_derived_rice_subframe():
    """FIXED order 1 over samples [5, 7, 6, 9]: residuals [2, -1, 3],
    zigzag [4, 1, 6], k=2 -> quotients [1, 0, 1] (unary: q zeros then
    a 1) and remainders [0, 1, 2]. Bits derived on paper:
      0 001001 0 | 5 as 16-bit | 00 000 | 0010 | 01 00 | 1 01 | 01 10
    """
    w = _MsbBitWriter()
    w.write(0, 1)            # subframe pad
    w.write(0b001001, 6)     # FIXED order 1
    w.write(0, 1)            # no wasted bits
    w.write(5, 16)           # warmup
    w.write(0, 2)            # residual method: rice 4-bit
    w.write(0, 3)            # partition order 0
    w.write(2, 4)            # rice parameter k=2
    w.write(0b01, 2)         # u=4: q=1 unary
    w.write(0b00, 2)         #      rem 0
    w.write(0b1, 1)          # u=1: q=0 unary
    w.write(0b01, 2)         #      rem 1
    w.write(0b01, 2)         # u=6: q=1 unary
    w.write(0b10, 2)         #      rem 2
    w.byte_align()
    hand = w.getvalue()
    r = _MsbBitReader(hand)
    assert _read_subframe(r, 4, 16) == [5, 7, 6, 9]
    # and the encoder must produce these exact bytes for this subframe
    from kafka_spark_streaming_app_spark.operators.flaccodec import (
        _write_subframe,
    )

    w2 = _MsbBitWriter()
    _write_subframe(w2, [5, 7, 6, 9], 16, 1, 0, False)
    w2.byte_align()
    assert w2.getvalue() == hand


def test_hand_derived_verbatim_frame_bytes():
    """Mono [3, -2]: one short frame -> blocksize code 0b0111 with a
    16-bit (bs-1) field; header bytes derived on paper:
    FF F8 | 0111 0100 | 0000 100 0 | 00 | 00 01, then CRC-8, then the
    VERBATIM subframe 0x02 0x00 0x03 0xFF 0xFE, pad-free, then CRC-16.
    """
    data = encode_flac([[3, -2]], subframe_plan=lambda f, c: None)
    assert data[:4] == b"fLaC"
    si_len = int.from_bytes(data[5:8], "big")
    frame = data[8 + si_len :]
    hdr = bytes([0xFF, 0xF8, 0x74, 0x08, 0x00, 0x00, 0x01])
    assert frame[:7] == hdr
    assert frame[7] == _crc8(hdr)
    body = hdr + bytes([frame[7], 0x02, 0x00, 0x03, 0xFF, 0xFE])
    assert frame[8:13] == bytes([0x02, 0x00, 0x03, 0xFF, 0xFE])
    assert frame[13:15] == struct.pack(">H", _crc16(body))
    assert len(frame) == 15


def test_streaminfo_md5_is_spec_hash_of_interleaved_pcm():
    left = [100, -5, 7]
    right = [-100, 5, -7]
    data = encode_flac([left, right], channel_mode="independent")
    raw = b"".join(
        struct.pack("<h", v) for pair in zip(left, right) for v in pair
    )
    md5 = hashlib.md5(raw).digest()
    si = data[8 : 8 + int.from_bytes(data[5:8], "big")]
    assert si[18:34] == md5
    out = decode_flac(data)
    assert out["md5_ok"] and out["samples"] == [left, right]


def test_streaminfo_md5_respects_bit_depth():
    """Spec MD5 is over raw PCM at the stream's ACTUAL bit depth
    ((bps+7)//8 bytes/sample little-endian signed) — an 8-bit stream
    hashes 1 byte/sample, a 24-bit one 3; hardcoding 16-bit would
    reject a foreign-encoded 8-bit file with a spurious mismatch and
    crash on 24-bit."""
    for bps, nbytes, lo, hi in ((8, 1, -128, 127), (24, 3, -80000, 80000)):
        samples = [lo, 0, 7, hi, -1]
        data = encode_flac([samples], bps=bps, blocksize=256)
        raw = b"".join(
            v.to_bytes(nbytes, "little", signed=True) for v in samples
        )
        si = data[8 : 8 + int.from_bytes(data[5:8], "big")]
        assert si[18:34] == hashlib.md5(raw).digest()
        out = decode_flac(data)
        assert out["md5_ok"] and out["bps"] == bps
        assert out["samples"] == [samples]


def test_roundtrip_matrix():
    rng = random.Random(5)
    for trial in range(40):
        n = rng.choice([1, 7, 64, 256, 300, 777])
        nch = rng.choice([1, 2])
        chans = [
            [rng.randint(-4000, 4000) for _ in range(n)]
            for _ in range(nch)
        ]
        if trial % 13 == 0:
            chans = [[(trial * 7) % 201 - 100] * n for _ in range(nch)]
        if trial % 11 == 0:
            chans = [[s * 4 for s in c] for c in chans]
        mode = (
            rng.choice(
                ["independent", "left_side", "right_side", "mid_side"]
            )
            if nch == 2
            else "independent"
        )
        data = encode_flac(
            chans,
            channel_mode=mode,
            subframe_plan=lambda f, c, t=trial: (
                None if (f + c + t) % 6 == 0 else (f + c + t) % 6 - 1
            ),
            escape_first=(trial % 7 == 0),
        )
        out = decode_flac(data)
        assert out["samples"] == chans, (trial, mode)
        assert out["n_samples"] == n and out["channels"] == nch


def test_tampering_is_detected():
    data = bytearray(
        encode_flac([[17, -3, 250, 9]], subframe_plan=lambda f, c: 2)
    )
    si_len = int.from_bytes(data[5:8], "big")
    frame_at = 8 + si_len
    # flip a sample bit inside the frame body -> CRC-16 must trip
    tampered = bytearray(data)
    tampered[-3] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16|MD5"):
        decode_flac(bytes(tampered))
    # corrupt the frame header -> CRC-8 must trip
    tampered = bytearray(data)
    tampered[frame_at + 2] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(tampered))


def test_lpc_subframe_raises_not_implemented():
    w = _MsbBitWriter()
    w.write(0, 1)
    w.write(0b100000, 6)  # LPC order 1
    w.write(0, 1)
    w.write(0, 24)
    w.byte_align()
    with pytest.raises(NotImplementedError, match="LPC"):
        _read_subframe(_MsbBitReader(w.getvalue()), 4, 16)


def test_not_a_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFF\x00\x00\x00\x00")


def test_synthesized_flac_media_decodes(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _flac_fixture,
        flac_sample_stats,
        synthesize_flac_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(16)
    rows = flac_sample_stats(synthesize_flac_media(docs)).collect()
    by_key = {(r["media_id"], r["channel"]): r for r in rows}
    ids = {r["media_id"] for r in rows}
    assert len(ids) == 16
    for mid in ids:
        chans = _flac_fixture(mid)
        for ch, samples in enumerate(chans):
            r = by_key[(mid, ch)]
            assert r["n_channels"] == len(chans)
            assert r["n_samples"] == len(samples)
            assert r["sample_sum"] == sum(samples)
            assert r["sample_min"] == min(samples)
            assert r["sample_max"] == max(samples)
            assert r["abs_sum"] == sum(abs(v) for v in samples)
            assert r["posw_sum"] == sum(
                v * (i % 31) for i, v in enumerate(samples)
            )
