"""G.711 mu-law/A-law tests: exhaustive bit-exactness against
CPython's audioop (a foreign implementation derived from Sun's
g711.c; present through 3.12, so the comparison is import-gated),
hand-pinned code points, container round-trips through the WAV
walker, and the Spark end-to-end path."""

import struct
import warnings

import pytest

from kafka_spark_streaming_app_spark.operators.avcodec import (
    alaw_decode_sample,
    alaw_encode_sample,
    decode_wav,
    encode_wav_g711,
    g711_decode,
    g711_encode,
    parse_wav_header,
    ulaw_decode_sample,
    ulaw_encode_sample,
)

try:  # removed in Python 3.13
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
except ImportError:  # pragma: no cover
    audioop = None


def test_hand_pinned_code_points():
    # mu-law: byte 0xFF is +0 region (all bits set = smallest positive)
    assert ulaw_decode_sample(0xFF) == 0
    assert ulaw_decode_sample(0x7F) == -0
    # loudest codes: segment 7, mantissa 0
    assert ulaw_decode_sample(0x80) == 32124
    assert ulaw_decode_sample(0x00) == -32124
    # A-law: 0x55 decodes to -8 (xor mask kills all bits), 0xD5 to +8
    assert alaw_decode_sample(0x55) == -8
    assert alaw_decode_sample(0xD5) == 8
    assert alaw_decode_sample(0x2A) == -32256
    assert alaw_decode_sample(0xAA) == 32256
    # encode of silence
    assert ulaw_encode_sample(0) == 0xFF
    assert alaw_encode_sample(0) == 0xD5


@pytest.mark.skipif(audioop is None, reason="audioop removed (3.13+)")
def test_ulaw_bit_exact_vs_audioop_full_domain():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        for x in range(-32768, 32768, 7):  # stride keeps runtime sane
            ref = audioop.lin2ulaw(struct.pack("<h", x), 2)[0]
            assert ulaw_encode_sample(x) == ref, x
        # clip/boundary band exhaustively
        for x in list(range(-32768, -32700)) + list(range(-31700, -31500)):
            ref = audioop.lin2ulaw(struct.pack("<h", x), 2)[0]
            assert ulaw_encode_sample(x) == ref, x
        for u in range(256):
            ref = struct.unpack("<h", audioop.ulaw2lin(bytes([u]), 2))[0]
            assert ulaw_decode_sample(u) == ref, u


@pytest.mark.skipif(audioop is None, reason="audioop removed (3.13+)")
def test_alaw_bit_exact_vs_audioop_full_domain():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        for x in range(-32768, 32768, 7):
            ref = audioop.lin2alaw(struct.pack("<h", x), 2)[0]
            assert alaw_encode_sample(x) == ref, x
        for u in range(256):
            ref = struct.unpack("<h", audioop.alaw2lin(bytes([u]), 2))[0]
            assert alaw_decode_sample(u) == ref, u


def test_compand_roundtrip_is_identity_on_decode_outputs():
    """decode o encode is NOT identity (lossy), but encode o decode
    over all 256 code points must reproduce every byte — the decoder
    output is each segment's quantization midpoint."""
    for law in ("ulaw", "alaw"):
        dec = g711_decode(bytes(range(256)), law)
        re = g711_encode(dec, law)
        mismatches = [u for u in range(256) if re[u] != u]
        if law == "alaw":
            assert mismatches == []
        else:
            # the one degenerate mu-law code point: 0x7F is "negative
            # zero", decodes to 0, and re-encodes as the canonical
            # positive zero 0xFF (audioop collapses it identically)
            assert mismatches == [0x7F] and re[0x7F] == 0xFF


def test_wav_g711_container_roundtrip():
    payload = bytes((7 * i + 3) % 256 for i in range(501))  # odd length
    for law, code in (("ulaw", 7), ("alaw", 6)):
        wav = encode_wav_g711(payload, 8000, 1, law)
        hdr = parse_wav_header(wav)
        assert hdr["audio_format"] == code
        assert hdr["bit_depth"] == 8
        assert hdr["n_frames"] == 501  # word-align pad not counted
        samples, hdr2 = decode_wav(wav)
        assert samples.size == 501
        expect = g711_decode(payload, law)
        assert (samples == expect).all()


def test_wav_g711_rejects_unknown_format():
    wav = bytearray(encode_wav_g711(bytes(16), 8000, 1, "ulaw"))
    pos = wav.index(b"fmt ") + 8
    struct.pack_into("<H", wav, pos, 99)  # unknown codec id
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(wav))


def test_synthesized_g711_media_decodes(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        g711_audio_stats,
        synthesize_g711_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(12)
    rows = g711_audio_stats(synthesize_g711_media(docs)).collect()
    assert len(rows) == 12
    for r in rows:
        d = r["media_id"]
        n = d % 400 + 40
        law = "ulaw" if d % 2 == 0 else "alaw"
        dec = ulaw_decode_sample if law == "ulaw" else alaw_decode_sample
        vals = [dec((d * 7 + 31 * i) % 256) for i in range(n)]
        assert r["audio_format"] == (7 if d % 2 == 0 else 6)
        assert r["n_samples"] == n
        assert r["linear_sum"] == sum(vals)
        assert r["linear_min"] == min(vals)
        assert r["linear_max"] == max(vals)
        assert r["abs_sum"] == sum(abs(v) for v in vals)
        assert r["posw_sum"] == sum(v * (i % 17) for i, v in enumerate(vals))


# --------------------------------------------------------------------------
# IMA ADPCM
# --------------------------------------------------------------------------


def test_ima_step_hand_pinned_transitions():
    """State transitions worked out by hand from the IMA tables:
    step[0]=7; nibble 0 -> diff = 7>>3 = 0 and index -1 clamps to 0;
    nibble 7 -> diff = (7>>3) + (7>>2) + (7>>1) + 7 = 0+1+3+7 = 11 and
    index 0+8; nibble 15 -> same magnitude, negative sign."""
    from kafka_spark_streaming_app_spark.operators.avcodec import ima_step

    assert ima_step(100, 0, 0) == (100, 0)        # +0, idx clamps at 0
    assert ima_step(100, 0, 7) == (111, 8)        # +11, idx 0+8
    assert ima_step(100, 0, 15) == (89, 8)        # -11
    assert ima_step(32760, 20, 7) == (32767, 28)  # clamp high
    assert ima_step(-32760, 20, 15) == (-32768, 28)  # clamp low
    # index clamps at 88
    assert ima_step(0, 88, 4)[1] == 88


def test_ima_blocked_wire_equals_state_replay():
    """400 planted docs: container decode (blocks, headers, nibble
    order, fact cap) must equal the plain state-machine replay."""
    from kafka_spark_streaming_app_spark.operators.avcodec import (
        decode_wav_ima,
        encode_wav_ima,
        ima_step,
    )

    spb = (36 - 4) * 2 + 1
    for d in range(0, 1200, 3):
        n = d % 600 + 50
        pred, idx = d % 2001 - 1000, d % 89
        nibs = []
        expect = []
        j = 0
        for i in range(n):
            if i % spb == 0:
                expect.append(pred)
            else:
                nib = (d * 3 + 5 * j + (j * j) % 11) % 16
                nibs.append(nib)
                pred, idx = ima_step(pred, idx, nib)
                expect.append(pred)
                j += 1
        wav = encode_wav_ima(nibs, d % 2001 - 1000, d % 89, n, block_align=36)
        out, hdr = decode_wav_ima(wav)
        assert out == expect, d
        assert hdr["audio_format"] == 0x11 and hdr["bit_depth"] == 4


def test_ima_encoder_tracks_input_within_step_bound():
    """The real quantizer must track a random walk: reconstruction
    error stays within ~2x the largest per-sample move (measured 560
    for a +-300/sample walk; the bound guards against sign or
    step-adaptation regressions, not exact behavior)."""
    import random

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        ima_encode_sample,
        ima_step,
    )

    rng = random.Random(2)
    x = 0
    pred, idx = 0, 0
    worst = 0
    for _ in range(3000):
        x = max(-30000, min(30000, x + rng.randint(-300, 300)))
        nib = ima_encode_sample(pred, idx, x)
        pred, idx = ima_step(pred, idx, nib)
        worst = max(worst, abs(pred - x))
    assert worst < 700, worst


def test_ima_rejects_stereo_and_missing_fact():
    import struct as _s

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        decode_wav_ima,
        encode_wav_ima,
    )

    wav = bytearray(encode_wav_ima([1, 2, 3], 0, 0, 4, block_align=36))
    pos = wav.index(b"fmt ") + 8
    _s.pack_into("<H", wav, pos + 2, 2)  # claim stereo
    with pytest.raises(NotImplementedError, match="stereo"):
        decode_wav_ima(bytes(wav))
