"""Multimodal plumbing: stubbed decode contract, deterministic fake,
Arrow batch shapes, row expansion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.multimodal import (
    decode_payload,
    extract_features,
    sample_frames,
    synthesize_media,
)
from kafka_spark_streaming_app_spark.sources.batch import load_table


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload(b"abc", "image")


def test_fake_decode_is_deterministic_and_shaped():
    img1 = decode_payload(b"same-bytes", "image", fake=True)
    img2 = decode_payload(b"same-bytes", "image", fake=True)
    assert (img1 == img2).all()
    assert img1.shape == (16, 16) and img1.dtype.name == "uint8"
    audio = decode_payload(b"x", "audio", fake=True)
    assert audio.shape == (256,) and audio.dtype.name == "int16"
    video = decode_payload(b"x", "video", fake=True)
    assert video.shape == (4, 8, 8)
    assert (decode_payload(b"other", "image", fake=True) != img1).any()


def test_feature_extraction_batch_shape(spark, sf_smoke):
    media = synthesize_media(load_table(spark, sf_smoke, "documents"))
    feats = extract_features(media, num_bins=16)
    rows = feats.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert len(r["histogram"]) == 16
    assert sum(r["histogram"]) == r["n_bytes"]
    assert 0.0 <= r["byte_mean"] <= 255.0


def test_feature_extraction_survives_repartition(spark, sf_smoke):
    """Multiple Arrow batches / partitions must not change results."""
    media = synthesize_media(load_table(spark, sf_smoke, "documents"))
    one = {
        r["media_id"]: r["byte_mean"]
        for r in extract_features(media.coalesce(1)).collect()
    }
    many = {
        r["media_id"]: r["byte_mean"]
        for r in extract_features(media.repartition(16)).collect()
    }
    assert one == many


def test_frame_sampling_expands_video_rows(spark, sf_smoke):
    media = synthesize_media(load_table(spark, sf_smoke, "documents"))
    frames = sample_frames(media, every_n=2)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    expected = {
        r["media_id"]: (int(r["n_frames"]) + 1) // 2
        for r in media.filter(F.col("media_type") == "video")
        .select("media_id", F.col("meta.n_frames").alias("n_frames"))
        .collect()
    }
    assert {r["media_id"]: r["n"] for r in got} == expected
    # frame payloads are non-empty deterministic slices
    sample = frames.limit(5).collect()
    assert all(len(r["frame_payload"]) > 0 for r in sample)


def test_resize_images_contract(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import resize_images

    media = synthesize_media(load_table(spark, sf_smoke, "documents"))
    resized = resize_images(media, width=8, height=4)
    rows = resized.collect()
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    assert all(len(r["pixels"]) == 8 * 4 for r in rows)
    # deterministic: same payload -> same pixels
    again = {r["media_id"]: r["pixels"] for r in resize_images(media, 8, 4).collect()}
    assert {r["media_id"]: r["pixels"] for r in rows} == again


# --- real PNG/JPEG codec (operators/imagecodec.py) ----------------------


def test_png_roundtrip_and_header():
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_png,
        encode_png,
        parse_image_header,
        parse_png_header,
    )

    img = ((np.arange(16 * 24).reshape(16, 24) * 7 + 3) % 256).astype(
        np.uint8
    )
    data = encode_png(img)
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    hdr = parse_png_header(data)
    assert hdr == {
        "format": "png", "width": 24, "height": 16,
        "bit_depth": 8, "channels": 1,
    }
    assert (decode_png(data) == img).all()
    assert parse_image_header(data)["format"] == "png"


def test_png_decoder_handles_all_filter_types():
    """The decoder must round-trip PNGs from ANY conformant encoder —
    re-filter the same image with Sub/Up/Average/Paeth scanlines and
    assert identical reconstruction."""
    import struct
    import zlib

    import numpy as np

    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    img = ((np.arange(12 * 17).reshape(12, 17) * 31 + 5) % 256).astype(
        np.uint8
    )

    def encode_with_filters(arr, ftypes):
        h, w = arr.shape
        raw = bytearray()
        prev = bytes(w)
        for y in range(h):
            ft = ftypes[y % len(ftypes)]
            line = arr[y].tobytes()
            raw.append(ft)
            if ft == 0:
                filt = line
            elif ft == 1:
                filt = bytes(
                    (line[x] - (line[x - 1] if x else 0)) & 0xFF
                    for x in range(w)
                )
            elif ft == 2:
                filt = bytes((line[x] - prev[x]) & 0xFF for x in range(w))
            elif ft == 3:
                filt = bytes(
                    (line[x] - ((line[x - 1] if x else 0) + prev[x]) // 2)
                    & 0xFF
                    for x in range(w)
                )
            else:
                filt = bytes(
                    (
                        line[x]
                        - ic._paeth(
                            line[x - 1] if x else 0,
                            prev[x],
                            prev[x - 1] if x else 0,
                        )
                    )
                    & 0xFF
                    for x in range(w)
                )
            raw += filt
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + ic._chunk(b"IHDR", ihdr)
            + ic._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + ic._chunk(b"IEND", b"")
        )

    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (ic.decode_png(encode_with_filters(img, ftypes)) == img).all()


def test_jpeg_header_parse_and_errors():
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        make_jpeg_header_bytes,
        parse_image_header,
        parse_jpeg_header,
    )

    data = make_jpeg_header_bytes(640, 480, 3)
    assert parse_jpeg_header(data) == {
        "format": "jpeg", "width": 640, "height": 480,
        "bit_depth": 8, "channels": 3,
    }
    assert parse_image_header(data)["format"] == "jpeg"
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_jpeg_header(b"\x00\x01")
    with pytest.raises(ValueError, match="unrecognized"):
        parse_image_header(b"plain text bytes")


def test_decode_payload_real_png_path():
    """fake=False is now REAL for PNG images; still gated for the
    compressed codecs the environment lacks."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        encode_png,
    )

    img = np.full((4, 5), 7, dtype=np.uint8)
    out = decode_payload(encode_png(img), "image", fake=False)
    assert (out == img).all()
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_payload(b"raw-bytes", "audio", fake=False)


def test_wav_roundtrip_header_and_foreign_encoder():
    """Our decoder round-trips our encoder AND the stdlib ``wave``
    module's output (a genuinely foreign RIFF writer)."""
    import io
    import wave

    import numpy as np

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )

    samples = (np.arange(200, dtype=np.int64) * 997 % 65536 - 32768).astype(
        np.int16
    )
    data = encode_wav(samples, 16000)
    hdr = parse_wav_header(data)
    assert hdr == {
        "format": "wav", "audio_format": 1, "channels": 1,
        "sample_rate": 16000, "bit_depth": 16, "n_frames": 200,
    }
    out, hdr2 = decode_wav(data)
    assert (out == samples).all() and hdr2["sample_rate"] == 16000

    # foreign encoder: stdlib wave writes the same PCM stream
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    foreign, fhdr = decode_wav(buf.getvalue())
    assert (foreign == samples).all() and fhdr["n_frames"] == 200

    # and stdlib wave reads OUR bytes back (round trip both ways)
    with wave.open(io.BytesIO(data), "rb") as r:
        assert r.getframerate() == 16000 and r.getnframes() == 200
        assert r.readframes(200) == samples.tobytes()


def test_wav_error_paths():
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav_header(b"not audio")
    with pytest.raises(ValueError, match="multiple of channels"):
        encode_wav(np.zeros(3, dtype=np.int16), 8000, channels=2)
    # 8-bit PCM is honestly unsupported
    eight_bit = encode_wav(np.zeros(4, dtype=np.int16), 8000)
    patched = bytearray(eight_bit)
    patched[34] = 8  # fmt chunk bits-per-sample field
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_wav(bytes(patched))


def test_y4m_roundtrip_header_and_frame_stats():
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        decode_y4m,
        encode_y4m,
        parse_y4m_header,
    )

    frames = (
        np.arange(3 * 6 * 10, dtype=np.int64).reshape(3, 6, 10) % 256
    ).astype(np.uint8)
    data = encode_y4m(frames, fps_num=30, fps_den=1)
    hdr = parse_y4m_header(data)
    assert (hdr["width"], hdr["height"], hdr["n_frames"]) == (10, 6, 3)
    assert hdr["fps_num"] == 30 and hdr["colorspace"] == "Cmono"
    out, _ = decode_y4m(data)
    assert (out == frames).all()

    # foreign-parameter header (different token order, extra params)
    alt = b"YUV4MPEG2 F25:1 H2 W3 Ip A1:1 Cmono XCOMMENT\nFRAME\n" + bytes(
        range(6)
    )
    out2, hdr2 = decode_y4m(alt)
    assert out2.shape == (1, 2, 3) and out2.flatten().tolist() == list(range(6))
    assert hdr2["n_frames"] == 1

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        parse_y4m_header(b"RIFFxxxx")
    with pytest.raises(NotImplementedError, match="C420"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\n" + b"FRAME\n" + bytes(24))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n" + bytes(3))


def test_decode_payload_real_audio_video_paths():
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        encode_wav,
        encode_y4m,
    )

    samples = np.array([1, -2, 3], dtype=np.int16)
    assert (
        decode_payload(encode_wav(samples, 8000), "audio", fake=False)
        == samples
    ).all()
    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    out = decode_payload(encode_y4m(frames), "video", fake=False)
    assert out.shape == (2, 4, 4) and (out == 0).all()


def test_synthesized_audio_video_media_decode(spark, sf_smoke):
    """End-to-end through Spark: real WAV/Y4M fixture rows decode to
    the closed-form stats."""
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        decode_audio_stats,
        decode_video_frame_stats,
        synthesize_audio_media,
        synthesize_video_media,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(12)
    audio = {
        r["media_id"]: r.asDict()
        for r in decode_audio_stats(synthesize_audio_media(docs)).collect()
    }
    assert len(audio) == 12
    for mid, a in audio.items():
        n = mid % 480 + 32
        rate = 8000 * (mid % 3 + 1)
        assert a["n_samples"] == n and a["sample_rate"] == rate
        assert a["duration_ms"] == n * 1000 // rate
        assert a["amp_sum"] == sum(
            (mid * 7919 + i * 131) % 65536 - 32768 for i in range(n)
        )

    vids = decode_video_frame_stats(
        synthesize_video_media(docs), every_n=2
    ).collect()
    by_media = {}
    for r in vids:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        nf = mid % 6 + 2
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(range(0, nf, 2))
        w, h = mid % 16 + 8, mid % 8 + 8
        r0 = rows[0]
        assert r0["width"] == w and r0["height"] == h
        expected = sum(
            (mid + 7 * r0["frame_idx"] + 3 * y + x) % 256
            for y in range(h)
            for x in range(w)
        )
        assert r0["luma_sum"] == expected


def test_synthesized_image_media_decodes(spark, sf_smoke):
    """End-to-end through Spark: real PNG fixture rows decode to the
    closed-form pixel grid; JPEG rows parse to the planted dims."""
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        decode_image_stats,
        image_header_metadata,
        synthesize_image_media,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    media = synthesize_image_media(docs)
    headers = {
        r["media_id"]: r.asDict()
        for r in image_header_metadata(media).collect()
    }
    assert len(headers) == 20
    for mid, h in headers.items():
        if mid % 2 == 0:
            assert h["format"] == "png" and h["channels"] == 1
            assert h["width"] == mid % 24 + 8 and h["height"] == mid % 16 + 8
        else:
            assert h["format"] == "jpeg" and h["channels"] == mid % 3 + 1
            assert h["width"] == mid % 640 + 16
    stats = {r["media_id"]: r.asDict() for r in decode_image_stats(media).collect()}
    for mid, s in stats.items():
        w, h = mid % 24 + 8, mid % 16 + 8
        assert s["n_pixels"] == w * h
        expect = sum(
            (mid + 31 * y + x) % 256 for y in range(h) for x in range(w)
        )
        assert s["pixel_sum"] == expect


def test_feature_faces_pandas_vs_arrow_identical(spark, sf_smoke):
    """The mapInPandas and mapInArrow featurizer faces must be
    bit-identical (same exact-integer arithmetic, different transport)."""
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        extract_features_arrow,
    )

    media = synthesize_media(load_table(spark, sf_smoke, "documents"))
    a = {
        r["media_id"]: r.asDict()
        for r in extract_features(media).collect()
    }
    b = {
        r["media_id"]: r.asDict()
        for r in extract_features_arrow(media).collect()
    }
    assert a == b


def test_wav_stereo_duration_counts_frames_not_samples():
    """A stereo file is not twice as long: duration derives from
    frames (interleaved sample sets), matching the header's channel
    count."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.avcodec import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )

    stereo = np.arange(16000, dtype=np.int16)  # 8000 frames x 2 ch
    data = encode_wav(stereo, 8000, channels=2)
    hdr = parse_wav_header(data)
    assert hdr["channels"] == 2 and hdr["n_frames"] == 8000
    samples, h2 = decode_wav(data)
    frames = samples.size // h2["channels"]
    assert frames * 1000 // h2["sample_rate"] == 1000  # 1s, not 2s


def test_y4m_header_counts_frames_with_per_frame_params():
    """Foreign streams may carry per-frame parameters after each FRAME
    marker; the header parse must still count frames correctly (and
    ignore a truncated trailing frame)."""
    from kafka_spark_streaming_app_spark.operators.avcodec import (
        parse_y4m_header,
    )

    frame = b"FRAME Ip X7\n" + bytes(6)
    data = b"YUV4MPEG2 W3 H2 F25:1 Cmono\n" + frame * 3
    assert parse_y4m_header(data)["n_frames"] == 3
    truncated = data + b"FRAME\n" + bytes(2)
    assert parse_y4m_header(truncated)["n_frames"] == 3


def test_jpeg_quant_parse_8_and_16_bit():
    """DQT walk: the fixture writes one table per segment (8-bit), but
    real encoders pack multiple tables per DQT segment and may use
    16-bit precision (Pq=1) — the parser must handle all three."""
    import struct

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        make_jpeg_header_bytes,
        parse_jpeg_quant,
    )

    # fixture path: 2 tables, seed 7 -> entries (7 + 17t + j) % 255 + 1
    data = make_jpeg_header_bytes(32, 16, 1, quant_tables=2, quant_seed=7)
    meta = parse_jpeg_quant(data)
    expect = [(7 + 17 * t + j) % 255 + 1 for t in range(2) for j in range(64)]
    assert meta["width"] == 32 and meta["height"] == 16
    assert meta["n_tables"] == 2
    assert meta["quant_sum"] == sum(expect)
    assert meta["quant_min"] == min(expect)
    assert meta["quant_max"] == max(expect)

    # hand-built: ONE DQT segment holding an 8-bit and a 16-bit table
    t8 = bytes([0x00]) + bytes(range(1, 65))
    t16 = bytes([0x11]) + b"".join(
        struct.pack(">H", 300 + j) for j in range(64)
    )
    body = t8 + t16
    sof = struct.pack(">BHHB", 8, 2, 3, 1) + struct.pack(">BBB", 1, 0x11, 0)
    data = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"
    )
    meta = parse_jpeg_quant(data)
    assert meta["n_tables"] == 2
    assert meta["quant_sum"] == sum(range(1, 65)) + sum(300 + j for j in range(64))
    assert meta["quant_min"] == 1
    assert meta["quant_max"] == 363


def test_ahash_banding_is_complete_vs_brute_force(spark, sf_smoke):
    """The 4x16-bit band join must be a COMPLETE candidate generator
    at Hamming radius 3 (pigeonhole: 4 bands, <=3 differing bits =>
    some band identical). Compare the banded query's pair set against
    brute-force all-pairs Hamming over the same signature table."""
    from itertools import combinations

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        ahash_bands,
        synthesize_ahash_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(120)
    bands = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in ahash_bands(synthesize_ahash_media(docs)).collect()
    }
    expected = set()
    for a, b in combinations(sorted(bands), 2):
        ham = sum(
            bin(x ^ y).count("1") for x, y in zip(bands[a], bands[b])
        )
        if ham <= 3:
            expected.add((a, b, ham))

    registry.load_all()
    # restrict the query to the same 120 docs via a temp parquet dir
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ahash_subset_")
    try:
        docs.write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in registry.QUERIES["multimodal_ahash_dedup"](
                spark, tmp
            ).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == expected
    # non-vacuous: the planted 2m/2m+1 retouch pairs must mostly match
    planted = {p for p in expected if p[1] == p[0] + 1 and p[0] % 2 == 0}
    assert len(planted) >= 30


def test_hamming_band_cap_bounds_planted_skew(spark):
    """Regression for the documented perceptual-dedup hazard: an
    all-dark / digital-silence corpus collapses a 16-bit band value
    into ONE bucket and the band join degrades toward all-pairs.
    Plant a 200-copy identical-fingerprint cluster (every band hot)
    beside healthy data and assert the hot-band cap (ported from
    lsh_candidate_pairs) drops the cluster's quadratic pair mass
    while small-bucket near-dup pairs are still found."""
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        hamming_band_pairs,
    )

    cols = ["media_id", "b0", "b1", "b2", "b3"]
    boiler = [(1_000_000 + i, 0, 0, 0, 0) for i in range(200)]
    near_dup = [(1, 10, 20, 30, 40), (2, 11, 20, 30, 40)]  # hamming 1
    # unique spread-out fingerprints: no band value repeats
    healthy = [
        (100 + i, 1000 + i, 17000 + i, 33000 + i, 49000 + i)
        for i in range(200)
    ]
    bands = spark.createDataFrame(boiler + near_dup + healthy, cols)

    capped = hamming_band_pairs(bands, radius=3, max_band_bucket=8)
    rows = capped.collect()
    planted = [
        r for r in rows if r.id_a >= 1_000_000 and r.id_b >= 1_000_000
    ]
    assert planted == []  # C(200,2)=19900 pairs uncapped — all dropped
    assert any(r.id_a == 1 and r.id_b == 2 for r in rows)  # recall kept
    n = len(boiler + near_dup + healthy)
    assert len(rows) <= n * 4 * 8 // 2  # N * n_bands * cap bound

    # contrast: uncapped, the hot cluster is quadratic
    uncapped = hamming_band_pairs(bands, radius=3)
    assert uncapped.count() >= 19900


def test_video_fingerprint_banding_complete_and_pairs_planted(spark, sf_smoke):
    """Video fingerprint: the band join must equal brute-force
    all-pairs Hamming<=3 over the same fingerprint table, and the
    planted (2m, 2m+1) near-dup pairs must be found (the +1 flash on
    every 11th frame barely moves bucket luminance vs the mean)."""
    from itertools import combinations

    from kafka_spark_streaming_app_spark.operators.multimodal import (
        hamming_band_pairs,
        synthesize_vfp_media,
        video_fingerprint_bands,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(80)
    bands_df = video_fingerprint_bands(synthesize_vfp_media(docs))
    bands = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in bands_df.collect()
    }
    expected = set()
    for a, b in combinations(sorted(bands), 2):
        ham = sum(bin(x ^ y).count("1") for x, y in zip(bands[a], bands[b]))
        if ham <= 3:
            expected.add((a, b, ham))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_band_pairs(bands_df, radius=3).collect()
    }
    assert got == expected
    planted = {(2 * m, 2 * m + 1) for m in range(40) if 2 * m + 1 in bands}
    found = {(a, b) for a, b, _ in got}
    assert planted <= found


def test_scene_cuts_fire_exactly_at_scene_boundaries(spark):
    """A crafted clip with a hard luma jump every `seg` frames must
    cut at exactly the multiples of seg and nowhere else — through
    the real Y4M encode/decode round trip."""
    import numpy as np
    import pandas as pd

    from kafka_spark_streaming_app_spark.operators.multimodal import (
        scene_cut_frames,
    )
    from kafka_spark_streaming_app_spark.operators.avcodec import encode_y4m

    seg, nf, h, w = 4, 13, 6, 9
    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    # base jump 60 per scene, flicker +/-1 within a scene
    luma = ((ff // seg) * 60 + (ff % 2) + yy + xx) % 250
    media = spark.createDataFrame(
        pd.DataFrame(
            [{"media_id": 1, "payload": encode_y4m(luma.astype(np.uint8))}]
        )
    )
    out = scene_cut_frames(media, mean_diff_x100=2000).collect()
    assert {r.cut_frame for r in out} == {seg, 2 * seg, 3 * seg}
    for r in out:
        assert r.n_pixels == h * w
        # boundary diff ~= 60 + flicker per pixel, far above 20
        assert 100 * r.diff_sum > 2000 * r.n_pixels


def test_wht_spectral_hash_matches_pure_python_and_finds_planted(
    spark, sf_smoke
):
    """wht_spectral_bands pinned by an independent pure-Python WHT from
    the fixture closed form (no codec, no numpy sign tables — direct
    nested loops), plus the perceptual contract: the planted retouched
    pairs (2m, 2m+1) overwhelmingly land within Hamming radius 3."""
    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        WHT_COEFFS,
        synthesize_ahash_media,
        wht_spectral_bands,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    registry.load_all()
    docs = load_table(spark, sf_smoke, "documents").limit(100)
    got = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in wht_spectral_bands(synthesize_ahash_media(docs)).collect()
    }
    assert len(got) == 100
    for d in sorted(got):
        pair = d // 2
        w, h = pair % 24 + 8, pair % 16 + 8
        sums = [0] * 64
        cnts = [0] * 64
        for y in range(h):
            for x in range(w):
                p = (pair + 31 * y + x) % 256
                if d % 2 == 1 and (y + x) % 17 == 0:
                    p = min(p + 1, 255)
                idx = (y * 8) // h * 8 + (x * 8) // w
                sums[idx] += p
                cnts[idx] += 1
        m = [(s << 20) // c for s, c in zip(sums, cnts)]
        bands = [0, 0, 0, 0]
        for k, (u, v) in enumerate(WHT_COEFFS):
            c = sum(
                m[i * 8 + j]
                * (-1) ** (bin(i & u).count("1") + bin(j & v).count("1"))
                for i in range(8)
                for j in range(8)
            )
            if c > 0:
                bands[k // 5] |= 1 << (k % 5)
        assert got[d] == tuple(bands), d
    # perceptual recall on the planted near-dup pairs: sign-of-
    # near-zero coefficients flips under the sparse +1 retouch, so
    # spectral recall is genuinely LOWER than aHash's on this additive
    # -noise fixture (measured 36/50 at radius 3) — the documented
    # complementarity; pin that it stays a useful signal
    found = 0
    for m_id in range(0, 100, 2):
        ham = sum(
            bin(x ^ y).count("1")
            for x, y in zip(got[m_id], got[m_id + 1])
        )
        found += ham <= 3
    assert found >= 30, found  # >=60% of 50 planted pairs
    # the property aHash does NOT have: EXACT invariance to a global
    # brightness shift (DC excluded, all AC coefficients unchanged:
    # m -> m + c*2^20 exactly, and Σ sign = 0 for (u,v) != (0,0))
    for d in sorted(got)[:10]:
        pair = d // 2
        w, h = pair % 24 + 8, pair % 16 + 8
        for shift in (0, 10):
            sums = [0] * 64
            cnts = [0] * 64
            for y in range(h):
                for x in range(w):
                    p = (pair + 31 * y + x) % 256 + shift
                    idx = (y * 8) // h * 8 + (x * 8) // w
                    sums[idx] += p
                    cnts[idx] += 1
            m = [(s << 20) // c for s, c in zip(sums, cnts)]
            bands = [0, 0, 0, 0]
            for k, (u, v) in enumerate(WHT_COEFFS):
                c = sum(
                    m[i * 8 + j]
                    * (-1)
                    ** (bin(i & u).count("1") + bin(j & v).count("1"))
                    for i in range(8)
                    for j in range(8)
                )
                if c > 0:
                    bands[k // 5] |= 1 << (k % 5)
            if shift == 0:
                base = tuple(bands)
            else:
                assert tuple(bands) == base, d


def test_audio_vad_matches_pure_python(spark, sf_smoke):
    """multimodal_audio_vad recomputed with a direct pure-Python pass
    over the closed-form samples (no SQL, no numpy) — pins frame
    energies, the cross-multiplied threshold, and the run-length
    merge; also checks the planted structure is actually detected
    (~1/3 of frames voiced, segments > 0 for every clip)."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    out = {
        r.media_id: r
        for r in registry.QUERIES["multimodal_audio_vad"](
            spark, sf_smoke
        ).collect()
    }
    assert len(out) == 500
    for d in list(out)[:80]:
        n = d % 480 + 96
        frames = {}
        for i in range(n):
            f = i // 32
            if (d + f) % 3 == 0:
                v = (d * 37 + i * 7) % 2048 - 1024
            else:
                v = (d + i) % 8 - 4
            e, c = frames.get(f, (0, 0))
            frames[f] = (e + v * v, c + 1)
        te = sum(e for e, _ in frames.values())
        tn = sum(c for _, c in frames.values())
        voiced = {
            f: e * tn > te * c for f, (e, c) in sorted(frames.items())
        }
        runs, cur = [], 0
        for f in sorted(voiced):
            if voiced[f]:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        r = out[d]
        assert r.n_frames == len(frames)
        assert r.n_voiced_frames == sum(voiced.values())
        assert r.n_segments == len(runs)
        assert r.longest_run_frames == (max(runs) if runs else 0)
        vs = sum(
            c for f, (e, c) in frames.items() if voiced[f]
        )
        assert r.voiced_ms == vs * 1000 // 16000
        assert r.n_segments > 0, d
        frac = r.n_voiced_frames / r.n_frames
        assert 0.15 < frac < 0.55, (d, frac)


def test_image_resize_identity_and_pure_python(spark, sf_smoke):
    """resize_png_pixels pinned by (1) the identity property — resizing
    an 8x6 image to 8x6 must reproduce it exactly — and (2) a direct
    pure-Python nearest-neighbor recompute for non-trivial ratios."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        encode_png,
    )
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        resize_png_pixels,
    )

    imgs = {
        1: ((np.arange(6 * 8).reshape(6, 8) * 37 + 5) % 256).astype(
            np.uint8
        ),
        2: ((np.arange(13 * 21).reshape(13, 21) * 7 + 3) % 256).astype(
            np.uint8
        ),
    }
    media = spark.createDataFrame(
        [(k, bytearray(encode_png(v))) for k, v in imgs.items()],
        "media_id long, payload binary",
    )
    rows = {
        r.media_id: r for r in resize_png_pixels(media, 8, 6).collect()
    }
    # identity: already 8x6
    assert rows[1].pixels_csv == ",".join(
        str(int(v)) for v in imgs[1].ravel()
    )
    # non-trivial ratio: direct recompute
    src = imgs[2].astype(int)
    want = [
        src[(y * 13) // 6][(x * 21) // 8]
        for y in range(6)
        for x in range(8)
    ]
    assert rows[2].pixels_csv == ",".join(str(v) for v in want)
    assert rows[2].pixel_sum == sum(want)
    assert (rows[2].src_w, rows[2].src_h) == (21, 13)


def test_motion_vectors_recover_planted_translation(spark, sf_smoke):
    """block_motion_vectors must recover the fixture's planted rigid
    scene translation EXACTLY on every interior block (SAD = 0, the
    true (dy, dx)) — the ground-truth contract of motion estimation;
    also recomputed per-block in pure numpy for a sample."""
    import numpy as np

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        block_motion_vectors,
        synthesize_motion_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    registry.load_all()
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    out = block_motion_vectors(synthesize_motion_media(docs)).toPandas()
    assert len(out) > 0
    for r in out.itertuples():
        d, f = r.media_id, r.frame_pair
        true_dy = ((d + f) % 2) - ((d + f + 1) % 2)
        true_dx = ((d * 3 + 2 * f) % 2) - ((d * 3 + 2 * (f + 1)) % 2)
        # cur(y,x) = b(y+sy1, x+sx1); prev(y+dy, x+dx) = b(y+dy+sy0,
        # x+dx+sx0): equal when dy = sy1-sy0, dx = sx1-sx0
        want_dy = ((d + f + 1) % 2) - ((d + f) % 2)
        want_dx = ((d * 3 + 2 * (f + 1)) % 2) - ((d * 3 + 2 * f) % 2)
        assert (r.mv_dy, r.mv_dx) == (want_dy, want_dx), (d, f)
        assert r.sad == 0, (d, f)
    # brute-force numpy recompute on one clip (incl. non-winning SADs)
    d = int(out["media_id"].iloc[0])
    W, H = 16, 12
    def frame(fi):
        sy = (d + fi) % 2
        sx = (d * 3 + 2 * fi) % 2
        yy, xx = np.mgrid[0:H, 0:W]
        return (d + 13 * (yy + sy) + 7 * (xx + sx)) % 256
    sub = out[out["media_id"] == d]
    for r in sub.itertuples():
        prev, cur = frame(r.frame_pair), frame(r.frame_pair + 1)
        best = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                blk = cur[r.block_y : r.block_y + 4,
                          r.block_x : r.block_x + 4]
                ref = prev[r.block_y + dy : r.block_y + dy + 4,
                           r.block_x + dx : r.block_x + dx + 4]
                key = (int(np.abs(blk - ref).sum()), dy, dx)
                best = key if best is None or key < best else best
    assert best[0] == 0


# --- baseline JPEG entropy codec ---------------------------------------------


def test_jpeg_baseline_coef_roundtrip_exact():
    """Entropy encode -> decode recovers every planted quantized
    coefficient exactly (dequantized + dezigzagged), across block
    counts, restart intervals, and AC run shapes incl. ZRL (run >= 16)
    and EOB."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        JPEG_ZIGZAG,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    q = [(7 * j) % 31 + 1 for j in range(64)]
    # block 0: long zero run (ZRL path) — DC, then nothing until zz 40
    b0 = [0] * 64
    b0[0], b0[40], b0[63] = -30, 5, -1
    # block 1: dense low frequencies, EOB after zz 5
    b1 = [0] * 64
    b1[0], b1[1], b1[2], b1[5] = 30, -1, 1, 10
    # block 2: all-zero ACs, zero DC (pure EOB after a 0-diff DC)
    b2 = [0] * 64
    for ri in (0, 1, 2, 5):
        data = encode_jpeg_baseline([b0, b1, b2], 24, 8, q, restart_interval=ri)
        out = decode_jpeg_baseline(data)
        assert (out["width"], out["height"]) == (24, 8)
        for blk_zz, nat in zip((b0, b1, b2), out["blocks"]):
            exp = [0] * 64
            for zz, v in enumerate(blk_zz):
                exp[JPEG_ZIGZAG[zz]] = v * q[zz]
            assert nat == exp
        assert out["pixels"].shape == (8, 24)
        assert out["pixels"].dtype == np.uint8


def test_jpeg_byte_stuffing_survives_all_ff_bytes():
    """Coefficients chosen to maximize 1-bits in the scan force 0xFF
    bytes into the entropy stream; the stuffed 0x00s must round-trip
    and never be mistaken for markers."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        JPEG_ZIGZAG,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    q = [1] * 64
    blocks = []
    for b in range(4):
        blk = [0] * 64
        blk[0] = 1023 if b % 2 == 0 else -1024  # max-size DC swings
        for k in range(1, 64):
            blk[k] = 1 if (b + k) % 2 else -1
        blocks.append(blk)
    data = encode_jpeg_baseline(blocks, 32, 8, q)
    out = decode_jpeg_baseline(data, want_pixels=False)
    for blk_zz, nat in zip(blocks, out["blocks"]):
        exp = [0] * 64
        for zz, v in enumerate(blk_zz):
            exp[JPEG_ZIGZAG[zz]] = v
        assert nat == exp


def test_jpeg_dc_prediction_resets_at_restart_markers():
    """A decoder that carries DC prediction across RSTn decodes wrong
    absolute DCs for every block after the first restart — this
    fixture makes that diverge (all equal planted DCs, nonzero)."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    q = [8] + [1] * 63
    blk = [0] * 64
    blk[0] = 9
    data = encode_jpeg_baseline([blk] * 6, 48, 8, q, restart_interval=2)
    out = decode_jpeg_baseline(data)
    assert [b[0] for b in out["blocks"]] == [72] * 6  # 9 * q0
    assert set(out["pixels"].flatten().tolist()) == {9 + 128}


def test_jpeg_full_dct_roundtrip_bounded_error():
    """Forward DCT + quantize (test-side, independent numpy path) ->
    encode -> decode must reproduce the source image within the
    quantization error bound; with an all-ones qtable the error is
    tiny (|e| <= 2 observed bound covers IDCT rounding)."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        JPEG_ZIGZAG,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((3 * yy + 7 * xx + yy * xx) % 256).astype(np.float64)
    # forward DCT built from first principles (orthonormal DCT-II)
    u = np.arange(8)
    m = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    blocks = []
    for by in range(h // 8):
        for bx in range(w // 8):
            tile = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coefs = m @ tile @ m.T
            qzz = [int(round(coefs[z // 8][z % 8])) for z in JPEG_ZIGZAG]
            # baseline AC range gate: clamp into 10-bit categories
            qzz = [max(-1023, min(1023, v)) for v in qzz]
            blocks.append(qzz)
    data = encode_jpeg_baseline(blocks, w, h, [1] * 64)
    out = decode_jpeg_baseline(data)
    err = np.abs(out["pixels"].astype(np.int64) - img.astype(np.int64))
    assert err.max() <= 2, f"max decode error {err.max()}"


def test_jpeg_decode_rejects_non_baseline():
    """Progressive frames must fail loudly (named gap), never decode
    garbage; a scanless container is a plain malformed-input error."""
    import pytest as _pytest

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_baseline,
        make_jpeg_header_bytes,
    )

    progressive = bytearray(make_jpeg_header_bytes(16, 16, 1))
    sof_at = progressive.index(b"\xff\xc0")
    progressive[sof_at + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with _pytest.raises(NotImplementedError, match="progressive|SOF2"):
        decode_jpeg_baseline(bytes(progressive))
    with _pytest.raises(ValueError, match="SOS"):
        decode_jpeg_baseline(make_jpeg_header_bytes(16, 16, 3))


def test_jpeg_scan_fixture_spark_path(spark, sf_smoke):
    """End-to-end through Spark: the entropy fixture rows decode to
    the closed-form coefficient stats for a spot-checked doc."""
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _jpeg_scan_fixture,
        jpeg_coef_stats,
        synthesize_jpeg_scan_media,
    )
    from kafka_spark_streaming_app_spark.operators.imagecodec import JPEG_ZIGZAG
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").filter(
        F.col("doc_id") < 40
    )
    got = {
        r["media_id"]: r
        for r in jpeg_coef_stats(synthesize_jpeg_scan_media(docs)).collect()
    }
    assert len(got) == 40
    for d in (0, 5, 17, 38):
        blocks, w, h, qtable, _ri = _jpeg_scan_fixture(d)
        dq = [
            (JPEG_ZIGZAG[zz], v * qtable[zz])
            for blk in blocks
            for zz, v in enumerate(blk)
            if v != 0
        ]
        row = got[d]
        assert (row["width"], row["height"]) == (w, h)
        assert row["n_nonzero"] == len(dq)
        assert row["coef_sum"] == sum(v for _, v in dq)
        assert row["posw_sum"] == sum(i * v for i, v in dq)


def test_jpeg_color_420_pixels_flat_regions():
    """DC-only 4:2:0 color: each luma block is flat and chroma is
    constant, so every RGB pixel is computable independently with the
    JFIF matrix — pins IDCT + upsample + color transform end to end."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline_color,
    )

    qy = [8] + [1] * 63
    qc = [16] + [1] * 63
    # 2x1 MCUs: 8 luma blocks (scan order: 4 per MCU), 2 chroma each
    y_dcs = [5, -3, 9, 0, 12, -7, 2, 4]
    cb_dcs = [3, -2]
    cr_dcs = [-4, 6]

    def dconly(dc):
        blk = [0] * 64
        blk[0] = dc
        return blk

    data = encode_jpeg_baseline_color(
        [[dconly(v) for v in y_dcs],
         [dconly(v) for v in cb_dcs],
         [dconly(v) for v in cr_dcs]],
        [(2, 2), (1, 1), (1, 1)],
        32, 16, [qy, qc, qc], restart_interval=1,
    )
    out = decode_jpeg_baseline(data)
    assert out["pixels"].shape == (16, 32, 3)
    # luma block (mcu m, within-MCU v,h) covers rows v*8..+8, cols
    # (2m+h)*8..+8; chroma block m covers cols m*16..+16 upsampled
    for m in range(2):
        for v in range(2):
            for hh in range(2):
                y = y_dcs[m * 4 + v * 2 + hh] * 8 / 8 + 128
                cb = cb_dcs[m] * 16 / 8 + 128
                cr = cr_dcs[m] * 16 / 8 + 128
                exp = np.clip(np.round(np.array([
                    y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128),
                ])), 0, 255).astype(np.uint8)
                tile = out["pixels"][
                    v * 8 : v * 8 + 8, (2 * m + hh) * 8 : (2 * m + hh) * 8 + 8
                ]
                assert (tile == exp).all(), (m, v, hh, tile[0, 0], exp)


def test_jpeg_color_restart_resets_all_component_predictions():
    """After a restart the Y, Cb AND Cr DC predictors must all reset;
    resetting only one (or carrying any across) breaks the planted
    absolute DCs in MCU 2+."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline_color,
    )

    def dconly(dc):
        blk = [0] * 64
        blk[0] = dc
        return blk

    qt = [1] * 64
    y = [dconly(v) for v in (10, 11, 12, 13, 20, 21, 22, 23, 30, 31, 32, 33)]
    cb = [dconly(v) for v in (-1, -2, -3)]
    cr = [dconly(v) for v in (7, 8, 9)]
    data = encode_jpeg_baseline_color(
        [y, cb, cr], [(2, 2), (1, 1), (1, 1)], 48, 16,
        [qt, qt, qt], restart_interval=1,
    )
    out = decode_jpeg_baseline(data, want_pixels=False)
    assert [b[0] for b in out["components"][0]["blocks"]] == [
        10, 11, 12, 13, 20, 21, 22, 23, 30, 31, 32, 33
    ]
    assert [b[0] for b in out["components"][1]["blocks"]] == [-1, -2, -3]
    assert [b[0] for b in out["components"][2]["blocks"]] == [7, 8, 9]


def test_jpeg_color_fixture_spark_path(spark, sf_smoke):
    """End-to-end through Spark: per-component stats for spot-checked
    docs match the closed-form color plant."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import JPEG_ZIGZAG
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _jpeg_color_fixture,
        jpeg_color_coef_stats,
        synthesize_jpeg_color_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").filter(F.col("doc_id") < 20)
    got = {
        (r["media_id"], r["component"]): r
        for r in jpeg_color_coef_stats(
            synthesize_jpeg_color_media(docs)
        ).collect()
    }
    assert len(got) == 60
    for d in (0, 7, 13):
        comp_blocks, _samp, w, h, qts, _ri = _jpeg_color_fixture(d)
        for ci, (blocks, qt) in enumerate(zip(comp_blocks, qts)):
            dq = [
                (JPEG_ZIGZAG[zz], v * qt[zz])
                for blk in blocks
                for zz, v in enumerate(blk)
                if v != 0
            ]
            row = got[(d, ci)]
            assert (row["width"], row["height"]) == (w, h)
            assert row["n_blocks"] == len(blocks)
            assert row["n_nonzero"] == len(dq)
            assert row["coef_sum"] == sum(v for _, v in dq)
            assert row["posw_sum"] == sum(i * v for i, v in dq)


def test_jpeg_progressive_equals_baseline_differential():
    """Differential fuzz: 150 random coefficient sets encoded BOTH
    ways must decode to identical dequantized blocks — progressive's
    DC/AC successive approximation, EOBRUN, ZRL and correction-bit
    paths against the already-oracle-pinned baseline decoder."""
    import random

    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    rng = random.Random(1234)
    for t in range(150):
        nb = rng.randint(1, 8)
        q = [rng.randint(1, 255) for _ in range(64)]
        blocks = []
        for _b in range(nb):
            bb = [0] * 64
            bb[0] = rng.randint(-1000, 1000)
            for _ in range(rng.randint(0, 12)):
                bb[rng.randint(1, 63)] = rng.choice(
                    [v for v in range(-500, 501) if v]
                )
            blocks.append(bb)
        d_b = ic.decode_jpeg_baseline(
            ic.encode_jpeg_baseline(blocks, nb * 8, 8, q), want_pixels=False
        )
        d_p = ic.decode_jpeg_progressive(
            ic.encode_jpeg_progressive(blocks, nb * 8, 8, q),
            want_pixels=False,
        )
        assert d_p["blocks"] == d_b["blocks"], f"trial {t}"


def test_jpeg_progressive_three_level_successive_approximation():
    """A 3-level script (Al=2 -> 1 -> 0, Ah always the previous Al)
    must still reconstruct exactly — two refinement rounds stack."""
    import random

    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    script = (
        (0, 0, 0, 2), (0, 0, 2, 1), (0, 0, 1, 0),
        (1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0),
    )
    rng = random.Random(7)
    for t in range(60):
        nb = rng.randint(1, 6)
        q = [rng.randint(1, 255) for _ in range(64)]
        blocks = []
        for _b in range(nb):
            bb = [0] * 64
            bb[0] = rng.randint(-1000, 1000)
            for _ in range(rng.randint(0, 10)):
                bb[rng.randint(1, 63)] = rng.choice(
                    [v for v in range(-300, 301) if v]
                )
            blocks.append(bb)
        d_b = ic.decode_jpeg_baseline(
            ic.encode_jpeg_baseline(blocks, nb * 8, 8, q), want_pixels=False
        )
        d_p = ic.decode_jpeg_progressive(
            ic.encode_jpeg_progressive(blocks, nb * 8, 8, q, script=script),
            want_pixels=False,
        )
        assert d_p["blocks"] == d_b["blocks"], f"trial {t}"


def test_jpeg_progressive_eobrun_spans_many_blocks():
    """A long run of empty-band blocks must collapse into one EOBn
    symbol and decode back; the final dirty block pins the resync."""
    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    q = [1] * 64
    empty = [0] * 64
    dirty = [0] * 64
    dirty[0], dirty[40] = 3, -5
    blocks = [list(empty) for _ in range(37)] + [list(dirty)]
    d_b = ic.decode_jpeg_baseline(
        ic.encode_jpeg_baseline(blocks, 38 * 8, 8, q), want_pixels=False
    )
    d_p = ic.decode_jpeg_progressive(
        ic.encode_jpeg_progressive(blocks, 38 * 8, 8, q), want_pixels=False
    )
    assert d_p["blocks"] == d_b["blocks"]


def test_jpeg_dispatcher_and_payload_path():
    """decode_jpeg dispatches SOF0 -> baseline and SOF2 ->
    progressive; decode_payload's real image path accepts both."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators import imagecodec as ic
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        decode_payload,
    )

    q = [8] + [1] * 63
    blk = [0] * 64
    blk[0] = 9
    base = ic.encode_jpeg_baseline([blk], 8, 8, q)
    prog = ic.encode_jpeg_progressive([blk], 8, 8, q)
    pb = decode_payload(base, "image", fake=False)
    pp = decode_payload(prog, "image", fake=False)
    assert pb.shape == pp.shape == (8, 8)
    assert (pb == pp).all()
    assert np.unique(pb).tolist() == [9 + 128]


def test_jpeg_progressive_restart_markers_differential():
    """Progressive scans with DRI/RSTn (per-scan marker cycle, DC
    prediction + EOB-run reset) must decode identically to the
    baseline encoding of the same coefficients, across intervals."""
    import random

    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    rng = random.Random(99)
    for t in range(40):
        nb = rng.randint(2, 10)
        ri = rng.choice([1, 2, 3, 5])
        q = [rng.randint(1, 255) for _ in range(64)]
        blocks = []
        for _b in range(nb):
            bb = [0] * 64
            bb[0] = rng.randint(-1000, 1000)
            for _ in range(rng.randint(0, 12)):
                bb[rng.randint(1, 63)] = rng.choice(
                    [v for v in range(-500, 501) if v]
                )
            blocks.append(bb)
        d_b = ic.decode_jpeg_baseline(
            ic.encode_jpeg_baseline(blocks, nb * 8, 8, q, restart_interval=ri),
            want_pixels=False,
        )
        d_p = ic.decode_jpeg_progressive(
            ic.encode_jpeg_progressive(
                blocks, nb * 8, 8, q, restart_interval=ri
            ),
            want_pixels=False,
        )
        assert d_p["blocks"] == d_b["blocks"], f"trial {t} ri={ri}"


def test_jpeg_color_progressive_roundtrip_with_dummy_blocks():
    """Color progressive: interleaved DC scans pad edge MCUs with
    dummy blocks that per-component AC scans must skip; the decode
    output strips them. Round-trip across dummy-producing crops and
    restart intervals must recover every planted coefficient."""
    import random

    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    rng = random.Random(77)

    def plant(nblocks):
        out = []
        for _ in range(nblocks):
            bb = [0] * 64
            bb[0] = rng.randint(-500, 500)
            for _ in range(rng.randint(0, 8)):
                bb[rng.randint(1, 63)] = rng.choice(
                    [v for v in range(-200, 201) if v]
                )
            out.append(bb)
        return out

    samp = [(2, 2), (1, 1), (1, 1)]
    for t in range(30):
        mx, my = rng.randint(1, 3), rng.randint(1, 2)
        w = 16 * mx - rng.choice([0, 3, 9, 11])
        h = 16 * my - rng.choice([0, 2, 9])
        ri = rng.choice([0, 1, 2, 5])
        geo = ic._prog_color_geometry(samp, w, h)[4]
        comp_blocks = [plant(g["bwr"] * g["bhr"]) for g in geo]
        qts = [[rng.randint(1, 255) for _ in range(64)] for _ in range(3)]
        data = ic.encode_jpeg_progressive_color(
            comp_blocks, samp, w, h, qts, restart_interval=ri
        )
        out = ic.decode_jpeg_progressive(data)
        for ci, (blocks, qt) in enumerate(zip(comp_blocks, qts)):
            for bp, nat in zip(blocks, out["components"][ci]["blocks"]):
                exp = [0] * 64
                for zz, v in enumerate(bp):
                    exp[ic.JPEG_ZIGZAG[zz]] = v * qt[zz]
                assert nat == exp, (t, ci)
        assert out["pixels"].shape == (h, w, 3)


def test_jpeg_color_progressive_matches_baseline_single_mcu():
    """On a single-MCU image the interleaved scan order equals the
    raster order, so baseline-color and progressive-color encodings
    of the same plants must decode to identical coefficients AND
    identical RGB pixels."""
    from kafka_spark_streaming_app_spark.operators import imagecodec as ic

    qy = [(7 * j) % 31 + 1 for j in range(64)]
    qc = [(5 * j) % 29 + 1 for j in range(64)]

    def mk(dc, ps):
        blk = [0] * 64
        blk[0] = dc
        for p, v in ps:
            blk[p] = v
        return blk

    y = [mk(10 + i, [(3, i - 2), (40, 5)]) for i in range(4)]
    cb = [mk(-5, [(7, 4)])]
    cr = [mk(6, [(2, -3)])]
    samp = [(2, 2), (1, 1), (1, 1)]
    base = ic.decode_jpeg_baseline(
        ic.encode_jpeg_baseline_color([y, cb, cr], samp, 16, 16, [qy, qc, qc])
    )
    prog = ic.decode_jpeg_progressive(
        ic.encode_jpeg_progressive_color(
            [y, cb, cr], samp, 16, 16, [qy, qc, qc]
        )
    )
    for ci in range(3):
        assert (
            prog["components"][ci]["blocks"]
            == base["components"][ci]["blocks"]
        )
    assert (prog["pixels"] == base["pixels"]).all()


def test_jpeg_cmyk_roundtrip_coefficients_exact():
    """4-component (Adobe YCCK) baseline round-trip: the 4-way
    interleaved scan with per-component quant tables and prediction
    chains reproduces every dequantized coefficient exactly, and the
    APP14 transform byte survives the trip."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        JPEG_ZIGZAG,
        decode_jpeg_baseline,
        encode_jpeg_baseline_color,
    )
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _jpeg_cmyk_fixture,
    )

    for d in (0, 3, 7, 22, 41):
        cb, w, h, qts, ri = _jpeg_cmyk_fixture(d)
        data = encode_jpeg_baseline_color(
            cb, [(1, 1)] * 4, w, h, qts,
            restart_interval=ri, adobe_transform=2,
        )
        assert b"Adobe" in data and b"JFIF" not in data
        out = decode_jpeg_baseline(data, want_pixels=False)
        assert out["ncomp"] == 4
        assert out["adobe_transform"] == 2
        for ci in range(4):
            want = []
            for blk in cb[ci]:
                nat = [0] * 64
                for zz, v in enumerate(blk):
                    nat[JPEG_ZIGZAG[zz]] = v * qts[ci][zz]
                want.append(nat)
            assert out["components"][ci]["blocks"] == want


def test_jpeg_ycck_pixels_closed_form():
    """DC-only zero-chroma YCCK: the decoded CMYK planes equal the
    closed form (C = M = Y-channel = 255 - y_val, K passthrough),
    per block, crop included."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline_color,
    )

    d = 9
    wb, hb = 2, 2
    w, h = wb * 8 - 3, hb * 8 - 1
    sy, sk = 5, 11
    qy = [8 * sy] + [17] * 63
    qk = [8 * sk] + [23] * 63
    qc = [16] * 64
    ydc = [10, -3, 0, 25]
    kdc = [-8, 4, 12, -30]
    cb = []
    for ci in range(4):
        blocks = []
        for b in range(wb * hb):
            blk = [0] * 64
            if ci == 0:
                blk[0] = ydc[b]
            elif ci == 3:
                blk[0] = kdc[b]
            blocks.append(blk)
        cb.append(blocks)
    data = encode_jpeg_baseline_color(
        cb, [(1, 1)] * 4, w, h, [qy, qc, qc, qk], adobe_transform=2
    )
    out = decode_jpeg_baseline(data)
    img = out["pixels"]
    assert img.shape == (h, w, 4)
    for b in range(wb * hb):
        r0, c0 = 8 * (b // wb), 8 * (b % wb)
        tile = img[r0 : min(r0 + 8, h), c0 : min(c0 + 8, w)]
        yval = min(255, max(0, ydc[b] * sy + 128))
        kval = min(255, max(0, kdc[b] * sk + 128))
        assert np.all(tile[..., :3] == 255 - yval)
        assert np.all(tile[..., 3] == kval)


def test_jpeg_multichannel_raw_without_adobe_transform():
    """2-component frames and 4-component frames without an APP14
    transform have no T.81-defined color transform: the decoder
    stacks the stored channel planes raw, in component order."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline_color,
    )

    qt = [8] + [13] * 63
    def dc_blocks(dcs):
        out = []
        for dc in dcs:
            blk = [0] * 64
            blk[0] = dc
            out.append(blk)
        return out

    two = encode_jpeg_baseline_color(
        [dc_blocks([7]), dc_blocks([-5])], [(1, 1)] * 2, 6, 8, [qt, qt]
    )
    o2 = decode_jpeg_baseline(two)
    assert o2["pixels"].shape == (8, 6, 2)
    assert np.all(o2["pixels"][..., 0] == 135)
    assert np.all(o2["pixels"][..., 1] == 123)

    four = encode_jpeg_baseline_color(
        [dc_blocks([7]), dc_blocks([-5]), dc_blocks([0]), dc_blocks([20])],
        [(1, 1)] * 4, 6, 8, [qt] * 4,
    )
    o4 = decode_jpeg_baseline(four)
    assert o4["adobe_transform"] is None
    assert o4["pixels"].shape == (8, 6, 4)
    assert [int(o4["pixels"][0, 0, c]) for c in range(4)] == [
        135, 123, 128, 148,
    ]
    # transform=0 explicitly signaled: still raw (0 = no transform)
    four0 = encode_jpeg_baseline_color(
        [dc_blocks([7]), dc_blocks([-5]), dc_blocks([0]), dc_blocks([20])],
        [(1, 1)] * 4, 6, 8, [qt] * 4, adobe_transform=0,
    )
    o40 = decode_jpeg_baseline(four0)
    assert o40["adobe_transform"] == 0
    assert np.array_equal(o40["pixels"], o4["pixels"])


def test_jpeg_cmyk_fixture_spark_path(spark, sf_smoke):
    """End-to-end through Spark: the 4-component fixture rows decode
    to the closed-form per-component coefficient stats."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        JPEG_ZIGZAG,
    )
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _jpeg_cmyk_fixture,
        jpeg_color_coef_stats,
        synthesize_jpeg_cmyk_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").filter(
        F.col("doc_id") < 20
    )
    got = {
        (r["media_id"], r["component"]): r
        for r in jpeg_color_coef_stats(
            synthesize_jpeg_cmyk_media(docs)
        ).collect()
    }
    assert len(got) == 80
    for d in (0, 6, 13):
        cb, w, h, qts, _ri = _jpeg_cmyk_fixture(d)
        for ci in range(4):
            dq = [
                (JPEG_ZIGZAG[zz], v * qts[ci][zz])
                for blk in cb[ci]
                for zz, v in enumerate(blk)
                if v != 0
            ]
            row = got[(d, ci)]
            assert (row["width"], row["height"]) == (w, h)
            assert row["n_blocks"] == len(cb[ci])
            assert row["n_nonzero"] == len(dq)
            assert row["coef_sum"] == sum(v for _, v in dq)
            assert row["posw_sum"] == sum(i * v for i, v in dq)


def test_jpeg_dc_only_decode_is_exact_and_stops_early():
    """dc_only must (a) reproduce the full decode's DC coefficients
    bit-exactly, (b) decode zero AC, and (c) also hold on COLOR
    progressive files where DC scans are interleaved."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_progressive,
        encode_jpeg_progressive,
    )
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _jpeg_scan_fixture,
    )

    for d in (0, 3, 17, 42, 101):
        blocks, w, h, qtable, ri = _jpeg_scan_fixture(d)
        data = encode_jpeg_progressive(
            blocks, w, h, qtable, restart_interval=ri
        )
        full = decode_jpeg_progressive(data, want_pixels=False)
        fast = decode_jpeg_progressive(
            data, want_pixels=False, dc_only=True
        )
        for cf, cd in zip(full["components"], fast["components"]):
            for bf, bd in zip(cf["blocks"], cd["blocks"]):
                assert bd[0] == bf[0]
                assert all(v == 0 for v in bd[1:])


def test_jpeg_dc_thumbnail_color_progressive():
    """Interleaved DC scans on a color progressive file: dc_only
    keeps all three components' DC planes exact."""
    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_color,
    )

    comp_blocks = []
    for ci, nblocks in ((0, 4), (1, 1), (2, 1)):
        blocks = []
        for b in range(nblocks):
            blk = [0] * 64
            blk[0] = 7 * (ci + 1) + b
            blk[5] = 3  # AC that dc_only must NOT see
            blocks.append(blk)
        comp_blocks.append(blocks)
    qt = [[4] * 64, [5] * 64, [5] * 64]
    data = encode_jpeg_progressive_color(
        comp_blocks, [(2, 2), (1, 1), (1, 1)], 16, 16, qt
    )
    full = decode_jpeg_progressive(data, want_pixels=False)
    fast = decode_jpeg_progressive(data, want_pixels=False, dc_only=True)
    for cf, cd in zip(full["components"], fast["components"]):
        for bf, bd in zip(cf["blocks"], cd["blocks"]):
            assert bd[0] == bf[0]
            assert all(v == 0 for v in bd[1:])
    # the planted AC really is on the wire (decoded blocks are in
    # natural order, so check any non-DC position)
    assert any(
        any(v != 0 for b in c["blocks"] for v in b[1:])
        for c in full["components"]
    )



# --------------------------------------------------------------------------
# Foreign-encoder JPEG ground truth
# --------------------------------------------------------------------------
# Three real-world files produced by third-party encoders, embedded
# with provenance: CPython's test-suite Python-logo JPEG in both its
# JFIF and raw (headerless) variants (Lib/test/imghdrdata — PSF
# licensed) and IPython's 2x2 test JPEG (BSD licensed). None were
# produced by this repo's encoder, so they pin the DECODER against
# the wider JPEG ecosystem the way the idlelib icons pin the GIF LZW
# schedule.

import base64

_PYTHON_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgG"
    "BgUGCQgKCgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMD"
    "AwQDBAgEBAgQCwkLEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ"
    "EBAQEBAQEBAQEBAQEBD/wAARCAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAA"
    "AAAAAAAABwQF/8QAJBAAAQQBBAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/"
    "xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQME"
    "BQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrs"
    "aUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Ia"
    "ad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPx"
    "w2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KO"
    "p1KM6iCNvngZHwetf//Z"
)

_PYTHON_RAW_JPG = base64.b64decode(
    "/9j/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgKCgkICQkKDA8MCgsO"
    "CwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkLEBAQEBAQ"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQB"
    "BAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAA"
    "AAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEA"
    "AhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuW"
    "PZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Iaad7UcUo4tILoS4kqcWkezS0h"
    "O/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5SWVPuciFKRFLgSrwetnyPIB+"
    "Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ/rs8AuA8VAe0vdl7"
    "VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwetf//Z"
)

_GREY_2X2_JPG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
    "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAC"
    "AAIBAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
    "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
    "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
    "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
    "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/ACv/2Q=="
)


def test_foreign_jpeg_python_logo_decodes_semantically():
    import hashlib

    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg,
    )

    a = np.asarray(decode_jpeg(_PYTHON_JPG)["pixels"])
    assert a.shape == (16, 16, 3)
    # the logo: blue-ish upper half, yellow-ish lower half
    top = a[:8].reshape(-1, 3).mean(axis=0)
    bot = a[8:].reshape(-1, 3).mean(axis=0)
    assert top[2] > top[0] + 20  # blue dominates red up top
    assert bot[0] > bot[2] + 50  # red/yellow dominates blue below
    assert (
        hashlib.md5(a.astype(np.uint8).tobytes()).hexdigest()
        == "4587bf0311fa55408e534874b963e01f"
    )


def test_foreign_jpeg_jfif_and_raw_variants_decode_identically():
    """The same image in two containers (JFIF APP0 vs bare SOI) must
    decode to identical pixels — container parsing cannot leak into
    pixel values."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg,
    )

    a = np.asarray(decode_jpeg(_PYTHON_JPG)["pixels"])
    b = np.asarray(decode_jpeg(_PYTHON_RAW_JPG)["pixels"])
    assert (a == b).all()


def test_foreign_jpeg_flat_grey_2x2():
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.imagecodec import (
        decode_jpeg,
    )

    c = np.asarray(decode_jpeg(_GREY_2X2_JPG)["pixels"])
    assert c.shape == (2, 2)
    assert (c == 128).all()  # a flat mid-grey plane, exactly


def test_compressed_text_magic_sniffing_and_mislabels(spark, sf_smoke):
    import bz2

    from kafka_spark_streaming_app_spark.operators.multimodal import (
        compressed_text_stats,
        synthesize_compressed_text_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(9)
    rows = compressed_text_stats(
        synthesize_compressed_text_media(docs)
    ).collect()
    assert len(rows) == 9
    kinds = {r["media_id"] % 3: r["codec"] for r in rows}
    assert kinds == {0: "gzip", 1: "bz2", 2: "xz"}
    # a payload whose magic contradicts its label must raise
    import pandas as pd
    from pyspark.sql import types as T

    bad = spark.createDataFrame(
        [(1, "gzip", bytearray(bz2.compress(b"text")))],
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("codec", T.StringType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="magic"):
        compressed_text_stats(bad).collect()
