"""GIF codec tests: hand-derived LZW bitstreams (independent of both
the encoder and the decoder — the code sequences below are derived on
paper from the LZW rules in the GIF89a specification, Appendix F),
foreign-encoder ground truth (two icons shipped with the CPython
distribution, embedded base64 with provenance), container round-trips
across interlace / local-palette / extension combinations, and the
Spark mapInPandas end-to-end path."""

import base64
import hashlib
import random

import pytest

from kafka_spark_streaming_app_spark.operators.gifcodec import (
    _interlace_row_order,
    decode_gif,
    encode_gif,
    encode_gif_animation,
    lzw_compress,
    lzw_decompress,
)

# ---------------------------------------------------------------------------
# Hand-derived LZW streams (min_code_size = 2: clear=4, eoi=5, first
# dynamic code=6, width starts at 3, LSB-first packing).
# ---------------------------------------------------------------------------

# indices [1, 1, 1]:
#   clear(4)@3 | emit 1@3, assign 6=(1,1) | (1,1) hits table -> prefix=6
#   flush 6@3 | eoi 5@3
#   LSB-first: 4 -> acc=0b100(n=3); 1 -> acc=0b001100(6); 6 -> acc=0b110001100
#   (9) -> byte 0x8C, acc=0b1(1); 5 -> acc=0b1011(4) -> final byte 0x0B.
HAND_111 = bytes([0x8C, 0x0B])

# indices [1, 1, 1, 1, 1] — exercises KwKwK AND the width flip landing
# one code later in the decoder than the encoder's table assignment:
#   clear(4)@3 | emit 1@3, assign 6=(1,1) | emit 6@3, assign 7=(6,1)
#   | flush 6@3 (decoder assigns entry 8=(1,1,1) here, so its next
#   read widens) | eoi 5@4.
#   Packing: 4,1 as above; 6@3 -> byte 0x8C, acc=1(n=1); 6@3 ->
#   acc=0b1101(4); 5@4 -> acc=0b01011101(8) -> byte 0x5D.
HAND_11111 = bytes([0x8C, 0x5D])


def test_lzw_hand_derived_encode():
    assert lzw_compress([1, 1, 1], 2) == HAND_111
    assert lzw_compress([1, 1, 1, 1, 1], 2) == HAND_11111


def test_lzw_hand_derived_decode():
    assert lzw_decompress(HAND_111, 2) == [1, 1, 1]
    assert lzw_decompress(HAND_11111, 2) == [1, 1, 1, 1, 1]


def test_lzw_roundtrip_fuzz_all_code_sizes():
    rng = random.Random(7)
    for trial in range(60):
        m = rng.randint(2, 8)
        n = rng.choice([1, 3, 50, 2000])
        seq = [rng.randrange(1 << m) for _ in range(n)]
        if trial % 3 == 0:  # low-entropy runs stress KwKwK chains
            seq = [rng.randrange(2) for _ in range(n)]
        ce = rng.choice([0, 0, 7, 31])
        assert lzw_decompress(lzw_compress(seq, m, clear_every=ce), m) == seq


def test_lzw_12bit_table_growth_and_forced_clear():
    """A high-entropy 60k-symbol stream drives the string table to the
    4096-code cap several times; every width 3..12 and the forced
    mid-stream clears are all on the path."""
    rng = random.Random(11)
    seq = [rng.randrange(256) for _ in range(60_000)]
    assert lzw_decompress(lzw_compress(seq, 8), 8) == seq


def test_lzw_rejects_out_of_range_symbol_and_truncation():
    with pytest.raises(ValueError):
        lzw_compress([4], 2)  # 4 == clear code for m=2
    with pytest.raises(ValueError):
        lzw_decompress(b"\x8c", 2)  # EOI never arrives


def test_interlace_row_order_matches_spec():
    # GIF89a appendix E worked example: pass 1 rows 0,8; pass 2 row 4;
    # pass 3 rows 2,6; pass 4 rows 1,3,5,7 (height 9 adds row 8's pass-1
    # companion).
    assert _interlace_row_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert _interlace_row_order(9) == [0, 8, 4, 2, 6, 1, 3, 5, 7]
    assert _interlace_row_order(1) == [0]


# ---------------------------------------------------------------------------
# Foreign-encoder ground truth: two icons from the CPython distribution
# (Lib/idlelib/Icons — PSF-licensed public content), produced by a real
# third-party GIF encoder. folder.gif is INTERLACED on the wire.
# ---------------------------------------------------------------------------

_MINUSNODE_GIF = base64.b64decode(
    "R0lGODlhCwALAPEDAP///39/fwAAAMDAwCH5BAUAAAMALAAAAAALAAsAAAIcnI8W"
    "y6wAIwhPQjqCvU94P1UWpm3kFmZNk7RDAQA7"
)
_FOLDER_GIF = base64.b64decode(
    "R0lGODlhDwANAKL/AP//z///kP/PkO/v78/PYJCQAAAAAMDAwCH5BAEAAAcALAAA"
    "AAAPAA0AQAM9eFfMplAVEKoVAQtipv0XdxhkaZoFoa5E0ywUWGncpGW4oIvFAMSF"
    "RwT2KxoptRjollzmAs3Zc9dhWVmGBAA7"
)


def test_foreign_gif_minusnode_decodes_exactly():
    g = decode_gif(_MINUSNODE_GIF)
    assert (g["width"], g["height"], g["version"]) == (11, 11, "GIF89a")
    fr = g["frames"][0]
    assert not fr["interlace"]
    assert fr["palette"][:3] == [(255, 255, 255), (127, 127, 127), (0, 0, 0)]
    idx = fr["indices"]
    assert len(idx) == 121 and sum(idx) == 162
    # the glyph is a bordered box with a horizontal black bar mid-row
    assert idx[5 * 11 : 6 * 11] == [3, 1, 0, 2, 2, 2, 2, 2, 0, 1, 3]
    assert (
        hashlib.md5(bytes(idx)).hexdigest()
        == "e8a72347ef4872c2a67dcd7ef75c8fd4"
    )


def test_foreign_gif_interlaced_folder_decodes_exactly():
    g = decode_gif(_FOLDER_GIF)
    assert (g["width"], g["height"]) == (15, 13)
    fr = g["frames"][0]
    assert fr["interlace"]  # real interlaced wire layout
    idx = fr["indices"]
    assert len(idx) == 195 and sum(idx) == 609
    assert (
        hashlib.md5(bytes(idx)).hexdigest()
        == "e208f82b3c1301c2bec6e9a21c01e5c7"
    )


# ---------------------------------------------------------------------------
# Container round-trips
# ---------------------------------------------------------------------------


def test_container_roundtrip_matrix():
    rng = random.Random(3)
    for trial in range(40):
        w, h = rng.randint(1, 31), rng.randint(1, 23)
        nc = rng.randint(2, 256)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(nc)
        ]
        idx = [rng.randrange(nc) for _ in range(w * h)]
        inter = trial % 2 == 0
        local = trial % 5 == 0
        data = encode_gif(
            idx,
            w,
            h,
            pal,
            interlace=inter,
            local_palette=local,
            global_palette=[(9, 9, 9), (8, 8, 8)],
            clear_every=rng.choice([0, 17]),
            comment=b"c" if trial % 3 == 0 else None,
            loop=trial % 4 == 0,
        )
        g = decode_gif(data)
        fr = g["frames"][0]
        assert (g["width"], g["height"]) == (w, h)
        assert fr["indices"] == idx
        assert fr["palette"][:nc] == pal  # local table wins over decoy
        assert fr["interlace"] == inter


def test_gif87a_has_no_extensions():
    data = encode_gif(
        [0, 1, 1, 0], 2, 2, [(0, 0, 0), (255, 255, 255)], version87=True
    )
    assert data[:6] == b"GIF87a"
    assert b"\x21" not in data[:13]  # no extension introducer up front
    g = decode_gif(data)
    assert g["version"] == "GIF87a" and g["frames"][0]["indices"] == [0, 1, 1, 0]


def test_animation_roundtrip_with_graphic_control():
    pal = [(i, 2 * i, 3 * i) for i in range(5)]
    frames = [
        {
            "indices": [(f + i) % 5 for i in range(24)],
            "interlace": f % 2 == 0,
            "delay_cs": 10 * f + 1,
            "disposal": f % 4,
        }
        for f in range(4)
    ]
    g = decode_gif(encode_gif_animation(frames, 6, 4, pal, loop=True))
    assert g["loop"] and len(g["frames"]) == 4
    for f, fr in enumerate(g["frames"]):
        assert fr["indices"] == frames[f]["indices"]
        assert fr["delay_cs"] == 10 * f + 1
        assert fr["disposal"] == f % 4


def test_partial_canvas_frame_raises():
    data = bytearray(
        encode_gif([0, 1, 1, 0], 2, 2, [(0, 0, 0), (1, 1, 1)])
    )
    pos = data.index(0x2C)  # image descriptor; shrink the frame rect
    data[pos + 5] = 1  # frame width 1 != canvas width 2
    with pytest.raises(ValueError, match="partial-canvas"):
        decode_gif(bytes(data))


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG!\x00\x00\x00\x00\x00\x00\x00\x00\x00")


# ---------------------------------------------------------------------------
# Spark end-to-end
# ---------------------------------------------------------------------------


def test_synthesized_gif_media_decodes(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _gif_fixture,
        gif_pixel_stats,
        synthesize_gif_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(15)
    rows = gif_pixel_stats(synthesize_gif_media(docs)).collect()
    by_key = {(r["media_id"], r["channel"]): r for r in rows}
    ids = {r["media_id"] for r in rows}
    assert len(ids) == 15 and len(rows) == 45
    muls = (3, 7), (5, 11), (7, 13)
    for mid in ids:
        w, h, palette, idx = _gif_fixture(mid)
        for ch in range(3):
            r = by_key[(mid, ch)]
            a, b = muls[ch]
            vals = [(mid * a + b * i) % 256 for i in idx]
            assert (r["width"], r["height"]) == (w, h)
            assert r["n_pixels"] == w * h
            assert r["pixel_sum"] == sum(vals)
            assert r["pixel_min"] == min(vals)
            assert r["pixel_max"] == max(vals)


def test_synthesized_gif_animation_frames(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        gif_frame_stats,
        synthesize_gif_animation_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(8)
    rows = gif_frame_stats(synthesize_gif_animation_media(docs)).collect()
    for r in rows:
        assert r["delay_cs"] == 4 * r["frame"] + 1
        assert r["disposal"] == r["frame"] % 4
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], set()).add(r["frame"])
    for mid, frames in by_media.items():
        assert frames == set(range(mid % 4 + 2))
