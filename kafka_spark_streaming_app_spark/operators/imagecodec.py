"""Pure-stdlib image codecs: a REAL (not faked) PNG encoder/decoder
for 8-bit grayscale plus PNG/JPEG header parsers.

This is the non-stub half of the multimodal story
(``operators/multimodal.py`` keeps the deterministic fakes for the
codecs this environment genuinely lacks — audio/video/ffmpeg).  PNG
needs nothing beyond ``zlib`` + ``struct``, so here the bytes are real:

- ``encode_png`` emits a spec-conformant non-interlaced 8-bit
  grayscale PNG (IHDR/IDAT/IEND, CRC'd chunks, zlib-compressed
  filtered scanlines);
- ``decode_png`` is a real decoder: chunk walk, IDAT concatenation,
  zlib inflate, and full reconstruction of all five PNG filter types
  (None/Sub/Up/Average/Paeth) — it decodes any 8-bit grayscale PNG,
  not just its own output;
- ``parse_png_header`` / ``parse_jpeg_header`` read width / height /
  channels / bit depth straight from the container (IHDR chunk; JPEG
  SOF0/1/2 marker scan) — the planning-relevant metadata a 100 TB
  media pipeline extracts WITHOUT decompressing payloads.

Scale posture: all of this runs inside Arrow-batched ``mapInPandas``
stages (see ``operators/multimodal.py``); nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8"


# --------------------------------------------------------------------------
# PNG encode
# --------------------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """Encode an (H, W) uint8 array as an 8-bit grayscale PNG.

    Scanlines use filter type 0 (None) — valid PNG; any conformant
    decoder reproduces the exact pixel values.
    """
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_png expects a 2-D (H, W) uint8 array")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # depth 8, gray
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# PNG decode
# --------------------------------------------------------------------------


def _png_chunks(data: bytes):
    pos = len(_PNG_MAGIC)
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield tag, body
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IEND":
            return


def parse_png_header(data: bytes) -> dict:
    """Width/height/bit-depth/channels from the IHDR chunk only —
    no decompression, O(1) regardless of payload size."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    for tag, body in _png_chunks(data):
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack_from(">IIBB", body, 0)
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
            return {
                "format": "png",
                "width": w,
                "height": h,
                "bit_depth": depth,
                "channels": channels,
            }
    raise ValueError("PNG missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """Decode an 8-bit grayscale non-interlaced PNG to an (H, W) uint8
    array.  Implements all five scanline filters, so it round-trips
    output from any conformant encoder, not just ``encode_png``."""
    import numpy as np

    hdr = parse_png_header(data)
    if hdr["bit_depth"] != 8 or hdr["channels"] != 1:
        raise NotImplementedError(
            "decode_png supports 8-bit grayscale only "
            f"(got depth={hdr['bit_depth']}, channels={hdr['channels']})"
        )
    w, h = hdr["width"], hdr["height"]
    idat = b"".join(body for tag, body in _png_chunks(data) if tag == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) != stride * h:
        raise ValueError("PNG scanline data has unexpected length")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = bytes(w)
    for y in range(h):
        ftype = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if ftype == 1:  # Sub
            for x in range(1, w):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(w):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(w):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(w):
                left = line[x - 1] if x else 0
                ul = prev[x - 1] if x else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = bytes(line)
    return out


# --------------------------------------------------------------------------
# JPEG header
# --------------------------------------------------------------------------

_SOF_MARKERS = {0xC0, 0xC1, 0xC2}  # baseline, extended sequential, progressive


def make_jpeg_header_bytes(
    width: int,
    height: int,
    channels: int = 3,
    quant_tables: int = 0,
    quant_seed: int = 0,
) -> bytes:
    """Minimal syntactically-valid JPEG container (SOI + JFIF APP0 +
    [DQT...] + SOF0 + EOI) carrying real frame dimensions — a
    header-only fixture for the marker-scan parser (full entropy-coded
    scan data would need a DCT pipeline; header metadata extraction
    doesn't). ``quant_tables`` > 0 inserts that many real DQT
    segments (8-bit precision, table id t) with deterministic entries
    ``(quant_seed + 17*t + j) % 255 + 1`` so a SQL oracle can
    recompute every table value."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b""
    for t in range(quant_tables):
        body = bytes([t]) + bytes(
            (quant_seed + 17 * t + j) % 255 + 1 for j in range(64)
        )
        dqt += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof_body = struct.pack(">BHHB", 8, height, width, channels)
    for i in range(channels):
        sof_body += struct.pack(">BBB", i + 1, 0x11, 0)
    return (
        _JPEG_MAGIC
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + dqt
        + b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
        + b"\xff\xd9"
    )


def parse_jpeg_quant(data: bytes) -> dict:
    """Full marker walk collecting DQT quantization tables (the
    compression-quality fingerprint a curation pipeline keys on) plus
    the SOF dimensions: returns n_tables and the sum/min/max over all
    table entries. 16-bit-precision tables (Pq=1) are supported; the
    fixture writes 8-bit."""
    if not data.startswith(_JPEG_MAGIC):
        raise ValueError("not a JPEG")
    pos = 2
    n_tables = 0
    qsum = 0
    qmin: int | None = None
    qmax: int | None = None
    hdr: dict | None = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xDB:  # DQT — may hold several tables per segment
            body = data[pos + 4 : pos + 2 + seglen]
            off = 0
            while off < len(body):
                prec, _tid = body[off] >> 4, body[off] & 0x0F
                off += 1
                n = 64
                vals = (
                    [v for (v,) in struct.iter_unpack(">H", body[off : off + 2 * n])]
                    if prec
                    else list(body[off : off + n])
                )
                off += 2 * n if prec else n
                n_tables += 1
                qsum += sum(vals)
                lo, hi = min(vals), max(vals)
                qmin = lo if qmin is None else min(qmin, lo)
                qmax = hi if qmax is None else max(qmax, hi)
        elif marker in _SOF_MARKERS:
            depth, h, w, ncomp = struct.unpack_from(">BHHB", data, pos + 4)
            hdr = {"width": w, "height": h, "channels": ncomp}
        pos += 2 + seglen
    if hdr is None:
        raise ValueError("JPEG missing SOF marker")
    return {
        **hdr,
        "n_tables": n_tables,
        "quant_sum": qsum,
        "quant_min": qmin if qmin is not None else 0,
        "quant_max": qmax if qmax is not None else 0,
    }


def parse_jpeg_header(data: bytes) -> dict:
    """Marker scan to the first SOF0/1/2 segment; returns width /
    height / channels / bit depth without touching scan data."""
    if not data.startswith(_JPEG_MAGIC):
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker in _SOF_MARKERS:
            depth, h, w, ncomp = struct.unpack_from(">BHHB", data, pos + 4)
            return {
                "format": "jpeg",
                "width": w,
                "height": h,
                "bit_depth": depth,
                "channels": ncomp,
            }
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF marker")


def parse_image_header(data: bytes) -> dict:
    """Dispatch on magic bytes — PNG IHDR or JPEG SOF scan."""
    if data.startswith(_PNG_MAGIC):
        return parse_png_header(data)
    if data.startswith(_JPEG_MAGIC):
        return parse_jpeg_header(data)
    raise ValueError("unrecognized image container (not PNG/JPEG)")
