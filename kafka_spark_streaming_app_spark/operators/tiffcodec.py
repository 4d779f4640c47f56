"""Pure-stdlib TIFF codec (baseline grayscale subset): the fourth
image container in the multimodal family (after PNG, JPEG, GIF) —
scanned-document corpora ship largely as TIFF.

Implements both byte orders (II little / MM big), the IFD entry walk
with inline-vs-offset value storage (values of <= 4 bytes live inside
the entry, larger arrays point elsewhere in the file), multi-strip
images via RowsPerStrip / StripOffsets / StripByteCounts, and two
compressions: 1 (none) and 32773 (PackBits RLE — control byte n in
0..127 copies n+1 literals, 129..255 repeats the next byte 257-n
times, 128 is a no-op). 8-bit single-sample BlackIsZero only; other
photometrics/depths raise loudly.

The PackBits coder is pinned by the worked example in the PackBits
specification (the classic Apple sample row) in
tests/test_tiffcodec.py, and the container round-trips under both
byte orders; per-pixel values are hash-checked by a closed-form
DuckDB oracle."""

from __future__ import annotations

import struct

_TYPE_SHORT = 3
_TYPE_LONG = 4


def packbits_encode(data: bytes) -> bytes:
    """PackBits RLE with the standard greedy policy: runs of >= 3
    identical bytes become repeat records (max 128), everything else
    accumulates into literal records (max 128)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal: scan until a run of >= 3 starts or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 128 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        if i - lit_start > 128:
            i = lit_start + 128  # a trailing 2-byte run may overshoot
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > len(data):
                raise ValueError("PackBits literal overruns input")
            out += data[i : i + c + 1]
            i += c + 1
        elif c == 128:
            continue  # no-op
        else:
            if i >= len(data):
                raise ValueError("PackBits repeat overruns input")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def encode_tiff(
    pixels,
    width: int,
    height: int,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int = 4,
) -> bytes:
    """Encode a row-major 8-bit grayscale pixel list as a TIFF file
    with multiple strips and out-of-line offset/count arrays."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    e = ">" if big_endian else "<"
    magic = b"MM\x00\x2a" if big_endian else b"II\x2a\x00"
    strips = []
    for y0 in range(0, height, rows_per_strip):
        rows = min(rows_per_strip, height - y0)
        raw = bytes(
            pixels[y * width + x]
            for y in range(y0, y0 + rows)
            for x in range(width)
        )
        strips.append(packbits_encode(raw) if packbits else raw)
    nstrips = len(strips)
    # layout: header(8) | strip data | offset array | count array | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    if pos & 1:
        pos += 1  # word-align the arrays
    off_array_at = pos
    pos += 4 * nstrips
    cnt_array_at = pos
    pos += 4 * nstrips
    ifd_at = pos

    def entry(tag, typ, count, value):
        return struct.pack(e + "HHI", tag, typ, count) + value

    def short_val(v):
        return struct.pack(e + "HH", v, 0)

    def long_val(v):
        return struct.pack(e + "I", v)

    if nstrips == 1:
        off_entry = entry(273, _TYPE_LONG, 1, long_val(strip_offsets[0]))
        cnt_entry = entry(279, _TYPE_LONG, 1, long_val(len(strips[0])))
    else:
        off_entry = entry(273, _TYPE_LONG, nstrips, long_val(off_array_at))
        cnt_entry = entry(279, _TYPE_LONG, nstrips, long_val(cnt_array_at))
    entries = [
        entry(256, _TYPE_LONG, 1, long_val(width)),
        entry(257, _TYPE_LONG, 1, long_val(height)),
        entry(258, _TYPE_SHORT, 1, short_val(8)),
        entry(259, _TYPE_SHORT, 1, short_val(32773 if packbits else 1)),
        entry(262, _TYPE_SHORT, 1, short_val(1)),  # BlackIsZero
        off_entry,
        entry(277, _TYPE_SHORT, 1, short_val(1)),
        entry(278, _TYPE_LONG, 1, long_val(rows_per_strip)),
        cnt_entry,
    ]
    out = bytearray(magic)
    out += struct.pack(e + "I", ifd_at)
    for s in strips:
        out += s
    if len(out) & 1:
        out += b"\x00"
    assert len(out) == off_array_at
    for o in strip_offsets:
        out += struct.pack(e + "I", o)
    for s in strips:
        out += struct.pack(e + "I", len(s))
    assert len(out) == ifd_at
    out += struct.pack(e + "H", len(entries))
    for en in entries:
        out += en
    out += struct.pack(e + "I", 0)  # no next IFD
    return bytes(out)


def decode_tiff(data: bytes) -> dict:
    """Decode to ``{"width", "height", "compression", "big_endian",
    "n_strips", "pixels": list}``. 8-bit grayscale BlackIsZero,
    compression 1 or 32773 only — anything else raises."""
    if data[:4] == b"II\x2a\x00":
        e = "<"
        big = False
    elif data[:4] == b"MM\x00\x2a":
        e = ">"
        big = True
    else:
        raise ValueError("not a TIFF file")
    (ifd_at,) = struct.unpack_from(e + "I", data, 4)
    (nentries,) = struct.unpack_from(e + "H", data, ifd_at)
    tags = {}
    for i in range(nentries):
        tag, typ, count = struct.unpack_from(
            e + "HHI", data, ifd_at + 2 + 12 * i
        )
        val_at = ifd_at + 2 + 12 * i + 8
        size = 2 if typ == _TYPE_SHORT else 4
        fmt = "H" if typ == _TYPE_SHORT else "I"
        if size * count <= 4:
            vals = list(
                struct.unpack_from(e + fmt * count, data, val_at)
            )
        else:
            (off,) = struct.unpack_from(e + "I", data, val_at)
            vals = list(struct.unpack_from(e + fmt * count, data, off))
        tags[tag] = vals
    width = tags[256][0]
    height = tags[257][0]
    bps = tags.get(258, [1])[0]
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    if bps != 8 or spp != 1 or photometric != 1:
        raise NotImplementedError(
            "decode_tiff supports 8-bit single-sample BlackIsZero only "
            f"(got bps={bps}, spp={spp}, photometric={photometric})"
        )
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"decode_tiff supports compression 1/32773 (got {compression})"
        )
    rows_per_strip = tags.get(278, [height])[0]
    offsets = tags[273]
    counts = tags[279]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    pixels = []
    remaining = height
    for off, cnt in zip(offsets, counts):
        raw = data[off : off + cnt]
        if compression == 32773:
            raw = packbits_decode(raw)
        rows = min(rows_per_strip, remaining)
        if len(raw) != rows * width:
            raise ValueError("strip byte count != rows*width")
        pixels.extend(raw)
        remaining -= rows
    if remaining != 0:
        raise ValueError("strips do not cover the image height")
    return {
        "width": width,
        "height": height,
        "compression": compression,
        "big_endian": big,
        "n_strips": len(offsets),
        "pixels": pixels,
    }
