"""Pure-stdlib GIF87a/GIF89a codec: real LZW compression and
decompression with variable code widths, clear-code table resets,
4-pass interlacing, global/local color tables, 89a extension blocks
(graphic control, comment, application) and multi-frame animations.

GIF is the third major image format in web-scale multimodal corpora
(after JPEG and PNG); the reference pipeline treats media as opaque
binary (`ecommerce_streaming.py` has no media path at all), so this
module is additive LLM-pipeline scope. The decoder is driven from
Arrow-batched ``mapInPandas`` stages in ``operators/multimodal.py``;
per-pixel correctness is pinned by closed-form DuckDB oracles and by
hand-derived LZW bitstreams in ``tests/test_gifcodec.py`` (deriving
the variable-width code sequence by hand from the LZW rules in the
GIF89a specification, Appendix F — an oracle independent of both the
encoder and the decoder).

Wire-format facts encoded below (all public, per the GIF89a spec):
  * logical screen descriptor packs the global-color-table flag,
    color resolution and table size into one byte;
  * image data = 1 byte LZW minimum code size, then length-prefixed
    sub-blocks (<= 255 bytes) terminated by a zero block;
  * LZW codes are packed LSB-first; clear = 1 << min_code_size,
    EOI = clear + 1, first dynamic code = clear + 2; the code width
    starts at min_code_size + 1 and bumps when the NEXT code to be
    assigned equals 1 << width, capped at 12 bits;
  * interlace writes rows in four passes (start/step 0/8, 4/8, 2/4,
    1/2).
"""

from __future__ import annotations

import struct

_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_row_order(height: int) -> list:
    """The order in which row indices appear on the wire."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------


class _LsbBitWriter:
    """Packs variable-width codes least-significant-bit first."""

    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def finish(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
        return bytes(self._out)


class _LsbBitReader:
    """Reads variable-width codes least-significant-bit first."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int:
        while self._nbits < width:
            if self._pos >= len(self._data):
                raise ValueError("LZW stream truncated")
            self._acc |= self._data[self._pos] << self._nbits
            self._pos += 1
            self._nbits += 8
        code = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return code


def lzw_compress(indices, min_code_size: int, clear_every: int = 0) -> bytes:
    """GIF-flavor LZW over a sequence of palette indices.

    ``clear_every`` > 0 forces a CLEAR code (and table reset) after
    that many emitted codes even if the table is not full — real
    encoders do this for adaptivity, and it exercises the decoder's
    mid-stream reset path. A CLEAR is always emitted when the table
    reaches 4096 (the 12-bit cap), per the spec.
    """
    if not 2 <= min_code_size <= 8:
        raise ValueError("min_code_size must be in [2, 8]")
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()

    def reset():
        # string table: maps (prefix_code, next_index) -> code
        return {}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    w.write(clear, width)
    emitted = 1
    prefix = -1

    # The decoder assigns its table entry for code k only upon
    # reading code k+1, so at any stream position the decoder's
    # next-code counter is one BEHIND the encoder's — the width flip
    # must therefore happen one code later than the assignment that
    # makes next_code == 2**width (validated against foreign-encoder
    # GIFs: CPython's idlelib icons all decode under this schedule
    # and fail under the bump-at-assignment schedule).
    def bumped(next_code, width):
        if next_code > (1 << width) and width < 12:
            return width + 1
        return width

    for sym in indices:
        sym = int(sym)
        if not 0 <= sym < clear:
            raise ValueError("palette index out of range for code size")
        if prefix < 0:
            prefix = sym
            continue
        key = (prefix, sym)
        if key in table:
            prefix = table[key]
            continue
        width = bumped(next_code, width)
        w.write(prefix, width)
        emitted += 1
        table[key] = next_code
        next_code += 1
        prefix = sym
        if next_code >= 4096 or (clear_every and emitted % clear_every == 0):
            width = bumped(next_code, width)
            w.write(clear, width)
            emitted += 1
            table, next_code, width = reset()
    if prefix >= 0:
        width = bumped(next_code, width)
        w.write(prefix, width)
        # the decoder assigns an entry for this final code too; mirror
        # it so the EOI is written at the width the decoder will use
        next_code += 1
    width = bumped(next_code, width)
    w.write(eoi, width)
    return w.finish()


def lzw_decompress(data: bytes, min_code_size: int) -> list:
    """Inverse of :func:`lzw_compress`; handles the KwKwK case
    (a code referencing the entry being defined) and mid-stream
    CLEAR resets."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("min_code_size must be in [2, 8]")
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LsbBitReader(data)
    out = []

    def reset():
        # code -> expansion (tuple of indices); roots are implicit
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev = None
    while True:
        code = r.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first code after clear must be a root")
            out.extend(table[code])
            prev = code
            continue
        if code in table:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + (table[prev][0],)  # KwKwK
        else:
            raise ValueError("corrupt LZW stream: code out of sequence")
        out.extend(entry)
        if next_code < 4096:
            table[next_code] = table[prev] + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


# --------------------------------------------------------------------------
# Container encode
# --------------------------------------------------------------------------


def _color_table_bytes(palette) -> bytes:
    """Pad a [(r, g, b), ...] palette to the next power of two and
    return (packed bytes, size-field exponent - 1)."""
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must have 2..256 entries")
    bits = max(1, (n - 1).bit_length())
    padded = list(palette) + [(0, 0, 0)] * ((1 << bits) - n)
    body = b"".join(bytes(rgb) for rgb in padded)
    return body, bits - 1


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    indices,
    width: int,
    height: int,
    palette,
    interlace: bool = False,
    local_palette: bool = False,
    global_palette=None,
    clear_every: int = 0,
    comment: bytes | None = None,
    loop: bool = False,
    version87: bool = False,
) -> bytes:
    """Encode one indexed frame as a complete GIF file.

    ``indices`` is a row-major list of ``width * height`` palette
    indices. With ``local_palette=True`` the real palette rides in
    the image descriptor's local color table and ``global_palette``
    (a decoy) fills the screen descriptor — catching decoders that
    ignore table selection. 89a extension blocks (comment,
    NETSCAPE2.0 loop) are emitted when requested so skip paths are on
    the wire.
    """
    frames = [
        {
            "indices": indices,
            "interlace": interlace,
            "local_palette": palette if local_palette else None,
            "delay_cs": None,
            "disposal": 0,
        }
    ]
    return encode_gif_animation(
        frames,
        width,
        height,
        global_palette if local_palette else palette,
        clear_every=clear_every,
        comment=comment,
        loop=loop,
        version87=version87,
    )


def encode_gif_animation(
    frames,
    width: int,
    height: int,
    palette,
    clear_every: int = 0,
    comment: bytes | None = None,
    loop: bool = False,
    version87: bool = False,
) -> bytes:
    """Encode full-canvas frames (each a dict with ``indices``,
    ``interlace``, optional ``local_palette``, ``delay_cs``,
    ``disposal``) as one GIF."""
    gct, gct_bits = _color_table_bytes(palette)
    out = bytearray(_GIF87 if version87 else _GIF89)
    # logical screen descriptor: GCT flag | color-res | sort | size
    packed = 0x80 | (gct_bits << 4) | gct_bits
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += gct
    if loop and not version87:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")
    if comment is not None and not version87:
        out += b"\x21\xfe" + _sub_blocks(comment)
    for fr in frames:
        delay = fr.get("delay_cs")
        disposal = fr.get("disposal", 0)
        if (delay is not None or disposal) and not version87:
            out += b"\x21\xf9\x04"
            out += bytes([disposal << 2, (delay or 0) & 0xFF, (delay or 0) >> 8, 0])
            out += b"\x00"
        lct = fr.get("local_palette")
        flags = 0x40 if fr.get("interlace") else 0
        lct_body = b""
        if lct is not None:
            lct_body, lct_bits = _color_table_bytes(lct)
            flags |= 0x80 | lct_bits
            n_colors = len(lct)
        else:
            n_colors = len(palette)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
        out += lct_body
        idx = fr["indices"]
        if len(idx) != width * height:
            raise ValueError("frame index count != width*height")
        if fr.get("interlace"):
            rows = _interlace_row_order(height)
            idx = [
                idx[y * width + x] for y in rows for x in range(width)
            ]
        mcs = max(2, (n_colors - 1).bit_length())
        out += bytes([mcs])
        out += _sub_blocks(lzw_compress(idx, mcs, clear_every=clear_every))
    out += b"\x3b"  # trailer
    return bytes(out)


# --------------------------------------------------------------------------
# Container decode
# --------------------------------------------------------------------------


def decode_gif(data: bytes) -> dict:
    """Decode a GIF file to ``{"width", "height", "version",
    "frames": [{"indices": list, "palette": [(r,g,b),...],
    "interlace": bool, "delay_cs": int|None, "disposal": int}, ...],
    "comments": [bytes], "loop": bool}``.

    Full-canvas frames only (frame rect must equal the logical
    screen) — compositing of partial frames is out of scope; a
    partial frame raises rather than silently mis-decoding.
    """
    if data[:6] not in (_GIF87, _GIF89):
        raise ValueError("not a GIF file")
    version = data[:6].decode("ascii")
    width, height, packed, _bg, _par = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    frames = []
    comments = []
    loop = False
    pending_gce = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            subs = []
            while data[pos]:
                ln = data[pos]
                subs.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and subs:
                b0 = subs[0]
                pending_gce = {
                    "disposal": (b0[0] >> 2) & 0x07,
                    "delay_cs": b0[1] | (b0[2] << 8),
                }
            elif label == 0xFE:
                comments.append(b"".join(subs))
            elif label == 0xFF and subs and subs[0][:11] == b"NETSCAPE2.0":
                loop = True
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, flags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if (left, top, fw, fh) != (0, 0, width, height):
            raise ValueError("partial-canvas GIF frames not supported")
        pal = gct
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            pal = [
                tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
            ]
            pos += 3 * n
        if pal is None:
            raise ValueError("frame has no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decompress(bytes(lzw), mcs)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        idx = idx[: fw * fh]
        if flags & 0x40:  # interlaced: undo the 4-pass row order
            rows = _interlace_row_order(fh)
            deinter = [None] * (fw * fh)
            for wire_r, real_r in enumerate(rows):
                deinter[real_r * fw : (real_r + 1) * fw] = idx[
                    wire_r * fw : (wire_r + 1) * fw
                ]
            idx = deinter
        nmax = len(pal)
        if any(i >= nmax for i in idx):
            raise ValueError("palette index out of range")
        frames.append(
            {
                "indices": idx,
                "palette": pal,
                "interlace": bool(flags & 0x40),
                "delay_cs": pending_gce["delay_cs"] if pending_gce else None,
                "disposal": pending_gce["disposal"] if pending_gce else 0,
            }
        )
        pending_gce = None
    return {
        "width": width,
        "height": height,
        "version": version,
        "frames": frames,
        "comments": comments,
        "loop": loop,
    }
