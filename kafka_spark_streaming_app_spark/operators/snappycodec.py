"""From-scratch Snappy block codec + xerial stream framing — the
default compression of real 2020s Kafka producers, implemented from
the PUBLIC format specification (google/snappy
``format_description.txt``) like the rest of the codec family
(gzip is stdlib; snappy is not in this environment, so the format is
built here).

Block format:

  * preamble: uncompressed length as little-endian varint (7 data
    bits per byte, high bit = continuation);
  * elements, each a tag byte (low 2 bits = type) + operands:
      00 LITERAL   len-1 in tag bits 2-7 when len <= 60; tag values
                   60/61/62/63 mean a 1/2/3/4-byte little-endian
                   (len-1) follows;
      01 COPY-1    len 4..11 (tag bits 2-4 = len-4), 11-bit offset
                   (tag bits 5-7 = high 3 bits, next byte = low 8);
      10 COPY-2    len 1..64 (tag bits 2-7 = len-1), 2-byte LE offset;
      11 COPY-4    same lengths, 4-byte LE offset.
  Copies may overlap (offset < length repeats the tail — RLE).

Kafka does not ship raw blocks: the JVM clients wrap snappy-java's
STREAM framing (the "xerial" format): the 16-byte header
``\\x82SNAPPY\\x00`` + version + compatVersion (int32 BE each),
then repeated ``[int32 BE compressed-size][snappy block]`` chunks.
``kafka_decompress``/``kafka_compress`` speak that framing (and
fall back to a raw block, which some non-JVM producers emit).

Reference parity: the reference app's producers/consumers rely on
kafka-python's codec support (kafka_producer_test.py uses the
library defaults); this module closes the snappy leg of that
surface for the in-sandbox wire twin."""

from __future__ import annotations

import struct

_MAX_COPY_LEN = 64
_MIN_MATCH = 4


# --- raw block format --------------------------------------------------------


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    n = len(chunk) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out += bytes((60 << 2, n & 0xFF))
    elif n < (1 << 16):
        out.append(61 << 2)
        out += struct.pack("<H", n)
    elif n < (1 << 24):
        out.append(62 << 2)
        out += struct.pack("<I", n)[:3]
    else:
        out.append(63 << 2)
        out += struct.pack("<I", n)
    out += chunk


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    while length > 0:
        n = min(length, _MAX_COPY_LEN)
        # avoid leaving a tail shorter than the 1-byte-offset copy's
        # 4-byte minimum
        if length - n in (1, 2, 3) and n == _MAX_COPY_LEN:
            n = 60
        if 4 <= n <= 11 and offset < (1 << 11):
            out.append(
                0b01 | ((n - 4) << 2) | ((offset >> 8) << 5)
            )
            out.append(offset & 0xFF)
        elif offset < (1 << 16):
            out.append(0b10 | ((n - 1) << 2))
            out += struct.pack("<H", offset)
        else:
            out.append(0b11 | ((n - 1) << 2))
            out += struct.pack("<I", offset)
        length -= n


def compress(data: bytes) -> bytes:
    """One snappy block. Greedy hash-table matcher over 4-byte
    sequences (the reference implementation's strategy, simplified):
    correctness-first — any literal/copy decomposition is a valid
    snappy stream; the matcher exists for interop-realistic ratios."""
    data = bytes(data)
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    while pos + _MIN_MATCH <= n:
        key = data[pos : pos + _MIN_MATCH]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand >= (1 << 31):
            pos += 1
            continue
        # extend the match
        length = _MIN_MATCH
        while (
            pos + length < n
            and data[cand + length] == data[pos + length]
        ):
            length += 1
        if pos > lit_start:
            _emit_literal(out, data[lit_start:pos])
        _emit_copy(out, pos - cand, length)
        # index a few positions inside the match so runs keep matching
        end = pos + length
        for p in range(pos + 1, min(end, n - _MIN_MATCH + 1)):
            table[data[p : p + _MIN_MATCH]] = p
        pos = end
        lit_start = end
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode one snappy block, validating the declared length."""
    expect, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(
                    data[pos : pos + nbytes], "little"
                )
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 0b01:
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 0b10:
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:  # overlapping copy = run-length repeat, per spec
            for i in range(length):
                out.append(out[start + i])
    if len(out) != expect:
        raise ValueError(
            f"snappy: declared {expect} bytes, decoded {len(out)}"
        )
    return bytes(out)


# --- xerial (snappy-java) stream framing -------------------------------------

_XERIAL_MAGIC = b"\x82SNAPPY\x00"
_XERIAL_BLOCK = 32 * 1024  # kafka clients' chunk size


def kafka_compress(data: bytes) -> bytes:
    """snappy-java stream framing, as every JVM Kafka producer emits:
    magic + version + compatVersion, then [size][block] chunks."""
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)
    for i in range(0, max(len(data), 1), _XERIAL_BLOCK):
        block = compress(data[i : i + _XERIAL_BLOCK])
        out += struct.pack(">i", len(block)) + block
    return bytes(out)


def kafka_decompress(data: bytes) -> bytes:
    """Decode Kafka snappy payloads: xerial-framed streams from JVM
    clients, or a raw block from non-JVM producers."""
    if not data.startswith(_XERIAL_MAGIC):
        return decompress(data)
    pos = len(_XERIAL_MAGIC) + 8  # skip version + compatVersion
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("snappy: truncated xerial chunk header")
        (size,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if pos + size > len(data):
            raise ValueError("snappy: truncated xerial chunk")
        out += decompress(data[pos : pos + size])
        pos += size
    return bytes(out)
