"""From-scratch LZ4 codec (block + frame) and xxHash32 — with
``operators/snappycodec.py`` this completes the two compression
codecs real 2020s Kafka producers actually default to, built from
the PUBLIC specifications (lz4 ``lz4_Block_format.md`` /
``lz4_Frame_format.md``, xxHash ``xxhash_spec.md``).

Block format: a stream of sequences — token byte (high nibble =
literal length, low nibble = match length - 4, value 15 = extended
by 255-valued bytes), the literals, then a 2-byte little-endian
match offset. The last sequence is literals-only; the spec's end
rules (last 5 bytes are literals; no match starts within the last
12 bytes) are honored by the compressor and assumed by decoders.

Frame format (what Kafka's lz4 compression actually ships): magic
``0x184D2204`` LE, FLG/BD descriptor + xxHash32 header checksum
(``(xxh32(descriptor) >> 8) & 0xFF``), data blocks as
``[u32 LE size][bytes]`` with the size's high bit flagging an
UNCOMPRESSED block, a zero end mark, and an optional xxHash32
content checksum.

Cross-validated in tests against the real lz4 bundled with pyarrow
(``lz4_raw`` for blocks, ``lz4`` for frames), both directions."""

from __future__ import annotations

import struct

# --- xxHash32 (spec constants) -----------------------------------------------

_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while pos <= limit:
            a, b, c, d = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + d * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + k * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --- block format ------------------------------------------------------------

_MIN_MATCH = 4
# spec end rules: the last 5 bytes are always literals, and no match
# may start within the last 12 bytes of the block
_LAST_LITERALS = 5
_MATCH_SAFE_END = 12


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def block_compress(data: bytes) -> bytes:
    """Greedy hash-table matcher (4-byte keys, 64 KiB window via the
    2-byte offset) — any literal/match decomposition honoring the end
    rules is a valid LZ4 block."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)  # one literals-only token of length 0
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    match_limit = n - _MATCH_SAFE_END
    while pos < match_limit:
        key = data[pos : pos + _MIN_MATCH]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        length = _MIN_MATCH
        max_len = n - _LAST_LITERALS - pos
        while (
            length < max_len
            and data[cand + length] == data[pos + length]
        ):
            length += 1
        # emit the pending literals + this match as one sequence
        lits = data[lit_start:pos]
        lit_len = len(lits)
        ml = length - _MIN_MATCH
        token = (min(lit_len, 15) << 4) | min(ml, 15)
        out.append(token)
        if lit_len >= 15:
            _write_len(out, lit_len - 15)
        out += lits
        out += struct.pack("<H", pos - cand)
        if ml >= 15:
            _write_len(out, ml - 15)
        end = pos + length
        for p in range(pos + 1, min(end, match_limit)):
            table[data[p : p + _MIN_MATCH]] = p
        pos = end
        lit_start = end
    # final literals-only sequence
    lits = data[lit_start:]
    lit_len = len(lits)
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        _write_len(out, lit_len - 15)
    out += lits
    return bytes(out)


def block_decompress(data: bytes, history: bytes = b"") -> bytes:
    """Decode one block; ``history`` is the already-decoded prefix a
    LINKED frame block may reference (offsets reach back into it).
    Returns only this block's bytes."""
    out = bytearray(history)
    base = len(history)
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence: literals only, per spec
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: match offset out of range")
        ml = token & 0x0F
        if ml == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += _MIN_MATCH
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:  # overlapping copy = run extension
            for i in range(ml):
                out.append(out[start + i])
    return bytes(out[base:])


# --- frame format ------------------------------------------------------------

_MAGIC = 0x184D2204
# BD block-max-size codes (byte = code << 4)
_BD_SIZES = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}
_BLOCK_SIZE = 64 << 10
_UNCOMPRESSED_BIT = 0x80000000


def frame_compress(data: bytes, content_checksum: bool = True) -> bytes:
    """Standard frame: version 01, independent 64 KiB blocks, no
    block checksums, optional content checksum (on by default —
    what current Kafka clients emit)."""
    flg = 0x40 | 0x20 | (0x04 if content_checksum else 0)
    bd = 4 << 4  # 64 KiB max block size
    descriptor = bytes((flg, bd))
    out = bytearray(struct.pack("<I", _MAGIC))
    out += descriptor
    out.append((xxhash32(descriptor) >> 8) & 0xFF)
    for i in range(0, len(data), _BLOCK_SIZE):
        chunk = data[i : i + _BLOCK_SIZE]
        comp = block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:  # incompressible: stored raw, high bit set
            out += struct.pack(
                "<I", len(chunk) | _UNCOMPRESSED_BIT
            ) + chunk
    out += struct.pack("<I", 0)  # end mark
    if content_checksum:
        out += struct.pack("<I", xxhash32(data))
    return bytes(out)


def frame_decompress(data: bytes) -> bytes:
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != _MAGIC:
        raise ValueError("lz4: not a frame (bad magic)")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != 0b01:
        raise ValueError(f"lz4: frame version {flg >> 6}")
    independent = bool(flg & 0x20)
    block_checksum = bool(flg & 0x10)
    content_size = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    if (bd >> 4) not in _BD_SIZES:
        raise ValueError(f"lz4: bad BD byte {bd:#x}")
    pos = 6
    if content_size:
        pos += 8  # declared size: not needed to decode
    expect_hc = (xxhash32(data[4:pos]) >> 8) & 0xFF
    if data[pos] != expect_hc:
        raise ValueError("lz4: frame header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block header")
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if size == 0:
            break  # end mark
        raw = bool(size & _UNCOMPRESSED_BIT)
        size &= ~_UNCOMPRESSED_BIT
        if pos + size > len(data):
            raise ValueError("lz4: truncated block")
        block = data[pos : pos + size]
        pos += size
        if block_checksum:
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxhash32(block) != bc:
                raise ValueError("lz4: block checksum mismatch")
        if raw:
            out += block
        else:
            # LINKED frames (independence flag off) let matches
            # reach back into prior blocks — pass the 64 KiB window
            history = b"" if independent else bytes(out[-65536:])
            out += block_decompress(block, history)
    if content_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxhash32(bytes(out)) != cc:
            raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
