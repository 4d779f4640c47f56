"""Delta Lake DELETION VECTOR codec, from public specs:

  * **Z85** (ZeroMQ RFC 32/Z85): 4 bytes -> 5 printable chars, the
    encoding Delta uses for inline deletion vectors (storageType
    ``i``). Pinned to the RFC's own test vector ("HelloWorld").
  * **Roaring bitmap, portable format** (RoaringFormatSpec): cookie
    12346 (no run containers) / 12347 (with runs), 16-bit keyed
    containers — array (<=4096 sorted u16s), bitmap (8 KiB), run
    (count + (start, length-1) pairs). The writer emits array/bitmap
    containers; the reader accepts all three (foreign files).
  * **RoaringBitmapArray** (Delta PROTOCOL.md deletion-vector
    format): magic ``1681511377`` (int32 LE) + int64 bitmap count +
    each 32-bit roaring bitmap in portable form; a 64-bit row index
    ``v`` lives in bitmap ``v >> 32`` at value ``v & 0xFFFFFFFF``.

A deletion vector marks ROW POSITIONS of a data file as deleted
without rewriting the file — Delta's merge-on-read, the twin of
Iceberg's position-delete files (``sources/iceberglog.py``)."""

from __future__ import annotations

import struct

# --- Z85 (ZeroMQ RFC 32) ------------------------------------------------------

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise ValueError(f"invalid z85 character {c!r}")
            n = n * 85 + _Z85_INDEX[c]
        if n > 0xFFFFFFFF:
            raise ValueError("z85 block out of range")
        out += n.to_bytes(4, "big")
    return bytes(out)


# --- 32-bit roaring bitmap, portable serialization ----------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def roaring32_serialize(values) -> bytes:
    """Sorted distinct uint32 values -> portable roaring bytes.
    Emits array containers (card <= 4096) or bitmap containers —
    the no-run-container cookie."""
    values = sorted(set(values))
    if values and not 0 <= values[-1] <= 0xFFFFFFFF:
        raise ValueError("roaring32 values must be uint32")
    by_key: dict[int, list] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    descr = b"".join(
        struct.pack("<HH", k, len(by_key[k]) - 1) for k in keys
    )
    containers = []
    for k in keys:
        vals = by_key[k]
        if len(vals) <= 4096:
            containers.append(
                b"".join(struct.pack("<H", v) for v in vals)
            )
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            containers.append(bytes(bits))
    # offsets section (present for the no-run cookie)
    offsets = []
    pos = len(head) + len(descr) + 4 * len(keys)
    for c in containers:
        offsets.append(struct.pack("<i", pos))
        pos += len(c)
    return head + descr + b"".join(offsets) + b"".join(containers)


def roaring32_deserialize(data: bytes, pos: int = 0) -> tuple:
    """-> (sorted values list, next_pos). Accepts both cookies and
    all three container types (array / bitmap / run)."""
    (cookie16,) = struct.unpack_from("<H", data, pos)
    run_bitset = None
    if cookie16 == _SERIAL_COOKIE:
        (n_minus1,) = struct.unpack_from("<H", data, pos + 2)
        size = n_minus1 + 1
        pos += 4
        nbytes = (size + 7) // 8
        run_bitset = data[pos : pos + nbytes]
        pos += nbytes
    else:
        (cookie, size) = struct.unpack_from("<ii", data, pos)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"not a roaring bitmap (cookie {cookie})")
        pos += 8
    keyscards = []
    for i in range(size):
        k, cm1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        keyscards.append((k, cm1 + 1))
    if run_bitset is None or size >= _NO_OFFSET_THRESHOLD:
        pos += 4 * size  # offsets section
    out = []
    for i, (k, card) in enumerate(keyscards):
        base = k << 16
        is_run = bool(
            run_bitset is not None and run_bitset[i >> 3] & (1 << (i & 7))
        )
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                out.extend(base + start + j for j in range(length + 1))
        elif card <= 4096:
            for _ in range(card):
                (v,) = struct.unpack_from("<H", data, pos)
                pos += 2
                out.append(base + v)
        else:
            bits = data[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & -b
                    out.append(base + (byte_i << 3) + low.bit_length() - 1)
                    b ^= low
    return out, pos


# --- RoaringBitmapArray (Delta deletion-vector payload) ------------------------

_DV_MAGIC = 1681511377


def dv_serialize(positions) -> bytes:
    """64-bit deleted row positions -> RoaringBitmapArray bytes."""
    by_high: dict[int, list] = {}
    for p in positions:
        if p < 0:
            raise ValueError("negative row position")
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    highs = sorted(by_high)
    if highs and highs != list(range(highs[-1] + 1)):
        # the format indexes bitmaps densely by the high word
        by_high = {h: by_high.get(h, []) for h in range(highs[-1] + 1)}
        highs = sorted(by_high)
    out = [struct.pack("<iq", _DV_MAGIC, len(highs))]
    for h in highs:
        out.append(roaring32_serialize(by_high[h]))
    return b"".join(out)


def dv_deserialize(data: bytes) -> list:
    """RoaringBitmapArray bytes -> sorted 64-bit row positions."""
    magic, count = struct.unpack_from("<iq", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(f"not a RoaringBitmapArray (magic {magic})")
    pos = 12
    out = []
    for high in range(count):
        vals, pos = roaring32_deserialize(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def dv_inline(positions) -> dict:
    """The add action's ``deletionVector`` struct for an INLINE
    (storageType ``i``) vector: z85 payload + sizeInBytes +
    cardinality, per the Delta protocol."""
    raw = dv_serialize(positions)
    pad = (-len(raw)) % 4
    raw_padded = raw + b"\x00" * pad
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(raw_padded),
        "sizeInBytes": len(raw),
        "cardinality": len(set(positions)),
    }


# --- file-backed deletion vectors (storageType "u" / "p") ---------------------
#
# Delta PROTOCOL.md "Deletion Vector File Storage Format": the .bin
# file opens with a 1-byte format version (1), then each stored DV is
# [int32 BE dataSize][RoaringBitmapArray bytes][int32 BE CRC-32 of
# the bytes]; the descriptor's ``offset`` points at its dataSize
# field. storageType "u": pathOrInlineDv is an optional random prefix
# + the Z85-encoded 16-byte UUID (20 chars), naming
# ``<prefix>/deletion_vector_<uuid>.bin`` under the table root;
# "p" carries an absolute path.

_DV_FILE_VERSION = 1


def dv_file_write(
    table_dir: str, positions, prefix: str = "",
    file_uuid=None,
) -> dict:
    """Write one deletion vector into its own spec-shaped ``.bin``
    file and return the add action's descriptor (storageType ``u``).
    ``file_uuid`` pins the name for deterministic fixtures."""
    import os
    import uuid as _uuid
    import zlib

    raw = dv_serialize(positions)
    u = file_uuid or _uuid.uuid4()
    rel = f"deletion_vector_{u}.bin"
    if prefix:
        rel = f"{prefix}/{rel}"
        os.makedirs(
            os.path.join(table_dir, prefix), exist_ok=True
        )
    blob = (
        bytes([_DV_FILE_VERSION])
        + struct.pack(">i", len(raw))
        + raw
        + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)
    )
    with open(os.path.join(table_dir, rel), "wb") as fh:
        fh.write(blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": 1,  # the version byte precedes the first DV
        "sizeInBytes": len(raw),
        "cardinality": len(set(positions)),
    }


def dv_file_path(dv: dict, table_dir: str | None) -> str:
    """Resolve a file-backed descriptor to its on-disk path."""
    import os
    import uuid as _uuid

    st = dv.get("storageType")
    if st == "p":
        return dv["pathOrInlineDv"]
    if st != "u":
        raise ValueError(f"not a file-backed descriptor ({st!r})")
    if table_dir is None:
        raise ValueError(
            "table_dir is required to resolve a 'u' deletion vector"
        )
    enc = dv["pathOrInlineDv"]
    prefix, b85 = enc[:-20], enc[-20:]
    u = _uuid.UUID(bytes=z85_decode(b85))
    return os.path.join(table_dir, prefix, f"deletion_vector_{u}.bin")


def dv_positions(dv: dict, table_dir: str | None = None) -> list:
    """Deleted positions from a deletionVector struct: inline
    (``i``, z85 in the log) or file-backed (``u``/``p``, the shape
    for delete sets too large to inline), with the spec's size and
    CRC-32 consistency checks."""
    import zlib

    st = dv.get("storageType")
    if st == "i":
        raw = z85_decode(dv["pathOrInlineDv"])[: dv["sizeInBytes"]]
        return dv_deserialize(raw)
    if st in ("u", "p"):
        path = dv_file_path(dv, table_dir)
        with open(path, "rb") as fh:
            data = fh.read()
        if not data or data[0] != _DV_FILE_VERSION:
            raise NotImplementedError(
                f"deletion-vector file version {data[:1]!r} "
                "(format version 1 here)"
            )
        off = int(dv.get("offset") or 1)
        (size,) = struct.unpack_from(">i", data, off)
        if size != int(dv["sizeInBytes"]):
            raise ValueError(
                f"deletion-vector size mismatch: descriptor says "
                f"{dv['sizeInBytes']}, file says {size}"
            )
        raw = data[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", data, off + 4 + size)
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise ValueError("deletion-vector CRC-32 mismatch")
        return dv_deserialize(raw)
    raise NotImplementedError(
        f"deletionVector storageType {st!r} is outside the subset "
        "(i/u/p here) — use the jar-backed path"
    )
