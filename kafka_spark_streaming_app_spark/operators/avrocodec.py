"""Pure-stdlib Apache Avro codec (Object Container File + binary
encoding, generic-reader subset): the Kafka ecosystem's canonical
record serialization — the reference pipeline moves JSON over Kafka
(`ecommerce_streaming.py:40-52`); production deployments of the same
topology overwhelmingly move Avro, so the engine carries the format
natively even though the spark-avro jar is absent in this
environment (the lakehouse gating note in ``sources/lakehouse.py``).

Implemented per the Avro 1.11 specification:
  * binary primitives — zigzag-varint longs, little-endian IEEE
    doubles, length-prefixed UTF-8 strings/bytes, 1-byte booleans,
    zero-byte nulls, unions tagged by a varint branch index;
  * records as the concatenation of their fields in schema order;
  * the Object Container File: magic ``Obj\\x01``, a file-metadata
    map carrying ``avro.schema`` (JSON) and ``avro.codec``, a 16-byte
    sync marker, then blocks of (record count, byte length, payload,
    sync) with ``null`` and ``deflate`` (raw RFC-1951, wbits=-15)
    codecs;
  * a GENERIC reader: decodes against the schema embedded in the
    container (record / long / double / string / bytes / boolean /
    null / union-of-null), so the writer's schema — not the caller's
    assumption — drives decoding.

The varint/zigzag wire bytes are pinned against the specification's
own examples in tests/test_avrocodec.py."""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# binary primitives
# --------------------------------------------------------------------------


def encode_long(n: int) -> bytes:
    """Zigzag + varint, per the spec (0->00, -1->01, 1->02, ...)."""
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(data: bytes, pos: int):
    u = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (u >> 1) ^ -(u & 1), pos


def encode_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return encode_long(len(raw)) + raw


def encode_value(value, schema) -> bytes:
    """Encode against a (parsed-JSON) schema node."""
    if isinstance(schema, list):  # union: varint branch index + value
        for i, branch in enumerate(schema):
            if value is None and branch == "null":
                return encode_long(i)
            if value is not None and branch != "null":
                return encode_long(i) + encode_value(value, branch)
        raise ValueError("no union branch matches value")
    if isinstance(schema, dict):
        if schema["type"] == "record":
            out = bytearray()
            for field in schema["fields"]:
                # .get: an absent key encodes as None, which a
                # ["null", ...] union accepts (optional fields) and a
                # required type rejects loudly
                out += encode_value(
                    value.get(field["name"]), field["type"]
                )
            return bytes(out)
        if schema["type"] == "array":
            # one block (count, items) + zero terminator, per spec;
            # how Iceberg stores non-string-keyed maps (bounds) in Avro
            out = bytearray()
            if value:
                out += encode_long(len(value))
                for item in value:
                    out += encode_value(item, schema["items"])
            out += encode_long(0)
            return bytes(out)
        return encode_value(value, schema["type"])
    if schema == "long" or schema == "int":
        return encode_long(int(value))
    if schema == "double":
        return struct.pack("<d", float(value))
    if schema == "string":
        return encode_string(str(value))
    if schema == "bytes":
        return encode_long(len(value)) + bytes(value)
    if schema == "boolean":
        return b"\x01" if value else b"\x00"
    if schema == "null":
        return b""
    raise NotImplementedError(f"avro type {schema!r} outside the subset")


def decode_value(data: bytes, pos: int, schema):
    if isinstance(schema, list):
        idx, pos = decode_long(data, pos)
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return decode_value(data, pos, branch)
    if isinstance(schema, dict):
        if schema["type"] == "record":
            rec = {}
            for field in schema["fields"]:
                rec[field["name"]], pos = decode_value(
                    data, pos, field["type"]
                )
            return rec, pos
        if schema["type"] == "array":
            items = []
            while True:
                count, pos = decode_long(data, pos)
                if count == 0:
                    break
                if count < 0:  # size-prefixed block: skip the size
                    count = -count
                    _, pos = decode_long(data, pos)
                for _ in range(count):
                    item, pos = decode_value(data, pos, schema["items"])
                    items.append(item)
            return items, pos
        return decode_value(data, pos, schema["type"])
    if schema in ("long", "int"):
        return decode_long(data, pos)
    if schema == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema == "string":
        n, pos = decode_long(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if schema == "bytes":
        n, pos = decode_long(data, pos)
        return bytes(data[pos : pos + n]), pos + n
    if schema == "boolean":
        return data[pos] == 1, pos + 1
    if schema == "null":
        return None, pos
    raise NotImplementedError(f"avro type {schema!r} outside the subset")


# --------------------------------------------------------------------------
# Object Container File
# --------------------------------------------------------------------------


def _encode_map(meta: dict) -> bytes:
    out = bytearray()
    if meta:
        out += encode_long(len(meta))
        for k, v in meta.items():
            out += encode_string(k)
            out += encode_long(len(v)) + v
    out += encode_long(0)
    return bytes(out)


def write_container(
    records, schema: dict, sync: bytes, codec: str = "null",
    records_per_block: int = 1000,
) -> bytes:
    """Write an Avro Object Container File. ``sync`` is the caller's
    16-byte marker (deterministic in fixtures; random in production
    writers)."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} outside the subset")
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _encode_map(meta)
    out += sync
    block = bytearray()
    count = 0

    def flush():
        nonlocal block, count
        if not count:
            return
        payload = bytes(block)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        out.extend(encode_long(count))
        out.extend(encode_long(len(payload)))
        out.extend(payload)
        out.extend(sync)
        block = bytearray()
        count = 0

    for rec in records:
        block += encode_value(rec, schema)
        count += 1
        if count >= records_per_block:
            flush()
    flush()
    return bytes(out)


def read_container(data: bytes) -> dict:
    """Generic read: returns ``{"schema", "codec", "n_blocks",
    "records": list}`` decoding against the EMBEDDED schema."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = decode_long(data, pos)
        if n == 0:
            break
        if n < 0:  # negative count: size-prefixed block, per spec
            n = -n
            _, pos = decode_long(data, pos)
        for _ in range(n):
            klen, pos = decode_long(data, pos)
            k = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = decode_long(data, pos)
            meta[k] = data[pos : pos + vlen]
            pos += vlen
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} outside the subset")
    sync = data[pos : pos + 16]
    pos += 16
    records = []
    n_blocks = 0
    while pos < len(data):
        count, pos = decode_long(data, pos)
        size, pos = decode_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        bp = 0
        for _ in range(count):
            rec, bp = decode_value(payload, bp, schema)
            records.append(rec)
        if bp != len(payload):
            raise ValueError("block payload has trailing bytes")
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — corrupt container")
        pos += 16
        n_blocks += 1
    return {
        "schema": schema,
        "codec": codec,
        "n_blocks": n_blocks,
        "records": records,
    }
