"""Kafka message format v2 (RecordBatch) — the modern on-disk/wire
record format every 2020s client speaks (kafka.apache.org/protocol,
"Record Batch"): zigzag-varint record framing, CRC-32C (Castagnoli)
integrity over attributes..records, and optional whole-batch gzip
compression (attributes bits 0-2 = 1).

Layout (all big-endian except varints):

  RecordBatch =>
    baseOffset:           int64
    batchLength:          int32   (bytes after this field)
    partitionLeaderEpoch: int32
    magic:                int8    (2)
    crc:                  uint32  (CRC-32C of attributes..end)
    attributes:           int16   (bits 0-2 compression, 3 timestampType,
                                   4 isTransactional, 5 isControl)
    lastOffsetDelta:      int32
    baseTimestamp:        int64
    maxTimestamp:         int64
    producerId:           int64   (-1: idempotence off)
    producerEpoch:        int16   (-1)
    baseSequence:         int32   (-1)
    recordCount:          int32
    records:              [Record] (gzip-compressed when attr&7 == 1)

  Record =>  (every integer zigzag-varint)
    length, attributes:int8, timestampDelta, offsetDelta,
    keyLength key, valueLength value, headerCount [headers]

Used by the minikafka broker/client for Produce v3 / Fetch v4 — the
first protocol versions that carry record batches — alongside the v0
MessageSet path, proving both generations of the public format from
scratch. CRC-32C is implemented table-driven here (Python's zlib only
has IEEE CRC-32); the table constant is the public Castagnoli
polynomial, checked against the RFC 3720 test vector in tests."""

from __future__ import annotations

import gzip
import io
import struct

COMPRESSION_NONE = 0
COMPRESSION_GZIP = 1
COMPRESSION_SNAPPY = 2
COMPRESSION_LZ4 = 3

_CODEC_NAMES = {
    "none": COMPRESSION_NONE,
    "gzip": COMPRESSION_GZIP,
    "snappy": COMPRESSION_SNAPPY,
    "lz4": COMPRESSION_LZ4,
}

# --- CRC-32C (Castagnoli, reflected polynomial 0x82F63B78) ------------------

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# --- zigzag varints ----------------------------------------------------------


def write_varint(n: int, out: io.BytesIO) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag, 64-bit
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_varint(data: bytes, pos: int) -> tuple:
    z = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (z >> 1) ^ -(z & 1), pos


# --- records -----------------------------------------------------------------


def _encode_record(
    offset_delta: int, timestamp_delta: int,
    key: bytes | None, value: bytes | None,
) -> bytes:
    body = io.BytesIO()
    body.write(b"\x00")  # record attributes (unused by the spec)
    write_varint(timestamp_delta, body)
    write_varint(offset_delta, body)
    if key is None:
        write_varint(-1, body)
    else:
        write_varint(len(key), body)
        body.write(key)
    if value is None:
        write_varint(-1, body)
    else:
        write_varint(len(value), body)
        body.write(value)
    write_varint(0, body)  # headers
    raw = body.getvalue()
    out = io.BytesIO()
    write_varint(len(raw), out)
    out.write(raw)
    return out.getvalue()


def _decode_record(data: bytes, pos: int) -> tuple:
    """-> ((offset_delta, timestamp_delta, key, value), next_pos)."""
    length, pos = read_varint(data, pos)
    end = pos + length
    pos += 1  # record attributes
    ts_delta, pos = read_varint(data, pos)
    off_delta, pos = read_varint(data, pos)
    klen, pos = read_varint(data, pos)
    key = None
    if klen >= 0:
        key = data[pos : pos + klen]
        pos += klen
    vlen, pos = read_varint(data, pos)
    value = None
    if vlen >= 0:
        value = data[pos : pos + vlen]
        pos += vlen
    nheaders, pos = read_varint(data, pos)
    for _ in range(nheaders):
        hklen, pos = read_varint(data, pos)
        pos += max(hklen, 0)
        hvlen, pos = read_varint(data, pos)
        pos += max(hvlen, 0)
    if pos != end:
        raise ValueError("record length mismatch")
    return (off_delta, ts_delta, key, value), pos


def encode_record_batch(
    messages,
    base_offset: int = 0,
    compression: str = "none",
    base_timestamp: int = -1,
) -> bytes:
    """``messages``: [(key|None, value|None)] -> one on-wire
    RecordBatch (magic 2). ``compression``: none | gzip."""
    codec = _CODEC_NAMES.get(compression)
    if codec is None:
        raise NotImplementedError(
            f"compression {compression!r}: none|gzip|snappy|lz4 "
            "(the zstd codec is not in this environment)"
        )
    records = b"".join(
        _encode_record(i, 0, k, v) for i, (k, v) in enumerate(messages)
    )
    if codec == COMPRESSION_GZIP:
        # mtime=0: deterministic frames (testable byte-for-byte)
        records = gzip.compress(records, mtime=0)
    elif codec == COMPRESSION_SNAPPY:
        # xerial stream framing, exactly what JVM producers emit
        from ..operators.snappycodec import kafka_compress

        records = kafka_compress(records)
    elif codec == COMPRESSION_LZ4:
        # the lz4 FRAME format, per the modern clients
        from ..operators.lz4codec import frame_compress

        records = frame_compress(records)
    n = len(messages)
    # attributes..records — the CRC-covered span
    tail = (
        struct.pack(
            ">hiqqqhii",
            codec,                # attributes
            max(n - 1, 0),        # lastOffsetDelta
            base_timestamp,       # baseTimestamp
            base_timestamp,       # maxTimestamp
            -1,                   # producerId
            -1,                   # producerEpoch
            -1,                   # baseSequence
            n,                    # recordCount
        )
        + records
    )
    head = struct.pack(">iBI", 0, 2, crc32c(tail))
    # partitionLeaderEpoch + magic + crc + tail, after baseOffset+length
    return struct.pack(">qi", base_offset, len(head) + len(tail)) + head + tail


def decode_record_batches(data: bytes) -> list:
    """Decode a record SET (one or more concatenated RecordBatches,
    a partial trailing batch dropped per spec) ->
    [(offset, key, value)] with CRC-32C verification and gzip
    decompression."""
    out = []
    pos = 0
    while pos + 12 <= len(data):
        base_offset, batch_len = struct.unpack_from(">qi", data, pos)
        if pos + 12 + batch_len > len(data):
            break  # partial trailing batch (legal in Fetch responses)
        body = data[pos + 12 : pos + 12 + batch_len]
        pos += 12 + batch_len
        _epoch, magic, crc = struct.unpack_from(">iBI", body, 0)
        if magic != 2:
            raise NotImplementedError(
                f"record batch magic {magic} (only v2 here; v0 message "
                "sets go through decode_message_set)"
            )
        tail = body[9:]
        if crc32c(tail) != crc:
            raise ValueError("record batch CRC-32C mismatch")
        (attrs, _last_delta, _base_ts, _max_ts, _pid, _pepoch,
         _bseq, count) = struct.unpack_from(">hiqqqhii", tail, 0)
        codec = attrs & 0x07
        records = tail[40:]  # 2+4+8+8+8+2+4+4 header bytes
        if codec == COMPRESSION_GZIP:
            records = gzip.decompress(records)
        elif codec == COMPRESSION_SNAPPY:
            from ..operators.snappycodec import kafka_decompress

            records = kafka_decompress(records)
        elif codec == COMPRESSION_LZ4:
            from ..operators.lz4codec import frame_decompress

            records = frame_decompress(records)
        elif codec != COMPRESSION_NONE:
            raise NotImplementedError(
                f"record batch compression codec {codec} "
                "(only none/gzip/snappy/lz4 in this environment)"
            )
        rpos = 0
        for _ in range(count):
            (off_delta, _ts, key, value), rpos = _decode_record(
                records, rpos
            )
            out.append((base_offset + off_delta, key, value))
    return out
