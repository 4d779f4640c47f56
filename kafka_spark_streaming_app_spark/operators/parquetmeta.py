"""From-scratch Parquet footer reader: PAR1 framing + a generic
Apache Thrift COMPACT-protocol struct parser, interpreted against the
parquet.thrift field ids for FileMetaData / RowGroup / ColumnChunk /
ColumnMetaData.

Why it exists: metadata-only planning (row-group pruning, scan cost
estimates, layout audits) reads footers without touching data pages —
the planner-side half of a 100 TB scan. Spark exposes none of this to
Python, so the engine carries its own reader; DuckDB's NATIVE
``parquet_metadata()`` table function is the independent oracle the
parse is differential-tested against (tests/test_parquetmeta.py
compares codec, num_values, offsets and byte sizes per column chunk
on the real testdata files).

Wire facts encoded below (public, per the Thrift compact protocol
spec and parquet.thrift):
  * a field header byte packs (id delta << 4 | type); delta 0 means a
    zigzag-varint field id follows; byte 0x00 is STOP;
  * i16/i32/i64 are zigzag varints; BINARY is varint length + bytes;
    BOOL is carried in the field-header type nibble (1 true, 2
    false);
  * a list header packs (size << 4 | element type), size 15 meaning a
    varint size follows;
  * the file tail is ``footer_bytes .. footer_len(u32 LE) .. PAR1``.
"""

from __future__ import annotations

import struct

_CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
    4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}
_TYPES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
_ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}


class _CompactReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def varint(self) -> int:
        u = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return u
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")

    def zigzag(self) -> int:
        u = self.varint()
        return (u >> 1) ^ -(u & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("binary field overruns footer")
        self.pos += n
        return out

    def value(self, ctype: int):
        if ctype in (1, 2):  # bool in list context
            return self.data_bool()
        if ctype == 3:  # byte
            v = self.data[self.pos]
            self.pos += 1
            return v - 256 if v >= 128 else v
        if ctype in (4, 5, 6):  # i16/i32/i64
            return self.zigzag()
        if ctype == 7:  # double
            v = struct.unpack_from("<d", self.data, self.pos)[0]
            self.pos += 8
            return v
        if ctype == 8:  # binary
            return self.binary()
        if ctype in (9, 10):  # list/set
            return self.read_list()
        if ctype == 12:  # struct
            return self.read_struct()
        raise ValueError(f"unsupported compact type {ctype}")

    def data_bool(self) -> bool:
        v = self.data[self.pos]
        self.pos += 1
        return v == 1

    def read_list(self) -> list:
        header = self.data[self.pos]
        self.pos += 1
        size = header >> 4
        etype = header & 0x0F
        if size == 15:
            size = self.varint()
        return [self.value(etype) for _ in range(size)]

    def read_struct(self) -> dict:
        fields = {}
        last_id = 0
        while True:
            header = self.data[self.pos]
            self.pos += 1
            if header == 0:  # STOP
                return fields
            delta = header >> 4
            ftype = header & 0x0F
            fid = last_id + delta if delta else self.zigzag()
            last_id = fid
            if ftype == 1:
                fields[fid] = True
            elif ftype == 2:
                fields[fid] = False
            else:
                fields[fid] = self.value(ftype)


def read_parquet_footer(data: bytes) -> dict:
    """Parse a whole parquet file's footer (pass the full file bytes
    or just its tail — only the footer span is touched). Returns
    ``{"num_rows", "created_by", "n_row_groups", "row_groups":
    [{"num_rows", "total_byte_size", "columns": [{"path", "type",
    "codec", "num_values", "total_compressed_size",
    "total_uncompressed_size", "data_page_offset", "encodings"},
    ...]}, ...], "schema_leaves": [names...]}``."""
    if data[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 tail magic)")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if start < 0:
        raise ValueError("footer length exceeds file")
    r = _CompactReader(data, start)
    fmd = r.read_struct()
    schema = fmd.get(2, [])
    leaves = [
        el[4].decode()
        for el in schema
        if isinstance(el, dict) and 4 in el and 5 not in el
    ]
    row_groups = []
    for rg in fmd.get(4, []):
        cols = []
        for chunk in rg.get(1, []):
            md = chunk.get(3, {})
            cols.append(
                {
                    "path": ".".join(p.decode() for p in md.get(3, [])),
                    "type": _TYPES.get(md.get(1), f"?{md.get(1)}"),
                    "codec": _CODECS.get(md.get(4), f"?{md.get(4)}"),
                    "num_values": md.get(5, 0),
                    "total_uncompressed_size": md.get(6, 0),
                    "total_compressed_size": md.get(7, 0),
                    "data_page_offset": md.get(9, 0),
                    "encodings": sorted(
                        _ENCODINGS.get(x, f"?{x}") for x in md.get(2, [])
                    ),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3, 0),
                "total_byte_size": rg.get(2, 0),
                "columns": cols,
            }
        )
    return {
        "num_rows": fmd.get(3, 0),
        "created_by": (fmd.get(6) or b"").decode("utf-8", "replace"),
        "n_row_groups": len(row_groups),
        "row_groups": row_groups,
        "schema_leaves": leaves,
    }


def read_parquet_footer_from_path(path: str, tail_bytes: int = 1 << 20):
    """Footer-only read: seek to the file tail (1 MiB default — far
    larger than any footer the testdata or Spark writes) instead of
    loading data pages; the planner-side access pattern."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if size > tail_bytes:
            fh.seek(size - tail_bytes)
        data = fh.read()
    return read_parquet_footer(data)
