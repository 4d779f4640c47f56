"""Pure from-scratch archive readers/writers: ZIP (local headers,
central directory, EOCD, stored + raw-deflate entries, CRC-32
verification) and TAR (ustar 512-byte blocks, octal fields, header
checksums). Training corpora are DELIVERED as archives — a corpus
pipeline's first stage is archive extraction, before any text
processing; the reference pipeline starts at Kafka and has no archive
path (additive LLM-pipeline scope).

Python's stdlib ``zipfile``/``tarfile`` are used in the tests as
FOREIGN implementations: archives written by the stdlib must parse
byte-correctly here and archives written here must round-trip through
the stdlib — a two-sided differential against an independent codebase
(the strongest pin available in this environment, same role audioop
plays for G.711).

Wire facts encoded below (public, per APPNOTE.TXT and the ustar
spec):
  * ZIP local header PK\\x03\\x04, central entry PK\\x01\\x02, end of
    central directory PK\\x05\\x06; methods 0 (stored) and 8 (raw
    deflate); CRC-32 over uncompressed bytes;
  * TAR ustar: NUL-padded octal size/mtime fields, checksum computed
    with the checksum field blanked to spaces, data padded to 512,
    two zero blocks at the end.
"""

from __future__ import annotations

import struct
import zlib


# --------------------------------------------------------------------------
# ZIP
# --------------------------------------------------------------------------


def write_zip(members, deflate: bool = True) -> bytes:
    """``members`` is [(name, bytes)]; writes a complete ZIP with
    central directory. ``deflate`` compresses entries whose packed
    form is smaller (real-writer behavior); others are stored."""
    out = bytearray()
    central = bytearray()
    for name, data in members:
        raw = bytes(data)
        nb = name.encode("utf-8")
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        packed = raw
        method = 0
        if deflate:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            cand = co.compress(raw) + co.flush()
            if len(cand) < len(raw):
                packed = cand
                method = 8
        offset = len(out)
        out += b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH",
            20, 0, method, 0, 0, crc, len(packed), len(raw), len(nb), 0,
        ) + nb
        out += packed
        central += b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, method, 0, 0, crc, len(packed), len(raw),
            len(nb), 0, 0, 0, 0, 0, offset,
        ) + nb
    cd_at = len(out)
    out += central
    out += b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_at, 0
    )
    return bytes(out)


def read_zip(data: bytes) -> list:
    """Parse via the CENTRAL DIRECTORY (the authoritative index, per
    the spec — never by scanning local headers), verify each entry's
    CRC-32 and sizes, return [(name, bytes)] in central-dir order."""
    eocd_at = data.rfind(b"PK\x05\x06")
    if eocd_at < 0:
        raise ValueError("not a ZIP file (no end-of-central-directory)")
    n_total, _, cd_size, cd_at = struct.unpack_from(
        "<HHII", data, eocd_at + 8
    )
    pos = cd_at
    out = []
    for _ in range(n_total):
        if data[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError("central directory entry magic mismatch")
        (_vmade, _vneed, _flags, method, _t, _d, crc, csize, usize,
         nlen, elen, clen, _disk, _iattr, _eattr, offset) = struct.unpack_from(
            "<HHHHHHIIIHHHHHII", data, pos + 4
        )
        name = data[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + elen + clen
        if data[offset : offset + 4] != b"PK\x03\x04":
            raise ValueError(f"{name}: local header magic mismatch")
        (lnlen, lelen) = struct.unpack_from("<HH", data, offset + 26)
        body_at = offset + 30 + lnlen + lelen
        packed = data[body_at : body_at + csize]
        if method == 0:
            raw = packed
        elif method == 8:
            raw = zlib.decompress(packed, -15)
        else:
            raise NotImplementedError(f"{name}: compression method {method}")
        if len(raw) != usize:
            raise ValueError(f"{name}: uncompressed size mismatch")
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise ValueError(f"{name}: CRC-32 mismatch")
        out.append((name, raw))
    return out


# --------------------------------------------------------------------------
# TAR (ustar)
# --------------------------------------------------------------------------


def _octal(n: int, width: int) -> bytes:
    return ("%0*o" % (width - 1, n)).encode() + b"\x00"


def write_tar(members) -> bytes:
    """``members`` is [(name, bytes)]; plain ustar regular files."""
    out = bytearray()
    for name, data in members:
        raw = bytes(data)
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("ustar name limited to 100 bytes")
        hdr = bytearray(512)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _octal(0o644, 8)
        hdr[108:116] = _octal(0, 8)
        hdr[116:124] = _octal(0, 8)
        hdr[124:136] = _octal(len(raw), 12)
        hdr[136:148] = _octal(0, 12)
        hdr[148:156] = b" " * 8  # checksum blanked for computation
        hdr[156] = 0x30  # typeflag '0' regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        csum = sum(hdr)
        hdr[148:156] = ("%06o" % csum).encode() + b"\x00 "
        out += hdr
        out += raw
        if len(raw) % 512:
            out += bytes(512 - len(raw) % 512)
    out += bytes(1024)  # two zero blocks
    return bytes(out)


def read_tar(data: bytes) -> list:
    """Parse ustar blocks, validating every header checksum; returns
    [(name, bytes)] for regular files."""
    out = []
    pos = 0
    while pos + 512 <= len(data):
        hdr = data[pos : pos + 512]
        if hdr == bytes(512):
            break  # end-of-archive zero block
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        blanked = bytearray(hdr)
        blanked[148:156] = b" " * 8
        if sum(blanked) != stored:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        typeflag = chr(hdr[156])
        pos += 512
        raw = data[pos : pos + size]
        if len(raw) != size:
            raise ValueError(f"{name}: tar data truncated")
        pos += size + ((512 - size % 512) % 512)
        if typeflag in ("0", "\x00"):
            out.append((name, raw))
    return out
