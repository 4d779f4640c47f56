"""Pure-stdlib WARC reader/writer (web-archive corpus format): the
container Common Crawl and every web-scale text corpus ship in —
the upstream source of the `documents` table in a real pipeline.

Implements WARC/1.0 records (version line, CRLF headers,
Content-Length-framed block, double-CRLF record separator), the three
record types a text pipeline touches (warcinfo / request / response),
nested HTTP/1.1 response parsing (status line, headers, body), and
BOTH storage layouts: plain concatenation and the Common Crawl layout
of one gzip member per record (readable by streaming gzip decoders
that stop at member boundaries — implemented here with
``zlib.decompressobj(wbits=31)`` over ``unused_data``).

The gzip members are produced by stdlib ``gzip`` (RFC 1952); the
record framing is from-scratch and pinned by hand-written WARC bytes
in tests/test_warccodec.py."""

from __future__ import annotations

import gzip as _gzip
import zlib

_CRLF = b"\r\n"


def _warc_record(rtype: str, headers: dict, block: bytes) -> bytes:
    hdr = bytearray(b"WARC/1.0\r\n")
    all_headers = {"WARC-Type": rtype, **headers,
                   "Content-Length": str(len(block))}
    for k, v in all_headers.items():
        hdr += f"{k}: {v}".encode() + _CRLF
    hdr += _CRLF
    return bytes(hdr) + block + _CRLF + _CRLF


def http_response(status: int, reason: str, headers: dict,
                  body: bytes) -> bytes:
    out = bytearray(f"HTTP/1.1 {status} {reason}".encode() + _CRLF)
    for k, v in {**headers, "Content-Length": str(len(body))}.items():
        out += f"{k}: {v}".encode() + _CRLF
    out += _CRLF
    return bytes(out) + body


def write_warc(records, gzip_per_record: bool = False) -> bytes:
    """``records`` is [(rtype, headers_dict, block_bytes)]; response
    blocks are full HTTP messages (use :func:`http_response`). With
    ``gzip_per_record`` each record becomes its own gzip member
    (the Common Crawl .warc.gz layout)."""
    out = bytearray()
    for rtype, headers, block in records:
        raw = _warc_record(rtype, headers, block)
        if gzip_per_record:
            out += _gzip.compress(raw, 9, mtime=0)
        else:
            out += raw
    return bytes(out)


def _split_members(data: bytes):
    """Yield decompressed gzip members from a concatenated stream."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:])
        yield chunk + d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def _parse_headers(text: bytes) -> dict:
    headers = {}
    for line in text.split(_CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.decode().strip()] = v.decode().strip()
    return headers


def parse_http_response(block: bytes) -> dict:
    """Parse an HTTP/1.1 response message: status line, headers,
    Content-Length-framed body."""
    head_end = block.find(_CRLF + _CRLF)
    if head_end < 0:
        raise ValueError("HTTP response missing header terminator")
    status_line, _, header_text = block[:head_end].partition(_CRLF)
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("malformed HTTP status line")
    headers = _parse_headers(header_text)
    body = block[head_end + 4 :]
    if "Content-Length" in headers:
        n = int(headers["Content-Length"])
        if len(body) != n:
            raise ValueError(
                f"HTTP body length {len(body)} != Content-Length {n}"
            )
    return {
        "status": int(parts[1]),
        "reason": parts[2].decode() if len(parts) > 2 else "",
        "headers": headers,
        "body": body,
    }


def read_warc(data: bytes) -> list:
    """Parse a WARC file (gzipped-per-record or plain) into
    ``[{"type", "headers", "block"}]``, enforcing Content-Length
    framing and the double-CRLF record separator."""
    if data[:2] == b"\x1f\x8b":
        raw = b"".join(_split_members(data))
    else:
        raw = data
    records = []
    pos = 0
    while pos < len(raw):
        if raw[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC version line at {pos}")
        head_end = raw.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC record missing header terminator")
        version_line, _, header_text = raw[pos:head_end].partition(_CRLF)
        headers = _parse_headers(header_text)
        if "Content-Length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        n = int(headers["Content-Length"])
        block = raw[head_end + 4 : head_end + 4 + n]
        if len(block) != n:
            raise ValueError("WARC block truncated")
        tail = raw[head_end + 4 + n : head_end + 4 + n + 4]
        if tail != _CRLF + _CRLF:
            raise ValueError("WARC record separator missing")
        records.append(
            {
                "type": headers.get("WARC-Type", ""),
                "headers": headers,
                "block": block,
            }
        )
        pos = head_end + 8 + n
    return records
