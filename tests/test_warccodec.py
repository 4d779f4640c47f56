"""WARC codec tests: hand-written record bytes (framing pinned
against the WARC/1.0 record layout independently of the writer),
gzip-member splitting, HTTP parse strictness, tamper detection, and
the Spark end-to-end path."""

import gzip

import pytest

from kafka_spark_streaming_app_spark.operators.warccodec import (
    http_response,
    parse_http_response,
    read_warc,
    write_warc,
)


def test_hand_written_record_parses():
    """A record typed out by hand from the WARC/1.0 layout — not
    produced by our writer."""
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://h/\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello"
        b"\r\n\r\n"
    )
    [rec] = read_warc(raw)
    assert rec["type"] == "response"
    assert rec["headers"]["WARC-Target-URI"] == "http://h/"
    assert rec["block"] == b"hello"


def test_missing_content_length_is_a_framing_error():
    """Content-Length is mandatory; its absence must raise the
    module's ValueError framing error, not a KeyError."""
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"\r\n"
        b"hello"
        b"\r\n\r\n"
    )
    with pytest.raises(ValueError, match="missing Content-Length"):
        read_warc(raw)


def test_writer_emits_the_same_layout():
    data = write_warc([("response", {"WARC-Target-URI": "http://h/"},
                        b"hello")])
    assert data.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert data.endswith(b"hello\r\n\r\n")
    assert b"Content-Length: 5\r\n" in data
    [rec] = read_warc(data)
    assert rec["block"] == b"hello"


def test_gzip_member_per_record_layout():
    recs = [
        ("warcinfo", {}, b"software: t\r\n"),
        ("response", {"WARC-Target-URI": "http://a/"},
         http_response(200, "OK", {}, b"abc")),
        ("response", {"WARC-Target-URI": "http://b/"},
         http_response(404, "Not Found", {}, b"")),
    ]
    data = write_warc(recs, gzip_per_record=True)
    # each record must be its OWN gzip member: 3 magics on the wire
    assert data.count(b"\x1f\x8b\x08") == 3
    out = read_warc(data)
    assert [r["type"] for r in out] == ["warcinfo", "response", "response"]
    # a generic whole-stream gunzip also recovers the concatenation
    assert gzip.decompress(data) == write_warc(recs)


def test_http_parse_strictness():
    ok = parse_http_response(
        http_response(301, "Moved", {"Location": "http://x/"}, b"zz")
    )
    assert ok["status"] == 301 and ok["headers"]["Location"] == "http://x/"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Length: 10\r\n\r\nshort"
        )
    with pytest.raises(ValueError, match="status line"):
        parse_http_response(b"<html>\r\n\r\n")


def test_framing_tamper_detected():
    data = bytearray(
        write_warc([("response", {}, b"12345"), ("response", {}, b"678")])
    )
    # shrink the first record's Content-Length -> separator check trips
    at = bytes(data).find(b"Content-Length: 5")
    data[at + len("Content-Length: ")] = ord("4")
    with pytest.raises(ValueError, match="separator|version"):
        read_warc(bytes(data))
    with pytest.raises(ValueError, match="version"):
        read_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_synthesized_warc_media_extracts(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _warc_body,
        synthesize_warc_media,
        warc_response_stats,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(10)
    rows = warc_response_stats(synthesize_warc_media(docs)).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 10
    for d, rs in by_media.items():
        assert len(rs) == d % 3 + 1
        for r in rs:
            body = _warc_body(d, r["record"])
            assert r["target_uri"] == f"http://example.com/{d}/{r['record']}"
            assert r["status"] == 200
            assert r["gzipped"] == (d % 2 == 0)
            assert r["n_bytes"] == len(body)
            assert r["char_sum"] == sum(body)
