"""WARC/1.0 reader-writer unit tests (pure Python, no Spark)."""

from __future__ import annotations

import gzip
import zlib

import pytest

from peerdb_cdc_psql_psql_spark.functions.warc import (
    build_http_response,
    build_warc_record,
    decode_warc,
    encode_warc_gz,
    gzip_member,
    parse_http_payload,
    parse_warc,
    parse_warc_record,
    split_gzip_members,
)


def _sample_records() -> list[bytes]:
    body = b"<html><body>hello crawl</body></html>"
    return [
        build_warc_record(
            "warcinfo",
            b"software: test-crawler/1.0\r\n",
            content_type="application/warc-fields",
        ),
        build_warc_record(
            "request",
            b"GET /page HTTP/1.1\r\nHost: example.com\r\n\r\n",
            target_uri="http://example.com/page",
            content_type="application/http; msgtype=request",
        ),
        build_warc_record(
            "response",
            build_http_response(body),
            target_uri="http://example.com/page",
        ),
    ]


def test_gzip_member_deterministic_and_stdlib_readable():
    m = gzip_member(b"payload bytes")
    assert m == gzip_member(b"payload bytes")
    assert gzip.decompress(m) == b"payload bytes"


def test_split_gzip_members_roundtrip():
    chunks = [b"a" * 10, b"", b"third member" * 50]
    stream = b"".join(gzip_member(c) for c in chunks)
    assert split_gzip_members(stream) == chunks
    with pytest.raises(ValueError):
        split_gzip_members(b"not gzip")
    with pytest.raises(ValueError):
        split_gzip_members(stream[:-3])  # truncated final member


def test_stdlib_gzip_members_also_split():
    """Members produced by the stdlib writer (nonzero mtime, fname
    flags) must split too — the reader can't assume our writer."""
    stream = gzip.compress(b"one") + gzip.compress(b"two")
    assert split_gzip_members(stream) == [b"one", b"two"]


def test_warc_record_roundtrip():
    raw = _sample_records()[2]
    rec, end = parse_warc_record(raw, 0)
    assert end == len(raw)
    assert rec["warc_type"] == "response"
    assert rec["target_uri"] == "http://example.com/page"
    assert rec["content_type"].startswith("application/http")
    http = parse_http_payload(rec["payload"])
    assert http["status"] == 200
    assert http["body"] == b"<html><body>hello crawl</body></html>"
    assert http["http_headers"]["content-type"] == "text/html"


def test_parse_warc_gz_per_record_members():
    data = encode_warc_gz(_sample_records())
    records = parse_warc(data)
    assert [r["warc_type"] for r in records] == ["warcinfo", "request", "response"]
    assert records[2]["status"] == 200
    assert records[2]["body"] == b"<html><body>hello crawl</body></html>"


def test_parse_warc_plain_concatenation():
    data = b"".join(_sample_records())
    records = parse_warc(data)
    assert len(records) == 3
    # single gzip member holding all three records (non-CommonCrawl layout)
    records2 = parse_warc(gzip_member(data))
    assert [r["warc_type"] for r in records2] == [
        r["warc_type"] for r in records
    ]


def test_decode_warc_summary():
    d = decode_warc(encode_warc_gz(_sample_records()))
    assert d["n_members"] == 3
    assert d["n_records"] == 3
    assert (d["n_warcinfo"], d["n_requests"], d["n_responses"]) == (1, 1, 1)
    assert d["http_status"] == 200
    assert d["first_uri"] == "http://example.com/page"
    assert d["first_body"] == "<html><body>hello crawl</body></html>"
    assert d["sum_body_bytes"] == len(b"<html><body>hello crawl</body></html>")


def test_header_continuation_lines():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"X-Long: part one\r\n\t part two\r\n"
        b"Content-Length: 2\r\n"
        b"\r\nok\r\n\r\n"
    )
    parsed, _ = parse_warc_record(rec, 0)
    assert parsed["payload"] == b"ok"


def test_malformed_records_raise_typed_errors():
    with pytest.raises(ValueError):
        parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\n", 0)
    no_len = b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody"
    with pytest.raises(ValueError):
        parse_warc_record(no_len, 0)
    good = _sample_records()[0]
    with pytest.raises(ValueError):
        parse_warc_record(good[:-10], 0)  # truncated payload


def test_non_http_payload_passthrough():
    http = parse_http_payload(b"just bytes, no message")
    assert http["status"] is None
    assert http["body"] == b"just bytes, no message"


def test_zlib_not_single_stream():
    """Regression guard for the classic bug: a concatenated .warc.gz
    is NOT one deflate stream — naive zlib.decompress(wbits=31) stops
    at the first member."""
    stream = gzip_member(b"one") + gzip_member(b"two")
    naive = zlib.decompress(stream, 31)
    assert naive == b"one"  # the trap
    assert split_gzip_members(stream) == [b"one", b"two"]  # the fix


# -- charset detection (r8) -------------------------------------------


def test_detect_charset_chain_order():
    from peerdb_cdc_psql_psql_spark.functions.warc import detect_charset

    # BOM wins over everything, header over meta, meta over sniffing
    assert detect_charset(b"\xef\xbb\xbfhi") == ("utf-8-sig", "bom")
    assert detect_charset(b"\xff\xfeh\x00") == ("utf-16", "bom")
    assert detect_charset(b"\xfe\xff\x00h") == ("utf-16", "bom")
    assert detect_charset(
        b'<meta charset="utf-8">x', "text/html; charset=iso-8859-1"
    ) == ("cp1252", "header")
    assert detect_charset(b'<meta charset="KOI8-R">x') == (
        "koi8-r", "meta",
    )
    assert detect_charset(b"plain ascii") == ("utf-8", "valid-utf-8")
    assert detect_charset("café".encode()) == ("utf-8", "valid-utf-8")
    assert detect_charset(b"caf\xe9") == ("cp1252", "fallback")


def test_detect_charset_whatwg_latin1_folds_to_cp1252():
    """Declared latin-1/ascii decode as windows-1252 in browsers —
    0x80-0x9F must come out as cp1252 punctuation, not C1 controls."""
    from peerdb_cdc_psql_psql_spark.functions.warc import decode_body_text

    text, cs, src = decode_body_text(
        b"a \x93quoted\x94 word", "text/plain; charset=ISO-8859-1"
    )
    assert (cs, src) == ("cp1252", "header")
    assert text == "a “quoted” word"


def test_detect_charset_unknown_label_falls_through():
    from peerdb_cdc_psql_psql_spark.functions.warc import detect_charset

    assert detect_charset(
        b"plain", "text/html; charset=x-bogus-charset"
    ) == ("utf-8", "valid-utf-8")


def test_decode_body_text_never_raises():
    from peerdb_cdc_psql_psql_spark.functions.warc import decode_body_text

    # lying header over invalid bytes → replacement chars, no raise
    text, cs, src = decode_body_text(
        b"ok\xe9", "text/plain; charset=utf-8"
    )
    assert cs == "utf-8" and "�" in text
    # BOM'd utf-16 consumes the BOM (no U+FEFF in the text)
    text, cs, src = decode_body_text(b"\xff\xfe" + "hé".encode("utf-16-le"))
    assert text == "hé" and "﻿" not in text
