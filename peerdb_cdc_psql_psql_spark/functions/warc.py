"""WARC/1.0 (ISO 28500) reader + writer, stdlib-only.

The web-crawl ingestion format: CommonCrawl ships ~100 TB crawls as
``.warc.gz`` files where EVERY RECORD IS ITS OWN GZIP MEMBER — the
convention that makes record-level random access (and Spark split
parallelism via offset indexes) possible. This module implements:

- the record grammar: ``WARC/1.0`` version line, CRLF header block,
  ``Content-Length``-delimited payload, double-CRLF record terminator;
- per-record gzip members on write (stdlib ``zlib`` with the gzip
  wrapper, wbits=31) and multi-member splitting on read via
  ``decompressobj().unused_data`` — a concatenated stream is NOT one
  deflate stream, the classic reader bug;
- the HTTP/1.1 message split for ``response``/``request`` records
  (status line, header block, body after the first blank line).

Scale posture: parse/encode run executor-side inside mapInPandas
batches (see operators/web.py); one crawl file maps to one task, and
nothing here touches the driver. Like codecs.py, the module registers
itself for cloudpickle BY-VALUE serialization so worker closures stay
import-free (memory: worker-closure-imports).

Reference parity note: the reference stack has no crawl ingestion —
this extends the engine along the LLM-training-data axis the build
brief lists as first-class (web corpus → text → quality → dedup).
"""

from __future__ import annotations

import codecs
import re
import sys
import zlib

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# gzip members
# ---------------------------------------------------------------------------


def gzip_member(raw: bytes) -> bytes:
    """One gzip member (mtime pinned to 0 — byte-deterministic)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    body = co.compress(raw) + co.flush()
    # zlib writes mtime from the clock into bytes 4:8; zero it for
    # deterministic fixtures (gzip spec: 0 = no timestamp).
    return body[:4] + b"\x00\x00\x00\x00" + body[8:]


def split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream into per-member bytes."""
    out: list[bytes] = []
    rest = data
    while rest:
        if rest[:2] != _GZIP_MAGIC:
            raise ValueError("not a gzip member boundary")
        do = zlib.decompressobj(31)
        try:
            out.append(do.decompress(rest))
        except zlib.error as e:
            # normalize: parse_warc's one documented failure type is
            # ValueError, so per-file degrade guards stay single-type
            raise ValueError(f"corrupt gzip member: {e}") from e
        if not do.eof:
            raise ValueError("truncated gzip member")
        rest = do.unused_data
    return out


# ---------------------------------------------------------------------------
# WARC records
# ---------------------------------------------------------------------------


def build_http_response(
    body: bytes, content_type: str = "text/html", status: int = 200
) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Unknown"
    )
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("ascii")
    return head + _CRLF + body


def build_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str = "urn:uuid:00000000-0000-0000-0000-000000000000",
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<{record_id}>"),
        ("WARC-Date", date),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    head = b"WARC/1.0" + _CRLF
    head += b"".join(f"{k}: {v}\r\n".encode("ascii") for k, v in headers)
    return head + _CRLF + payload + _CRLF + _CRLF


def encode_warc_gz(records: list[bytes]) -> bytes:
    """Concatenate records as independent gzip members (the
    CommonCrawl ``.warc.gz`` layout)."""
    return b"".join(gzip_member(r) for r in records)


def _parse_header_block(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    last_key: str | None = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last_key is not None:
            # RFC 822 continuation line
            headers[last_key] += " " + line.strip().decode("latin-1")
            continue
        k, _, v = line.partition(b":")
        last_key = k.strip().decode("latin-1").lower()
        headers[last_key] = v.strip().decode("latin-1")
    return headers


def parse_warc_record(raw: bytes, offset: int = 0) -> tuple[dict, int]:
    """Parse one record starting at ``offset``; return (record, next
    offset). Tolerates the optional trailing CRLFs."""
    if raw[offset : offset + 9] not in (b"WARC/1.0\r", b"WARC/1.1\r"):
        raise ValueError(f"no WARC version line at offset {offset}")
    ver_end = raw.index(_CRLF, offset)
    head_end = raw.index(_CRLF + _CRLF, ver_end)
    headers = _parse_header_block(raw[ver_end + 2 : head_end])
    try:
        n = int(headers["content-length"])
    except (KeyError, ValueError) as exc:
        raise ValueError("WARC record missing Content-Length") from exc
    body_start = head_end + 4
    if body_start + n > len(raw):
        raise ValueError("WARC payload truncated")
    payload = raw[body_start : body_start + n]
    pos = body_start + n
    while raw[pos : pos + 2] == _CRLF:
        pos += 2
    rec = {
        "version": raw[offset : ver_end].decode("ascii"),
        "warc_type": headers.get("warc-type", ""),
        "target_uri": headers.get("warc-target-uri"),
        "date": headers.get("warc-date", ""),
        "content_type": headers.get("content-type", ""),
        "content_length": n,
        "payload": payload,
    }
    return rec, pos


def parse_http_payload(payload: bytes) -> dict:
    """Split an application/http payload into status + headers + body."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload[:5] in (b"HTTP/", b"GET /", b"POST "):
        return {"status": None, "http_headers": {}, "body": payload}
    head = payload[:sep]
    first = head.split(_CRLF, 1)[0].decode("latin-1")
    status = None
    if first.startswith("HTTP/"):
        parts = first.split(" ")
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    headers = _parse_header_block(head.split(_CRLF, 1)[1] if _CRLF in head else b"")
    return {"status": status, "http_headers": headers, "body": payload[sep + 4 :]}


def parse_warc(data: bytes) -> list[dict]:
    """Parse a ``.warc`` or ``.warc.gz`` blob into records. Gzipped
    input is split on member boundaries first; members may hold one
    record each (CommonCrawl) or several (plain concatenation)."""
    if data[:2] == _GZIP_MAGIC:
        chunks = split_gzip_members(data)
    else:
        chunks = [data]
    records: list[dict] = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            rec, pos = parse_warc_record(chunk, pos)
            # MIME types are case-insensitive — CommonCrawl emits
            # lowercase but 'Application/HTTP; msgtype=response' is
            # legal and must still parse (ADVICE r6 low)
            if rec["content_type"].lower().startswith("application/http"):
                rec.update(parse_http_payload(rec["payload"]))
            records.append(rec)
    return records


# -- charset detection + decode (r8) ----------------------------------
#
# Real crawl corpora are NOT all UTF-8: ~weeks-old pages declare
# charsets in Content-Type headers or <meta> tags, legacy pages ship
# undeclared windows-1252, and feeds ship UTF-16 with BOMs. The
# detection chain below is the WHATWG-ish order browsers use:
# BOM → Content-Type header → <meta> in the first 2 KB → strict
# UTF-8 validation → windows-1252 fallback. Browsers also treat
# declared latin-1/ascii AS windows-1252 (the WHATWG encoding spec
# folds them), which is what keeps 0x80-0x9F bytes readable.

_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9_.:\-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?([A-Za-z0-9_.:\-]+)", re.I
)


def _resolve_charset(name: str) -> str | None:
    """Normalize a declared charset label to a Python codec name, or
    None when the label is unknown (the chain then continues)."""
    name = name.strip().lower()
    if name in ("iso-8859-1", "iso8859-1", "latin-1", "latin1",
                "us-ascii", "ascii"):
        return "cp1252"  # WHATWG folding
    if name in ("utf8", "utf-8"):
        return "utf-8"
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def detect_charset(
    body: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """(codec name, detection source) for an HTTP body. Sources:
    ``bom`` / ``header`` / ``meta`` / ``valid-utf-8`` /
    ``fallback``."""
    if body.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", "bom"
    if body.startswith(b"\xff\xfe") or body.startswith(b"\xfe\xff"):
        return "utf-16", "bom"  # the utf-16 codec consumes the BOM
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            cs = _resolve_charset(m.group(1))
            if cs is not None:
                return cs, "header"
    m = _META_CHARSET_RE.search(body[:2048])
    if m:
        cs = _resolve_charset(m.group(1).decode("latin-1"))
        if cs is not None:
            return cs, "meta"
    try:
        body.decode("utf-8")
        return "utf-8", "valid-utf-8"
    except UnicodeDecodeError:
        return "cp1252", "fallback"


def decode_body_text(
    body: bytes, content_type: str | None = None
) -> tuple[str, str, str]:
    """Charset-aware body decode → (text, codec, detection source).
    Decoding never raises (errors='replace'): a mislabeled body
    degrades to replacement characters, not a task failure."""
    cs, src = detect_charset(body, content_type)
    try:
        return body.decode(cs, "replace"), cs, src
    except (LookupError, ValueError):
        return body.decode("utf-8", "replace"), "utf-8", "fallback"


def decode_warc(data: bytes) -> dict:
    """Summary contract for the oracle-checked query: member/record
    counts by type + exact byte accounting."""
    n_members = len(split_gzip_members(data)) if data[:2] == _GZIP_MAGIC else 0
    records = parse_warc(data)
    by_type: dict[str, int] = {}
    for r in records:
        by_type[r["warc_type"]] = by_type.get(r["warc_type"], 0) + 1
    responses = [r for r in records if r["warc_type"] == "response"]
    return {
        "n_members": n_members,
        "n_records": len(records),
        "n_warcinfo": by_type.get("warcinfo", 0),
        "n_requests": by_type.get("request", 0),
        "n_responses": len(responses),
        "sum_content_length": sum(r["content_length"] for r in records),
        "sum_body_bytes": sum(len(r.get("body", b"")) for r in responses),
        "http_status": responses[0].get("status") if responses else None,
        "first_uri": responses[0]["target_uri"] if responses else None,
        "first_body": (
            responses[0].get("body", b"").decode("utf-8", "replace")
            if responses
            else None
        ),
    }


# ---------------------------------------------------------------------------
# Fixture-record synthesis (lives HERE, not in operators/web.py: worker
# closures capture it, and only this module is cloudpickle-registered
# by value — a module-level function in an operators/ module would be
# pickled by REFERENCE and crash import-free workers; memory:
# worker-closure-imports)
# ---------------------------------------------------------------------------

WARCINFO_PAYLOAD = b"software: spark-graft-crawler/1.0\r\nformat: WARC/1.0\r\n"
CRAWL_HOST = "crawl.example.com"


def build_doc_records(doc_id: int, body: bytes, content_type: str) -> list[bytes]:
    """The 3-record (warcinfo + request + response) fixture for one
    document — the layout `warc_record_stats`'s oracle re-derives
    byte-for-byte."""
    uri = f"http://{CRAWL_HOST}/doc/{doc_id}"
    return [
        build_warc_record(
            "warcinfo", WARCINFO_PAYLOAD,
            content_type="application/warc-fields",
        ),
        build_warc_record(
            "request",
            f"GET /doc/{doc_id} HTTP/1.1\r\nHost: {CRAWL_HOST}\r\n\r\n".encode(),
            target_uri=uri,
            content_type="application/http; msgtype=request",
        ),
        build_warc_record(
            "response",
            build_http_response(body, content_type=content_type),
            target_uri=uri,
        ),
    ]


try:  # pragma: no cover — exercised by the driver-contract e2e path
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 — never fail import over a perf/compat lever
    pass
