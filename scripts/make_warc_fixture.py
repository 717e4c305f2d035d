#!/usr/bin/env python3
"""Generate fixtures/tiny_warc/ — a minimal, spec-conformant WARC
corpus hand-encoded at the wire level (ISO 28500; no warcio or other
WARC library), so the repo's native Scala reader is tested against an
INDEPENDENT encoding of the published format.

Layout exercised on purpose:
- a.warc (uncompressed):  4 records — a response carrying an HTTP
  envelope with CRLFs inside the payload, a request, a metadata
  record with a FOLDED (continuation-line) header, and a zero-length
  payload record; header name casing varies (the spec says field
  names are case-insensitive).
- b.warc.gz (compressed): 3 records, EACH ITS OWN GZIP MEMBER
  concatenated into one file — the CommonCrawl per-record layout a
  streaming reader must consume member-by-member.

Besides the WARCs it writes fixtures/tiny_warc_expected.parquet: the
rows graft's scan must produce (src_file, record_index, warc_type,
record_id, target_uri, warc_date, content_type, content_length,
payload_md5), so the driver's DuckDB oracle can grade q182_warc_scan
with a plain SELECT over that parquet. payload_md5 is the lowercase
hex md5 — identical in hashlib and Spark's md5().

Run: python3 scripts/make_warc_fixture.py   (writes both fixtures)
"""
import gzip
import hashlib
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
OUT = os.path.join(ROOT, "tiny_warc")
os.makedirs(OUT, exist_ok=True)

CRLF = b"\r\n"


def record(headers, payload):
    """headers: list of (name, value) — written in the given order and
    casing; Content-Length appended automatically."""
    lines = [b"WARC/1.0"]
    for k, v in headers:
        lines.append(k.encode() + b": " + v.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    head = CRLF.join(lines) + CRLF + CRLF
    return head + payload + CRLF + CRLF


http_payload = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html\r\n"
    b"\r\n"
    b"<html><body>hello warc \xe2\x9c\x93</body></html>"
)

a_records = [
    record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000001>"),
         ("WARC-Date", "2026-01-02T03:04:05Z"),
         ("WARC-Target-URI", "http://example.com/a"),
         ("Content-Type", "application/http;msgtype=response")],
        http_payload),
    record(
        # lowercase header names: field names are case-insensitive
        [("warc-type", "request"),
         ("warc-record-id", "<urn:uuid:00000000-0000-0000-0000-000000000002>"),
         ("warc-date", "2026-01-02T03:04:05Z"),
         ("warc-target-uri", "http://example.com/a"),
         ("content-type", "application/http;msgtype=request")],
        b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"),
    record(
        # folded header: continuation line joins with a single space
        [("WARC-Type", "metadata"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000003>"),
         ("WARC-Date", "2026-01-02T03:04:06Z"),
         ("WARC-Target-URI", "http://example.com/a"),
         ("X-Long-Note", "first part\r\n  second part"),
         ("Content-Type", "application/warc-fields")],
        b"fetchTimeMs: 42\r\n"),
    record(
        [("WARC-Type", "resource"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000004>"),
         ("WARC-Date", "2026-01-02T03:04:07Z")],
        b""),
]

b_records = [
    record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-00000000000a>"),
         ("WARC-Date", "2026-02-03T04:05:06Z"),
         ("WARC-Target-URI", "https://example.org/b?q=caf%C3%A9"),
         ("Content-Type", "application/http;msgtype=response")],
        b"HTTP/1.1 404 Not Found\r\n\r\n"),
    record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-00000000000b>"),
         ("WARC-Date", "2026-02-03T04:05:07Z"),
         ("WARC-Target-URI", "https://example.org/c"),
         ("Content-Type", "application/http;msgtype=response")],
        b"HTTP/1.1 200 OK\r\n\r\n" + b"x" * 1000),
    record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-00000000000c>"),
         ("WARC-Date", "2026-02-03T04:05:08Z"),
         ("Content-Type", "application/warc-fields")],
        b"software: tiny-fixture-encoder/1.0\r\n"),
]

with open(os.path.join(OUT, "a.warc"), "wb") as f:
    for r in a_records:
        f.write(r)

# one gzip member PER RECORD, concatenated (the CommonCrawl layout)
with open(os.path.join(OUT, "b.warc.gz"), "wb") as f:
    for r in b_records:
        f.write(gzip.compress(r, mtime=0))


def parse_expected(src_file, records):
    rows = []
    for i, raw in enumerate(records):
        head, _, rest = raw.partition(CRLF + CRLF)
        lines = head.split(CRLF)[1:]
        h = {}
        last = None
        for ln in lines:
            s = ln.decode()
            if s[:1] in (" ", "\t"):
                h[last] = h[last] + " " + s.strip()
            else:
                k, _, v = s.partition(":")
                last = k.strip().lower()
                h[last] = v.strip()
        n = int(h["content-length"])
        payload = rest[:n]
        rows.append({
            "src_file": src_file,
            "record_index": i,
            "warc_type": h.get("warc-type", "unknown"),
            "record_id": h.get("warc-record-id", ""),
            "target_uri": h.get("warc-target-uri"),
            "warc_date": h.get("warc-date"),
            "content_type": h.get("content-type"),
            "content_length": n,
            "payload_md5": hashlib.md5(payload).hexdigest(),
        })
    return rows


rows = parse_expected("a.warc", a_records) + parse_expected("b.warc.gz", b_records)

import pyarrow as pa
import pyarrow.parquet as pq

table = pa.Table.from_pylist(rows, schema=pa.schema([
    ("src_file", pa.string()),
    ("record_index", pa.int64()),
    ("warc_type", pa.string()),
    ("record_id", pa.string()),
    ("target_uri", pa.string()),
    ("warc_date", pa.string()),
    ("content_type", pa.string()),
    ("content_length", pa.int64()),
    ("payload_md5", pa.string()),
]))
pq.write_table(table, os.path.join(ROOT, "tiny_warc_expected.parquet"))
print(f"wrote {OUT}/a.warc ({len(a_records)} records), "
      f"{OUT}/b.warc.gz ({len(b_records)} members), "
      f"{ROOT}/tiny_warc_expected.parquet ({len(rows)} rows)")
