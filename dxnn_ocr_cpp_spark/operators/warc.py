"""WARC source reader — the web-archive container format (ISO 28500)
that web-scale corpora ship in (Common Crawl et al.): each blob holds
many records `WARC/1.0 CRLF headers CRLF CRLF <Content-Length octets>
CRLF CRLF`; response records wrap an HTTP message (status line +
headers + body).

This is the S1/S5 source analog for archived web text (the reference's
file ingestion + 1->N sub-document fan-out, /root/reference/server/
file_handler.h:38 and src/pipeline/ocr_pipeline.cpp page fan-out),
re-expressed as the pdftext pattern: blobs stay opaque binary columns
until ONE mapInPandas hop parses and explodes them — 1 blob row in,
N record rows out, so the per-record fan-out happens inside the Arrow
batch (no explode-of-UDF double-eval, no driver involvement) and
parallelism is executor cores times blob partitions.

Fault containment mirrors parse_pdf: a malformed record yields a
single status!='ok' row and the scanner RESYNCS to the next
'WARC/'-magic offset, so one corrupt record can never eat the rest of
the blob — at 100 TB some records are always corrupt, and a
reader that dies (or silently truncates) on the first bad record is
unusable. Statuses: ok | truncated (Content-Length overruns the blob)
| bad-header (no parsable header block).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' import point)
from pyspark.sql import types as T

_MAGIC = b"WARC/1.0\r\n"
_HTTP_STATUS_RE = re.compile(rb"^HTTP/\d\.\d (\d{3})")

RECORD_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("rec_idx", T.IntegerType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
    T.StructField("status", T.StringType()),
])


def _parse_headers(block: bytes) -> dict:
    out = {}
    for line in block.split(b"\r\n"):
        k, sep, v = line.partition(b": ")
        if sep:
            out[k.decode("latin-1").lower()] = v.decode("latin-1")
    return out


def _split_http(payload: bytes):
    """HTTP message -> (status_code, content_type, body). A payload
    with no HTTP preamble is returned whole (status/type None) —
    non-response records carry raw payloads."""
    m = _HTTP_STATUS_RE.match(payload)
    if not m:
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return int(m.group(1)), None, b""
    hdrs = _parse_headers(head.split(b"\r\n", 1)[1]
                          if b"\r\n" in head else b"")
    return int(m.group(1)), hdrs.get("content-type"), body


def parse_warc(blob) -> list:
    """bytes -> [(rec_idx, record_type, target_uri, http_status,
    content_type, body, status)], resyncing to the next WARC magic
    after any malformed record."""
    if blob is None:
        return []
    blob = bytes(blob)
    out, pos, idx = [], 0, 0

    def emit(rtype, uri, st, ctype, body, status):
        nonlocal idx
        out.append((idx, rtype, uri, st, ctype, body, status))
        idx += 1

    while True:
        start = blob.find(_MAGIC, pos)
        if start < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            emit(None, None, None, None, b"", "bad-header")
            break
        hdrs = _parse_headers(blob[start + len(_MAGIC):hdr_end])
        rtype = hdrs.get("warc-type")
        uri = hdrs.get("warc-target-uri")
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            emit(rtype, uri, None, None, b"", "bad-header")
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        if body_start + clen > len(blob):
            emit(rtype, uri, None, None, b"", "truncated")
            pos = body_start
            continue
        payload = blob[body_start:body_start + clen]
        st, ctype, body = _split_http(payload)
        emit(rtype, uri, st, ctype, body, "ok")
        pos = body_start + clen
    return out


def warc_records(df: DataFrame, id_col: str = "blob_id",
                 blob_col: str = "blob") -> DataFrame:
    """(blob_id, blob BINARY) -> one row per WARC record, exploded
    inside one mapInPandas hop (see module docstring)."""
    def gen(batches):
        for b in batches:
            rows = {f.name: [] for f in RECORD_SCHEMA.fields}
            for bid, raw in zip(b[id_col], b[blob_col]):
                for (ri, rt, uri, st, ct, body, status) in parse_warc(raw):
                    rows["blob_id"].append(bid)
                    rows["rec_idx"].append(ri)
                    rows["record_type"].append(rt)
                    rows["target_uri"].append(uri)
                    rows["http_status"].append(st)
                    rows["content_type"].append(ct)
                    rows["body"].append(body)
                    rows["status"].append(status)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(gen,
                                                   schema=RECORD_SCHEMA)


def build_record(uri: str, payload: bytes,
                 record_type: str = "response") -> bytes:
    """Serialize one WARC record (test/synthesis helper — the writer
    twin of parse_warc; round-trip pinned in tests/test_warc.py)."""
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {record_type}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode("latin-1")
    return hdr + payload + b"\r\n\r\n"


def build_http_payload(body: bytes, status: int = 200,
                       content_type: str = "text/html") -> bytes:
    return (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n\r\n").encode("latin-1") + body
