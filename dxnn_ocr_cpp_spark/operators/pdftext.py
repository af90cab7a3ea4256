"""PDF text extraction — the reference's PDF source re-targeted at text.

The reference renders PDF pages to images with Poppler and OCRs them
(S5: /root/reference/server/pdf_handler.h:183-241 — parallel page
rendering bounded by a semaphore, per-page success/error records,
pageIndex-ordered reassembly /root/reference/server/ocr_handler.cpp:505-559).
A text-first pipeline skips rasterization: machine-generated PDFs carry
their text in content streams. This module parses them directly —
pure Python + stdlib zlib (FlateDecode), no external PDF library:

  * object table scan (`N 0 obj ... endobj`),
  * page-tree walk (/Root -> /Pages -> /Kids) with object-id-order
    fallback for broken trees,
  * per-page /Contents stream fetch, Flate decompress,
  * BT..ET text-operator tokenization: (..) Tj, [..] TJ, ', ",
    octal/escape/hex-string decoding, UTF-16BE detection.

Per-page records carry a status instead of raising (the reference's
per-page success/error analog): "ok", "no-text",
"needs-decoder:<Filter>" for unsupported filters (DCTDecode etc.),
"parse-error" for garbage. Deterministic: output is a pure function of
the bytes. The 1->N page explosion happens inside one mapInPandas hop
(bounded concurrency = executor cores, replacing the semaphore).
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame

PAGE_SCHEMA = "id long, page_idx int, text string, status string"

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_CONTENTS_RE = re.compile(
    rb"/Contents\s*(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)*)\s*\])")
_FILTER_RE = re.compile(rb"/Filter\s*(?:/(\w+)|\[\s*/(\w+)[^\]]*\])")
_PAGES_ROOT_RE = re.compile(rb"/Type\s*/Pages\b")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
# text-showing operators inside BT..ET: literal string, hex string,
# TJ array, and the operator token that follows
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_SHOW_RE = re.compile(
    rb"(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|\[(?:[^\]\\]|\\.)*\])\s*"
    rb"(Tj|TJ|'|\")", re.DOTALL)
_ARRAY_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(body: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = body[i + 1:i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \ooo (1-3 digits)
            j = i + 1
            while j < min(i + 4, n) and body[j:j + 1].isdigit():
                j += 1
            out.append(int(body[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt == b"\n":   # line continuation
            i += 2
        else:                # unknown escape: drop the backslash
            i += 1
    return bytes(out)


def _decode_string_token(tok: bytes) -> str:
    """One PDF string token -> text. UTF-16BE when BOM-prefixed,
    PDFDocEncoding~latin-1 otherwise (the simple-font case)."""
    if tok.startswith(b"("):
        raw = _unescape_literal(tok[1:-1])
    else:  # <hex>
        hx = re.sub(rb"\s+", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        try:
            raw = bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return ""
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _stream_text(data: bytes) -> str:
    parts = []
    for block in _BT_RE.findall(data):
        for operand, op in _SHOW_RE.findall(block):
            if op == b"TJ":
                for s in _ARRAY_STR_RE.findall(operand):
                    parts.append(_decode_string_token(s))
            else:
                if op in (b"'", b'"'):
                    parts.append("\n")  # next-line show operators
                parts.append(_decode_string_token(operand))
        parts.append("\n")  # block boundary
    return "".join(parts).strip()


def parse_pdf(raw: bytes | None) -> list:
    """bytes -> [(page_idx, text, status)] — never raises; garbage in,
    one ('', 'parse-error') page out; non-PDF prefix -> 'not-pdf'."""
    if raw is None or not raw.startswith(b"%PDF"):
        return [(0, "", "not-pdf")]
    try:
        objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(raw)}
        if not objs:
            return [(0, "", "parse-error")]
        # page order: walk /Pages /Kids depth-first; fall back to
        # object-id order over /Type /Page objects when the tree is odd
        page_ids: list = []

        def walk(oid: int, depth: int = 0) -> None:
            body = objs.get(oid)
            if body is None or depth > 32:
                return
            if _PAGE_RE.search(body):
                if oid not in page_ids:
                    page_ids.append(oid)
                return
            km = _KIDS_RE.search(body)
            if km:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)), depth + 1)

        roots = [oid for oid, b in objs.items()
                 if _PAGES_ROOT_RE.search(b) and not _KIDS_RE.search(b) is None
                 and not _PAGE_RE.search(b)]
        for r in sorted(roots):
            walk(r)
        if not page_ids:
            page_ids = sorted(o for o, b in objs.items() if _PAGE_RE.search(b))
        if not page_ids:
            return [(0, "", "no-pages")]

        out = []
        for idx, pid in enumerate(page_ids):
            body = objs[pid]
            cm = _CONTENTS_RE.search(body)
            if not cm:
                out.append((idx, "", "no-text"))
                continue
            refs = ([int(cm.group(1))] if cm.group(1)
                    else [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))])
            texts, status = [], "ok"
            for ref in refs:
                cbody = objs.get(ref)
                if cbody is None:
                    continue
                sm = _STREAM_RE.search(cbody)
                if sm is None:
                    continue
                data = sm.group(1)
                fm = _FILTER_RE.search(cbody[:sm.start()])
                filt = (fm.group(1) or fm.group(2)).decode() if fm else None
                if filt == "FlateDecode":
                    try:
                        # decompressobj tolerates trailing EOL bytes
                        # before 'endstream' (unused_data)
                        data = zlib.decompressobj().decompress(data)
                    except zlib.error:
                        status = "needs-decoder:FlateDecode"
                        continue
                elif filt is not None:
                    status = f"needs-decoder:{filt}"
                    continue
                texts.append(_stream_text(data))
            text = "\n".join(t for t in texts if t)
            if status == "ok" and not text:
                status = "no-text"
            out.append((idx, text, status))
        return out
    except Exception:
        return [(0, "", "parse-error")]


def pdf_pages(df: DataFrame, id_col: str = "doc_id",
              pdf_col: str = "pdf") -> DataFrame:
    """(id, pdf BINARY) -> (id, page_idx, text, status) — one row per
    page, exploded inside the Python hop (the reference's parallel
    page fan-out, concurrency = executor cores instead of a
    semaphore; reassembly = groupBy(id) sort_array(collect_list),
    exactly J4)."""
    def gen(batches):
        for pdf_batch in batches:
            ids, pidx, texts, status = [], [], [], []
            for i, raw in zip(pdf_batch[id_col], pdf_batch[pdf_col]):
                for p, t, st in parse_pdf(raw):
                    ids.append(i)
                    pidx.append(p)
                    texts.append(t)
                    status.append(st)
            yield pd.DataFrame({"id": ids, "page_idx": pidx,
                                "text": texts, "status": status})

    return df.select(id_col, pdf_col).mapInPandas(gen, schema=PAGE_SCHEMA)


def _pdf_string(s: str) -> bytes:
    """Encode one text as a PDF string token: escaped literal when
    latin-1-safe, BOM-prefixed UTF-16BE hex string otherwise."""
    try:
        raw = s.encode("latin-1")
        raw = raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
        return b"(" + raw + b")"
    except UnicodeEncodeError:
        return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode() + b">"


def build_pdf(pages, compress: bool = False) -> bytes:
    """Deterministic minimal PDF from page texts — the synthetic-corpus
    generator analog for the PDF source (the reference ships test
    images; we ship a constructor). parse_pdf(build_pdf(pages)) round-
    trips each page to page_text.strip()."""
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ]
    for i, text in enumerate(pages):
        content = (b"BT /F1 12 Tf 72 720 Td "
                   + _pdf_string(text) + b" Tj ET")
        data = zlib.compress(content) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append((3 + 2 * i,
                     f"<< /Type /Page /Parent 2 0 R /Contents "
                     f"{4 + 2 * i} 0 R >>".encode()))
        objs.append((4 + 2 * i,
                     b"<< " + filt + f"/Length {len(data)} >>".encode()
                     + b"\nstream\n" + data + b"\nendstream"))
    out = b"%PDF-1.4\n"
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    return out + b"%%EOF"


def pdf_roundtrip_ok(text_col):
    """Column: build a 1-page FlateDecode PDF from the text, parse it
    back, true iff the text survives exactly (stripped). The driver
    query's kernel — lives here so both sides share one implementation."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def roundtrip(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            pages = parse_pdf(build_pdf([t], compress=True))
            out.append(len(pages) == 1
                       and pages[0][1] == (t or "").strip()
                       and pages[0][2] in ("ok", "no-text"))
        return pd.Series(out)

    return roundtrip(text_col)
