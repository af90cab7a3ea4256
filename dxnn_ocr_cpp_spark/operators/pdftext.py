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
"decode-error:FlateDecode" for corrupt Flate data, "parse-error" for
garbage — contained per page, not per document. Deterministic: output is a pure function of
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
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# direct-integer /Length only (negative lookahead rejects 'N G R'
# indirect refs, which we can't resolve without another objs lookup)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_CONTENTS_RE = re.compile(
    rb"/Contents\s*(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)*)\s*\])")
_FILTER_RE = re.compile(rb"/Filter\s*(?:/(\w+)|\[\s*/(\w+)[^\]]*\])")
_PAGES_ROOT_RE = re.compile(rb"/Type\s*/Pages\b")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CATALOG_RE = re.compile(rb"/Type\s*/Catalog\b")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_NAME_TOKEN_RE = re.compile(rb"/[^\s()<>\[\]/%]*")
_OPNUM_RE = re.compile(rb"[^\s()<>\[\]/%]+")
_PDF_WS = b" \t\r\n\x0c\x00"

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
        elif nxt and nxt in b"01234567":  # octal \ooo (1-3 OCTAL digits;
            # \8 and \9 are invalid escapes and fall through to the
            # drop-the-backslash branch — isdigit() here once collapsed
            # whole documents to parse-error on '(he\8llo)')
            j = i + 1
            while j < min(i + 4, n) and body[j:j + 1] in b"01234567":
                j += 1
            out.append(int(body[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt == b"\n":   # line continuation
            i += 2
        else:                # unknown escape: drop the backslash
            i += 1
    return bytes(out)


def _decode_inner(kind: str, raw: bytes) -> str:
    """Inner bytes of one string token -> text. UTF-16BE when
    BOM-prefixed, PDFDocEncoding~latin-1 otherwise (simple fonts)."""
    if kind == "str":
        raw = _unescape_literal(raw)
    else:  # hex
        hx = re.sub(rb"\s+", b"", raw)
        if len(hx) % 2:
            hx += b"0"
        try:
            raw = bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return ""
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _iter_tokens(data: bytes):
    """Sequential content-stream tokenizer: strings (with PDF's nested
    balanced parens + escapes) and dicts are atoms, so operator names
    appearing INSIDE string data ('NET gains' contains 'ET') can never
    be mistaken for operators — the bug class a regex scan has."""
    i, n = 0, len(data)
    find = data.find
    while i < n:
        c = data[i:i + 1]
        if c in _PDF_WS:
            i += 1
        elif c == b"(":
            depth, j = 1, i + 1
            buf = bytearray()
            while j < n and depth:
                ch = data[j:j + 1]
                if ch == b"\\":
                    buf += data[j:j + 2]
                    j += 2
                elif ch == b"(":
                    depth += 1
                    buf += ch
                    j += 1
                elif ch == b")":
                    depth -= 1
                    if depth:
                        buf += ch
                    j += 1
                else:
                    buf += ch
                    j += 1
            yield ("str", bytes(buf))
            i = j
        elif c == b"<":
            if data[i:i + 2] == b"<<":  # dict: skip balanced, dropped
                depth, j = 1, i + 2
                while j < n and depth:
                    two = data[j:j + 2]
                    if two == b"<<":
                        depth += 1
                        j += 2
                    elif two == b">>":
                        depth -= 1
                        j += 2
                    else:
                        j += 1
                i = j
            else:
                e = find(b">", i + 1)
                if e < 0:
                    return
                yield ("hex", data[i + 1:e])
                i = e + 1
        elif c in (b"[", b"]"):
            i += 1  # array delimiters: strings inside accumulate as operands
        elif c == b"%":
            e = find(b"\n", i)
            i = n if e < 0 else e + 1
        elif c == b"/":
            m = _NAME_TOKEN_RE.match(data, i)
            i = m.end() if m else i + 1
        else:
            m = _OPNUM_RE.match(data, i)
            if m is None:
                i += 1
                continue
            yield ("op", m.group())
            i = m.end()


def _stream_text(data: bytes) -> str:
    """Walk tokens; string operands accumulate until a text-show
    operator consumes them (Tj/'/" take the last, TJ takes all);
    numbers are operands (never clear), any other operator clears."""
    parts = []
    in_text = False
    pending = []
    for kind, val in _iter_tokens(data):
        if kind != "op":
            if in_text:
                pending.append(_decode_inner(kind, val))
            continue
        lead = val[:1]
        if lead.isdigit() or lead in (b"+", b"-", b"."):
            continue  # numeric operand
        if val == b"BT":
            in_text, pending = True, []
        elif val == b"ET":
            if in_text:
                parts.append("\n")  # block boundary
            in_text, pending = False, []
        elif not in_text:
            continue
        elif val == b"Tj":
            if pending:
                parts.append(pending[-1])
            pending = []
        elif val == b"TJ":
            parts.extend(pending)
            pending = []
        elif val in (b"'", b'"'):
            parts.append("\n")  # next-line show operators
            if pending:
                parts.append(pending[-1])
            pending = []
        else:  # any other operator consumed its operands
            pending = []
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

        # root resolution: /Catalog's /Pages ref is authoritative —
        # walking every /Pages node would visit intermediate tree nodes
        # in object-id order and scramble page order for nested trees
        cat_roots = [int(m.group(1))
                     for _, b in sorted(objs.items())
                     if _CATALOG_RE.search(b)
                     and (m := _PAGES_REF_RE.search(b)) is not None]
        for r in cat_roots:
            walk(r)
        if not page_ids:  # no/broken catalog: top-level /Pages nodes,
            # i.e. those not referenced as a Kid of another /Pages
            kid_ids = {int(rm.group(1))
                       for _, b in objs.items() if _PAGES_ROOT_RE.search(b)
                       for km in _KIDS_RE.finditer(b)
                       for rm in _REF_RE.finditer(km.group(1))}
            for r in sorted(oid for oid, b in objs.items()
                            if _PAGES_ROOT_RE.search(b)
                            and _KIDS_RE.search(b) is not None
                            and not _PAGE_RE.search(b)
                            and oid not in kid_ids):
                walk(r)
        if not page_ids:
            page_ids = sorted(o for o, b in objs.items() if _PAGE_RE.search(b))
        if not page_ids:
            return [(0, "", "no-pages")]

        # per-page try: one bad string/stream degrades ONE page record,
        # not the whole document (the reference's per-page success/error
        # containment, /root/reference/server/pdf_handler.h:149-174)
        return [_page_record(objs, idx, pid)
                for idx, pid in enumerate(page_ids)]
    except Exception:
        return [(0, "", "parse-error")]


def _stream_body(cbody: bytes) -> bytes | None:
    """Slice one content object's stream body. A direct-integer /Length
    is authoritative (embedded 'endstream' byte sequences inside
    compressed data silently truncate the regex match otherwise); fall
    back to the stream..endstream regex when /Length is absent,
    indirect, or inconsistent with the object bytes."""
    lm = _LENGTH_RE.search(cbody)
    if lm:
        sm = _STREAM_START_RE.search(cbody)
        if sm:
            start, length = sm.end(), int(lm.group(1))
            end = start + length
            # sanity: 'endstream' must follow (within EOL slack)
            if end <= len(cbody) and \
                    cbody[end:].lstrip(b"\r\n \t").startswith(b"endstream"):
                return cbody[start:end]
    m = _STREAM_RE.search(cbody)
    return m.group(1) if m else None


def _page_record(objs: dict, idx: int, pid: int) -> tuple:
    try:
        body = objs[pid]
        cm = _CONTENTS_RE.search(body)
        if not cm:
            return (idx, "", "no-text")
        refs = ([int(cm.group(1))] if cm.group(1)
                else [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))])
        texts, status = [], "ok"
        for ref in refs:
            cbody = objs.get(ref)
            if cbody is None:
                continue
            data = _stream_body(cbody)
            if data is None:
                continue
            # /Filter lives in the object dict BEFORE the stream
            # keyword; bound the search by the keyword match, not by a
            # bare 'stream' substring which a dict string value (e.g.
            # '(stream)') could fake out earlier
            sk = _STREAM_START_RE.search(cbody)
            fm = _FILTER_RE.search(cbody[:sk.start()] if sk else cbody)
            filt = (fm.group(1) or fm.group(2)).decode() if fm else None
            if filt == "FlateDecode":
                try:
                    # decompressobj tolerates trailing EOL bytes
                    # before 'endstream' (unused_data)
                    data = zlib.decompressobj().decompress(data)
                except zlib.error:
                    # supported filter, corrupt bytes — distinct from
                    # the missing-decoder case
                    status = "decode-error:FlateDecode"
                    continue
            elif filt is not None:
                status = f"needs-decoder:{filt}"
                continue
            texts.append(_stream_text(data))
        text = "\n".join(t for t in texts if t)
        if status == "ok" and not text:
            status = "no-text"
        return (idx, text, status)
    except Exception:
        return (idx, "", "parse-error")


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
    latin-1-safe, BOM-prefixed UTF-16BE hex string otherwise.
    None -> empty string (null text rows must not kill the batch)."""
    if s is None:
        s = ""
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
