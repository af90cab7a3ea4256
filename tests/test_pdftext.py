"""PDF text extraction tests (operators/pdftext.py) — synthetic PDFs
constructed in-test (uncompressed + FlateDecode), page ordering via the
page tree, string escapes/hex/UTF-16BE, garbage tolerance, and the
Spark 1->N page fan-out + J4 reassembly."""

import zlib

import pytest

from dxnn_ocr_cpp_spark.operators.pdftext import parse_pdf, pdf_pages


def make_pdf(page_contents, compress=False) -> bytes:
    """Minimal well-formed PDF: catalog -> pages -> N (page, content)."""
    n = len(page_contents)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ]
    for i, content in enumerate(page_contents):
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


def tj(text: str) -> bytes:
    return f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode("latin-1")


class TestParse:
    def test_two_pages_in_order(self):
        pdf = make_pdf([tj("first page"), tj("second page")])
        assert parse_pdf(pdf) == [(0, "first page", "ok"),
                                  (1, "second page", "ok")]

    def test_flate_compressed(self):
        pdf = make_pdf([tj("compressed text")], compress=True)
        assert parse_pdf(pdf) == [(0, "compressed text", "ok")]

    def test_escapes_octal_hex_utf16(self):
        content = (rb"BT (a\(b\)c \\ \101) Tj "
                   rb"<48656C6C6F> Tj "
                   rb"[(He) -30 (llo)] TJ "
                   rb"<FEFF00480069> Tj ET")
        pdf = make_pdf([content])
        [(_, text, status)] = parse_pdf(pdf)
        assert status == "ok"
        assert text == "a(b)c \\ AHelloHelloHi"

    def test_next_line_show_operators(self):
        pdf = make_pdf([rb"BT (one) Tj (two) ' ET".replace(b"'", b"'")])
        [(_, text, _)] = parse_pdf(pdf)
        assert text == "one\ntwo"

    def test_unsupported_filter_flagged(self):
        raw = make_pdf([tj("x")]).replace(b"<< /Length", b"<< /Filter /DCTDecode /Length")
        [(_, text, status)] = parse_pdf(raw)
        assert status == "needs-decoder:DCTDecode" and text == ""

    def test_garbage_and_none(self):
        assert parse_pdf(None) == [(0, "", "not-pdf")]
        assert parse_pdf(b"\x00\xffgarbage") == [(0, "", "not-pdf")]
        assert parse_pdf(b"%PDF-1.4 broken")[0][2] in ("parse-error", "no-pages")

    def test_page_without_contents(self):
        pdf = make_pdf([tj("x")]).replace(b"/Contents 4 0 R ", b"")
        assert parse_pdf(pdf) == [(0, "", "no-text")]

    def test_deterministic(self):
        pdf = make_pdf([tj("abc"), tj("def")], compress=True)
        assert parse_pdf(pdf) == parse_pdf(pdf)


class TestSpark:
    def test_fanout_and_reassembly(self, spark):
        from pyspark.sql import functions as F
        rows = [
            (1, make_pdf([tj("p one"), tj("p two"), tj("p three")])),
            (2, make_pdf([tj("solo")], compress=True)),
            (3, b"not a pdf"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, pdf binary")
        pages = pdf_pages(df)
        got = {(r.id, r.page_idx): (r.text, r.status) for r in pages.collect()}
        assert got[(1, 0)] == ("p one", "ok")
        assert got[(1, 2)] == ("p three", "ok")
        assert got[(2, 0)] == ("solo", "ok")
        assert got[(3, 0)] == ("", "not-pdf")
        # J4 reassembly: pageIndex-ordered concat per doc
        docs = (pages.filter(F.col("status") == "ok")
                .groupBy("id")
                .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("page_idx", "text"))),
                        lambda s: s["text"]), "\n").alias("text")))
        out = {r.id: r.text for r in docs.collect()}
        assert out[1] == "p one\np two\np three"


def test_build_pdf_roundtrip_corpus_texts():
    """build_pdf -> parse_pdf roundtrips arbitrary unicode text (the
    pdf_roundtrip driver query's invariant)."""
    from dxnn_ocr_cpp_spark.operators.pdftext import build_pdf
    cases = ["plain", "parens (and) \\ stuff", "数据页面 unicode 。",
             "  ws  ", "", "line\nbreaks\nkept"]
    for t in cases:
        pages = parse_pdf(build_pdf([t], compress=True))
        assert len(pages) == 1
        assert pages[0][1] == t.strip()


def _craft(content: bytes) -> bytes:
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")


class TestTokenizerRegressions:
    """Findings from adversarial review: operator names inside string
    data, nested balanced parens, ']' inside TJ strings, nested page
    trees — each previously broke the regex-scan parser."""

    def test_operator_names_inside_text(self):
        from dxnn_ocr_cpp_spark.operators.pdftext import build_pdf
        t = "NET gains and BT losses GET SET"
        assert parse_pdf(build_pdf([t], compress=True)) == [(0, t, "ok")]

    def test_nested_balanced_parens(self):
        assert parse_pdf(_craft(b"BT ((a(b)c)) Tj ET")) == \
            [(0, "(a(b)c)", "ok")]

    def test_bracket_inside_tj_string(self):
        assert parse_pdf(_craft(b"BT [(br]kt) -20 (ok)] TJ ET")) == \
            [(0, "br]ktok", "ok")]

    def test_nested_page_tree_order(self):
        nested = (
            b"%PDF-1.4\n"
            b"9 0 obj\n<< /Type /Catalog /Pages 8 0 R >>\nendobj\n"
            b"8 0 obj\n<< /Type /Pages /Kids [3 0 R 1 0 R] /Count 2 >>\nendobj\n"
            b"1 0 obj\n<< /Type /Pages /Parent 8 0 R /Kids [5 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 8 0 R /Contents 4 0 R >>\nendobj\n"
            b"5 0 obj\n<< /Type /Page /Parent 1 0 R /Contents 6 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 20 >>\nstream\nBT (FIRST) Tj ET\nendstream\nendobj\n"
            b"6 0 obj\n<< /Length 21 >>\nstream\nBT (SECOND) Tj ET\nendstream\nendobj\n"
            b"%%EOF")
        assert parse_pdf(nested) == [(0, "FIRST", "ok"),
                                     (1, "SECOND", "ok")]

    def test_dicts_comments_and_operands_skipped(self):
        c = b"% comment\nBT << /D 1 >> (keep) Tj 1 0 0 1 5 5 Tm (two) Tj ET"
        assert parse_pdf(_craft(c)) == [(0, "keeptwo", "ok")]


class TestRobustnessFixes:
    """Round-2 advice fixes: invalid \\8 \\9 escapes, /Length-sliced
    streams with embedded 'endstream' bytes, corrupt-Flate status, and
    per-page (not per-doc) error containment."""

    def test_invalid_octal_escape_drops_backslash(self):
        # \8 is not octal; previously int('8', 8) raised and collapsed
        # the whole doc to one parse-error row
        assert parse_pdf(_craft(rb"BT (he\8llo) Tj ET")) == \
            [(0, "he8llo", "ok")]
        # run \18: \1 consumes only the octal digit, 8 stays literal
        [(_, text, status)] = parse_pdf(_craft(rb"BT (a\18b) Tj ET"))
        assert status == "ok" and text == "a\x018b"

    def test_length_preserves_embedded_endstream(self):
        # literal 'endstream' inside string data: the regex fallback
        # truncates there; the /Length slice must not
        assert parse_pdf(_craft(b"BT (has endstream inside) Tj ET")) == \
            [(0, "has endstream inside", "ok")]

    def test_corrupt_flate_is_decode_error(self):
        garbage = b"\x00\x01\x02 not deflate \xff"
        pdf = (b"%PDF-1.4\n"
               b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
               b"4 0 obj\n<< /Filter /FlateDecode /Length "
               + str(len(garbage)).encode()
               + b" >>\nstream\n" + garbage + b"\nendstream\nendobj\n%%EOF")
        assert parse_pdf(pdf) == [(0, "", "decode-error:FlateDecode")]

    def test_one_bad_page_degrades_one_page(self):
        good = b"BT (fine) Tj ET"
        garbage = b"\xde\xad\xbe\xef"
        pdf = (b"%PDF-1.4\n"
               b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
               b"4 0 obj\n<< /Filter /FlateDecode /Length "
               + str(len(garbage)).encode()
               + b" >>\nstream\n" + garbage + b"\nendstream\nendobj\n"
               b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
               b"6 0 obj\n<< /Length " + str(len(good)).encode()
               + b" >>\nstream\n" + good + b"\nendstream\nendobj\n%%EOF")
        assert parse_pdf(pdf) == [(0, "", "decode-error:FlateDecode"),
                                  (1, "fine", "ok")]


def test_build_pdf_null_text():
    """Null text rows (FIXTURES: the generator may leave text NULL)
    must produce a valid empty-page PDF, not an AttributeError."""
    from dxnn_ocr_cpp_spark.operators.pdftext import build_pdf
    assert parse_pdf(build_pdf([None], compress=True)) == \
        [(0, "", "no-text")]
