"""Input-guard (F7) tests: rule order, row accounting, F8 boundary."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dxnn_ocr_cpp_spark.config import ExtractionConfig
from dxnn_ocr_cpp_spark.operators.validate import MAX_URL_LEN, validate_documents
from dxnn_ocr_cpp_spark.schemas import DOCUMENTS


def mk(spark, rows):
    return spark.createDataFrame(rows, DOCUMENTS.add if False else T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in DOCUMENTS.fields]))


CASES = [
    (("https://ok.example/x", None, b"<p>hi</p>", None, "en"), None),
    ((None, None, b"<p>x</p>", None, "en"), "null_url"),
    (("", None, b"<p>x</p>", None, "en"), "null_url"),
    (("no-scheme.example/x", None, b"<p>x</p>", None, "en"), "no_scheme"),
    (("https://h/" + "a" * MAX_URL_LEN, None, b"", None, "en"), "url_too_long"),
    (("ftp://files.example/x", None, b"<p>x</p>", None, "en"), None),
    # html NULL/empty is VALID (F8: row still emits text='')
    (("https://ok.example/null", None, None, None, "en"), None),
    (("https://ok.example/empty", None, b"", None, "en"), None),
]


def test_rules_and_accounting(spark):
    df = mk(spark, [c[0] for c in CASES])
    valid, rejects = validate_documents(df)
    assert valid.count() + rejects.count() == len(CASES)
    got = {r["url"]: r["reject_reason"] for r in rejects.collect()}
    for row, expected in CASES:
        if expected is None:
            assert row[0] not in got
        else:
            assert got.get(row[0], "MISSING") == expected, row[0]


def test_oversize_reject_vs_truncate(spark):
    cfg = ExtractionConfig(max_html_bytes=100)
    rows = [
        ("https://h/truncate-me", None, b"x" * 200, None, "en"),   # 1-4x: truncated
        ("https://h/reject-me", None, b"x" * 500, None, "en"),     # >4x: rejected
    ]
    valid, rejects = validate_documents(mk(spark, rows), cfg)
    assert [r["url"] for r in valid.collect()] == ["https://h/truncate-me"]
    assert [(r["url"], r["reject_reason"]) for r in rejects.collect()] == \
        [("https://h/reject-me", "html_too_large")]
