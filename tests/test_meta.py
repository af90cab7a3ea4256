"""Page-metadata extraction: field policies (first match wins,
attribute-order independence, case-insensitive tags, entity decode with
amp-last, missing -> ''), and the zero-shuffle/zero-Python plan pin."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.meta import clean_text, page_meta

DOCS = [
    # attribute order flipped (content before name) + entities + ws
    (0, '<html lang="EN-us"><head><title> A &amp;  B \n C </title>'
        '<meta content="d0" name="description">'
        "<link rel='canonical' href='https://c.org/0'>"
        '<meta property="og:title" content="og &quot;q&quot;">'
        '</head></html>'),
    (1, "<html><body>nothing in the head</body></html>"),
    # upper-case tags; no quotes policy: only quoted attrs match
    (2, '<HTML LANG="fr"><TITLE>UP</TITLE>'
        '<META NAME="description" CONTENT="d2">'),
    # first match wins on duplicated fields
    (3, "<title>first</title><title>second</title>"
        '<meta name="description" content="one">'
        '<meta name="description" content="two">'),
    # amp-last single-pass policy: '&amp;lt;' -> '&lt;' and stops
    (4, "<title>&amp;lt;</title>"),
]


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, html string")
    return {r["doc_id"]: r for r in page_meta(df).collect()}


def test_all_fields_extracted_and_cleaned(rows):
    r = rows[0]
    assert r["title"] == "A & B C"
    assert r["meta_description"] == "d0"          # content BEFORE name
    assert r["canonical_url"] == "https://c.org/0"
    assert r["og_title"] == 'og "q"'
    assert r["html_lang"] == "en-us"


def test_missing_fields_are_empty_strings(rows):
    r = rows[1]
    assert (r["title"], r["meta_description"], r["canonical_url"],
            r["og_title"], r["html_lang"]) == ("", "", "", "", "")


def test_case_insensitive_tags(rows):
    assert rows[2]["title"] == "UP"
    assert rows[2]["meta_description"] == "d2"
    assert rows[2]["html_lang"] == "fr"


def test_first_match_wins(rows):
    assert rows[3]["title"] == "first"
    assert rows[3]["meta_description"] == "one"


def test_entity_decode_is_single_pass_amp_last(rows):
    assert rows[4]["title"] == "&lt;"


def test_null_html_yields_empty_fields(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, html string")
    r = page_meta(df).collect()[0]                # F9: null-safe
    assert r["title"] is None or r["title"] == ""


def test_plan_is_scan_stage_expressions_only(spark):
    df = spark.createDataFrame([(0, "<title>x</title>")],
                               "doc_id long, html string")
    plan = page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_clean_text_collapses_all_whitespace(spark):
    df = spark.createDataFrame([("a\t\n  b&nbsp;&nbsp;c",)], "s string")
    assert df.select(clean_text(F.col("s")).alias("c")) \
             .collect()[0]["c"] == "a b c"
