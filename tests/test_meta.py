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


# ---------- publish-date extraction ----------

from dxnn_ocr_cpp_spark.operators.meta import publish_dates  # noqa: E402


def _pd_rows(spark, cases):
    df = spark.createDataFrame(cases, "doc_id long, url string, html string")
    return {r["doc_id"]: r for r in publish_dates(df).collect()}


def test_publish_date_priority_meta_wins(spark):
    got = _pd_rows(spark, [(0,
        "https://a.ex/2020/01/05/p",
        '<meta property="article:published_time" content="2024-06-17T08:00:00Z">'
        '<time datetime="2023-01-01">x</time>')])
    assert got[0]["pub_date"] == "2024-06-17"
    assert got[0]["pub_source"] == "meta"


def test_publish_date_time_element(spark):
    got = _pd_rows(spark, [(0, "https://a.ex/p",
                            '<time datetime="2022-11-03 10:00">x</time>')])
    assert got[0]["pub_date"] == "2022-11-03"
    assert got[0]["pub_source"] == "time"


def test_publish_date_url_segments(spark):
    got = _pd_rows(spark, [
        (0, "https://a.ex/2021/07/19/post.html", "<p>x</p>"),
        (1, "https://a.ex/2021/07/post.html", "<p>x</p>"),   # day default
        (2, "https://a.ex/12021/99/post.html", "<p>x</p>"),  # not a date
    ])
    assert (got[0]["pub_date"], got[0]["pub_source"]) == ("2021-07-19", "url")
    assert got[1]["pub_date"] == "2021-07-01"
    assert (got[2]["pub_date"], got[2]["pub_source"]) == ("", "")


def test_publish_date_invalid_falls_through(spark):
    # syntactically invalid meta month -> fall to <time>, then url
    got = _pd_rows(spark, [
        (0, "https://a.ex/p",
         '<meta property="article:published_time" content="2024-13-40">'
         '<time datetime="2022-02-09">x</time>'),
        (1, "https://a.ex/2019/04/p",
         '<meta property="article:published_time" content="garbage">'),
    ])
    assert (got[0]["pub_date"], got[0]["pub_source"]) == ("2022-02-09", "time")
    assert (got[1]["pub_date"], got[1]["pub_source"]) == ("2019-04-01", "url")


def test_publish_date_plan_scan_stage_only(spark):
    df = spark.createDataFrame([(0, "https://a.ex/p", "<p>x</p>")],
                               "doc_id long, url string, html string")
    plan = publish_dates(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestRobotsDirectives:
    ROWS = [
        (0, '<head><meta name="robots" content="noindex, follow"></head>'),
        (1, '<head><meta content="NOFOLLOW" name="ROBOTS"></head>'),
        (2, "<head><meta name='robots' content='none'></head>"),
        (3, '<head><meta name="description" content="noindex"></head>'),
        (4, '<head><meta name="robots" content="index, follow"></head>'),
        (5, '<head><meta name="googlebot" content="noindex"></head>'),
        # first robots tag wins; second must not resurrect indexing
        (6, '<head><meta name="robots" content="noindex">'
            '<meta name="robots" content="index, follow"></head>'),
        # content attr missing entirely -> default index,follow
        (7, '<head><meta name="robots"></head>'),
        # token boundary: noindexfoo is NOT the noindex directive
        (8, '<head><meta name="robots" content="noindexfoo"></head>'),
    ]

    @pytest.fixture(scope="class")
    def out(self, spark):
        from dxnn_ocr_cpp_spark.operators.meta import robots_directives
        df = spark.createDataFrame(self.ROWS, "doc_id long, html string")
        return {r["doc_id"]: r for r in robots_directives(df).collect()}

    def test_directives(self, out):
        expect = {0: (True, False), 1: (False, True), 2: (True, True),
                  3: (False, False), 4: (False, False),
                  5: (False, False), 6: (True, False),
                  7: (False, False), 8: (False, False)}
        got = {k: (v["robots_noindex"], v["robots_nofollow"])
               for k, v in out.items()}
        assert got == expect

    def test_gate_preserves_schema_and_drops_noindex(self, spark):
        from dxnn_ocr_cpp_spark.operators.meta import indexable_docs
        df = spark.createDataFrame(self.ROWS, "doc_id long, html string")
        kept = indexable_docs(df)
        assert kept.columns == ["doc_id", "html"]
        assert sorted(r["doc_id"] for r in kept.collect()) == \
            [1, 3, 4, 5, 7, 8]


class TestScriptMix:
    def test_counts_and_dominance(self, spark):
        from dxnn_ocr_cpp_spark.operators.textstats import script_mix
        rows = [
            (0, "hello world 123"),          # latin only
            (1, "Привет мир"),               # cyrillic
            (2, "abc 你好你好"),              # cjk 4 > latin 3
            (3, "ab юя"),                     # tie 2-2 -> latin priority
            (4, "1234 !?"),                   # no script letters
            (5, "αβγ مرحبا 한국어"),          # arabic 5 > hangul 3 > greek 3
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in script_mix(df).collect()}
        assert out[0]["dominant_script"] == "latin"
        assert out[0]["n_latin"] == 10
        assert out[1]["dominant_script"] == "cyrillic"
        assert out[2]["dominant_script"] == "cjk"
        assert out[2]["n_cjk"] == 4 and out[2]["n_latin"] == 3
        assert out[3]["dominant_script"] == "latin"   # declared priority
        assert out[4]["dominant_script"] == "none"
        assert out[4]["n_script_chars"] == 0
        assert out[5]["dominant_script"] == "arabic"
        assert out[5]["n_greek"] == 3 and out[5]["n_hangul"] == 3

    def test_pure_catalyst_plan(self, spark):
        from dxnn_ocr_cpp_spark.operators.textstats import script_mix
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = script_mix(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan
