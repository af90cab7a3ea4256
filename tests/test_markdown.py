"""Markdown emission mode (operators/emit.with_markdown).

Structured-output analog of the reference's second result rendering
(the server returns both prunedResult JSON and an annotated ocrImage
per request, /root/reference/server/json_response.cpp:19-60): the same
kept/ordered spans, decorated from each block's context tag.

Pins: per-tag rendering rules, parity with the pure-Python twin on the
seeded corpus, agreement with extract()'s text on WHICH spans survive,
determinism under partitioning, F8/F9 edge rows, plan shape (still
zero Exchange / one Python hop), and the frozen driver-oracle fixture.
"""

import pathlib

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.corpus import generate_documents_df, make_document
from dxnn_ocr_cpp_spark.operators.emit import markdown_block_py
from dxnn_ocr_cpp_spark.pipeline import extract, extract_python
from dxnn_ocr_cpp_spark.schemas import DOCUMENTS

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"

N_DOCS = 120


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents_df(spark, N_DOCS, partitions=4).cache()


def _one(spark, html: bytes | None, url: str = "u"):
    df = spark.createDataFrame([(url, None, html, None, None)], DOCUMENTS)
    rows = extract(df, markdown=True).collect()
    assert len(rows) == 1
    return rows[0]


class TestRenderRules:
    def test_heading_levels(self, spark):
        html = (b"<html><body><main>"
                b"<h1>Top title here</h1>"
                b"<h3>Sub section here</h3>"
                b"<p>A paragraph with enough characters to pass the "
                b"minimum span length filter easily.</p>"
                b"</main></body></html>")
        r = _one(spark, html)
        paras = r["markdown"].split("\n\n")
        assert paras[0] == "# Top title here"
        assert paras[1] == "### Sub section here"
        assert paras[2].startswith("A paragraph")

    def test_list_quote_pre(self, spark):
        html = (b"<html><body><main>"
                b"<ul><li>First list item with plenty of text in it</li>"
                b"<li>Second list item with plenty of text too</li></ul>"
                b"<blockquote>A quoted passage long enough to survive "
                b"the filters of the pipeline</blockquote>"
                b"<pre>preformatted code sample kept as a fenced block "
                b"by the renderer</pre>"
                b"</main></body></html>")
        r = _one(spark, html)
        paras = r["markdown"].split("\n\n")
        assert paras[0].startswith("- First list item")
        assert paras[1].startswith("- Second list item")
        assert paras[2].startswith("> A quoted passage")
        assert paras[3].startswith("```\npreformatted")
        assert paras[3].endswith("\n```")

    def test_python_twin_rules(self):
        assert markdown_block_py("h1", "t") == "# t"
        assert markdown_block_py("h6", "t") == "###### t"
        assert markdown_block_py("h7", "t") == "t"      # not a heading
        assert markdown_block_py("li", "t") == "- t"
        assert markdown_block_py("blockquote", "t") == "> t"
        assert markdown_block_py("pre", "t") == "```\nt\n```"
        assert markdown_block_py("p", "t") == "t"
        assert markdown_block_py("div", "t") == "t"


class TestCorpusParity:
    def test_matches_python_reference(self, spark, docs):
        """Byte-parity of the markdown rendering vs extract_python on
        every corpus doc — pins the Catalyst when-chain to the Python
        twin the same way text parity is pinned."""
        got = {r["url"]: r for r in extract(docs, markdown=True).collect()}
        assert len(got) == N_DOCS
        for i in range(N_DOCS):
            d = make_document(i)
            exp = extract_python(d["url"], d["html"])
            assert got[d["url"]]["markdown"] == exp["markdown"], f"doc {i}"

    def test_same_spans_as_text(self, spark, docs):
        """The two renderings agree on WHICH text survived: stripping
        markdown decoration recovers exactly the text rendering's
        span sequence."""
        rows = extract(docs, markdown=True).collect()
        for r in rows:
            spans = r["text"].split("\n") if r["text"] else []
            md = []
            for p in (r["markdown"].split("\n\n")
                      if r["markdown"] else []):
                if p.startswith("```\n") and p.endswith("\n```"):
                    md.append(p[4:-4])
                elif p.startswith("- "):
                    md.append(p[2:])
                elif p.startswith("> "):
                    md.append(p[2:])
                elif p.startswith("#"):
                    md.append(p.lstrip("#")[1:])  # '#'*k + ' '
                else:
                    md.append(p)
            # paragraphs can themselves contain '\n\n'? No: block text
            # is single-line by construction (normalize_text collapses
            # whitespace), so the split is exact.
            assert md == spans, r["url"]


class TestEdges:
    def test_empty_body_emits_empty_markdown(self, spark):
        r = _one(spark, b"<html><body></body></html>")
        assert r["markdown"] == ""

    def test_none_html_row_preserved(self, spark):
        r = _one(spark, None)
        assert r["markdown"] == ""

    def test_deterministic_under_partitioning(self, spark):
        docs = generate_documents_df(spark, 60, partitions=1)
        a = {r["url"]: r["markdown"]
             for r in extract(docs.repartition(1),
                              markdown=True).collect()}
        b = {r["url"]: r["markdown"]
             for r in extract(docs.repartition(16),
                              markdown=True).collect()}
        assert a == b


class TestPlanShape:
    def test_zero_exchange_one_python_hop(self, spark, docs):
        plan = (extract(docs, markdown=True)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert plan.count("ArrowEvalPython") == 1


def test_markdown_fixture_fresh(spark):
    """The driver-oracle fixture (extract_markdown_expected.parquet)
    must match a live run — catches a stale fixture after rendering
    changes BEFORE the driver's DuckDB compare does. Regenerate with
    tools/freeze_extract_expected.py."""
    import pyarrow.parquet as pq

    from __spark_entry__ import q_extract_markdown

    expected = {
        r["url"]: r
        for r in pq.read_table(
            GOLDEN_DIR / "extract_markdown_expected.parquet").to_pylist()
    }
    live = q_extract_markdown(spark, "").collect()
    assert len(live) == len(expected)
    for r in live:
        e = expected[r["url"]]
        got = {k: r[k] for k in ("url", "md_len", "md_md5",
                                 "n_headings", "n_list_items")}
        assert got == e, f"stale fixture for {r['url']}: {got} != {e}"


def test_fixture_has_structure(spark):
    """The frozen corpus fixture is not degenerate: some docs render
    headings and list items (the corpus generator emits h2/li blocks),
    so the structural counters genuinely discriminate."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(GOLDEN_DIR / "extract_markdown_expected.parquet")
    assert sum(tbl.column("n_headings").to_pylist()) > 0
    assert sum(tbl.column("n_list_items").to_pylist()) > 0
