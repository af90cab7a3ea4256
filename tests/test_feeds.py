"""Sitemap / RSS / Atom parsing units: block split, field extraction,
entity decode, trim, dialect detection, malformed-entry visibility,
plan shape (one explode, zero Python, zero shuffle)."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.feeds import feed_entries, sitemap_entries

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>  https://ex.com/a?x=1&amp;y=2  </loc>
    <lastmod>2024-01-15</lastmod>
  </url>
  <url><loc>https://ex.com/b</loc></url>
  <url><lastmod>2024-02-02</lastmod></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.com/sitemap-a.xml</loc>
    <lastmod>2023-12-01</lastmod></sitemap>
  <sitemap><loc>https://ex.com/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""

RSS = """<rss version="2.0"><channel>
  <title>Chan</title>
  <item>
    <title>First &amp; best</title>
    <link> https://ex.com/p/1 </link>
    <pubDate>Mon, 01 Jan 2024</pubDate>
  </item>
  <item><link>https://ex.com/p/2</link></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed</title>
  <entry>
    <title type="text">Entry one</title>
    <link rel="alternate" href="https://ex.com/e/1"/>
    <updated>2024-03-03</updated>
  </entry>
</feed>"""


@pytest.fixture()
def feed_df(spark):
    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, xml string")
    return mk


class TestSitemap:
    def test_urlset_fields(self, spark, feed_df):
        out = sitemap_entries(feed_df([(1, SITEMAP)])).collect()
        assert [r.kind for r in out] == ["urlset"] * 3
        assert [r.pos for r in out] == [0, 1, 2]
        # entity decode + trim
        assert out[0].loc == "https://ex.com/a?x=1&y=2"
        assert out[0].lastmod == "2024-01-15"
        assert out[1].loc == "https://ex.com/b"
        assert out[1].lastmod is None
        # malformed entry (no <loc>) stays visible, loc NULL
        assert out[2].loc is None and out[2].lastmod == "2024-02-02"

    def test_sitemapindex(self, spark, feed_df):
        out = sitemap_entries(feed_df([(2, SITEMAP_INDEX)])).collect()
        assert [r.kind for r in out] == ["sitemapindex"] * 2
        assert out[0].loc == "https://ex.com/sitemap-a.xml"
        assert out[0].lastmod == "2023-12-01"
        assert out[1].lastmod is None

    def test_empty_doc_row_preserved(self, spark, feed_df):
        # no blocks at all: posexplode_outer keeps the doc visible
        out = sitemap_entries(feed_df([(3, "<urlset></urlset>")])).collect()
        assert len(out) == 1
        assert out[0].pos is None and out[0].loc is None

    def test_plan_one_explode_no_python_no_shuffle(self, spark, feed_df):
        plan = sitemap_entries(feed_df([(1, SITEMAP)]))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan
        assert plan.count("Generate") == 1

    def test_comment_mention_does_not_flip_dialect(self, spark, feed_df):
        # a urlset whose XML comment mentions <sitemapindex> must still
        # parse with the urlset grammar (root-anchored, comment-
        # stripped sniff)
        tricky = ("<?xml version='1.0'?>\n"
                  "<!-- unlike a <sitemapindex> this is a urlset -->\n"
                  "<urlset>\n"
                  "  <url><loc>https://ex.com/a</loc></url>\n"
                  "  <url><loc>https://ex.com/b</loc></url>\n"
                  "</urlset>")
        out = sitemap_entries(feed_df([(9, tricky)])) \
            .orderBy("pos").collect()
        assert [r.kind for r in out] == ["urlset", "urlset"]
        assert [r.loc for r in out] == ["https://ex.com/a",
                                        "https://ex.com/b"]

    def test_index_with_preamble_still_detected(self, spark, feed_df):
        # declarations / DOCTYPE / comments before the root must not
        # defeat index detection
        idx = ("<?xml version='1.0'?>\n<!DOCTYPE sitemapindex>\n"
               "<!-- generated -->\n" + SITEMAP_INDEX)
        out = sitemap_entries(feed_df([(10, idx)])).collect()
        assert [r.kind for r in out] == ["sitemapindex"] * 2


class TestFeeds:
    def test_rss_items(self, spark, feed_df):
        out = feed_entries(feed_df([(1, RSS)])).collect()
        assert [r.kind for r in out] == ["rss", "rss"]
        assert out[0].title == "First & best"
        assert out[0].link == "https://ex.com/p/1"     # trimmed body text
        assert out[0].published == "Mon, 01 Jan 2024"
        assert out[1].title is None and out[1].published is None
        # channel-level <title>Chan</title> must NOT leak into items
        assert all(r.title != "Chan" for r in out)

    def test_atom_entries(self, spark, feed_df):
        out = feed_entries(feed_df([(2, ATOM)])).collect()
        assert [r.kind for r in out] == ["atom"]
        assert out[0].link == "https://ex.com/e/1"     # href attribute
        assert out[0].title == "Entry one"
        assert out[0].published == "2024-03-03"

    def test_mixed_dialects_one_pass(self, spark, feed_df):
        out = feed_entries(feed_df([(1, RSS), (2, ATOM)])) \
            .orderBy("doc_id", "pos").collect()
        assert [r.kind for r in out] == ["rss", "rss", "atom"]

    def test_atom_xmlns_in_comment_stays_rss(self, spark, feed_df):
        # an RSS feed quoting the Atom namespace in a comment must not
        # flip to the entry-block grammar
        tricky = ('<!-- cf <feed xmlns="http://www.w3.org/2005/Atom"> '
                  "-->\n" + RSS)
        out = feed_entries(feed_df([(11, tricky)])) \
            .orderBy("pos").collect()
        assert [r.kind for r in out] == ["rss", "rss"]
        assert out[0].link == "https://ex.com/p/1"
