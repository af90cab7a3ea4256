"""Sitemap / feed source parsing — the crawl-frontier builders.

A web-scale pipeline doesn't only consume crawled pages; it harvests
WHERE to crawl next from sitemap.xml (urlset + sitemapindex,
sitemaps.org protocol) and RSS 2.0 / Atom feeds. Both are
regular-enough XML that the extraction is pure Catalyst
regexp_extract_all over the blob — the linkgraph.href_harvest
discipline — with ONE explode as the 1→N fan-out and zero Python,
zero shuffle (plan pinned in tests/test_feeds.py).

Reference analog: the 1→N sub-document fan-out of the PDF page walk
(S5, operators/pdftext.py; reference task splitting
/root/reference/src/pipeline/ocr_pipeline.cpp:457-461) applied to a
different container grammar.

Regex note: patterns are in the Java-regex / RE2-common subset with
(?s) DOTALL groups, so the DuckDB oracle can replay them identically;
the driver queries instead certify against PLANTED arithmetic (the
fixture builds the XML from doc_id, the oracle recomputes the expected
rows without touching XML at all — the media_decode discipline).

Namespace policy (documented, pinned): tags are matched without
namespace prefixes (the overwhelming real-world form); a prefixed
`<sm:loc>` is out of scope for the regex grammar, as is CDATA.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.meta import decode_entities

# block splitters: non-greedy DOTALL bodies
URL_BLOCK_RE = r"(?s)<url\s*>(.*?)</url\s*>"
SITEMAP_BLOCK_RE = r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"
ITEM_BLOCK_RE = r"(?s)<item\s*>(.*?)</item\s*>"
ENTRY_BLOCK_RE = r"(?s)<entry[^>]*>(.*?)</entry\s*>"

# field extractors within one block
LOC_RE = r"(?s)<loc\s*>\s*(.*?)\s*</loc\s*>"
LASTMOD_RE = r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"
LINK_TEXT_RE = r"(?s)<link\s*>\s*(.*?)\s*</link\s*>"
LINK_HREF_RE = r"""<link\b[^>]*\bhref\s*=\s*["']([^"']*)["']"""
TITLE_RE = r"(?s)<title[^>]*>\s*(.*?)\s*</title\s*>"
PUBDATE_RE = r"(?s)<(?:pubDate|updated|published)\s*>\s*(.*?)\s*</(?:pubDate|updated|published)\s*>"


def _blocks(xml: Column, block_re: str) -> Column:
    return F.regexp_extract_all(xml, F.lit(block_re), F.lit(1))


def _field(block: Column, field_re: str) -> Column:
    """First match of `field_re` group 1, entity-decoded, NULL when
    absent (regexp_extract returns '' on no-match)."""
    return F.nullif(decode_entities(
        F.regexp_extract(block, field_re, 1)), F.lit(""))


def _sniff(xml: Column) -> Column:
    """Comment-stripped view of the blob for dialect sniffing only —
    a urlset file merely MENTIONING '<sitemapindex' in an XML comment
    must not flip the block grammar."""
    return F.regexp_replace(xml, r"(?s)<!--.*?-->", "")


def _tag_before(sniff: Column, tag: str, other: str) -> Column:
    """True when `<tag` occurs and occurs before any `<other` — the
    root-element test expressed as first-occurrence order, which is
    robust to XML declarations / DOCTYPE preambles that a ^-anchored
    regex would have to enumerate."""
    p = F.locate("<" + tag, sniff)
    q = F.locate("<" + other, sniff)
    return (p > 0) & ((q == 0) | (p < q))


def sitemap_entries(df: DataFrame, xml_col: str = "xml",
                    id_col: str = "doc_id") -> DataFrame:
    """sitemaps.org parse: one row per <url> (kind='urlset') or
    per child <sitemap> of an index (kind='sitemapindex'), with
    (pos, loc, lastmod). Entity-decoded, whitespace-trimmed; a block
    with no <loc> still emits its row (loc NULL) so malformed entries
    are visible, not silently dropped. One explode, zero shuffle.

    Dialect sniff is comment-stripped and root-anchored: the doc is an
    index only when '<sitemapindex' occurs before any '<url' (the
    urlset root '<urlset' and its '<url>' blocks both start with that
    prefix), so a urlset mentioning the token in a comment or <loc>
    cannot flip the grammar."""
    xml = F.col(xml_col)
    sn = _sniff(xml)
    is_index = sn.rlike(r"<sitemapindex[\s>]") & \
        _tag_before(sn, "sitemapindex", "url")
    blocks = F.when(is_index, _blocks(xml, SITEMAP_BLOCK_RE)) \
        .otherwise(_blocks(xml, URL_BLOCK_RE))
    exploded = df.select(
        F.col(id_col),
        F.when(is_index, F.lit("sitemapindex"))
         .otherwise(F.lit("urlset")).alias("kind"),
        F.posexplode_outer(blocks).alias("pos", "block"))
    b = F.col("block")
    return exploded.select(
        id_col, "kind", "pos",
        _field(b, LOC_RE).alias("loc"),
        _field(b, LASTMOD_RE).alias("lastmod"))


def feed_entries(df: DataFrame, xml_col: str = "xml",
                 id_col: str = "doc_id") -> DataFrame:
    """RSS 2.0 (<item><link>text</link>) and Atom
    (<entry><link href="..."/>) parse into one uniform
    (kind, pos, link, title, published) shape. Atom is detected by
    the feed-level xmlns; within a block the href-attribute form wins
    over link-body text (Atom links are self-closing). One explode,
    zero shuffle.

    Dialect sniff is comment-stripped and root-anchored (same policy
    as sitemap_entries): the Atom xmlns must sit on a '<feed' that
    occurs before any '<rss', so an RSS feed quoting the Atom
    namespace in a comment cannot flip the grammar."""
    xml = F.col(xml_col)
    sn = _sniff(xml)
    is_atom = sn.rlike(
        r"""<feed[^>]*xmlns\s*=\s*["']http://www\.w3\.org/2005/Atom["']"""
    ) & _tag_before(sn, "feed", "rss")
    blocks = F.when(is_atom, _blocks(xml, ENTRY_BLOCK_RE)) \
        .otherwise(_blocks(xml, ITEM_BLOCK_RE))
    exploded = df.select(
        F.col(id_col),
        F.when(is_atom, F.lit("atom")).otherwise(F.lit("rss"))
         .alias("kind"),
        F.posexplode_outer(blocks).alias("pos", "block"))
    b = F.col("block")
    return exploded.select(
        id_col, "kind", "pos",
        F.coalesce(_field(b, LINK_HREF_RE),
                   _field(b, LINK_TEXT_RE)).alias("link"),
        _field(b, TITLE_RE).alias("title"),
        _field(b, PUBDATE_RE).alias("published"))
