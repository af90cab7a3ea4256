"""HTML page-metadata extraction — title, meta description, canonical
URL, og:title, html lang attribute. These are the per-page header
fields every crawl-derived corpus carries alongside the extracted body
(Common Crawl's WAT metadata sidecar publishes exactly this set), used
downstream for dedup keys (canonical URL), language routing (lang
attr), and snippet/label generation (title/description).

Reference analog: the per-task metadata the reference attaches to each
OCR result envelope (/root/reference/server/ocr_handler.cpp response
assembly — id, timing, source fields next to the recognized text);
here the envelope fields come from the document head itself.

Scale shape: every field is a pure Catalyst regexp_extract over the
raw HTML inside the scan stage — zero Python, zero shuffle, zero extra
pass (the linkgraph.host_edges discipline). All pattern strings live
in module constants in the Java/RE2 COMMON subset so the DuckDB oracle
replays the IDENTICAL strings (the urls.py discipline).

Policy (deterministic, SQL-mirrorable):
  * first match wins for every field (regexp_extract semantics in
    both engines); missing field -> '' (both engines return '' on
    no-match).
  * attribute matching requires the discriminating attribute
    (name=/property=/rel=) BEFORE the value attribute within the tag;
    the two-step tag-then-attribute extraction below removes that
    order dependence for content=/href= (matched anywhere in the
    already-isolated tag).
  * title text is entity-decoded for the five canonical entities
    + &nbsp;, single pass with &amp; LAST (the standard single-pass
    approximation: '&amp;lt;' decodes to '&lt;' and stops), then
    whitespace-collapsed and trimmed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# group 1 = raw title text (dotall: titles wrap lines in the wild)
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
# whole-tag isolators (group 0 used): discriminator attr inside the tag
DESC_TAG_RE = r"""(?is)<meta\s[^>]*?name\s*=\s*["']description["'][^>]*>"""
OG_TITLE_TAG_RE = (
    r"""(?is)<meta\s[^>]*?property\s*=\s*["']og:title["'][^>]*>""")
CANONICAL_TAG_RE = (
    r"""(?is)<link\s[^>]*?rel\s*=\s*["']canonical["'][^>]*>""")
# value pulls out of the isolated tag — attribute order no longer matters
CONTENT_ATTR_RE = r"""(?is)content\s*=\s*["']([^"']*)["']"""
HREF_ATTR_RE = r"""(?is)href\s*=\s*["']([^"']*)["']"""
LANG_ATTR_RE = r"""(?is)<html\s[^>]*?lang\s*=\s*["']([A-Za-z][A-Za-z-]*)["']"""

# (entity, replacement) in application order; amp LAST by policy
ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def decode_entities(col: Column) -> Column:
    """Chained literal replaces in ENTITIES order (DuckDB twin chains
    replace() over the same tuples)."""
    for ent, rep in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def clean_text(col: Column) -> Column:
    """Entity-decode + whitespace-collapse + trim."""
    return F.trim(F.regexp_replace(decode_entities(col), r"\s+", " "))


def page_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds (title, meta_description, canonical_url, og_title,
    html_lang) string columns; '' where the field is absent. Pure
    Catalyst — plans as expressions in the scan stage."""
    h = F.col(html_col)
    title = clean_text(F.regexp_extract(h, TITLE_RE, 1))
    desc = clean_text(F.regexp_extract(
        F.regexp_extract(h, DESC_TAG_RE, 0), CONTENT_ATTR_RE, 1))
    og = clean_text(F.regexp_extract(
        F.regexp_extract(h, OG_TITLE_TAG_RE, 0), CONTENT_ATTR_RE, 1))
    canon = F.trim(F.regexp_extract(
        F.regexp_extract(h, CANONICAL_TAG_RE, 0), HREF_ATTR_RE, 1))
    lang = F.lower(F.regexp_extract(h, LANG_ATTR_RE, 1))
    return (df.withColumn("title", title)
            .withColumn("meta_description", desc)
            .withColumn("canonical_url", canon)
            .withColumn("og_title", og)
            .withColumn("html_lang", lang))


# ---------- publish-date extraction ----------
#
# Freshness signal for mixture weighting / recency filtering — real
# pipelines extract it from (in priority order): the
# article:published_time meta tag, the first <time datetime=...>
# element, and date-shaped URL path segments (/2024/05[/17]/). A
# syntactically valid YYYY-MM-DD prefix is required at each source; an
# invalid value falls through to the next source. Validation is the
# regex below — calendar semantics (Feb 30) are out of scope, the
# twin must replay EXACTLY this rule.

PUBLISHED_TAG_RE = (
    r"""(?is)<meta\s[^>]*?property\s*=\s*"""
    r"""["']article:published_time["'][^>]*>""")
TIME_ATTR_RE = r"""(?is)<time\s[^>]*?datetime\s*=\s*["']([^"']*)["']"""
DATE_PREFIX_RE = (
    r"^((?:19|20)\d{2})-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])")
URL_DATE_RE = (
    r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\d|3[01]))?(?:/|$)")


def publish_dates(df: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Adds (pub_date 'YYYY-MM-DD' or '', pub_source
    meta|time|url|''). Pure Catalyst regexp in the scan stage — zero
    Python, zero shuffle (page_meta discipline); all pattern strings
    are module constants in the Java/RE2 common subset."""
    h = F.col(html_col)
    meta_raw = F.regexp_extract(
        F.regexp_extract(h, PUBLISHED_TAG_RE, 0), CONTENT_ATTR_RE, 1)
    meta_date = F.regexp_extract(meta_raw, DATE_PREFIX_RE, 0)
    time_date = F.regexp_extract(
        F.regexp_extract(h, TIME_ATTR_RE, 1), DATE_PREFIX_RE, 0)
    u = F.col(url_col)
    url_y = F.regexp_extract(u, URL_DATE_RE, 1)
    url_m = F.regexp_extract(u, URL_DATE_RE, 2)
    url_d = F.regexp_extract(u, URL_DATE_RE, 3)
    url_date = F.when(
        url_y != "",
        F.concat_ws("-", url_y, url_m,
                    F.when(url_d == "", F.lit("01")).otherwise(url_d))
    ).otherwise(F.lit(""))
    pub_date = (F.when(meta_date != "", meta_date)
                .when(time_date != "", time_date)
                .otherwise(url_date))
    pub_source = (F.when(meta_date != "", F.lit("meta"))
                  .when(time_date != "", F.lit("time"))
                  .when(url_date != "", F.lit("url"))
                  .otherwise(F.lit("")))
    return (df.withColumn("pub_date", pub_date)
            .withColumn("pub_source", pub_source))


# ---------- robots meta directives ----------

# whole-tag isolator, first match wins (page_meta discipline). The
# name attribute must say exactly robots — bot-specific tags
# (name="googlebot") are a per-agent policy this corpus-level gate
# deliberately ignores (documented limitation, mirrors the urls.py
# robots_gate single-agent simplification).
ROBOTS_TAG_RE = r"""(?is)<meta\s[^>]*?name\s*=\s*["']robots["'][^>]*>"""
# token tests on the isolated content= value: comma/whitespace
# delimited directive lists ("noindex, follow"), case-insensitive;
# 'none' is the spec'd shorthand for 'noindex, nofollow'
NOINDEX_RE = r"(?i)(^|[,\s])\s*(noindex|none)\s*([,\s]|$)"
NOFOLLOW_RE = r"(?i)(^|[,\s])\s*(nofollow|none)\s*([,\s]|$)"


def robots_directives(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds boolean (robots_noindex, robots_nofollow) from the page's
    <meta name="robots"> tag — the in-page analog of the host-level
    robots.txt gate (urls.robots_gate): noindex pages must be dropped
    from a published corpus, nofollow pages contribute no edges to the
    link graph (linkgraph.host_edges).

    Policy: first robots tag wins; directives are comma/whitespace
    separated tokens, case-insensitive; 'none' implies both noindex
    and nofollow; absent tag / absent content attr -> both False
    (index,follow is the web default). Pure Catalyst regexp in the
    scan stage — zero Python, zero shuffle; pattern constants live in
    the Java/RE2 COMMON subset so the DuckDB twin replays the
    IDENTICAL strings (page_meta discipline).
    """
    content = F.regexp_extract(
        F.regexp_extract(F.col(html_col), ROBOTS_TAG_RE, 0),
        CONTENT_ATTR_RE, 1)
    return (df.withColumn("robots_noindex", content.rlike(NOINDEX_RE))
            .withColumn("robots_nofollow", content.rlike(NOFOLLOW_RE)))


def indexable_docs(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Corpus gate: rows whose page does NOT opt out via
    <meta name="robots" ... noindex|none>. Input schema preserved."""
    out = robots_directives(df, html_col)
    return (out.filter(~F.col("robots_noindex"))
            .drop("robots_noindex", "robots_nofollow"))
