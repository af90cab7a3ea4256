"""HTML table extraction — structured (table, row, cells) records out
of raw page markup. Web tables are the densest structured-data payload
in a crawl (product specs, statistics, schedules); a training-data
pipeline mines them for relational/QA corpora, and an extraction
engine that drops them loses exactly the content boilerplate
heuristics mis-score (tables are link- and tag-dense, so the
density classifier rightly excludes them from the prose body — this
operator is the parallel channel that keeps them).

Reference analog: the reference's structured-region channel — detect
a region, then emit its content as an ORDERED sequence of sub-units
(/root/reference/src/pipeline/ocr_pipeline.cpp staged detect ->
per-region recognize); here the region is a <table> element and the
ordered sub-units are its rows and cells.

Scale shape: a pure Catalyst explode chain — regexp_extract_all for
tables, posexplode, regexp_extract_all for rows, posexplode, one
array transform for cells. Zero Python, ZERO SHUFFLE (explode is a
narrow map), scan pruned to (id, html). All pattern constants live in
the Java/RE2 COMMON subset so the DuckDB oracle replays the IDENTICAL
strings (the meta.py discipline).

Policy (deterministic, SQL-mirrorable):
  * tags matched case-insensitively, dotall (tables span lines).
  * non-greedy body capture => FLAT tables: a nested <table> truncates
    the outer capture at the inner's close tag (the wild-web common
    case is flat; nested layout-tables predate CSS and are rare in a
    modern crawl). Documented, not hidden.
  * cell text: inner tags -> ' ' (so 'a<br>b' keeps its word break),
    entity decode (meta.ENTITIES order, &amp; last), whitespace
    collapse, trim.
  * header detection is per-row: n_th = count of <th cells in the row
    (handles both header-row and header-column layouts).
  * docs/tables with no rows produce no output rows (inner explode) —
    emptiness is visible as absence, never as null padding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.meta import decode_entities

# group 1 = element inner html; \s* tolerates sloppy close tags
TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table\s*>"
ROW_RE = r"(?is)<tr\b[^>]*>(.*?)</tr\s*>"
# one alternation for td|th keeps cell ORDER (two separate scans would
# lose the interleaving of header and data cells within a row)
CELL_RE = r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]\s*>"
TH_OPEN_RE = r"(?is)<th\b"
# any residual markup inside a cell -> single space
TAG_RE = r"(?s)<[^>]*>"


def clean_cell(col: Column) -> Column:
    """Strip inner tags (-> space), entity-decode, collapse ws, trim."""
    return F.trim(F.regexp_replace(
        decode_entities(F.regexp_replace(col, TAG_RE, " ")),
        r"\s+", " "))


def extract_tables(df: DataFrame, html_col: str = "html",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, table_idx, row_idx, n_cells, n_th, cells) — one output row
    per <tr>, cells in document order, indexes 0-based longs. Pure
    Catalyst; zero shuffle."""
    h = F.col(html_col)
    tb = (df.select(id_col,
                    F.posexplode(F.regexp_extract_all(
                        h, F.lit(TABLE_RE), F.lit(1)))
                    .alias("table_idx", "tbody")))
    rw = (tb.select(id_col, "table_idx",
                    F.posexplode(F.regexp_extract_all(
                        F.col("tbody"), F.lit(ROW_RE), F.lit(1)))
                    .alias("row_idx", "rowhtml")))
    cells = F.transform(
        F.regexp_extract_all(F.col("rowhtml"), F.lit(CELL_RE), F.lit(1)),
        clean_cell)
    n_th = F.size(F.regexp_extract_all(
        F.col("rowhtml"), F.lit(TH_OPEN_RE), F.lit(0)))
    return (rw.select(
        id_col,
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.size(cells).cast("long").alias("n_cells"),
        n_th.cast("long").alias("n_th"),
        cells.alias("cells")))
