"""Count-Min Sketch term-frequency summarization (Cormode &
Muthukrishnan 2005) — the mergeable frequency sketch a 100 TB corpus
uses where an exact token groupBy is too wide to keep: vocabulary-size
state collapses to a fixed depth x width grid, shards build their
grids independently, and grids MERGE by cell-wise addition (the same
mergeability argument as the HLL/approx-percentile sketches in the
sketch_accuracy query; reference analog: the fixed-size accumulator
grids DXNN-OCR keeps per inference batch in
/root/reference/server/benchmark/core/metrics.py:63-205, which are
likewise merged across runs rather than re-scanned).

Representation: the sketch IS a DataFrame of (r, bucket, n) cells —
no binary blob, so building it is ONE partial-aggregated groupBy
(depth x width <= a few thousand shuffle rows per partition, always
bounded regardless of vocabulary size), merging is union + groupBy,
and point lookups are a broadcast join. Everything stays in Catalyst.

Hashing: the dedup.py Carter-Wegman affine family over Z_P seeded by
the first 8 md5 hex chars of the token — one md5 per occurrence, row
r's bucket = ((A*(r+1))%P * x(tok) + (B*(r+7))%P) mod P mod width.
Pairwise-independent per row and bit-replayable in DuckDB
(CAST('0x'||substr(md5(t),1,8) AS BIGINT) % P), so the FULL sketch —
build, merge, lookup — gets a value-exact oracle twin, unlike mixing
heuristics (xxhash64) which are rows-only.

Guarantees (classic CMS, asserted in tests/test_cms.py):
  est(t) >= true(t)                        always (counts only add)
  est(t) <= true(t) + e*N  w.p. 1-delta    e = e/width, delta = e^-depth
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MH_A_MULT, MH_B_MULT, MH_P, _md5_gram_int

# one shared token grammar for build and lookup (and the DuckDB twin):
# lowercased alphanumeric runs — the textstats bpe_ish alphabet minus
# punctuation, so sketch keys match dsir/tfidf token keys
CMS_TOKEN_RE = r"[a-z0-9]+"


def _row_bucket(r: int, x, width: int):
    """Bucket of token-point x under row r's affine permutation,
    folded onto [0, width)."""
    a = (MH_A_MULT * (r + 1)) % MH_P
    b = (MH_B_MULT * (r + 7)) % MH_P
    return F.pmod(F.pmod(x * F.lit(a) + F.lit(b), F.lit(MH_P)),
                  F.lit(width))


def cms_build(df: DataFrame, text_col: str = "text",
              depth: int = 4, width: int = 512) -> DataFrame:
    """(r, bucket, n) cell table for the corpus' token stream.

    ONE wide pass: tokenize -> per-token md5 point -> depth buckets
    via a literal unrolled array (depth is a small constant) -> explode
    -> groupBy(r, bucket). The shuffle carries at most depth*width
    distinct keys per partition after partial aggregation — bounded by
    the SKETCH size, never the vocabulary."""
    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)),
                             F.lit(CMS_TOKEN_RE), 0)).alias("tok")
    x = _md5_gram_int(F.col("tok"))
    cells = F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 _row_bucket(r, x, width).alias("bucket"))
        for r in range(depth)])).alias("cell")
    return (df.select(toks).select(cells)
            .groupBy(F.col("cell.r").alias("r"),
                     F.col("cell.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of independently built grids (shard -> corpus).
    Counts only add, so the >= guarantee survives the merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("r", "bucket")
            .agg(F.sum("n").cast("long").alias("n")))


def cms_lookup(cms: DataFrame, terms: DataFrame,
               term_col: str = "term",
               depth: int = 4, width: int = 512) -> DataFrame:
    """Point estimates: min over the term's depth cells.

    The terms side fans out to depth rows per term; the SKETCH is the
    broadcast side — it is bounded at depth*width cells by
    construction, so broadcasting it is always safe (and Spark cannot
    build the preserved side of an outer join, so broadcasting the
    probe side would silently fall back to a shuffle). Absent cells
    read as 0 via the left-join coalesce. Returns (term, est)."""
    x = _md5_gram_int(F.lower(F.col(term_col)))
    probes = (terms.select(
        F.col(term_col).alias("term"),
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     _row_bucket(r, x, width).alias("bucket"))
            for r in range(depth)])).alias("cell"))
        .select("term", "cell.r", "cell.bucket"))
    joined = probes.join(F.broadcast(cms), ["r", "bucket"], "left")
    return (joined.groupBy("term")
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0).cast("long")))
                 .alias("est")))


def cms_oracle_cells_sql(doc_sql: str, text_expr: str,
                         depth: int = 4, width: int = 512) -> str:
    """DuckDB twin of cms_build over `doc_sql` (a relation exposing
    `text_expr`): replays tokenization, the md5 point, and every
    affine row hash bit-for-bit. Returned as a CTE body producing
    (r, bucket, n)."""
    rows = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(depth))
    return f"""
    toks AS (
      SELECT unnest(regexp_extract_all(lower({text_expr}),
                    '{CMS_TOKEN_RE}')) AS tok
      FROM ({doc_sql})
    ),
    pts AS (
      SELECT tok,
             CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
               % {MH_P} AS x
      FROM toks
    ),
    rws AS ({rows}),
    cells AS (
      SELECT r.r,
             ((p.x * (({MH_A_MULT} * (r.r + 1)) % {MH_P})
               + (({MH_B_MULT} * (r.r + 7)) % {MH_P})) % {MH_P})
               % {width} AS bucket
      FROM pts p CROSS JOIN rws r
    ),
    grid AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS n
      FROM cells GROUP BY r, bucket
    )"""
