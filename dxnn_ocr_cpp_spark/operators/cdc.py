"""Exact-substring duplicate-span detection and removal via
content-defined chunking (CDC).

The span-level complement of the doc-level dedup family: instead of
flagging whole documents as near-duplicates, find the duplicated BYTE
RANGES themselves (license headers, boilerplate paragraphs, quoted
chain-mails duplicated across thousands of pages) and optionally cut
them out — the pass published as exact-substring dedup in the
training-data-dedup literature, re-expressed Spark-first.

Suffix arrays (the single-node tool of choice) do not distribute;
content-defined chunking does: cut a document after every position
whose trailing w-char window hashes to 0 mod p. Cut positions are a
pure function of LOCAL content, so two copies of a long substring —
at different offsets, in different documents — produce identical
interior chunks, and duplicate detection becomes a plain groupBy on
chunk hash. A shared substring of length L contains an interior
duplicated chunk with probability >= 1 - (L/p)·(1-1/p)^(L-2w) — in
practice shared runs >= ~4·p chars are caught; runs shorter than the
expected chunk length p are invisible by design (this operator
targets multi-line boilerplate, not short phrases; n-gram/winnowing
operators in dedup.py / textstats.py cover fine-grained overlap).

Everything is pure Catalyst — the per-position window hashing is a
sequence/transform/filter higher-order-function pipeline over the
text column (JVM-side, whole-stage codegen), the chunk explosion is
one explode, and duplicate detection is ONE exchange (a window over
chunk_key computing count + cross-doc min/max — no join-back). The
escalation path if per-position hashing ever dominates a profile is a
gear-hash mapInPandas kernel; at 100 TB the cost is the chunk-key
exchange either way, identical for both.

hash_family:
  xxhash64  production: cut where pmod(xxhash64(window), p) == 0.
  md5       oracle twin: cut where the md5 hex of the window starts
            '0' followed by '0'-'7' (a 5-bit test, p fixed at 32) —
            the ONLY hash primitive DuckDB shares bit-for-bit, so the
            DuckDB oracle replays chunking, duplicate detection, and
            span removal end-to-end. Same code path, different cut
            predicate (pinned by tests).

Reference analog: the reference dedupes at CTC-symbol granularity
inside one result (rec_postprocess.cpp:130-142); this is the corpus-
wide generalization to duplicated spans ACROSS documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.partitioning import ensure_min_partitions

# expected chunk length (and the md5 family's fixed modulus): the md5
# cut predicate tests 5 bits of the hex digest, so p is 32 there; the
# xxhash64 family accepts any p
MD5_P = 32


def _cut_predicate(win: Column, p: int, hash_family: str) -> Column:
    if hash_family == "md5":
        # first hex char '0' (4 bits) + second in 0-7 (1 bit) -> 1/32;
        # lexicographic BETWEEN is safe: hex digits sort '0'..'9'<'a'
        h = F.md5(win)
        return (h.substr(1, 1) == "0") & h.substr(2, 1).between("0", "7")
    return F.pmod(F.xxhash64(win), F.lit(p)) == 0


def cdc_chunks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", w: int = 16, p: int = 64,
               hash_family: str = "xxhash64") -> DataFrame:
    """Explode each document into content-defined chunks.

    Returns (id_col, start, length, chunk_key): 1-based char offset,
    chunk char length, md5 of the chunk text (the dedup key — chunk
    TEXT never leaves the row it was computed in). Pure Catalyst,
    zero shuffle; docs shorter than w become one whole-doc chunk.
    """
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"hash_family must be xxhash64|md5, got {hash_family}")
    if hash_family == "md5":
        p = MD5_P
    # the per-position hashing is the CPU-heavy stage (measured
    # 8.5s -> 0.6s at sf0.1 on local[32] when widened)
    df = ensure_min_partitions(df)
    t = F.col(text_col)
    n = F.length(t)
    # cut AFTER position i (1-based) iff the w-char window ENDING at i
    # hashes to the cut value; i ranges over [w, n-1] — a cut at n
    # would produce an empty tail chunk, so it is excluded
    cuts = F.filter(
        F.transform(
            F.when(n > w, F.sequence(F.lit(w), n - 1))
            .otherwise(F.array().cast("array<int>")),
            lambda i: F.when(
                _cut_predicate(t.substr(i - w + 1, F.lit(w)), p,
                               hash_family), i)),
        lambda x: x.isNotNull())
    starts = F.concat(F.array(F.lit(1)), F.transform(cuts, lambda c: c + 1))
    ends = F.concat(cuts, F.array(n))
    chunks = F.zip_with(
        starts, ends,
        lambda s, e: F.struct(
            s.alias("start"),
            (e - s + 1).alias("length"),
            F.md5(t.substr(s, e - s + 1)).alias("chunk_key")))
    return (df.filter(t.isNotNull() & (n > 0))
            .select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(id_col, "c.start", "c.length", "c.chunk_key"))


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", w: int = 16, p: int = 64,
                    min_docs: int = 2,
                    hash_family: str = "xxhash64") -> DataFrame:
    """Char ranges duplicated across >= min_docs distinct documents.

    Returns (id_col, start, length, n_copies) — every occurrence of
    every cross-document duplicated chunk, n_copies = total
    occurrences corpus-wide.

    Scale shape: ONE exchange (all three windows partition by
    chunk_key, so they share it); the distinct-DOC count is a sum of
    first-occurrence-within-doc flags — no count-distinct (unsupported
    over windows), no collect_set (unbounded per-key state on a hot
    license header), no join back to a grouped table. Hot chunk keys
    all land in one partition; acceptable because rows are 4 small
    columns, but a df-cap analog (filter n_copies <= cap downstream)
    is the guard if a profile ever shows it.
    """
    ch = cdc_chunks(df, id_col, text_col, w, p, hash_family)
    win = Window.partitionBy("chunk_key")
    # min_docs counts DISTINCT documents (the docstring contract), not
    # total occurrences: a chunk repeated twice inside one doc and once
    # in another has n_copies=3 but spans only 2 docs. The distinct
    # count is a sum of doc-boundary flags under an (id, start) sort —
    # both windows partition by chunk_key alone, so the exchange stays
    # shared (a (chunk_key, id)-partitioned window would force a
    # second one)
    by_doc = win.orderBy(id_col, "start")
    out = (ch.withColumn("_new_doc",
                         (F.lag(id_col).over(by_doc).isNull()
                          | (F.lag(id_col).over(by_doc)
                             != F.col(id_col))).cast("int"))
           .withColumn("n_copies", F.count(F.lit(1)).over(win)
                       .cast("long"))
           .withColumn("_n_docs", F.sum("_new_doc").over(win))
           .filter(F.col("_n_docs") >= min_docs)
           .drop("_new_doc", "_n_docs"))
    return out.select(id_col, "start", "length", "n_copies")


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", w: int = 16,
                           p: int = 64, keep: str = "first",
                           hash_family: str = "xxhash64") -> DataFrame:
    """Cut cross-document duplicated chunks out of every document and
    reassemble the survivors in order.

    keep:
      first  the globally first occurrence (min (id, start) per chunk
             key) survives; every other copy is removed — the corpus
             keeps exactly one copy of each duplicated span.
      none   every copy of a duplicated span is removed.

    Returns (id_col, text) for ALL input docs (a doc whose every chunk
    was cut still emits with text='' — row preservation mirrors the
    pipeline's F8 invariant). Two exchanges total: the chunk_key
    window + the per-doc reassembly groupBy.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be first|none, got {keep}")
    ch = cdc_chunks(df, id_col, text_col, w, p, hash_family)
    win = Window.partitionBy("chunk_key")
    flagged = (ch.withColumn("_cross", F.min(id_col).over(win)
                             != F.max(id_col).over(win)))
    if keep == "first":
        first = Window.partitionBy("chunk_key") \
                      .orderBy(id_col, "start")
        flagged = flagged.withColumn(
            "_drop", F.col("_cross") & (F.row_number().over(first) > 1))
    else:
        flagged = flagged.withColumn("_drop", F.col("_cross"))
    kept = flagged.filter(~F.col("_drop"))
    src = df.select(F.col(id_col),
                    F.col(text_col).alias("_orig")).alias("src")
    parts = (kept.groupBy(id_col)
             .agg(F.sort_array(F.collect_list(
                 F.struct("start", "length"))).alias("_spans")))
    # reassemble from the ORIGINAL text column so the output is exact
    # substrings, not re-hashed keys: join spans back to the doc row
    # (id-keyed, the reassembly groupBy's exchange feeds it) and
    # substring per surviving span
    out = (src.join(parts, id_col, "left")
           .select(
               F.col(id_col),
               F.when(F.col("_spans").isNull(), F.lit("")).otherwise(
                   F.array_join(
                       F.transform(
                           F.col("_spans"),
                           lambda s: F.col("_orig").substr(
                               s["start"], s["length"])),
                       "")).alias("text")))
    return out
