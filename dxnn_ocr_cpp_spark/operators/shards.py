"""Training-shard packing: assign curated documents to fixed
token-budget output shards (the data-loader prep step after curation
— writers want ~equal-token shards, not ~equal-row files).

The core is a DISTRIBUTED PREFIX SUM over a deterministic document
order — the textbook trap here is `Window.orderBy(...)` with no
partitionBy, which Spark executes as a single partition (one task
scans the whole corpus). Instead:

  1. bucket rows by a deterministic, order-preserving key range
     (floor(rank-surrogate / bucket_size) is NOT needed — the order
     column itself is bucketed by value range via a coarse width),
  2. aggregate per-bucket token sums (partial map-side combine),
  3. one cumulative window over the BUCKET SUMS — thousands of rows,
     the single-partition window is fine at that size,
  4. join the bucket prefix back and finish with a within-bucket
     cumulative window.

Two real exchanges (bucket agg + within-bucket window) regardless of
corpus size; the only single-partition stage touches one row per
bucket. Every step is pure Catalyst and SQL-replayable, so the DuckDB
oracle (one `sum() OVER (ORDER BY ...)`) certifies the whole
decomposition.

Shard rule: a document's shard is floor(cumulative_tokens_before_it /
shard_tokens) — greedy packing without splitting documents; shards
overshoot by at most one document. Deterministic given (order_col,
tokens), independent of partitioning.

Reference analog: the recognizer's ratio-bucket batching groups
similar-size items so device batches fill evenly
(/root/reference/src/recognition/text_recognizer.cpp:169-183); this
is the corpus-output version of the same balancing idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(df: DataFrame, tokens_col: str = "n_tokens",
                order_col: str = "doc_id",
                shard_tokens: int = 100_000,
                bucket_width: int = 4096) -> DataFrame:
    """-> input columns + (cum_tokens, shard_id).

    cum_tokens is the EXCLUSIVE prefix sum of tokens_col in order_col
    order (tokens before this doc); shard_id =
    floor(cum_tokens / shard_tokens).

    order_col must be unique; bucket_width is the value-range width of
    the prefix-sum buckets (corpus_rows / bucket_width single-window
    rows — size it so that stays in the thousands-to-millions; for a
    sparse/non-numeric order key, pre-derive a dense numeric key).
    """
    if shard_tokens <= 0 or bucket_width <= 0:
        raise ValueError("shard_tokens and bucket_width must be > 0")
    o, t = F.col(order_col), F.col(tokens_col).cast("long")
    b = F.floor(o / bucket_width).alias("_bucket")
    rows = df.withColumn("_bucket", b)
    bucket_prefix = (
        rows.groupBy("_bucket")
        .agg(F.sum(t).alias("_bsum"))
        # single-partition window, but over ONE ROW PER BUCKET
        .withColumn(
            "_boffset",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.orderBy("_bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)).cast("long"))
        .drop("_bsum"))
    intra = Window.partitionBy("_bucket").orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (rows.join(bucket_prefix, "_bucket")
            .withColumn("cum_tokens",
                        (F.col("_boffset")
                         + F.coalesce(F.sum(t).over(intra), F.lit(0)))
                        .cast("long"))
            .withColumn("shard_id",
                        F.floor(F.col("cum_tokens") / shard_tokens)
                        .cast("long"))
            .drop("_bucket", "_boffset"))


def shard_manifest(df: DataFrame, tokens_col: str = "n_tokens",
                   order_col: str = "doc_id",
                   shard_tokens: int = 100_000,
                   bucket_width: int = 4096) -> DataFrame:
    """Per-shard summary a writer consumes: (shard_id, n_docs,
    total_tokens, first_doc, last_doc)."""
    packed = pack_shards(df, tokens_col, order_col, shard_tokens,
                         bucket_width)
    return (packed.groupBy("shard_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.col(tokens_col).cast("long"))
                 .cast("long").alias("total_tokens"),
                 F.min(order_col).alias("first_doc"),
                 F.max(order_col).alias("last_doc")))
