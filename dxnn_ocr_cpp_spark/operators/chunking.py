"""Token-window document chunking — the training-data prep step that
turns variable-length documents into fixed-budget training examples
(max_tokens per chunk, overlap tokens of context carried between
consecutive chunks).

Pure Catalyst: whitespace tokenization via split, chunk fan-out via
sequence+explode (1→N, the S5 sub-document fan-out shape — same as the
reference's page explosion in pdftext), chunk text via slice +
array_join. Zero Python, zero shuffle: a chunk never leaves its
document's row until the explode, and the explode is narrow.

Scale shape: output rows = ceil(tokens/stride) per doc — linear fan-out
with no key shuffle; downstream writers partition however they need.

Whitespace tokens, not BPE: the chunk boundary only needs to be
deterministic and roughly proportional to real tokens (the BPE-ish
regex count in textstats.token_counts stays the measurement op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", max_tokens: int = 128,
                    overlap: int = 16) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — consecutive chunks share
    `overlap` tokens; the last chunk may be short; empty/blank docs
    produce ZERO chunks (nothing to train on). chunk_id is 0-based and
    dense per document.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, "
                         f"got {overlap} / {max_tokens}")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "",
                  F.array().cast("array<string>")).otherwise(toks)
    n = F.size("_toks")
    # chunk starts: 0, stride, 2*stride, ... while start < n; a final
    # window shorter than overlap never stands alone (it was already
    # fully covered by the previous chunk) — ceil((n-overlap)/stride)
    # chunks, min 1 for any nonempty doc
    n_chunks = F.when(n <= max_tokens, F.least(n, F.lit(1))) \
                .otherwise(F.ceil((n - overlap) / F.lit(stride)).cast("int"))
    return (df.select(F.col(id_col), toks.alias("_toks"))
            .withColumn("_nc", n_chunks)
            .filter(F.col("_nc") > 0)
            .select(F.col(id_col),
                    F.explode(F.sequence(
                        F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
                    F.col("_toks"))
            .select(F.col(id_col), "chunk_id",
                    F.array_join(
                        F.slice("_toks",
                                F.col("chunk_id") * stride + 1,
                                max_tokens), " ").alias("chunk_text"),
                    F.least(
                        F.size("_toks") - F.col("chunk_id") * stride,
                        F.lit(max_tokens)).cast("long").alias("n_tokens")))
