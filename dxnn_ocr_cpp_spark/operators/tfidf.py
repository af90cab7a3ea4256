"""TF-IDF keyword extraction — the per-document salient-term channel a
corpus pipeline uses for topic routing, index keys, and cheap
relevance features (the classical complement to embedding similarity:
no model, fully explainable, exactly reproducible).

Reference analog: the reference's per-region classifier features —
a score per recognized unit derived from corpus-level statistics
(/root/reference/src/pipeline/ocr_pipeline.cpp classify stage); here
the unit is a token and the corpus statistic is document frequency.

Scale shape (three exchanges, each irreducible for exact TF-IDF):
  tf      explode + groupBy(id, token) — map-side partial aggregation
          collapses the token stream before the shuffle, so shuffle
          rows are DISTINCT (doc, token) pairs, not corpus tokens.
  df      window count over partitionBy(token) ON THE TF TABLE — one
          token-keyed exchange serves both the document-frequency
          count and its "join" back to the rows (a separate groupBy +
          join would be two exchanges plus a join build).
  top-k   row_number over partitionBy(id) — carries only the distinct
          (doc, token) rows that survive, never raw text.
N (corpus size) is the one driver-side scalar (the lm.py discipline).

Determinism: idf is quantized to integer MICRO-NATS immediately after
the ln (the dsir.py discipline), so score = tf * idf_micro is exact
integer arithmetic — order-independent, bit-replayable, and the top-k
tie-break (score DESC, token ASC) is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.lm import tokens_col

IDF_MICRO_SCALE = 1_000_000


def doc_term_freqs(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, token, tf) — distinct tokens per doc with counts. One
    partial-aggregated exchange."""
    return (df.select(id_col, F.explode(tokens_col(text_col))
                      .alias("token"))
            .groupBy(id_col, "token")
            .agg(F.count("*").cast("long").alias("tf")))


def tfidf_topk(df: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text",
               n_docs: int | None = None) -> DataFrame:
    """Top-k keywords per document by integer-exact TF-IDF.

    Output: (id, token, tf, df, idf_micro, score_micro, rank) — rank
    1-based, ordering (score_micro DESC, token ASC). Documents with
    no tokens produce no rows. idf_micro = round(ln(N/df) * 1e6);
    tokens present in every document score 0 but still rank (a doc
    of only-ubiquitous tokens keeps its k rows — emptiness means the
    doc was empty, never that scoring zeroed out).
    """
    if n_docs is None:
        n_docs = df.count()                      # scalar only
    tf = doc_term_freqs(df, id_col, text_col)
    dfreq = F.count("*").over(Window.partitionBy("token")).cast("long")
    idf_micro = F.round(
        F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        * IDF_MICRO_SCALE).cast("long")
    scored = (tf.withColumn("df", dfreq)
              .withColumn("idf_micro", idf_micro)
              .withColumn("score_micro", F.col("tf") * F.col("idf_micro")))
    rank = F.row_number().over(
        Window.partitionBy(id_col)
        .orderBy(F.desc("score_micro"), F.asc("token")))
    return (scored.withColumn("rank", rank.cast("long"))
            .filter(F.col("rank") <= int(k)))
