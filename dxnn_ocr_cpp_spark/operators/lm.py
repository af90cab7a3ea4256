"""CCNet-style corpus language-model quality scoring.

The standard web-pipeline curation stage this engine was still missing:
train a unigram LM on the corpus itself (or any reference corpus),
score every document by its mean token log-probability, and gate on it
— the cheap, fully-distributed analog of CCNet's KenLM perplexity
filter (Wenzek et al., LREC 2020). Documents full of rare junk tokens
score low; fluent text built from the corpus's head vocabulary scores
high.

Scale shape (the part that must survive 100 TB):

  tokenize          narrow (split; the dedup-family canonical
                    lower/trim/ws-collapse tokenization so the gram
                    universe agrees with dedup/decontaminate)
  count vocab       ONE groupBy(token) with partial aggregation —
                    shuffle volume is the distinct-token set per
                    partition, not the token stream
  top-V cutoff      orderBy(count desc, token).limit(V) =
                    TakeOrderedAndProject — per-partition top-V then a
                    driver merge of V rows, never a global sort
  score             explode_outer + BROADCAST hash join against the
                    <=V-row vocab table + groupBy(doc_id) mean — the
                    doc-side stream never shuffles until the per-doc
                    fan-in, and that agg is partial-aggregation
                    friendly

Driver-side collects are two scalars (total token count, kept vocab
size) — same tiny-table discipline as operators/ivf.py's centroid
collect.

Smoothing is add-one over the kept vocabulary: with T = total corpus
tokens, K = |kept vocab| and c(t) the kept-vocab count (0 for OOV),

    logp(t) = ln(c(t) + 1) - ln(T + K + 1)

so every token (including OOV) has mass and the formula is exactly
replayable in ANSI SQL for the DuckDB oracle. Scores are means of ln()
values; queries round to 4 dp so last-ulp libm differences between
engines can't flip the hash.

Analog anchoring: this is the stage-2 classifier idea
(/root/reference/src/models/classifier_dbnet.cpp's confidence gate)
generalized from per-block to per-document, trained from data instead
of fixed thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_VOCAB_SIZE = 512
# keep-gate on the ROUNDED mean log-prob so the Spark/DuckDB boundary
# is exact (comparing unrounded doubles would race libm ulps).
AVG_LOGP_MIN = -8.0


def tokens_col(text_col: str = "text"):
    """Canonical dedup-family tokenization as an array column:
    lower, trim, whitespace-collapse, split on ' '. '' -> empty array
    (size(split('')) would be 1)."""
    w = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    return F.when(F.trim(F.col(text_col)) == "",
                  F.array().cast("array<string>")).otherwise(w)


def train_unigram_lm(df: DataFrame, text_col: str = "text",
                     vocab_size: int = DEFAULT_VOCAB_SIZE):
    """Build the unigram LM from a corpus.

    Returns (vocab_df, total_tokens, kept_vocab_size) where vocab_df is
    the <=vocab_size-row (token, c) table ready to broadcast. The top-V
    cutoff orders by (count DESC, token ASC) so the vocabulary is a
    deterministic function of the corpus.
    """
    tok = (df.select(F.explode(tokens_col(text_col)).alias("token")))
    cnt = (tok.groupBy("token").agg(F.count("*").cast("long").alias("c"))
           .persist())  # one corpus token scan serves total AND top-V
    try:
        total = cnt.agg(F.sum("c")).collect()[0][0] or 0   # scalar only
        # top-V is <= vocab_size rows — land it on the driver so the
        # downstream broadcast join references literal data instead of
        # re-running the corpus aggregation a third time
        rows = (cnt.orderBy(F.desc("c"), F.asc("token"))
                .limit(int(vocab_size)).collect())
    finally:
        cnt.unpersist()
    vocab = df.sparkSession.createDataFrame(
        [(r["token"], r["c"]) for r in rows], "token string, c long")
    return vocab, int(total), len(rows)


def score_documents(df: DataFrame, vocab: DataFrame, total_tokens: int,
                    kept_vocab: int, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_avg_logp: float = AVG_LOGP_MIN) -> DataFrame:
    """Per-document mean token log-probability under the unigram LM.

    Output: (id_col, n_tokens:long, avg_logp:double, keep:boolean).
    Empty documents score avg_logp = 0.0 and fail the gate via the
    n_tokens > 0 clause, not via a magic score value.

    explode_outer keeps zero-token documents in the stream (a null
    token row) so no second join against the document base is needed;
    count(token) ignores the null, avg(lp) ignores the null.
    """
    log_denom = F.log(F.lit(float(total_tokens + kept_vocab + 1)))
    tok = df.select(id_col,
                    F.explode_outer(tokens_col(text_col)).alias("token"))
    lp = F.when(F.col("token").isNotNull(),
                F.log(F.coalesce(F.col("c"), F.lit(0)).cast("double") + 1.0)
                - log_denom)
    scored = (tok.join(F.broadcast(vocab), "token", "left")
              .groupBy(id_col)
              .agg(F.count("token").cast("long").alias("n_tokens"),
                   F.round(F.coalesce(F.avg(lp), F.lit(0.0)), 4)
                    .alias("avg_logp")))
    return scored.withColumn(
        "keep",
        (F.col("n_tokens") > 0)
        & (F.col("avg_logp") >= F.lit(float(min_avg_logp))))


def lm_quality(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               vocab_size: int = DEFAULT_VOCAB_SIZE,
               min_avg_logp: float = AVG_LOGP_MIN) -> DataFrame:
    """Train-on-self convenience: the CCNet pattern where the corpus IS
    the LM training set (self-perplexity flags statistical outliers)."""
    vocab, total, kept = train_unigram_lm(df, text_col, vocab_size)
    return score_documents(df, vocab, total, kept, id_col, text_col,
                           min_avg_logp)


# CCNet partitions Common Crawl into head/middle/tail thirds by
# document perplexity and trains preferentially on the head.
PPL_BUCKET_FRACS = (1.0 / 3.0, 2.0 / 3.0)


def ppl_bucket_documents(scored: DataFrame, logp_col: str = "avg_logp",
                         fracs: tuple = PPL_BUCKET_FRACS,
                         round_to: int = 6) -> DataFrame:
    """CCNet's head/middle/tail corpus partition by self-perplexity.

    Input is a score_documents/lm_quality result; output adds
    ppl_bucket: 'head' (most fluent — HIGHEST mean log-prob = lowest
    perplexity), 'middle', 'tail', or 'empty' (no tokens; CCNet drops
    these upstream, we label rather than lose rows — F8 invariant).

    Cutoffs are EXACT interpolated percentiles of logp over non-empty
    docs: one aggregation job collecting two scalars, broadcast back
    as literals — no window over the corpus. Rounded to round_to dp so
    the Spark/DuckDB boundary compares equal (both engines interpolate
    at (n-1)*q over identical 4-dp inputs).

    Note the inherent two evaluations of `scored`: once under the
    cutoff aggregation, once when the returned frame is consumed —
    cutoffs are a function of the whole distribution, so no single
    pass exists. At scale, persist (or checkpoint to a table) the
    score_documents output before calling this; the synthetic-bench
    path deliberately leaves it lazy rather than leak a cache."""
    base = scored.filter(F.col("n_tokens") > 0)
    row = base.agg(
        F.round(F.percentile(F.col(logp_col), F.lit(float(fracs[0]))),
                round_to).alias("c1"),
        F.round(F.percentile(F.col(logp_col), F.lit(float(fracs[1]))),
                round_to).alias("c2")).collect()[0]
    c1 = row["c1"] if row["c1"] is not None else 0.0
    c2 = row["c2"] if row["c2"] is not None else 0.0
    bucket = (F.when(F.col("n_tokens") == 0, "empty")
              .when(F.col(logp_col) >= F.lit(c2), "head")
              .when(F.col(logp_col) >= F.lit(c1), "middle")
              .otherwise("tail"))
    return scored.withColumn("ppl_bucket", bucket)
