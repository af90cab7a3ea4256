"""Hashed bag-of-ngrams linear quality classifier — the fastText-style
model-based filter every modern web-corpus pipeline runs after the
heuristic gates (CCNet's fastText lang-id, GPT-3/LLaMA's quality
logistic regression, FineWeb-Edu's educational scorer): train a linear
model over hashed word-gram counts on a labelled slice, score the whole
corpus, keep the top.

Reference analog: the classification stage of the reference's staged
pipeline (/root/reference/src/pipeline/ocr_pipeline.cpp stage 2 — the
angle/text classifier that gates candidates between detect and
recognize); here the "classifier" gates documents between extraction
and training-data emission.

Model choice — integer-weight batch PERCEPTRON, not logistic SGD:

  * Feature map: hashed word-unigram counts x_b (dsir._bucket_of md5 /
    xxhash64 family, shared tokenization `lm.tokens_col`), so the
    DuckDB oracle replays the hash bit-for-bit.
  * One training round: score_d = Σ_b w_b·x_db; every doc with
    y_d·score_d <= 0 is misclassified; w_b += Σ_mis y_d·x_db.
    All quantities are INTEGERS — the reduction is exact, order-
    independent, and bit-replayable (the dsir.py micro-nat
    discipline taken to its limit: no floats at all), which is what
    lets the oracle UNROLL the training loop as chained CTEs (the
    linkgraph.pagerank_oracle_sql discipline). Logistic SGD would
    put an exp() inside every iteration and compound cross-engine
    ULP drift; the perceptron buys determinism at no structural cost
    (same explode/agg dataflow a logistic trainer would plan).

Scale shape (per training round, corpus of N docs):

  * The feature table (id, y, bkts array<long>) is computed ONCE and
    localCheckpoint'ed — tokenize+hash is the CPU-heavy stage and
    must not replay per round (cc.py's iterative-lineage fix).
  * Scoring runs INSIDE the scan stage: weights ride along as a
    B-long array LITERAL and score is a pure aggregate() fold over
    the doc's bucket array — zero shuffle, zero join, zero Python.
  * The only exchange per round is the partial-aggregated
    groupBy(bucket) over misclassified docs' exploded buckets:
    <= B rows per map partition leave the map side.
  * The <=B-row gradient lands on the driver (the lm.py vocab
    discipline: weights are a model, not data — B ~ 10^3..10^6
    regardless of corpus size).

Inference (`score_documents`) is the same zero-shuffle fold with the
final weights; at 10^12 docs it is a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import _bucket_of
from .lm import tokens_col

DEFAULT_BUCKETS = 1024


def feature_buckets(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    n_buckets: int = DEFAULT_BUCKETS,
                    hash_family: str = "md5",
                    keep_cols: tuple = ()) -> DataFrame:
    """(id_col, keep_cols..., bkts: array<long>) hashed unigram bucket
    ids WITH multiplicity, in token order. '' / whitespace-only docs
    get an empty array (F8: rows preserved, never dropped)."""
    w = tokens_col(text_col)
    bkts = F.transform(w, lambda t: _bucket_of(t, n_buckets, hash_family))
    return df.select(id_col, *keep_cols, bkts.alias("bkts"))


def _fold_score(bkts, weights: list[int]):
    """Integer score Σ w[b]·count(b) as a pure aggregate() fold over
    the bucket array against a weight-array LITERAL — evaluated in the
    scan stage, no join, no shuffle. element_at is 1-based."""
    warr = F.lit([int(x) for x in weights])
    return F.aggregate(
        bkts, F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(warr, (b + 1).cast("int")))


def train_perceptron(df: DataFrame, label_col: str = "y",
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = DEFAULT_BUCKETS,
                     iters: int = 3,
                     hash_family: str = "md5") -> list[int]:
    """Batch perceptron over hashed unigram counts; returns the final
    integer weight vector (length n_buckets).

    label_col must be +1 / -1 (int). Round k: docs with
    y·score <= 0 under the round-(k-1) weights contribute y·x to the
    gradient; w += gradient. Round 1 starts from w = 0, so every doc
    is misclassified and the first update is the class-difference
    count vector — deterministic bootstrap, no RNG init.

    The per-round gradient (<= n_buckets rows) is collected to the
    driver and folded into the literal weight array for the next
    round — the model is driver-state by design (lm.py vocab
    discipline); the corpus is touched once per round, map-side only
    except the <=B-row gradient agg."""
    feats = (feature_buckets(df, id_col, text_col, n_buckets,
                             hash_family,
                             keep_cols=(label_col,))
             .localCheckpoint())  # tokenize+hash once, not per round
    w = [0] * n_buckets
    y = F.col(label_col).cast("long")
    for _ in range(iters):
        mis = (feats
               .withColumn("_s", _fold_score(F.col("bkts"), w))
               .filter(y * F.col("_s") <= 0))
        grad = (mis.select(y.alias("_y"),
                           F.explode("bkts").alias("_b"))
                .groupBy("_b")
                .agg(F.sum("_y").alias("_g"))
                .collect())  # <= n_buckets tiny rows
        for r in grad:
            w[r["_b"]] += r["_g"]
    return w


def score_documents(df: DataFrame, weights: list[int],
                    id_col: str = "doc_id", text_col: str = "text",
                    hash_family: str = "md5",
                    keep_cols: tuple = ()) -> DataFrame:
    """(id_col, keep_cols..., score: long, pred: boolean) under a
    trained weight vector. Map-only: zero shuffle, zero Python —
    the 10^12-doc inference pass is embarrassingly parallel."""
    n_buckets = len(weights)
    feats = feature_buckets(df, id_col, text_col, n_buckets,
                            hash_family, keep_cols=keep_cols)
    s = _fold_score(F.col("bkts"), weights)
    return (feats.withColumn("score", s)
            .withColumn("pred", F.col("score") > 0)
            .drop("bkts"))
