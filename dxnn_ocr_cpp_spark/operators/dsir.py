"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick raw web documents that LOOK LIKE a small target
corpus (wiki/books/eval-domain text) by importance weighting in a
hashed n-gram feature space. This is the standard "make Common Crawl
look like quality text" selection stage, sitting between the quality
gates (operators/lm.py, textstats.quality_features) and the mixture
step (operators/mixing.py): mixing hits target DOMAIN shares, DSIR
hits a target DISTRIBUTION.

Method (public paper, re-expressed Spark-first):

  features      word unigrams + bigrams (the paper's feature set),
                hashed into B buckets — the canonical dedup-family
                tokenization (lm.tokens_col) so the gram universe
                agrees with dedup/decontaminate/lm.
  fit           bag-of-buckets multinomials over target and raw
                corpora with add-one smoothing:
                p(b) = (c(b) + 1) / (T + B).
  weight        log w(doc) = sum over doc grams of
                [ln p_target(bucket) - ln p_raw(bucket)]
                (grams counted WITH multiplicity, per the paper).
  resample      deterministic variant: top-k by (weight, id) — the
                paper samples Gumbel-perturbed top-k; this engine's
                no-RNG discipline (partitioning.split_assign family)
                swaps the perturbation for a total order so reruns
                and the DuckDB twin are bit-stable.

Scale shape (the part that must survive 100 TB):

  bucket counts   explode grams -> ONE partial-aggregated
                  groupBy(bucket): shuffle volume is <= B rows per
                  map partition, never the gram stream. B ~ 10^4.
  ratio table     raw-side bucket counts LEFT JOIN target counts —
                  two <=B-row tables; totals via tiny crossJoin
                  broadcasts, no driver collect.
  scoring         explode_outer grams -> broadcast join against the
                  <=B-row ratio table -> groupBy(id) SUM. The corpus
                  never shuffles until the per-doc fan-in, and that
                  agg is partial-aggregation friendly (same shape as
                  lm.score_documents).
  selection       orderBy(weight desc, id).limit(k) =
                  TakeOrderedAndProject — per-partition top-k then a
                  k-row driver merge, never a global sort.

Determinism across engines (the oracle discipline): the per-bucket
log-ratio is quantized to integer MICRO-NATS
(lr_micro = round(lr * 1e6) as long) before the per-doc sum, so the
sum is exact integer arithmetic — order-independent, bit-identical
between Spark and DuckDB regardless of partial-agg merge order. Doubles
only ever flow through ln/round on SINGLE values, never through a
reduction. (Same trap class as the bench.py max-of-noise and the
lm.py 4-dp rounding, solved structurally here.)

hash_family "md5" is the oracle family (DuckDB replays
'0x'||substr(md5(g),1,15) bit-for-bit — the mixing.py/_bucket
discipline); "xxhash64" is the production family (fastest, JVM-side).

Reference analog: none (single-request engine) — corpus-composition
infrastructure in the operators/mixing.py category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import ensure_min_partitions
from .lm import tokens_col

DEFAULT_BUCKETS = 4096
MICRO = 1_000_000  # log-ratio quantum: integer micro-nats


def _bucket_of(gram, n_buckets: int, hash_family: str):
    """Deterministic hash bucket in [0, n_buckets) for one gram
    column (mixing.py/_bucket discipline; 15 md5 hex chars = 60
    bits, sign-safe as long)."""
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    elif hash_family == "xxhash64":
        h = F.xxhash64(gram)
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return F.pmod(h, F.lit(n_buckets))


def gram_array(text_col: str = "text", gram_ns: tuple = (1, 2)):
    """All word n-grams of the given orders as ONE array column, WITH
    multiplicity (DSIR fits multinomials over gram counts — contrast
    dedup.word_grams, which is distinct by design). Canonical
    tokenization shared with lm/dedup; a doc shorter than n
    contributes no n-grams of that order; '' -> empty array."""
    w = tokens_col(text_col)

    def _zip_grams(base, order):
        # n-grams via chained zip_with against shifted slices: lambda
        # variables BIND the elements, so the token-array expression is
        # evaluated a constant number of times per row. The tempting
        # transform(sequence(...), i -> get(w, i)) shape re-evaluates
        # the whole tokenization PER ELEMENT (O(words^2) per doc —
        # measured 17s -> 3s at sf0.1 when replaced); same trap class
        # as dedup.word_grams' documented slice cost.
        g = base
        for j in range(1, order):
            nxt = F.slice(base, j + 1,
                          F.greatest(F.size(base) - j, F.lit(0)))
            g = F.zip_with(
                g, nxt,
                lambda a, b: F.when(a.isNull() | b.isNull(), None)
                .otherwise(F.concat(a, F.lit(" "), b)))
        return F.filter(g, lambda x: x.isNotNull())

    parts = []
    for n in sorted(gram_ns):
        # zip_with pads the shorter side with null -> the null-guarded
        # lambda + filter drop the tail, so short docs need no guard
        parts.append(w if n == 1 else _zip_grams(w, n))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def bucket_counts(df: DataFrame, text_col: str = "text",
                  n_buckets: int = DEFAULT_BUCKETS,
                  gram_ns: tuple = (1, 2),
                  hash_family: str = "md5") -> DataFrame:
    """(bucket:long, c:long) hashed-gram counts over a corpus — the
    sufficient statistic for one side's multinomial. One explode +
    one partial-aggregated groupBy; shuffle rows <= n_buckets per
    map partition."""
    # gram explode + hashing is the CPU-heavy stage; widen a 1-split
    # small-file scan (no-op at real scale — cdc.py discipline)
    g = (ensure_min_partitions(df)
         .select(F.explode(gram_array(text_col, gram_ns)).alias("g")))
    return (g.select(_bucket_of(F.col("g"), n_buckets, hash_family)
                     .alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def log_ratio_table(target_counts: DataFrame, raw_counts: DataFrame,
                    n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(bucket, lr_micro:long) per-bucket quantized log importance
    ratio ln p_target(b) - ln p_raw(b), add-one smoothed.

    Only buckets PRESENT IN RAW matter for scoring raw docs (a raw
    doc's every bucket appears in raw_counts by construction), so
    this is raw LEFT JOIN target over two <=n_buckets-row tables.
    Totals ride as 1-row broadcast crossJoins — no driver collect.
    round() is away-from-zero in both Spark and DuckDB."""
    tt = target_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_tt"))
    tr = raw_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_tr"))
    t = target_counts.select(F.col("bucket").alias("_b"),
                             F.col("c").alias("_ct"))
    lr = (F.log((F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double"))
          - F.log((F.col("_tt") + n_buckets).cast("double"))
          - F.log((F.col("c") + 1).cast("double"))
          + F.log((F.col("_tr") + n_buckets).cast("double")))
    return (raw_counts
            .join(F.broadcast(t), raw_counts["bucket"] == t["_b"], "left")
            .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(tr))
            .select("bucket",
                    F.round(lr * MICRO, 0).cast("long").alias("lr_micro")))


def fit_log_ratios(docs: DataFrame, is_target_col: str = "is_target",
                   text_col: str = "text",
                   n_buckets: int = DEFAULT_BUCKETS,
                   gram_ns: tuple = (1, 2),
                   hash_family: str = "md5") -> DataFrame:
    """(bucket, lr_micro) fitted from ONE corpus pass when target and
    raw live in the same table under a boolean flag column — the
    common self-referential setup (target = a labelled slice of the
    crawl). Halves the corpus scans vs bucket_counts twice; use the
    two-DataFrame bucket_counts + log_ratio_table pair when the
    target is a genuinely separate corpus (wiki/books).

    The fused (bucket, c_target, c_raw) table is <=n_buckets rows and
    lands on the driver (the lm.py vocab discipline), so computing
    totals and the ratio never re-triggers the corpus aggregation;
    the ln/round arithmetic runs as the SAME Spark expressions as
    log_ratio_table, in the same op order, over literal data."""
    t = F.col(is_target_col)
    g = (ensure_min_partitions(docs)
         .select(t.alias("_t"),
                 F.explode(gram_array(text_col, gram_ns)).alias("g")))
    fused = (g.select("_t",
                      _bucket_of(F.col("g"), n_buckets, hash_family)
                      .alias("bucket"))
             .groupBy("bucket")
             .agg(F.sum(F.when(F.col("_t"), 1).otherwise(0))
                  .cast("long").alias("ct"),
                  F.sum(F.when(~F.col("_t"), 1).otherwise(0))
                  .cast("long").alias("cr")))
    rows = fused.collect()                    # <= n_buckets tiny rows
    tt = float(sum(r["ct"] for r in rows))
    tr = float(sum(r["cr"] for r in rows))
    lit = docs.sparkSession.createDataFrame(
        [(r["bucket"], r["ct"], r["cr"]) for r in rows if r["cr"] > 0],
        "bucket long, _ct long, c long")
    lr = (F.log((F.col("_ct") + 1).cast("double"))
          - F.log(F.lit(tt + n_buckets))
          - F.log((F.col("c") + 1).cast("double"))
          + F.log(F.lit(tr + n_buckets)))
    return lit.select("bucket",
                      F.round(lr * MICRO, 0).cast("long")
                      .alias("lr_micro"))


def importance_scores(raw: DataFrame, ratio: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_buckets: int = DEFAULT_BUCKETS,
                      gram_ns: tuple = (1, 2),
                      hash_family: str = "md5") -> DataFrame:
    """(id_col, n_grams:long, logw_micro:long) per-document log
    importance weight in integer micro-nats.

    explode_outer keeps zero-gram documents in the stream (null gram
    -> logw_micro 0, n_grams 0 — the F8 empty-row invariant, same
    shape as lm.score_documents); the ratio join is a broadcast of
    <=n_buckets rows; the only corpus exchange is the per-doc fan-in."""
    g = ensure_min_partitions(raw).select(
        id_col,
        F.explode_outer(gram_array(text_col, gram_ns)).alias("g"))
    b = g.select(id_col,
                 F.when(F.col("g").isNotNull(),
                        _bucket_of(F.col("g"), n_buckets, hash_family))
                 .alias("bucket"))
    return (b.join(F.broadcast(ratio), "bucket", "left")
            .groupBy(id_col)
            .agg(F.count("bucket").cast("long").alias("n_grams"),
                 F.coalesce(F.sum("lr_micro"), F.lit(0)).cast("long")
                 .alias("logw_micro")))


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = DEFAULT_BUCKETS,
                gram_ns: tuple = (1, 2),
                hash_family: str = "md5") -> DataFrame:
    """Top-k raw documents by target-likeness: fit both multinomials,
    score raw, keep the k highest (logw_micro DESC, id ASC — the
    deterministic stand-in for the paper's Gumbel-top-k).

    Returns (id_col, n_grams, logw_micro) for the selected docs.
    limit(k) after orderBy is TakeOrderedAndProject — scale-safe.
    At scale, persist the two bucket_counts tables when selecting
    repeatedly against the same target."""
    tc = bucket_counts(target, text_col, n_buckets, gram_ns, hash_family)
    rc = bucket_counts(raw, text_col, n_buckets, gram_ns, hash_family)
    ratio = log_ratio_table(tc, rc, n_buckets)
    scored = importance_scores(raw, ratio, id_col, text_col,
                               n_buckets, gram_ns, hash_family)
    return (scored.orderBy(F.desc("logw_micro"), F.asc(id_col))
            .limit(int(k)))
