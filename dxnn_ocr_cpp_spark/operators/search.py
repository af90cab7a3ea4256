"""Full-text search over the extracted corpus: positional inverted
index, boolean-AND retrieval, exact phrase match, and BM25 ranking —
the query-side channel a corpus pipeline exposes once extraction and
dedup are done (find the training docs that mention X, rank candidate
pages for a topic, audit what a filter kept).

Reference analog: the reference's recognition output is consumed by a
downstream lookup of recognized text against expected strings
(/root/reference/benchmark/calculate_acc.py matches recognized spans
to ground truth); here the lookup is generalized to an inverted index
over every extracted document.

Scale shape:
  postings  posexplode + groupBy(token, doc_id) — ONE exchange, and
            map-side partial aggregation collapses the token stream to
            distinct (token, doc_id) rows before the shuffle. At 100 TB
            the postings table is written once, bucketed by token, and
            every query below becomes a pruned scan + result-sized agg.
  boolean / a literal `token IN (...)` filter lands in the parquet
  phrase    scan (pushed-down, partition-pruned when bucketed by
            token), so query cost is proportional to the matched
            postings, never the corpus. Per-doc phrase verification is
            pure higher-order array expressions (exists/array_contains)
            — zero Python, zero extra shuffle past the per-doc fan-in.
  bm25      df per term via a window on the SAME token-keyed exchange
            the filter already produced (the tfidf.py discipline); dl
            and avgdl come from one narrow corpus projection; ranking
            is a result-sized row_number.

Determinism (the dsir/tfidf integer discipline): ln() is the ONLY
transcendental — its output is quantized to integer micro-nats
immediately (idf_micro). Everything after is IEEE-correctly-rounded
rational arithmetic (+,*,/ on doubles are bit-identical across Spark
and DuckDB), and the final per-term score is re-quantized to a BIGINT
before the per-doc sum, so scores are exact integers and the top-k
tie-break (score DESC, doc_id ASC) is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.lm import tokens_col

IDF_MICRO_SCALE = 1_000_000
BM25_K1 = 1.2
BM25_B = 0.75


def build_postings(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Positional inverted index: (token, doc_id, tf, positions).

    positions is the 0-based token-offset list, ascending (array_sort
    over collect_list — collect_list order is nondeterministic under
    parallel fan-in, the sort makes the column a pure function of the
    document). Empty/whitespace-only docs contribute no rows.
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(text_col)).alias("pos", "token"))
    return (tok.groupBy("token", id_col)
            .agg(F.count("*").cast("long").alias("tf"),
                 F.array_sort(F.collect_list(F.col("pos").cast("long")))
                 .alias("positions")))


def boolean_and(postings: DataFrame, terms: list[str],
                id_col: str = "doc_id") -> DataFrame:
    """Docs containing ALL of `terms` (conjunctive retrieval).

    Output: (doc_id, n_terms_hit) with n_terms_hit == len(set(terms)).
    The literal IN-filter is Catalyst-pushed into the postings scan;
    the agg is result-sized. Duplicate query terms are collapsed —
    AND(x, x) is AND(x).
    """
    uniq = sorted(set(terms))
    hit = (postings.filter(F.col("token").isin(uniq))
           .groupBy(id_col)
           .agg(F.count("*").cast("long").alias("n_terms_hit")))
    return hit.filter(F.col("n_terms_hit") == len(uniq))


def phrase_match(postings: DataFrame, phrase: list[str],
                 id_col: str = "doc_id") -> DataFrame:
    """Docs where `phrase` occurs as consecutive tokens.

    Output: (doc_id, n_starts) — n_starts = number of distinct start
    offsets (overlapping occurrences each count: 'a a a' has 2 starts
    of 'a a').

    Plan: filter postings to the phrase's distinct tokens (pushed-down
    IN), ONE per-doc fan-in building a position array per phrase slot
    via conditional max (postings are unique per (token, doc) so max
    picks the single row), then a pure array expression counts starts:
    p is a start iff p+i is in slot i's positions for every i. Zero
    Python, no join chain — a k-token phrase is k array_contains
    probes per candidate start, not k-1 self-joins.
    """
    if not phrase:
        raise ValueError("phrase_match: empty phrase")
    uniq = sorted(set(phrase))
    slots = (postings.filter(F.col("token").isin(uniq))
             .groupBy(id_col)
             .agg(*[F.max(F.when(F.col("token") == t, F.col("positions")))
                    .alias(f"pos_{i}")
                    for i, t in enumerate(phrase)]))
    # a doc missing any phrase token has a NULL slot -> filter early
    present = slots
    for i in range(len(phrase)):
        present = present.filter(F.col(f"pos_{i}").isNotNull())
    return (present
            .withColumn("n_starts", _n_starts(phrase))
            .filter(F.col("n_starts") > 0)
            .select(id_col, "n_starts"))


def _n_starts(phrase: list[str]):
    """Count of start offsets p in pos_0 with pos_i containing p+i for
    all i in 1..k-1 — one F.filter over pos_0 whose predicate is the
    conjunction of k-1 array_contains probes on the sibling columns."""
    if len(phrase) == 1:
        return F.size(F.col("pos_0")).cast("long")

    def is_start(p):
        cond = None
        for i in range(1, len(phrase)):
            probe = F.array_contains(F.col(f"pos_{i}"), p + i)
            cond = probe if cond is None else (cond & probe)
        return cond

    return F.size(F.filter(F.col("pos_0"), is_start)).cast("long")


def doc_lengths(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, dl) token counts — narrow projection, zero shuffle.
    Empty docs get dl=0 and never match (no postings)."""
    return df.select(
        F.col(id_col), F.size(tokens_col(text_col)).cast("long").alias("dl"))


def bm25_topk(df: DataFrame, terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              n_docs: int | None = None,
              postings: DataFrame | None = None) -> DataFrame:
    """Top-k docs for `terms` by BM25 (Robertson/Sparck Jones; the
    Okapi formulation with k1=1.2, b=0.75).

    Output: (doc_id, score_micro, n_terms_hit, rank), rank 1-based by
    (score_micro DESC, doc_id ASC). Disjunctive: a doc matching any
    term scores; n_terms_hit says how many.

    Integer discipline: idf_micro = round(ln((N-df+0.5)/(df+0.5)+1)*1e6)
    quantized per TERM right after the ln; the tf-normalization
    fraction is rational IEEE arithmetic; per-term score re-quantized
    to BIGINT before the per-doc sum. N is the one driver-side scalar
    when not supplied (the lm.py discipline); avgdl is derived from
    exact integers (sum_dl / N) inside the plan, not collected.
    """
    if n_docs is None:
        n_docs = df.count()                       # scalar only
    if postings is None:
        postings = build_postings(df, id_col, text_col)
    uniq = sorted(set(terms))
    hits = postings.filter(F.col("token").isin(uniq)).drop("positions")
    # df per term: window over the token-keyed exchange the IN-filter
    # already produced (tfidf.py discipline — no second shuffle)
    dfreq = F.count("*").over(Window.partitionBy("token")).cast("long")
    idf_micro = F.round(
        F.log((F.lit(float(n_docs)) - F.col("term_df") + F.lit(0.5))
              / (F.col("term_df") + F.lit(0.5)) + F.lit(1.0))
        * IDF_MICRO_SCALE).cast("long")
    dl = doc_lengths(df, id_col, text_col)
    # avgdl = sum(dl)/N: both sides exact integers, the division is a
    # single correctly-rounded IEEE op — bit-identical cross-engine
    sum_dl = dl.agg(F.sum("dl")).collect()[0][0] or 0  # scalar only
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 1.0
    tf_d = F.col("tf").cast("double")
    frac = (tf_d * (BM25_K1 + 1.0)
            / (tf_d + BM25_K1 * (1.0 - BM25_B
                                 + BM25_B * F.col("dl").cast("double")
                                 / F.lit(avgdl))))
    scored = (hits.withColumn("term_df", dfreq)
              .join(dl, id_col)            # dl is a narrow corpus scan;
                                           # at scale dl rides in the
                                           # postings row instead
              .withColumn("idf_micro", idf_micro)
              .withColumn("term_score_micro",
                          F.round(F.col("idf_micro") * frac).cast("long")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.sum("term_score_micro").alias("score_micro"),
                    F.count("*").cast("long").alias("n_terms_hit")))
    # orderBy+limit compiles to TakeOrderedAndProject (distributed
    # partial top-k per partition, merged on the driver) — never the
    # single-partition global window; rank is assigned on the <=k
    # survivor rows where the window is trivially small
    topk = per_doc.orderBy(F.desc("score_micro"), F.asc(id_col)) \
        .limit(int(k))
    rank = F.row_number().over(
        Window.orderBy(F.desc("score_micro"), F.asc(id_col)))
    return topk.withColumn("rank", rank.cast("long"))
