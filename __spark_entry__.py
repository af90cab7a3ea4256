"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   flagship: full 3-stage main-content extraction over the
               seeded Common-Crawl-style corpus (BASELINE.json north
               rule) at sf0.001 scale (200 docs).
queries()      operator inventory from SURVEY.md §2 + the training-data
               curation ops (dedup / similarity / text analysis), each
               runnable on /root/testdata/sf*.
oracle_sql()   DuckDB-equivalent SQL for every SQL-expressible query.

Column-name/type discipline: every computed column is aliased
identically on both sides; counts/ranks cast to BIGINT, floats rounded,
timestamps reduced to epoch longs — so the driver's order-insensitive
value-hash compares bit-equal values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_DOCS_ENTRY = 200


def _prep(spark: SparkSession) -> None:
    """Runtime confs needed for oracle comparability on an
    externally-provided session."""
    from dxnn_ocr_cpp_spark.session import tune_runtime
    tune_runtime(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: seeded corpus -> extract. Deterministic, ≥0 rows,
    stable schema (url, text, n_spans, n_candidates, charset)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    # few generation partitions: a 200-doc fixture across 32 tasks
    # pays ~6s of python-worker spin-up for ~6 docs/task (measured);
    # 4 tasks amortize the Arrow round-trip and leave output identical
    # (content is a pure function of doc id)
    docs = generate_documents_df(spark, N_DOCS_ENTRY, partitions=4)
    return extract(docs)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _epoch(col):
    """TIMESTAMP_NTZ-safe epoch seconds; with session TZ pinned to UTC
    this equals DuckDB's epoch() on the same parquet value."""
    return col.cast("timestamp").cast("long")


# ---------------- relational operator coverage ----------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan+filter+groupBy multi-agg+sort (SURVEY A4/A5)."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_top_orders_per_cust(spark, sf_dir):
    """Top-k per group via window row_number (O1/O2 reading-order analog)."""
    _prep(spark)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("o_custkey", "rank", "o_orderkey",
                    F.round("o_totalprice", 2).alias("totalprice")))


def q_cust_nation_region(spark, sf_dir):
    """Broadcast-join chain + agg (J3 golden-join analog: small dims
    broadcast, no shuffle for the join itself)."""
    _prep(spark)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"))
            .orderBy("r_name"))


def q_order_revenue_by_priority(spark, sf_dir):
    """Fact-fact shuffle join orders⋈lineitem + agg (the one genuinely
    shuffling join; AQE handles skew)."""
    _prep(spark)
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("o_orderpriority"))


def q_union_nationkeys(spark, sf_dir):
    """Set op coverage: union + distinct (SURVEY §2.7)."""
    _prep(spark)
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (c.union(s).distinct()
            .select(F.col("nationkey").cast("long").alias("nationkey")))


def q_group_concat_customers(spark, sf_dir):
    """Ordered group-concat (J4 page-reassembly analog:
    sort_array(collect_list))."""
    _prep(spark)
    c = _t(spark, sf_dir, "customer")
    return (c.filter(F.col("c_custkey") <= 100)
            .groupBy("c_nationkey")
            .agg(F.array_join(F.array_sort(F.collect_list("c_name")), ",")
                 .alias("names"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.col("c_nationkey").cast("long").alias("nationkey"),
                    "names", "n"))


def q_len_bucket_histogram(spark, sf_dir):
    """Length-bucket histogram (C5 aspect-ratio-bucket analog, A6
    model-usage histogram analog) over documents."""
    _prep(spark)
    d = _t(spark, sf_dir, "documents")
    return (d.withColumn("len_bucket", F.floor(F.col("n_chars") / 256).cast("long"))
            .groupBy("len_bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .orderBy("len_bucket"))


def q_events_tumbling(spark, sf_dir):
    """Tumbling 5-min window agg over events (§2.10 batch analog of the
    streaming path; window key = epoch//300, engine-neutral)."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    return (e.withColumn("win", (_epoch(F.col("ts")) / 300).cast("long"))
            .groupBy("win", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


def q_events_sessionize(spark, sf_dir):
    """Sessionization: lag + gap>30min -> session count per user
    (stateful-op analog expressed relationally)."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _epoch(F.col("ts")) - F.lag(_epoch(F.col("ts"))).over(w)
    return (e.withColumn("new_sess",
                         F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
            .groupBy("user_id")
            .agg(F.sum("new_sess").cast("long").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


def q_latency_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per event_type (A8 latency-
    percentile analog, /root/reference/server/benchmark/core/metrics.py:63-91)."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
                 F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"))
            .orderBy("event_type"))


# ---------------- text analysis / curation ----------------

def q_token_counts(spark, sf_dir):
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import token_count
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    token_count(F.col("text")).cast("long").alias("n_tokens"))


def q_quality_scores(spark, sf_dir):
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import quality_score, quality_features
    d = _t(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["n_tokens"].cast("long").alias("n_tokens"),
        F.round(f["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(quality_score(F.col("text"), features=f), 6)
        .alias("quality_score"))


def q_lang_id_hist(spark, sf_dir):
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import lang_id
    d = _t(spark, sf_dir, "documents")
    return (d.select(lang_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang_pred"))


def q_exact_dedup(spark, sf_dir):
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import exact_dedup
    d = _t(spark, sf_dir, "documents")
    out = exact_dedup(d)
    return out.select("fingerprint",
                      F.col("keep_id").cast("long").alias("keep_id"),
                      F.col("n_dupes").cast("long").alias("n_dupes"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    """EXACT word-3-gram Jaccard near-dup pairs (>=0.4) — the
    SQL-checkable dedup flagship."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import ngram_jaccard_pairs
    d = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(d, threshold=0.4)
    return out.select(F.col("a").cast("long").alias("a"),
                      F.col("b").cast("long").alias("b"), "jaccard")


def q_containment_pairs(spark, sf_dir):
    """Asymmetric word-3-gram containment pairs (src >=50% contained
    in dst) — the aggregator/quotation redundancy symmetric Jaccard
    misses; reuses the same df-capped inverted index."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import containment_pairs
    d = _t(spark, sf_dir, "documents")
    out = containment_pairs(d, threshold=0.5)
    return out.select(F.col("src").cast("long").alias("src"),
                      F.col("dst").cast("long").alias("dst"),
                      "containment")


def q_containment_keeplist(spark, sf_dir):
    """Aggregator/subset-page removal composed on containment_pairs:
    drop any doc whose shingle set is >=90% contained in a LONGER doc
    (char-length ties break to the smaller doc_id, so mutual-
    containment groups keep exactly one member). Returns (doc_id,
    keep) for every document — the asymmetric-redundancy keep-list a
    near-dup pass cannot produce. Pair table is result-sized; the
    length lookup is a 2-column projection; every join keyed."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import containment_pairs
    d = _t(spark, sf_dir, "documents")
    pairs = containment_pairs(d, threshold=0.9)
    lens = d.select(F.col("doc_id").cast("long").alias("id"),
                    F.length("text").alias("len"))
    dropped = (pairs
               .join(lens.select(F.col("id").alias("src"),
                                 F.col("len").alias("sl")), "src")
               .join(lens.select(F.col("id").alias("dst"),
                                 F.col("len").alias("dl")), "dst")
               .filter((F.col("dl") > F.col("sl"))
                       | ((F.col("dl") == F.col("sl"))
                          & (F.col("dst") < F.col("src"))))
               .select(F.col("src").alias("id")).distinct()
               .withColumn("dropped", F.lit(True)))
    return (lens.select("id").join(dropped, "id", "left")
            .select(F.col("id").alias("doc_id"),
                    F.coalesce("dropped", F.lit(False)).alias("dropped"))
            .select("doc_id", (~F.col("dropped")).alias("keep"))
            .orderBy("doc_id"))


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs (verified by exact Jaccard).
    Probabilistic candidate recall -> no SQL oracle (rows-only check)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import minhash_lsh_pairs
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.4)


def q_curate_keeplist(spark, sf_dir):
    """The composed training-data curation pipeline — what the engine
    exists for, as ONE query: exact-dedup survivor (min doc_id per
    md5 fingerprint) AND quality_score >= 0.5 AND lang 'en'. Each leg
    is an already-oracle-checked operator; this checks the composition
    (window + filters chain) end-to-end against SQL."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import (fingerprint,
                                                        lang_id,
                                                        quality_score)
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint")
    return (d.select("doc_id",
                     fingerprint(F.col("text")).alias("fingerprint"),
                     F.round(quality_score(F.col("text")), 6).alias("quality_score"),
                     lang_id(F.col("text")).alias("lang_pred"))
            .withColumn("keep_id", F.min("doc_id").over(w))
            .filter((F.col("doc_id") == F.col("keep_id"))
                    & (F.col("quality_score") >= 0.5)
                    & (F.col("lang_pred") == "en"))
            .select("doc_id", "fingerprint", "quality_score", "lang_pred"))


def q_pdf_roundtrip(spark, sf_dir):
    """PDF source coverage (S5 analog, /root/reference/server/pdf_handler.h):
    build a deterministic FlateDecode PDF per doc from its text, parse
    it back with the pure-Python content-stream extractor, verify the
    text survives byte-exactly. The oracle asserts all-true, so any
    extraction regression fails the value-hash gate."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.pdftext import pdf_roundtrip_ok
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    pdf_roundtrip_ok(F.col("text")).alias("roundtrip_ok"))


def q_winnow_pairs(spark, sf_dir):
    """Winnowing (rolling-hash) fingerprint pairs: docs sharing >=20
    local fingerprints = substantial copied passages (Schleimer et al.,
    SIGMOD 2003). Threshold calibrated on the corpus: template-level
    sharing tops out at n_common~11 (p99.9), seeded near-dup pairs
    cluster at 20-55. Engine-specific hash mixing -> rows-only check;
    kernel guarantees pinned in tests/test_winnow.py. strategy='count'
    here: the synthetic corpus's tiny fingerprint vocabulary (~3k
    distinct over 5k docs) is the dense-sharing shape where the slim
    inverted-index count beats prefix filtering (4.2s vs 6.2s at
    sf0.1); equal output either way (pinned in test_winnow.py)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import winnow_pairs
    d = _t(spark, sf_dir, "documents")
    return (winnow_pairs(d, min_common=20, strategy="count")
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("n_common").cast("long").alias("n_common")))


def q_simhash_pairs(spark, sf_dir):
    """SimHash hamming<=3 near-dup pairs. 3 is the radius the
    pigeonhole candidate join guarantees complete recall for with
    4x16-bit pieces (pieces = d+1); engine-specific hash bit mixing ->
    rows-only check."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import simhash_pairs
    d = _t(spark, sf_dir, "documents")
    return (simhash_pairs(d, max_hamming=3)
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("hamming").cast("long").alias("hamming")))


def q_minhash_lsh_pairs_md5(spark, sf_dir):
    """MinHash+LSH pairs over the md5 hash family — the fully
    oracle-replayable twin of q_minhash_lsh_pairs.  Same banding /
    bucket-join / dedupe / exact-Jaccard-verify code paths, but every
    hash is md5 (which DuckDB evaluates bit-identically), so the DuckDB
    oracle certifies the operator's pair-mining logic end-to-end, not
    just a rows-only count.  carry='ride_along' pinned (auto would run
    an eager count; both carry modes produce identical pairs —
    tests/test_dedup.py::test_minhash_carry_modes_agree)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import minhash_lsh_pairs
    d = _t(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(d, threshold=0.4, hash_family="md5",
                            carry="ride_along")
    return out.select(F.col("a").cast("long").alias("a"),
                      F.col("b").cast("long").alias("b"), "jaccard")


def _minhash_index_cached(spark, sf_dir, corpus_df):
    """Persisted MinHash index (md5 family) for the corpus slice of
    {sf_dir}/documents.parquet — same per-snapshot cache discipline as
    _ivf_cached: keyed by a fingerprint of the source parquet, built
    under a temp dir, atomically renamed into place."""
    import os
    import pathlib
    import shutil
    import uuid
    from dxnn_ocr_cpp_spark.operators.dedup import (read_minhash_index,
                                                    write_minhash_index)
    src = pathlib.Path(sf_dir) / "documents.parquet"
    parts = sorted(src.rglob("*")) if src.is_dir() else [src]
    stats = [p.stat() for p in parts if p.is_file()]
    fp = (f"{sum(s.st_size for s in stats)}_"
          f"{max((int(s.st_mtime) for s in stats), default=0)}")
    cache = (f"/tmp/spark_graft_mhidx/"
             f"{sf_dir.strip('/').replace('/', '_')}_md5_{fp}")
    if not os.path.exists(f"{cache}/meta/_SUCCESS"):
        tmp = f"{cache}.tmp.{uuid.uuid4().hex[:8]}"
        write_minhash_index(corpus_df, tmp, hash_family="md5")
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return read_minhash_index(spark, cache)


def q_incremental_dedup(spark, sf_dir):
    """Incremental dedup of a new crawl batch against a PERSISTED
    corpus MinHash index (operators/dedup.py write_minhash_index /
    incremental_dedup) — the shape a continuously-crawling pipeline
    runs: corpus signatures are computed once per snapshot, each new
    batch pays only its own narrow signature map plus keyed joins.

    Fixture: corpus = doc_id % 10 != 0 (indexed), batch = doc_id % 10
    == 0 (deduped against the index, then among themselves). md5
    family at threshold 0.4, so the DuckDB oracle replays the banding,
    the cross verify + argmax (rounded jaccard DESC, corpus id ASC),
    and the batch-internal closure via recursive CTE — certifying both
    stages end-to-end."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import incremental_dedup
    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    index = _minhash_index_cached(spark, sf_dir, corpus)
    out = incremental_dedup(batch, index, threshold=0.4,
                            carry="ride_along")
    return (out.select(F.col("id").cast("long").alias("id"),
                       F.col("dup_of").cast("long").alias("dup_of"),
                       "jaccard", "keep")
            .orderBy("id"))


def q_simhash_pairs_md5(spark, sf_dir):
    """SimHash hamming<=3 pairs over the md5 token-hash family — the
    oracle-replayable twin of q_simhash_pairs.  Token bits come from the
    first 8 md5 digest bytes (big-endian), so DuckDB can rebuild every
    signature bit-for-bit and replay the hamming filter; the pigeonhole
    candidate join has complete recall (pieces = d+1), so the operator's
    output equals the oracle's exhaustive pair scan."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import simhash_pairs
    d = _t(spark, sf_dir, "documents")
    return (simhash_pairs(d, max_hamming=3, hash_family="md5")
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("hamming").cast("long").alias("hamming")))


def q_winnow_pairs_md5(spark, sf_dir):
    """Winnowing fingerprint pairs over the md5/Catalyst family — the
    oracle-replayable twin of q_winnow_pairs.  Same SIGMOD'03 robust
    winnowing selection (per length-w window of consecutive k-gram
    hashes keep the rightmost minimum) expressed purely in built-ins
    both engines share (md5 + lpad tie-break + window min), so the
    DuckDB oracle certifies selection AND pair mining.  min_common=14
    calibrated on the corpus: template-level sharing tops out at 13
    (p99.9 = 10), seeded near-dup pairs sit at 14-61."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import winnow_pairs_catalyst
    d = _t(spark, sf_dir, "documents")
    return (winnow_pairs_catalyst(d, min_common=14)
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("n_common").cast("long").alias("n_common")))


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbours for query vectors vec_id<5."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import brute_force_topk
    emb = _t(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, emb.filter("vec_id < 5"), k=5)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("rank").cast("long").alias("rank"),
                      F.col("nb_id").cast("long").alias("nb_id"), "sim")


def q_embedding_lsh_topk(spark, sf_dir):
    """ANN variant: hyperplane-LSH bucketed top-k (approximate ->
    rows-only check; bench reports recall vs brute force)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import lsh_topk
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter("vec_id < 5"), k=5)


def q_base64_roundtrip(spark, sf_dir):
    """base64 encode/decode coverage (S3/C9 analog: the reference's
    base64 request payloads, /root/reference/server/ocr_handler.cpp:300-306)."""
    _prep(spark)
    d = _t(spark, sf_dir, "documents")
    enc = F.base64(F.col("text").cast("binary"))
    return d.select(
        "doc_id",
        F.substring(enc, 1, 32).alias("b64_head"),
        (F.unbase64(enc).cast("string") == F.col("text")).alias("roundtrip_ok"))


def q_embedding_cosine_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (sim >= 0.4): the
    embedding-space twin of the text near-dup operators. EXACT all-
    pairs — the oracle-checkable twin, guarded by a row cap (O(n^2));
    the scale path is embedding_cosine_dups_scale below."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import cosine_dup_pairs_exact
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs_exact(emb, threshold=0.4)


def q_embedding_cosine_dups_scale(spark, sf_dir):
    """The 100-TB variant of embedding_cosine_dups: banded hyperplane-
    LSH candidate generation (equi-join on band buckets, no cartesian)
    + exact-cosine verify. Probabilistic candidate recall -> rows-only
    check; precision vs the exact query is pinned in
    tests/test_similarity_pairs.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import cosine_dup_pairs_lsh
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs_lsh(emb, threshold=0.4)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (operators/similarity.py,
    semantic_dedup): k-means cells as candidate buckets, within-cell
    block-matmul pair mining, connected components, keep min id per
    duplicate group. k-means + hash mixing -> rows-only check;
    collapse semantics and partitioning invariance pinned in
    tests/test_similarity_pairs.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import semantic_dedup
    emb = _t(spark, sf_dir, "embeddings")
    # clustering reuses the persisted per-snapshot IVF index (trained
    # once per corpus) — this query measures the dedup pass itself
    return semantic_dedup(emb, threshold=0.4,
                          index=_ivf_cached(spark, sf_dir))


def _ivf_cached(spark, sf_dir):
    """(indexed, centroids) for {sf_dir}/embeddings.parquet from the
    per-corpus-snapshot index cache — the production IVF shape:
    train+write the list_id-partitioned index once per CORPUS
    SNAPSHOT, probe it per query. The cache key embeds a fingerprint
    of the source parquet (total bytes + newest mtime) so a
    regenerated corpus can never silently reuse an index trained on
    old vectors, and writers build under a unique temp dir then
    atomically rename into place so concurrent processes race to an
    identical, never-partially-visible index."""
    import os
    import pathlib
    import uuid
    from dxnn_ocr_cpp_spark.operators.ivf import read_ivf, write_ivf
    emb = _t(spark, sf_dir, "embeddings")
    src = pathlib.Path(sf_dir) / "embeddings.parquet"
    parts = sorted(src.rglob("*")) if src.is_dir() else [src]
    stats = [p.stat() for p in parts if p.is_file()]
    fp = f"{sum(s.st_size for s in stats)}_{max((int(s.st_mtime) for s in stats), default=0)}"
    cache = (f"/tmp/spark_graft_ivf/"
             f"{sf_dir.strip('/').replace('/', '_')}_L16_i2_{fp}")
    if not os.path.exists(f"{cache}/centroids/_SUCCESS"):
        tmp = f"{cache}.tmp.{uuid.uuid4().hex[:8]}"
        write_ivf(emb, tmp, n_lists=16, iters=2)
        try:
            os.rename(tmp, cache)  # atomic; loser of the race cleans up
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    return read_ivf(spark, cache)


def q_embedding_ivf_topk(spark, sf_dir):
    """IVF-indexed ANN top-k (inverted-file cells, nprobe=8/16) —
    approximate -> rows-only check; recall vs brute force is pinned in
    tests/test_ivf.py. Index comes from the per-snapshot cache
    (_ivf_cached); the probe side is what this query measures."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.ivf import ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    indexed, cents = _ivf_cached(spark, sf_dir)
    return ivf_topk(indexed, cents, emb.filter("vec_id < 5"), k=5, nprobe=8)


_PLANT_DIM = 16        # planted vector dimensionality = group count
_PLANT_K = 5


def _planted_embeddings(spark, sf_dir):
    """Embedding table with ground truth planted as pure integer
    functions of doc_id (the media_decode / sitemap_harvest
    discipline, applied to the ANN family): vector for doc_id is the
    one-hot basis vector e_{doc_id % 16} scaled by (doc_id % 7 + 1).
    Consequences that make the approximate operators exactly
    predictable with NO hash mixing in the oracle:

      * all members of a group (same doc_id % 16) are POSITIVE SCALAR
        MULTIPLES of one another -> identical normalized vector ->
        identical hyperplane-LSH signature (signs of projections are
        scale-invariant) and identical k-means cell assignment, under
        ANY planes/centroids — so candidate generation provably
        surfaces every group member;
      * cosine within a group is exactly 1.0 (integer scales: the
        norm sqrt is exact, the ratio is exactly 1.0 before rounding)
        and exactly 0.0 across groups (disjoint one-hot support) —
        so the verified/ranked output is a pure function of the
        group arithmetic, which DuckDB replays without touching a
        vector.

    Every group has >= 12 members even at sf0.001 (200 docs / 16), so
    top-5 among sim-1.0 ties is always filled from the query's own
    group, cut deterministically by the operators' (sim DESC, nb_id
    ASC) ranking."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    g = (F.col("doc_id") % _PLANT_DIM).cast("int")
    s = (F.col("doc_id") % 7 + 1).cast("double")
    vec = F.transform(F.sequence(F.lit(0), F.lit(_PLANT_DIM - 1)),
                      lambda i: F.when(i == g, s).otherwise(F.lit(0.0)))
    return d.select(F.col("doc_id").alias("vec_id"),
                    vec.alias("embedding"))


def q_embedding_lsh_topk_planted(spark, sf_dir):
    """Hyperplane-LSH top-k over the PLANTED embedding table — the
    oracle-certified twin of embedding_lsh_topk (which stays rows-only
    on the real vectors). Group members share every band bucket by
    construction (see _planted_embeddings), so the approximate
    operator's output is exactly the 5 smallest same-group neighbour
    ids at sim 1.0 — a match certifies signature build, band
    bucketing, candidate join, exact re-rank, and the deterministic
    tie-break, independent of the hyperplane draw."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import lsh_topk
    emb = _planted_embeddings(spark, sf_dir)
    out = lsh_topk(emb, emb.filter("vec_id < 5"), k=_PLANT_K,
                   dim=_PLANT_DIM)
    return (out.select(F.col("query_id").cast("long").alias("query_id"),
                       F.col("rank").cast("long").alias("rank"),
                       F.col("nb_id").cast("long").alias("nb_id"), "sim")
            .orderBy("query_id", "rank"))


def q_embedding_ivf_topk_planted(spark, sf_dir):
    """IVF top-k over the PLANTED embedding table — the
    oracle-certified twin of embedding_ivf_topk. All group members
    land in one k-means cell regardless of seeding (identical
    normalized vectors); nprobe = n_lists so the probe set is
    hash-independent too (the real-vector query keeps nprobe=8 —
    THIS query certifies assignment, cell join, and re-rank
    plumbing, not cell pruning, which stays covered by the recall
    tests in tests/test_ivf.py)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.ivf import build_ivf, ivf_topk
    emb = _planted_embeddings(spark, sf_dir)
    indexed, cents = build_ivf(emb, n_lists=16, iters=2)
    out = ivf_topk(indexed, cents, emb.filter("vec_id < 5"),
                   k=_PLANT_K, nprobe=16)
    return (out.select(F.col("query_id").cast("long").alias("query_id"),
                       F.col("rank").cast("long").alias("rank"),
                       F.col("nb_id").cast("long").alias("nb_id"), "sim")
            .orderBy("query_id", "rank"))


def q_embedding_cosine_dups_scale_planted(spark, sf_dir):
    """Banded-LSH near-dup pair mining over the PLANTED embedding
    table — the oracle-certified twin of embedding_cosine_dups_scale.
    Every within-group pair shares all 8 band buckets (identical
    signatures), so candidate generation provably surfaces the full
    within-group clique; exact verify scores it 1.0 and scores every
    cross-group collision exactly 0.0 — the expected pair set is the
    group arithmetic itself, certifying bucketing, the block-tiled
    verify kernel, and cross-band dedup with no hash mixing in the
    oracle."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import cosine_dup_pairs_lsh
    emb = _planted_embeddings(spark, sf_dir)
    return (cosine_dup_pairs_lsh(emb, threshold=0.4, dim=_PLANT_DIM)
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"), "sim")
            .orderBy("a", "b"))


def q_semantic_dedup_planted(spark, sf_dir):
    """SemDeDup over the PLANTED embedding table — the
    oracle-certified twin of semantic_dedup. Each one-hot group is a
    sim-1.0 clique confined to one k-means cell (identical normalized
    vectors), cross-group sims are exactly 0.0, so the expected
    output is: group_id = min doc_id of the group, keep = (id ==
    group_id) — certifying cell mining, the connected-components
    closure, and min-id representative selection with no hash mixing
    in the oracle."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.similarity import semantic_dedup
    emb = _planted_embeddings(spark, sf_dir)
    return (semantic_dedup(emb, threshold=0.9, n_lists=16, iters=2)
            .select(F.col("id").cast("long").alias("id"),
                    "group_id", "keep")
            .orderBy("id"))


def q_validate_rejects(spark, sf_dir):
    """Input-guard operator (F7 analog of request validation,
    /root/reference/server/ocr_handler.cpp:38-124) — reject histogram
    over a URL-shaped corpus derived deterministically from
    {sf_dir}/documents.parquet (doc_id % 50 mangles rows into each
    reject class), so the DuckDB oracle can mirror it exactly.  The
    Column-expr rules themselves are also unit-tested in
    tests/test_validate.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.config import ExtractionConfig
    from dxnn_ocr_cpp_spark.operators.validate import validate_documents
    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 50
    did = F.col("doc_id").cast("string")
    base = d.select(
        F.when(m == 0, F.lit(None).cast("string"))
         .when(m == 1, F.lit(""))
         .when(m == 2, F.concat(F.lit("example.com/doc/"), did))
         .when(m == 3, F.concat(F.lit("https://h/"), F.repeat(F.lit("a"), 3000)))
         .otherwise(F.concat(F.lit("https://example.com/doc/"), did))
         .alias("url"),
        F.encode(F.when(m == 4, F.repeat(F.lit("x"), 5000))
                  .otherwise(F.col("text")), "UTF-8").alias("html"))
    # small max_html_bytes so the oversize rule trips without MB blobs;
    # the oracle mirrors the *4 truncate-vs-reject threshold (4096).
    _, rejects = validate_documents(base, ExtractionConfig(max_html_bytes=1024))
    return (rejects.groupBy("reject_reason")
            .agg(F.count(F.lit(1)).alias("n")).orderBy("reject_reason"))


def q_media_pipeline(spark, sf_dir):
    """Multimodal plumbing end-to-end (S5/P6 media analogs,
    operators/multimodal.py) over a media table derived
    deterministically from {sf_dir}/documents.parquet (doc_id picks
    kind/dims/duration, payload = utf-8 text bytes): featurize
    (n_bytes + shape-checked stub feature), aspect-preserving resize
    geometry (np.rint half-to-even mirrored exactly in the oracle),
    and the video frame-sample explode, joined per media row."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.multimodal import (featurize_media,
                                                         frame_sample_plan,
                                                         resize_media)
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    media = d.select(
        F.concat(F.lit("m"), did.cast("string")).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (did % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        (64 + did % 512).cast("int").alias("width"),
        (64 + (did * 13) % 512).cast("int").alias("height"),
        ((did % 7) * 1500).cast("int").alias("duration_ms"))
    feats = featurize_media(media).select(
        "media_id", "kind", "n_bytes",
        ((F.size("feature") == 16)
         & (F.array_min("feature") >= 0.0)
         & (F.array_max("feature") <= 1.0)).alias("feature_ok"))
    resized = resize_media(media).select(
        "media_id", F.col("out_width").cast("long").alias("out_width"),
        F.col("out_height").cast("long").alias("out_height"))
    frames = (frame_sample_plan(media)
              .groupBy("media_id")
              .agg(F.count(F.lit(1)).alias("n_frames")))
    return (feats.join(resized, "media_id")
            .join(frames, "media_id", "left")
            .select("media_id", "kind", "n_bytes", "feature_ok",
                    "out_width", "out_height",
                    F.coalesce(F.col("n_frames"), F.lit(0)).cast("long")
                     .alias("n_frames")))


def q_media_decode(spark, sf_dir):
    """REAL codec-free media decode certification
    (operators/multimodal.py decode_image/decode_wav): synthesize
    solid-color PPM/BMP images and constant-amplitude PCM16 WAV audio
    with ground truth planted as pure integer functions of doc_id
    (synthesize_media), byte-decode them back (decode_media), and emit
    the measured facts. The DuckDB oracle replays the planted
    arithmetic WITHOUT touching bytes — equality certifies the
    byte-level decoders recover every planted value, incl. the
    truncated-payload rows degrading per-row to decode-error."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.multimodal import (decode_media,
                                                         synthesize_media)
    d = _t(spark, sf_dir, "documents")
    return decode_media(synthesize_media(d.select("doc_id")))


def q_image_dhash_pairs(spark, sf_dir):
    """Perceptual image dedup certification (operators/multimodal.py
    dhash64_arr / image_dhash_pairs): synthesize patterned 16x12 PPMs
    where doc_id %% 25 picks the pattern (same group -> byte-identical
    image -> hamming 0; distinct groups measured >= 8 bits apart, so a
    radius-2 search returns EXACTLY the same-group pairs), find pairs
    with the shared pigeonhole hamming join, max_hamming=2. Every 37th
    doc is truncated (planted decode failures -> excluded from
    pairing). The DuckDB oracle replays group + corruption arithmetic
    without touching bytes or hashes — the media_decode discipline
    applied to the dedup family."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.multimodal import (
        image_dhash_pairs, synthesize_patterned_images)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_patterned_images(d)
    return image_dhash_pairs(media, max_hamming=2)


def q_audio_fp_pairs(spark, sf_dir):
    """Perceptual audio dedup certification (operators/multimodal.py
    afp64_samples / audio_fp_pairs): synthesize patterned 65-window
    PCM16 WAVs where doc_id %% 25 picks the amplitude pattern (same
    group -> byte-identical clip -> hamming 0; groups measured >= 11
    bits apart), pair via the shared pigeonhole hamming join at
    radius 2; every 37th doc truncated (planted decode failures ->
    excluded). DuckDB oracle replays group + corruption arithmetic
    without touching bytes — image_dhash_pairs' twin for audio."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.multimodal import (
        audio_fp_pairs, synthesize_patterned_audio)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return audio_fp_pairs(synthesize_patterned_audio(d), max_hamming=2)


def q_media_dedup_keeplist(spark, sf_dir):
    """END-TO-END perceptual media dedup — the fuzzy_dedup_keeplist
    composition applied to binary media: dHash pairs (radius 2) ->
    alternating-star connected components -> keep the smallest id per
    duplicate cluster -> survivor anti-join. Undecodable payloads
    produce no signature, so they can never be DROPPED by the dedup —
    the conservative fault policy a real pipeline wants (a corrupt
    byte stream must not evict a good capture) — and the planted
    corruption rule makes the oracle assert exactly that. All stages
    after the signature are result-sized."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cc import connected_components
    from dxnn_ocr_cpp_spark.operators.multimodal import (
        image_dhash_pairs, synthesize_patterned_images)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_patterned_images(d)
    pairs = image_dhash_pairs(media, max_hamming=2)
    comp = connected_components(pairs, "a", "b")
    canon = comp.groupBy("component").agg(F.min("node").alias("keep"))
    drops = (comp.join(canon, "component")
             .filter(F.col("node") != F.col("keep"))
             .select(F.col("node").alias("media_id")))
    return (media.select("media_id")
            .join(drops, "media_id", "left_anti")
            .orderBy("media_id"))


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap: discovery from robots.txt (operators/urls.py
    robots_sitemaps) — the missing link between parse_robots (which
    ignores non-rule fields by policy) and feeds.sitemap_entries.
    Planted bodies exercise case-insensitive field names, zero-space
    colons, trailing comments, relative values (dropped per RFC 9309
    absolute-URI requirement), and in-file duplicates (collapsed);
    the DuckDB twin replays only the doc_id arithmetic."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import robots_sitemaps
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    host = F.concat(F.lit("h"), i.cast("string"), F.lit(".ex"))
    base = F.concat(F.lit("https://"), host)
    txt = F.concat(
        F.lit("User-agent: *\nDisallow: /tmp\n"),
        F.when(i % 2 == 0, F.concat(
            F.lit("Sitemap: "), base, F.lit("/sm-"), i.cast("string"),
            F.lit(".xml # find me\n"))).otherwise(F.lit("")),
        F.when((i % 2 == 0) & (i % 7 == 0), F.concat(
            F.lit("Sitemap: "), base, F.lit("/sm-"), i.cast("string"),
            F.lit(".xml\n"))).otherwise(F.lit("")),
        F.when(i % 3 == 0, F.concat(
            F.lit("sitemap:"), base,
            F.lit("/extra.xml\n"))).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.concat(
            F.lit("Sitemap: /relative-"), i.cast("string"),
            F.lit(".xml\n"))).otherwise(F.lit("")))
    return (robots_sitemaps(
                d.select(host.alias("host"), txt.alias("robots_txt")))
            .orderBy("host", "sitemap_url"))


def q_canonical_collapse(spark, sf_dir):
    """rel=canonical collapse (operators/urls.py canonical_collapse)
    — dedup downstream of page_meta: AMP/mobile/tracking variants
    declaring the same canonical collapse to ONE representative (the
    latest capture, ties to larger url). Planted: doc_id %% 3 == 0
    rows share group canonicals (doc_id %% 40), %% 3 == 2 rows declare
    a RELATIVE canonical (ignored -> self-keyed), ts = (doc_id*7) %%
    100 so ties exercise the url tie-break. One partial-agg groupBy,
    no window; DuckDB twin replays arithmetic + row_number winner."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import canonical_collapse
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://s.ex/v/"), i.cast("string"))
    canon = (F.when(i % 3 == 0,
                    F.concat(F.lit("https://c.ex/g"),
                             (i % 40).cast("string")))
             .when(i % 3 == 2, F.lit("/relative"))
             .otherwise(F.lit("")))
    ts = ((i * 7) % 100).cast("long")
    base = d.select(url.alias("url"), canon.alias("canonical_url"),
                    ts.alias("ts"))
    return (canonical_collapse(base, ts_col="ts")
            .orderBy("canon_key"))


def q_sitemap_harvest(spark, sf_dir):
    """Crawl-frontier harvesting (operators/feeds.py sitemap_entries):
    build sitemaps.org XML from doc_id arithmetic IN CATALYST (urlset
    docs with 1-5 <url> entries carrying entity-escaped locs, padded
    whitespace, and conditional <lastmod>; every 13th doc is a
    sitemapindex of 2 child sitemaps), parse it back with the real
    regexp grammar, one explode. The DuckDB oracle recomputes the
    expected rows from the SAME arithmetic without touching XML — a
    match certifies block split, field extraction, trim, and entity
    decode (the media_decode planted-ground-truth discipline)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.feeds import sitemap_entries
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("https://h"), (did % 23).cast("string"),
                    F.lit(".ex.com"))
    is_idx = did % 13 == 0
    n = F.when(is_idx, F.lit(2).cast("long")).otherwise(did % 5 + 1)

    def url_entry(i):
        loc = F.concat(host, F.lit("/p/"), did.cast("string"),
                       F.lit("/"), i.cast("string"), F.lit("&amp;x"))
        lastmod = F.when(
            (did + i) % 2 == 0,
            F.concat(F.lit("<lastmod>2024-0"),
                     ((did + i) % 9 + 1).cast("string"),
                     F.lit("-15</lastmod>"))).otherwise(F.lit(""))
        return F.concat(F.lit("<url><loc>  "), loc, F.lit(" </loc>"),
                        lastmod, F.lit("</url>"))

    def sm_entry(i):
        return F.concat(F.lit("<sitemap><loc>"), host,
                        F.lit("/sitemap-"), i.cast("string"),
                        F.lit(".xml</loc></sitemap>"))

    body = F.array_join(
        F.transform(F.sequence(F.lit(0).cast("long"), n - 1),
                    lambda i: F.when(is_idx, sm_entry(i))
                               .otherwise(url_entry(i))), "")
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'),
        F.when(is_idx,
               F.concat(F.lit("<sitemapindex>"), body,
                        F.lit("</sitemapindex>")))
         .otherwise(F.concat(F.lit("<urlset>"), body,
                             F.lit("</urlset>"))))
    out = sitemap_entries(d.select("doc_id", xml.alias("xml")))
    # absent lastmod -> '' in the DRIVER artifact only: hash/sort
    # neutrality across compare harnesses (the operator itself keeps
    # NULL-for-absent semantics, pinned in tests/test_feeds.py)
    return out.withColumn("lastmod",
                          F.coalesce(F.col("lastmod"), F.lit("")))


def q_robots_parse(spark, sf_dir):
    """robots.txt PARSING certification (urls.parse_robots, the
    zero-shuffle aggregate() fold): synthesize robots.txt bodies from
    doc_id arithmetic in Catalyst — 1-3 groups per doc, each with 1-2
    consecutive User-agent lines and 1-3 Allow/Disallow rules,
    trailing comments on rule lines, blank separator lines, and the
    empty-path 'Disallow:' idiom planted every 5th (doc+group+rule) —
    parse them back with the real fold, and let the DuckDB oracle
    recompute the expected (host, agent, allow, prefix) rows from the
    same arithmetic with no text at all. Pairs with robots_gate
    (parse -> gate is the full robots pipeline)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import parse_robots
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    g = did % 3 + 1

    def group_txt(j):
        na = (did + j) % 2 + 1
        nr = (did * 7 + j) % 3 + 1
        uas = F.array_join(F.transform(
            F.sequence(F.lit(0).cast("long"), na - 1),
            lambda a: F.concat(
                F.lit("User-agent: "),
                F.when(a == 0, F.concat(F.lit("bot"), j.cast("string")))
                 .otherwise(F.concat(F.lit("crawler"),
                                     j.cast("string"))))), "\n")
        rules = F.array_join(F.transform(
            F.sequence(F.lit(0).cast("long"), nr - 1),
            lambda k: F.when((did + j + k) % 5 == 0, F.lit("Disallow:"))
            .otherwise(F.concat(
                F.when((did + j + k) % 2 == 0, F.lit("Allow: "))
                 .otherwise(F.lit("Disallow: ")),
                F.lit("/p"), j.cast("string"), F.lit("/"),
                k.cast("string"), F.lit(" # trailing comment")))), "\n")
        return F.concat(uas, F.lit("\n"), rules)

    txt = F.concat(
        F.lit("# synthetic robots\n\n"),
        F.array_join(F.transform(F.sequence(F.lit(0).cast("long"),
                                            g - 1), group_txt),
                     "\n\n"))
    host = F.concat(F.lit("h"), (did % 23).cast("string"),
                    F.lit(".ex.com"))
    return parse_robots(
        d.select(host.alias("host"), txt.alias("robots_txt")))


def q_frontier_build(spark, sf_dir):
    """THE composed crawl-frontier pipeline — every stage is the real
    operator, chained: sitemap XML (Catalyst fixture, tracking params
    + duplicate locs planted) -> sitemap_entries parse -> canonical_url
    (strips utm_*) -> filter_blocklist (two planted blocked hosts) ->
    parse_robots over per-host robots.txt bodies -> robots_gate ->
    dedup with reference counts. Sitemapindex docs emit child-sitemap
    rows, not pages, so they are excluded from the page frontier by
    kind. The DuckDB oracle replays the URL arithmetic plus the SAME
    generated canonicalization SQL (urls.oracle_url_sql) and the
    planted block/robots predicates — one oracle certifies the whole
    chain composing correctly."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.feeds import sitemap_entries
    from dxnn_ocr_cpp_spark.operators.urls import (canonical_url,
                                                   filter_blocklist,
                                                   parse_robots,
                                                   robots_gate)
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("https://h"), (did % 23).cast("string"),
                    F.lit(".ex.com"))
    is_idx = did % 13 == 0
    n = F.when(is_idx, F.lit(2).cast("long")).otherwise(did % 5 + 1)

    def url_entry(i):
        # i%2 plants duplicate locs within a doc (dedup stage food);
        # utm_source is canonicalization food
        loc = F.concat(host, F.lit("/p/"), did.cast("string"),
                       F.lit("/"), (i % 2).cast("string"),
                       F.lit("?utm_source=t&amp;q="),
                       (i % 2).cast("string"))
        return F.concat(F.lit("<url><loc>"), loc, F.lit("</loc></url>"))

    def sm_entry(i):
        return F.concat(F.lit("<sitemap><loc>"), host,
                        F.lit("/sitemap-"), i.cast("string"),
                        F.lit(".xml</loc></sitemap>"))

    body = F.array_join(
        F.transform(F.sequence(F.lit(0).cast("long"), n - 1),
                    lambda i: F.when(is_idx, sm_entry(i))
                               .otherwise(url_entry(i))), "")
    xml = F.when(is_idx, F.concat(F.lit("<sitemapindex>"), body,
                                  F.lit("</sitemapindex>"))) \
        .otherwise(F.concat(F.lit("<urlset>"), body, F.lit("</urlset>")))
    pages = (sitemap_entries(d.select("doc_id", xml.alias("xml")))
             .filter((F.col("kind") == "urlset")
                     & F.col("loc").isNotNull())
             .select(canonical_url(F.col("loc")).alias("url")))

    blocklist = spark.createDataFrame(
        [("h3.ex.com",), ("h7.ex.com",)], "domain string")
    unblocked = filter_blocklist(pages, blocklist)

    hosts = spark.range(23).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".ex.com")).alias("host"),
        F.when(F.col("id") % 4 == 1,
               F.lit("User-agent: *\nDisallow: /p/"))
         .otherwise(F.lit("User-agent: *\nAllow: /")).alias("robots_txt"))
    rules = parse_robots(hosts).select("host", "prefix", "allow")
    gated = robots_gate(unblocked, rules).filter(F.col("allowed"))

    return (gated.groupBy("url")
            .agg(F.count(F.lit(1)).cast("long").alias("n_refs")))


def q_rss_harvest(spark, sf_dir):
    """Feed parsing (operators/feeds.py feed_entries): even doc_ids
    synthesize RSS 2.0 (<item> with <link> body text + <pubDate>,
    conditionally absent), odd doc_ids Atom (xmlns-detected, <entry>
    with self-closing <link href=.../> + <updated>). Planted
    arithmetic oracle as in q_sitemap_harvest."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.feeds import feed_entries
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    is_rss = did % 2 == 0
    n = did % 4 + 1

    def mklink(i):
        return F.concat(F.lit("https://h"), (did % 23).cast("string"),
                        F.lit(".ex.com/a/"), did.cast("string"),
                        F.lit("/"), i.cast("string"))

    def rss_item(i):
        pub = F.when((did + i) % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("<pubDate>2024-01-0"),
                     ((did + i) % 9 + 1).cast("string"),
                     F.lit("</pubDate>")))
        return F.concat(F.lit("<item><title>T "), did.cast("string"),
                        F.lit(" "), i.cast("string"),
                        F.lit("&amp;z</title><link> "), mklink(i),
                        F.lit(" </link>"), pub, F.lit("</item>"))

    def atom_entry(i):
        return F.concat(F.lit("<entry><title>T "), did.cast("string"),
                        F.lit(" "), i.cast("string"),
                        F.lit('</title><link rel="alternate" href="'),
                        mklink(i),
                        F.lit('"/><updated>2024-02-0'),
                        ((did + i) % 9 + 1).cast("string"),
                        F.lit("</updated></entry>"))

    body = F.array_join(
        F.transform(F.sequence(F.lit(0).cast("long"), n - 1),
                    lambda i: F.when(is_rss, rss_item(i))
                               .otherwise(atom_entry(i))), "")
    xml = F.when(is_rss,
                 F.concat(F.lit("<rss><channel>"), body,
                          F.lit("</channel></rss>"))) \
        .otherwise(F.concat(
            F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'), body,
            F.lit("</feed>")))
    return feed_entries(d.select("doc_id", xml.alias("xml")))


_MOJIBAKE_PLANTS = ["é", "“", "€", "中", "Ã"]


def q_fix_mojibake(spark, sf_dir):
    """Mojibake repair certification (curation.fix_mojibake, pure
    Catalyst encode/decode inverse): plant one non-ASCII char per doc
    (doc_id%5 picks latin-1 'e-acute', curly quote, euro, CJK, lone
    'A-tilde' — covering the latin1-only and false-positive gates),
    MANGLE every doc_id%3==1 row by re-decoding its UTF-8 bytes as
    Latin-1 (the classic upstream bug, same Catalyst encode/decode),
    then repair. The DuckDB oracle computes md5 of the PLANTED
    original without any charset machinery — a value match proves the
    repair inverted the mangle exactly and never touched clean rows."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import fix_mojibake
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    orig = F.concat(
        F.element_at(F.array(*[F.lit(p) for p in _MOJIBAKE_PLANTS]),
                     (did % 5 + 1).cast("int")),
        F.lit(" "), F.col("text"))
    mangled = F.decode(F.encode(orig, "UTF-8"), "ISO-8859-1")
    feed = d.select(
        "doc_id",
        (did % 3 == 1).alias("was_mangled"),
        F.when(did % 3 == 1, mangled).otherwise(orig).alias("text"))
    out = fix_mojibake(feed)
    return out.select(
        "doc_id", "was_mangled",
        F.col("fixed_applied").alias("changed"),
        F.md5(F.col("fixed")).alias("fixed_md5"))


def q_events_json_props(spark, sf_dir):
    """Semi-structured extraction: events.props is a JSON object
    (the WARC-record-metadata analog — crawl pipelines carry per-page
    JSON sidecars). Pull $.k with get_json_object (JVM-side JsonPath,
    no Python), decile-bucket per event_type."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (e.withColumn("k", k)
            .groupBy("event_type",
                     F.floor(F.col("k") / 10).cast("long").alias("k_decile"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("k").cast("long").alias("sum_k"))
            .orderBy("event_type", "k_decile"))


def q_url_host_salt_plan(spark, sf_dir):
    """Hot-host skew census -> salt plan (X4/X5 analog; north rule:
    'salts hot hosts to defuse skew'). A deterministic URL corpus with
    linearly skewed host mass (host index = floor(sqrt(doc_id % 1024)):
    host h31 owns 63x the docs of h0) is parsed back through the
    engine's host_of() and each host gets the salt-bucket count the
    partitioner would assign (ceil(n_docs / cap)), so the DuckDB oracle
    certifies host parsing AND the salt arithmetic."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.partitioning import host_of
    d = _t(spark, sf_dir, "documents")
    hidx = F.floor(F.sqrt(F.col("doc_id") % 1024)).cast("long")
    urls = d.select(
        F.concat(F.lit("https://h"), hidx.cast("string"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    cap = 40  # docs per partition-salt bucket at this scale
    return (urls.select(host_of(F.col("url")).alias("host"))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .withColumn("n_salt",
                        F.ceil(F.col("n_docs") / cap).cast("long"))
            .orderBy("host"))


def q_quota_sample(spark, sf_dir):
    """Deterministic per-host quota sampling (partitioning.quota_sample)
    over the same linearly-skewed host corpus as url_host_salt_plan:
    keep <=15 docs per host, winners = cap-smallest md5-hash units.
    The skew-defusing pre-thin (broadcast count join + u<threshold
    filter BEFORE the window) is part of the operator definition, so
    the DuckDB oracle replays count, threshold, and rank bit-for-bit."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.partitioning import host_of, quota_sample
    d = _t(spark, sf_dir, "documents")
    hidx = F.floor(F.sqrt(F.col("doc_id") % 1024)).cast("long")
    urls = d.select(
        F.concat(F.lit("https://h"), hidx.cast("string"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    hosts = urls.withColumn("host", host_of(F.col("url")))
    out = quota_sample(hosts, group_col="host", cap=15,
                       key_col="url", hash_family="md5")
    return (out.select("host", "url", "u",
                       F.col("rk").cast("long").alias("rk"))
            .orderBy("host", "rk"))


def q_sketch_accuracy(spark, sf_dir):
    """Sketch operators — the 100-TB path for distinct counts and
    percentiles (exact count(DISTINCT)/percentile need a full shuffle
    of every value; HLL++ and the approx-percentile sketch are
    mergeable, one pass, bounded memory). Emits per event_type the
    EXACT values (oracle-checked for real) plus booleans asserting the
    sketch landed within its documented error (HLL rsd=0.05 -> allow
    3*rsd; percentile_approx accuracy 10000 -> allow the observed
    value range / 100), so a sketch regression fails the value hash."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    # exact countDistinct in its OWN aggregation: mixed into the sketch
    # agg it plans an Expand (x2 rows) and drags every
    # ObjectHashAggregate buffer through sort-based aggregation over
    # the expanded rows (measured 6.8s combined vs 0.75+1.0 split at
    # sf0.1 — and Expand over the full fact table is exactly what you
    # cannot afford at 100 TB). The join key is the tiny group-by
    # domain, broadcast by AQE.
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").cast("long").alias("n_users")))
    sk = (e.groupBy("event_type")
          .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("n_users_hll"),
               F.expr("percentile(value, 0.5)").alias("p50_exact"),
               F.percentile_approx("value", F.lit(0.5), F.lit(10000))
                .alias("p50_sketch"),
               (F.max("value") - F.min("value")).alias("vrange")))
    agg = exact.join(sk, "event_type")
    return (agg.select(
                "event_type", "n_users",
                F.round("p50_exact", 6).alias("p50"),
                (F.abs(F.col("n_users_hll") - F.col("n_users"))
                 <= F.greatest(F.col("n_users") * 0.15, F.lit(1.0)))
                 .alias("hll_ok"),
                (F.abs(F.col("p50_sketch") - F.col("p50_exact"))
                 <= F.col("vrange") / 100).alias("pctl_ok"))
            .orderBy("event_type"))


def q_dataset_split(spark, sf_dir):
    """Deterministic leakage-safe train/val/test split (98/1/1) keyed
    on url — pure hash-range assignment, no RNG/partition-order
    dependence (partitioning.split_assign). md5 family so the DuckDB
    oracle replays the exact boundary arithmetic; the xxhash64
    production family shares the code path (tests/test_bucketing.py
    pins family agreement on proportions and determinism)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.partitioning import split_assign
    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"), "doc_id")
    out = split_assign(urls, key_col="url", hash_family="md5")
    return (out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_doc_id"))
            .orderBy("split"))


def q_events_asof_join(spark, sf_dir):
    """Point-in-time (as-of) join: each click event enriched with the
    most recent view event at-or-before it by the same user, within a
    2 h staleness window — the leakage-free temporal join every
    feature/label pipeline needs. Implemented without a join node
    (union + one window shuffle, operators/asof.py); the DuckDB oracle
    is the independent LATERAL formulation of the same semantics."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.asof import asof_join
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view")
    out = asof_join(clicks, views, on="user_id", ts="ts",
                    payload=["event_id", "value"], tie="event_id",
                    tolerance_sec=7200)
    return out.select(
        F.col("event_id").cast("long").alias("click_id"),
        F.col("user_id").cast("long").alias("user_id"),
        _epoch(F.col("ts")).alias("click_ts"),
        F.col("asof_event_id").cast("long").alias("view_id"),
        (_epoch(F.col("ts")) - _epoch(F.col("asof_ts"))).alias("gap_sec"),
        F.round("asof_value", 2).alias("view_value"))


def q_warc_roundtrip(spark, sf_dir):
    """WARC source reader end-to-end (operators/warc.py — the web
    archive container web corpora ship in): documents are serialized
    into 25 multi-record WARC blobs (deterministic string build so the
    oracle can reconstruct expected output without parsing), every
    fifth blob gets a deliberately truncated trailing record, and the
    reader explodes blobs to records inside ONE mapInPandas hop with
    per-record fault containment (the bad record emits
    status='truncated', the rest of the blob survives)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.warc import warc_records
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(F.lit("https://example.com/doc/"), did.cast("string"))
    # HTTP preamble is exactly 44 octets; texts are ASCII but use
    # octet_length anyway — Content-Length is an OCTET count
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url, F.lit("\r\nContent-Length: "),
        (F.octet_length("text") + 44).cast("string"),
        F.lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        F.col("text"), F.lit("\r\n\r\n"))
    blobs = (d.select((did % 25).alias("blob_id"),
                      F.struct(did.alias("doc_id"), rec.alias("rec"))
                       .alias("s"))
             .groupBy("blob_id")
             .agg(F.array_join(
                 F.transform(F.array_sort(F.collect_list("s")),
                             lambda s: s["rec"]), "").alias("txt")))
    bad = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://bad.example/x\r\n"
           "Content-Length: 999999\r\n\r\nshort")
    blobs = blobs.select(
        "blob_id",
        F.encode(F.when(F.col("blob_id") % 5 == 0,
                        F.concat(F.col("txt"), F.lit(bad)))
                  .otherwise(F.col("txt")), "UTF-8").alias("blob"))
    out = warc_records(blobs)
    return out.select(
        F.col("blob_id").cast("long").alias("blob_id"),
        F.col("target_uri").alias("url"),
        "status",
        F.col("http_status").cast("long").alias("http_status"),
        "content_type",
        F.length("body").cast("long").alias("n_body"),
        F.md5("body").alias("body_fp")).orderBy("blob_id", "url")


def q_dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS from the exact Jaccard pair graph:
    alternating large-star/small-star connected components
    (operators/cc.py, O(log^2 n) rounds independent of component
    diameter — the 100-TB property naive min-label propagation lacks).
    Summary per component (survivor = min doc id, size, max member);
    the DuckDB oracle closes the same pair graph with a recursive CTE."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cc import dedup_clusters
    from dxnn_ocr_cpp_spark.operators.dedup import ngram_jaccard_pairs
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.4)
    return (dedup_clusters(pairs)
            .select(F.col("component").cast("long").alias("component"),
                    "n_docs", "max_doc")
            .orderBy("component"))


def q_pii_redact(spark, sf_dir):
    """PII redaction policy gate (operators/curation.py): emails, IPv4,
    phone numbers -> typed placeholders, pure chained regexp_replace
    (zero shuffle). PII is injected deterministically from doc_id so
    the DuckDB oracle mirrors the corpus exactly; patterns are the
    Java/RE2-common subset and the oracle runs the IDENTICAL pattern
    strings (imported from PII_PATTERNS — one source of truth)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import (pii_counts,
                                                       redact_pii)
    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 10
    did = F.col("doc_id").cast("string")
    email = F.concat(F.lit(" contact bob"), did, F.lit("@example.com now"))
    phone = F.concat(F.lit(" call 555-123-"),
                     F.lpad((F.col("doc_id") % 10000).cast("string"),
                            4, "0"), F.lit(" today"))
    ip = F.concat(F.lit(" from 10."), (F.col("doc_id") % 250).cast("string"),
                  F.lit(".0."), (F.col("doc_id") % 200).cast("string"),
                  F.lit(" net"))
    injected = d.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(m == 0, email)
                  .when(m == 1, phone)
                  .when(m == 2, ip)
                  .when(m == 3, F.concat(email, phone, ip))
                  .otherwise(F.lit(""))).alias("text2"))
    counts = pii_counts(F.col("text2"))
    return injected.select(
        "doc_id",
        *[c.cast("long").alias(f"n_{k}") for k, c in counts.items()],
        F.md5(redact_pii(F.col("text2"))).alias("redacted_fp"))


def q_repetition_filters(spark, sf_dir):
    """Gopher-style repetition/boilerplate metrics + keep-gate
    (operators/curation.py): duplicate-word fraction, duplicate-bigram
    fraction, mean word length — pure per-row array expressions, zero
    shuffle. Thresholds imported from the module constants; the DuckDB
    oracle recomputes every metric with list functions."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import \
        with_repetition_features
    d = _t(spark, sf_dir, "documents")
    return (with_repetition_features(d)
            .select("doc_id",
                    F.col("n_words").cast("long").alias("n_words"),
                    F.round("dup_word_frac", 6).alias("dup_word_frac"),
                    F.round("dup_2gram_frac", 6).alias("dup_2gram_frac"),
                    F.round("mean_word_len", 6).alias("mean_word_len"),
                    "keep"))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/curation.py): training docs
    sharing >=3 distinct word 3-grams with the eval slice
    (doc_id % 41 == 0) are flagged. Eval gram set broadcast (KBs of
    benchmarks vs TBs of train at scale); one explode + broadcast semi
    join; only matched gram rows reach the per-doc count shuffle.
    'grams' family here so DuckDB replays the same string universe; the
    blake2b int64 family is the production twin (agreement pinned in
    tests/test_curation.py)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import decontaminate
    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 41 == 0)
    tr = d.filter(F.col("doc_id") % 41 != 0)
    return (decontaminate(tr, ev, min_common=3, gram_family="grams")
            .orderBy("doc_id"))


def q_nfc_normalize(spark, sf_dir):
    """Unicode NFC canonical composition (operators/curation.py, one
    vectorized Arrow hop — Spark has no built-in normalizer). Decomposed
    sequences (e+U+0301, u+U+0308) injected for doc_id % 7 == 0; DuckDB's
    independent nfc_normalize implementation is the oracle. Output pins
    the composition actually happened: char length shrinks and the md5
    of the normalized text matches across engines."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import normalize_nfc
    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 7 == 0,
                        F.lit(" cafe\u0301 u\u0308mlaut"))
                  .otherwise(F.lit(""))).alias("text2"))
    out = injected.withColumn("norm", normalize_nfc(F.col("text2")))
    return out.select(
        "doc_id",
        F.length("text2").cast("long").alias("len_raw"),
        F.length("norm").cast("long").alias("len_nfc"),
        (F.col("text2") != F.col("norm")).alias("changed"),
        F.md5("norm").alias("nfc_fp"))


def q_extract_corpus(spark, sf_dir):
    """The extraction pipeline itself as a queries() entry. Input is
    the seeded 200-doc synthetic corpus (pure function of (seed, i) —
    no external data), so the output is fully deterministic and the
    DuckDB oracle reads a frozen expected-output parquet
    (tests/golden/extract_corpus_expected.parquet, regenerated by
    tools/freeze_extract_expected.py whenever extraction semantics
    change — same discipline as tests/test_golden.py). text_md5 pins
    the north-rule invariant (byte-identical extracted text per url)
    through the driver's hash compare, not just span counts."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    # few generation partitions: a 200-doc fixture across 32 tasks
    # pays ~6s of python-worker spin-up for ~6 docs/task (measured);
    # 4 tasks amortize the Arrow round-trip and leave output identical
    # (content is a pure function of doc id)
    docs = generate_documents_df(spark, N_DOCS_ENTRY, partitions=4)
    return (extract(docs)
            .select("url",
                    F.col("n_spans").cast("long").alias("n_spans"),
                    F.col("n_candidates").cast("long").alias("n_candidates"),
                    "charset",
                    F.length("text").cast("long").alias("text_len"),
                    F.md5(F.encode("text", "UTF-8")).alias("text_md5")))


def q_extract_markdown(spark, sf_dir):
    """Markdown emission mode (operators/emit.py with_markdown) — the
    same kept/ordered spans as extract_corpus rendered with structure
    from each block's context tag (#/##… headings, '- ' list items,
    '> ' quotes, ``` fences), blocks joined by a blank line. Input is
    the seeded 200-doc corpus, so the DuckDB oracle reads a frozen
    expected parquet (tests/golden/extract_markdown_expected.parquet,
    regenerated by tools/freeze_extract_expected.py). md_md5 pins the
    rendering byte-exactly; n_headings/n_list_items pin that the
    output HAS structure (a fixture of plain concatenated text would
    fail those columns, not just the hash)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    # few generation partitions: a 200-doc fixture across 32 tasks
    # pays ~6s of python-worker spin-up for ~6 docs/task (measured);
    # 4 tasks amortize the Arrow round-trip and leave output identical
    # (content is a pure function of doc id)
    docs = generate_documents_df(spark, N_DOCS_ENTRY, partitions=4)
    paras = F.split("markdown", "\n\n")
    return (extract(docs, markdown=True)
            .select("url",
                    F.length("markdown").cast("long").alias("md_len"),
                    F.md5(F.encode("markdown", "UTF-8")).alias("md_md5"),
                    F.size(F.filter(paras, lambda p: p.rlike("^#{1,6} ")))
                     .cast("long").alias("n_headings"),
                    F.size(F.filter(paras, lambda p: p.startswith("- ")))
                     .cast("long").alias("n_list_items")))


def q_line_dedup(spark, sf_dir):
    """Line-level boilerplate dedup (operators/curation.py,
    remove_boilerplate_lines) — the CCNet/RefinedWeb line-wise dedup
    step: lines whose document frequency >= 5 (cookie banners, footers)
    are dropped and documents reassembled from surviving lines in
    order. Boilerplate lines are injected deterministically (banner on
    every doc, newsletter line on doc_id%4==0, footer on doc_id%2==0)
    around the unique body; the DuckDB twin replays injection, df
    count, classification, and ordered reassembly. clean_fp = md5 of
    the reassembled text pins byte-exact reassembly through the
    driver's hash compare."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import \
        remove_boilerplate_lines
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text2 = F.concat(
        F.lit("Accept cookies to continue\n"),
        F.when(i % 4 == 0, F.lit("Subscribe to our newsletter\n"))
         .otherwise(F.lit("")),
        F.col("text"),
        F.when(i % 2 == 0, F.lit("\n© 2026 Example Corp"))
         .otherwise(F.lit("")))
    inj = d.select("doc_id", text2.alias("text2"))
    return (remove_boilerplate_lines(inj, text_col="text2", min_df=5)
            .select("doc_id", "n_lines", "n_dropped",
                    F.md5("text_clean").alias("clean_fp")))


def q_host_template_lines(spark, sf_dir):
    """Host-scoped template removal (operators/curation.py,
    remove_host_template_lines) — the per-site companion of line_dedup:
    a line is template when its document frequency WITHIN ITS HOST
    reaches half the host's pages (frac mode, min_frac=0.5). Injection
    plants host = h(doc_id%7), a per-host navigation line on every
    page (within-host df 1.0 -> dropped) and a per-host trending line
    on doc_id%3==0 (within-host df ~1/3 -> kept), around the unique
    body; the DuckDB twin replays injection, the per-host page count,
    the (host, line) df gate, and ordered reassembly. clean_fp pins
    byte-exact reassembly through the driver's hash compare."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import \
        remove_host_template_lines
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    host = F.concat(F.lit("h"), (i % 7).cast("string"),
                    F.lit(".example.org"))
    text2 = F.concat(
        F.lit("Navigation for "), host, F.lit("\n"),
        F.when(i % 3 == 0,
               F.concat(F.lit("Trending on "), host, F.lit("\n")))
         .otherwise(F.lit("")),
        F.col("text"))
    inj = d.select("doc_id", host.alias("host"), text2.alias("text2"))
    return (remove_host_template_lines(inj, text_col="text2",
                                       min_frac=0.5)
            .select("doc_id", "host", "n_lines", "n_dropped",
                    F.md5("text_clean").alias("clean_fp")))


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-wide paragraph dedup, first occurrence wins
    (operators/curation.py, dedup_paragraphs) — the CCNet/C4 companion
    of line_dedup at paragraph granularity: ANY paragraph seen anywhere
    else in the corpus (or earlier in the same doc) is dropped, not
    just high-frequency ones. Injection plants a cookie paragraph on
    every doc (only the (doc_id,pos)-smallest instance survives), a
    promo paragraph on doc_id%3==0, and an intra-doc repeat of the
    cookie paragraph on doc_id%5==0; the DuckDB twin replays the
    split, the min-(doc_id,pos) winner rule, and ordered reassembly.
    dedup_fp = md5 of the reassembled text pins byte-exact reassembly
    through the driver's hash compare."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import dedup_paragraphs
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text3 = F.concat(
        F.lit(_PD_COOKIE + "\n\n"),
        F.col("text"),
        F.when(i % 3 == 0, F.lit("\n\n" + _PD_PROMO))
         .otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("\n\n" + _PD_COOKIE))
         .otherwise(F.lit("")))
    inj = d.select("doc_id", text3.alias("text3"))
    return (dedup_paragraphs(inj, text_col="text3")
            .select("doc_id", "n_paras", "n_dropped",
                    F.md5("text_dedup").alias("dedup_fp")))


# paragraph-dedup injected boilerplate, shared verbatim by the Spark
# query above and the DuckDB oracle below (one source of truth)
_PD_COOKIE = ("This site uses cookies. By continuing to browse you "
              "accept our cookie policy.")
_PD_PROMO = ("Subscribe to our newsletter for weekly updates and "
             "exclusive offers.")


def q_crawl_schedule(spark, sf_dir):
    """Politeness scheduler (operators/urls.py, crawl_schedule):
    rank each host's frontier by (priority DESC, url ASC) and assign
    fetch offsets of rank * per-host crawl-delay, capped at 40
    scheduled fetches per host per cycle. Frontier is planted from
    doc_id arithmetic (7 hosts, priority = doc_id % 13); even-index
    hosts get an explicit delay of 200*(k+1) ms, odd hosts fall back
    to the 1000 ms default — the DuckDB twin replays the ranking, the
    delay join, the offset arithmetic, and the cycle cap."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import crawl_schedule
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    frontier = d.select(
        F.concat(F.lit("https://h"), (i % 7).cast("string"),
                 F.lit(".example.org/p"), i.cast("string")).alias("url"),
        (i % 13).cast("long").alias("prio"))
    k = F.col("id")
    delays = (spark.range(7).filter(k % 2 == 0)
              .select(F.concat(F.lit("h"), k.cast("string"),
                               F.lit(".example.org")).alias("host"),
                      (200 * (k + 1)).cast("long").alias("delay_ms")))
    return crawl_schedule(frontier, delays, priority_col="prio",
                          default_delay_ms=1000, max_per_host=40)


# duplicated-span injection shared by q_duplicate_spans/q_span_dedup
# and their oracles: a >100-char boilerplate block spliced into every
# doc_id%3==0 doc at a doc-dependent offset (doc_id%37), so the spans
# sit at DIFFERENT positions in every carrier — the driver's value
# compare therefore certifies the chunking's translation invariance,
# not just duplicate counting.
_CDC_BOILER = ("All rights reserved. Reproduction in whole or in part "
               "without written permission is strictly prohibited. "
               "Terms of use and privacy policy apply to all visitors.")


def _cdc_injected(d):
    i = (F.col("doc_id") % 37).cast("int")
    spliced = F.concat(
        F.col("text").substr(F.lit(1), i),
        F.lit(_CDC_BOILER),
        F.col("text").substr(i + 1, F.length("text")))
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, spliced)
         .otherwise(F.col("text")).alias("text"))


def q_duplicate_spans(spark, sf_dir):
    """Exact-substring duplicate-span detection via content-defined
    chunking (operators/cdc.py) — the span-level dedup pass of the
    training-data-dedup literature, re-expressed as pure Catalyst
    higher-order functions + ONE window exchange. md5 hash family:
    the DuckDB twin replays the per-position cut rule, chunking,
    and cross-doc detection end-to-end."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cdc import duplicate_spans
    d = _cdc_injected(_t(spark, sf_dir, "documents"))
    return (duplicate_spans(d, hash_family="md5")
            .select("doc_id",
                    F.col("start").cast("long").alias("start"),
                    F.col("length").cast("long").alias("length"),
                    "n_copies"))


def q_span_dedup(spark, sf_dir):
    """Duplicated-span REMOVAL (operators/cdc.py,
    remove_duplicate_spans, keep='first'): the corpus keeps exactly
    one copy of every cross-document duplicated chunk and documents
    are reassembled from their surviving spans in order. clean_fp =
    md5 of the reassembled text pins byte-exact surgery through the
    driver's hash compare."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cdc import remove_duplicate_spans
    d = _cdc_injected(_t(spark, sf_dir, "documents"))
    return (remove_duplicate_spans(d, keep="first", hash_family="md5")
            .select("doc_id",
                    F.length("text").cast("long").alias("clean_len"),
                    F.md5("text").alias("clean_fp")))


def q_url_blocklist(spark, sf_dir):
    """Domain-blocklist gate (operators/urls.py, flag_blocked): hosts
    are matched against a blocklist by exact domain or subdomain —
    chained broadcast joins over end-anchored host suffixes, zero
    corpus-side shuffle. URLs synthesized from doc_id residues both
    engines replay; the DuckDB twin matches via EXISTS with the SAME
    suffix semantics (host = dom OR host LIKE '%.'||dom)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import flag_blocked
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url2 = F.concat(
        F.lit("https://"),
        F.when(i % 7 == 0,
               F.concat(F.lit("sub"), (i % 3).cast("string"),
                        F.lit(".blocked.net")))
         .otherwise(F.concat(F.lit("host"), (i % 20).cast("string"),
                             F.lit(".example.org"))),
        F.lit("/p/"), i.cast("string"))
    bl = spark.createDataFrame(
        [("blocked.net",), ("host3.example.org",)], "domain string")
    return (flag_blocked(d.select("doc_id", url2.alias("url2")),
                         bl, url_col="url2")
            .select("doc_id", "url2", "blocked"))


def q_pack_shards(spark, sf_dir):
    """Training-shard packing (operators/shards.py): documents
    assigned to fixed token-budget output shards via a bucketed
    distributed prefix sum (no full-corpus single-partition window).
    The DuckDB twin is ONE naive `sum() OVER (ORDER BY doc_id)` —
    certifying that the two-level bucket decomposition equals the
    sequential cumulative sum exactly."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.shards import shard_manifest
    d = _t(spark, sf_dir, "documents")
    return (shard_manifest(d, tokens_col="n_chars", order_col="doc_id",
                           shard_tokens=20_000, bucket_width=64)
            .select("shard_id", "n_docs", "total_tokens",
                    "first_doc", "last_doc"))


def q_chunk_documents(spark, sf_dir):
    """Token-window chunking (operators/chunking.py): docs split into
    16-token chunks with 4 tokens of overlap — the training-example
    prep step. 1→N fan-out via sequence+explode, zero shuffle, zero
    Python; the DuckDB twin replays tokenization, the ceil chunk-count
    arithmetic, list slicing, and joins. chunk_fp = md5(chunk_text)
    pins chunk bytes through the driver's hash compare."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.chunking import chunk_documents
    d = _t(spark, sf_dir, "documents")
    return (chunk_documents(d, max_tokens=16, overlap=4)
            .select("doc_id",
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    "n_tokens",
                    F.md5("chunk_text").alias("chunk_fp")))


def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization (operators/urls.py) — the dedup-key
    normalizer run before url-level dedup in every web pipeline. Messy
    variants (case-noise, default ports, tracking params, fragments,
    unsorted query params, empty paths) are synthesized from doc_id with
    residue arithmetic both engines replay identically; the DuckDB twin
    canonicalizes with the SAME regex strings (urls.oracle_url_sql).
    Zero shuffle: pure Catalyst column expressions."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import canonical_url
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = i.cast("string")
    url2 = F.concat(
        F.when(i % 3 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(i % 2 == 0, F.lit("Host")).otherwise(F.lit("host")),
        (i % 20).cast("string"), F.lit(".Example.org"),
        F.when(i % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.lit("")).otherwise(F.concat(F.lit("/p/"), s)),
        F.when(i % 3 == 1, F.lit("?b=2&a=1&utm_source=feed"))
         .when(i % 3 == 2, F.lit("?utm_campaign=x"))
         .otherwise(F.lit("")),
        F.when(i % 2 == 1, F.lit("#sec")).otherwise(F.lit("")))
    return (d.select("doc_id", url2.alias("url2"))
            .select("doc_id", "url2",
                    canonical_url("url2").alias("canon"))
            .withColumn("changed", F.col("canon") != F.col("url2")))


def q_lm_quality(spark, sf_dir):
    """CCNet-style unigram-LM quality scoring (operators/lm.py): train
    a top-512 unigram LM on the corpus itself, score each document by
    mean token log-probability, gate on the rounded score. One vocab
    groupBy (partial-agg), TakeOrdered top-V, then explode_outer +
    broadcast vocab join + per-doc fan-in — no plan shape that grows
    with corpus size except linearly. The DuckDB twin replays the
    vocabulary cutoff (count DESC, token ASC), the add-one smoothing
    and the ln() mean; both sides round to 4 dp so libm last-ulp
    differences can't flip the hash."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.lm import lm_quality
    d = _t(spark, sf_dir, "documents")
    # gate threshold sits inside the synthetic corpus's (narrow,
    # 31-token-vocab) score range so the keep column discriminates;
    # the module default -8.0 is the realistic web-corpus setting
    return lm_quality(d, min_avg_logp=-3.41).orderBy("doc_id")


def q_recrawl_latest(spark, sf_dir):
    """Re-crawl snapshot dedup — the Common-Crawl "keep newest capture
    per url" step run before any content dedup. A (url, warc_ts)
    capture history is synthesized deterministically from doc_id
    (5 hosts × 100 paths; multiple doc_ids collide per url, each with
    a distinct epoch-derived timestamp), then one max_by aggregation
    keeps the latest capture per url, tie-broken by doc_id. ONE shuffle
    on url with partial aggregation — at 10^12 docs this is the
    cheapest possible plan (no window sort, no join-back). The DuckDB
    twin uses arg-max-by-struct semantics via row_number."""
    _prep(spark)
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://h"), (i % 5).cast("string"),
                   F.lit(".example.org/p"), (i % 100).cast("string"))
    # distinct per-doc capture times: base epoch + residue-scrambled
    # offset (both engines replay the arithmetic exactly)
    ts = (F.lit(1700000000).cast("long")
          + (i * 37 % 100000).cast("long") * 60 + i)
    caps = d.select(i.alias("doc_id"), url.alias("url"), ts.alias("cap_ts"))
    latest = (caps.groupBy("url")
              .agg(F.count("*").cast("long").alias("n_captures"),
                   F.max_by(F.struct(F.col("cap_ts"), F.col("doc_id")),
                            F.struct(F.col("cap_ts"), F.col("doc_id")))
                    .alias("win")))
    return (latest.select("url", "n_captures",
                          F.col("win.cap_ts").alias("latest_ts"),
                          F.col("win.doc_id").alias("latest_doc"))
            .orderBy("url"))


def q_lm_ppl_buckets(spark, sf_dir):
    """CCNet's head/middle/tail corpus partition by self-perplexity:
    score every doc under the self-trained unigram LM (the lm_quality
    pipeline), then bucket by exact tercile cutoffs of the mean
    log-prob — 'head' is the most fluent third CCNet trains on. The
    cutoffs are ONE aggregation collecting two scalars, broadcast back
    as literals; no corpus-wide window. DuckDB twin replays the LM end
    to end plus quantile_cont at the same fractions (both engines
    interpolate (n-1)*q over identical 4-dp inputs; cutoffs rounded to
    6 dp on both sides)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.lm import (lm_quality,
                                                 ppl_bucket_documents)
    d = _t(spark, sf_dir, "documents")
    scored = lm_quality(d, min_avg_logp=-3.41)
    return (ppl_bucket_documents(scored)
            .select("doc_id", "n_tokens", "avg_logp", "ppl_bucket")
            .orderBy("doc_id"))


def q_lang_spans(spark, sf_dir):
    """Mixed-language document segmentation (textstats.lang_spans):
    paragraphs language-id'd and merged into contiguous same-language
    spans — the per-language routing step for interleaved pages.
    Mixed docs are synthesized deterministically (every third doc gains
    a German paragraph, every fourth a Spanish one) so the run-length
    merge is actually exercised. ONE exchange: the (id, span_idx)
    reassembly groupBy rides the window's id-hash partitioning. Full
    DuckDB twin replays the split, marker scoring, run-length merge,
    and span md5."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import lang_spans
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    de = "der die und ist nicht der die und ist nicht."
    es = "el la los es una el la los es una."
    mixed = F.concat(
        F.col("text"),
        F.when(i % 3 == 0, F.lit("\n\n" + de)).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.lit("\n\n" + es)).otherwise(F.lit("")))
    src = d.select("doc_id", mixed.alias("text"))
    return (lang_spans(src)
            .select("doc_id", "span_idx", "lang", "n_paras",
                    F.md5("span_text").alias("span_md5"))
            .orderBy("doc_id", "span_idx"))


def q_snapshot_diff(spark, sf_dir):
    """Cross-snapshot corpus diff — the re-crawl delta that drives
    incremental processing between Common-Crawl-style dumps. Two
    snapshots are synthesized deterministically from documents: the
    old one is missing doc_id % 11 == 3 (those become 'added'), the
    new one is missing doc_id % 13 == 5 ('removed'), and doc_id % 7
    == 0 pages carry revised text ('changed'). One full-outer shuffle
    join over (url, md5-fingerprint) projections — the minimal exact
    plan; both sides pre-shrink to two columns before the exchange."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.snapshots import snapshot_diff
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    base = d.select(
        i.alias("doc_id"),
        F.concat(F.lit("https://h"), (i % 5).cast("string"),
                 F.lit(".example.org/d"), i.cast("string")).alias("url"),
        "text")
    old = base.filter(F.col("doc_id") % 11 != 3).select("url", "text")
    new = (base.filter(F.col("doc_id") % 13 != 5)
           .select("url",
                   F.when(F.col("doc_id") % 7 == 0,
                          F.concat(F.col("text"), F.lit(" [rev2]")))
                   .otherwise(F.col("text")).alias("text")))
    # absent-side fingerprints surface as '' (not NULL) so the value
    # compare sorts cleanly in any engine
    return (snapshot_diff(old, new)
            .select("url", "status",
                    F.coalesce("old_fp", F.lit("")).alias("old_fp"),
                    F.coalesce("new_fp", F.lit("")).alias("new_fp"))
            .orderBy("url"))


def q_incremental_refresh(spark, sf_dir):
    """Churn-only refresh of a derived table across snapshots
    (operators/snapshots.py incremental_refresh): reuse previous
    results for unchanged pages, reprocess only added/changed keys,
    drop removed ones — the monthly-dump shape where the expensive
    stage runs over a few percent of the corpus. Same synthesized
    snapshot pair as q_snapshot_diff; process_fn derives
    (url, n_chars_out, text_md5) per page. The refresh contract is
    row-identity with processing the new snapshot outright, so the
    oracle computes exactly that — while the Spark side actually
    takes the reuse/reprocess path (the reuse split itself is pinned
    in tests/test_snapshots.py)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.snapshots import incremental_refresh
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    base = d.select(
        i.alias("doc_id"),
        F.concat(F.lit("https://h"), (i % 5).cast("string"),
                 F.lit(".example.org/d"), i.cast("string")).alias("url"),
        "text")
    old = base.filter(F.col("doc_id") % 11 != 3).select("url", "text")
    new = (base.filter(F.col("doc_id") % 13 != 5)
           .select("url",
                   F.when(F.col("doc_id") % 7 == 0,
                          F.concat(F.col("text"), F.lit(" [rev2]")))
                   .otherwise(F.col("text")).alias("text")))

    def proc(docs):
        return docs.select(
            "url",
            F.length("text").cast("long").alias("n_chars_out"),
            F.md5("text").alias("text_md5"))

    prev = proc(old)
    return incremental_refresh(old, new, prev, proc).orderBy("url")


def _linky_docs(spark, sf_dir):
    """Deterministic HTML-with-anchors corpus for the link-graph
    family: every doc links one partner host (absolute), every third
    doc a CDN (protocol-relative), plus a relative link (self-host ->
    dropped) and a fragment link (never harvested). The DuckDB twins
    rebuild the identical strings."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sid = i.cast("string")
    url = F.concat(F.lit("https://h"), (i % 5).cast("string"),
                   F.lit(".example.org/d"), sid)
    html = F.concat(
        F.lit('<html><body><a href="https://p'),
        (i * 3 % 7).cast("string"),
        F.lit('.partner.net/x'), sid, F.lit('">p</a>'),
        F.when(i % 3 == 0, F.concat(
            F.lit("<a href='//cdn"), (i % 2).cast("string"),
            F.lit(".assets.net/lib.js'>c</a>"))).otherwise(F.lit("")),
        F.lit('<a href="/about">rel</a><a href="#top">frag</a>'),
        F.lit("</body></html>"))
    return d.select(url.alias("url"), html.alias("html"))


def q_link_graph(spark, sf_dir):
    """Host-level link-graph construction (operators/linkgraph.py):
    href harvest via regexp_extract_all (pure Catalyst, zero Python),
    link policy (absolute / protocol-relative / relative), self-edge
    drop, one partial-aggregated groupBy on (src_host, dst_host). The
    DuckDB oracle replays the IDENTICAL HREF_RE pattern string."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.linkgraph import host_edges
    return (host_edges(_linky_docs(spark, sf_dir))
            .orderBy("src_host", "dst_host"))


def q_host_pagerank(spark, sf_dir):
    """Weighted PageRank over the harvested host graph — the web-graph
    quality prior (Common-Crawl publishes exactly this artifact as its
    host-level ranks). 3 power-iteration rounds, damping 0.85,
    dangling mass not redistributed (the SQL-replayable variant); the
    DuckDB oracle unrolls the SAME 3 iterations as chained CTEs
    (linkgraph.pagerank_oracle_sql), so value equality certifies the
    distributed join+agg decomposition against a sequential replay."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.linkgraph import (host_edges,
                                                        host_pagerank)
    edges = host_edges(_linky_docs(spark, sf_dir))
    return (host_pagerank(edges, damping=0.85, iters=3)
            .select("host", F.round("rank", 6).alias("rank"))
            .orderBy("host"))


def q_compression_quality(spark, sf_dir):
    """Compression-ratio quality signal
    (textstats.with_compression_ratio) certified by planted classes:
    even doc_ids carry machine-repeated template text (zlib ratio
    ~0.03), odd ones an md5-hex entropy stream (~0.56); the 0.25
    bucket cut sits >=0.3 from both, so the bucket is a pure
    function of doc_id arithmetic the DuckDB oracle replays with no
    zlib (the media_decode planted-ground-truth discipline — robust
    to zlib-version drift by construction)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import \
        with_compression_ratio
    d = _t(spark, sf_dir, "documents").select("doc_id")
    hexspam = F.concat(*[
        F.md5(F.encode(F.concat_ws(
            "-", F.col("doc_id").cast("string"), F.lit(str(j))),
            "UTF-8"))
        for j in range(20)])
    planted = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0,
               F.repeat(F.lit("click here to subscribe "), 80))
        .otherwise(hexspam))
    out = with_compression_ratio(planted)
    return (out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.col("compression_ratio") < 0.25, "template")
         .otherwise("entropy").alias("bucket"))
        .orderBy("doc_id"))


def q_host_trustrank(spark, sf_dir):
    """Seed-personalized PageRank (TrustRank, VLDB'04) over the
    harvested host graph — the spam-demotion companion of
    host_pagerank: trust mass re-enters only at a curated seed set,
    so link farms with no trusted in-path score exactly zero however
    densely they interlink. Seeds here: the 3 lexicographically-first
    hosts of the graph (deterministic, oracle-replayable). The DuckDB
    oracle unrolls the SAME 3 iterations as chained CTEs
    (linkgraph.trustrank_oracle_sql)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.linkgraph import (host_edges,
                                                        host_trustrank)
    edges = host_edges(_linky_docs(spark, sf_dir))
    nodes = (edges.select(F.col("src_host").alias("host"))
             .union(edges.select(F.col("dst_host").alias("host")))
             .distinct())
    seeds = nodes.orderBy("host").limit(3)
    return (host_trustrank(edges, seeds, damping=0.85, iters=3)
            .select("host", F.round("trust", 6).alias("trust"))
            .orderBy("host"))


def q_dataset_mix(spark, sf_dir):
    """Domain-weighted dataset mixing (operators/mixing.py): compose a
    training corpus to TARGET shares (web 50 / code 30 / reference 20)
    via feasibility-capped acceptance rates + deterministic md5
    hash-threshold sampling (no RNG; the split_assign oracle family).
    The DuckDB twin replays counts, the min(n_avail/share) feasibility
    bound, the rate arithmetic in the same op order, and the md5
    bucket compare bit-for-bit."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.mixing import mix_rates, mix_sample
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    docs = d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 i.cast("string")).alias("url"),
        F.when(i % 10 < 6, "web").when(i % 10 < 9, "code")
        .otherwise("reference").alias("domain"),
        "doc_id")
    weights = spark.createDataFrame(
        [("web", 0.5), ("code", 0.3), ("reference", 0.2)],
        "domain string, weight double")
    counts = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
    rates = mix_rates(counts, weights)
    kept = mix_sample(docs, rates, hash_family="md5")
    return (kept.groupBy("domain")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("sum_doc_id"))
            .orderBy("domain"))


def q_robots_gate(spark, sf_dir):
    """Robots-style URL rule gate (urls.robots_gate, RFC 9309
    simplified): per-host allow/disallow path-prefix rules, longest
    match wins, allow wins ties, no-rule hosts pass. Corpus side is
    ONE 1:1 broadcast join on host (rules pre-aggregated to structs)
    + array-HOF resolution — zero corpus shuffle. The DuckDB twin
    resolves the same rules RELATIONALLY (join + row_number argmax),
    certifying the HOF decomposition against a relational replay."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import robots_gate
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sid = i.cast("string")
    path = (F.when(i % 5 == 0, F.concat(F.lit("/private/pub/x"), sid))
            .when(i % 5 == 1, F.concat(F.lit("/private/x"), sid))
            .when(i % 5 == 2, F.concat(F.lit("/p/x"), sid))
            .when(i % 5 == 3, F.lit(""))      # empty path -> '/'
            .otherwise(F.concat(F.lit("/docs/x"), sid)))
    url2 = F.concat(F.lit("https://h"), (i % 4).cast("string"),
                    F.lit(".example.org"), path)
    rules = spark.createDataFrame(
        [("h0.example.org", "/", True),
         ("h0.example.org", "/private", False),
         ("h0.example.org", "/private/pub", True),
         ("h1.example.org", "/p", False),
         ("h1.example.org", "/p", True),       # length tie -> allow
         ("h2.example.org", "/docs", False)],
        "host string, prefix string, allow boolean")
    return (robots_gate(d.select("doc_id", url2.alias("url2")), rules,
                        url_col="url2")
            .select("doc_id", "url2", "allowed")
            .orderBy("doc_id"))


def q_bpe_train(spark, sf_dir):
    """Distributed BPE vocabulary training (operators/bpe.py, Sennrich
    et al. 2016): word-count table (one corpus groupBy), then per
    merge round an explode+groupBy pair count, a ONE-row TakeOrdered
    argmax, and a pure-Catalyst aggregate() fold rewrite. Iterative
    argmax is not SQL-expressible — rows-only by design; exact parity
    with a sequential pure-Python reference (merge list AND final
    segmentations) is pinned in tests/test_bpe.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.bpe import merges_df, train_bpe
    d = _t(spark, sf_dir, "documents")
    merges, _ = train_bpe(d, n_merges=10)
    return merges_df(spark, merges).orderBy("merge_idx")


def q_bpe_tokenize(spark, sf_dir):
    """BPE corpus segmentation under the trained vocabulary
    (bpe.bpe_segment): per-doc word/BPE-token counts via one
    word-table equi-join with character fallback for OOV words.
    Rows-only (depends on the iteratively-trained vocab); join-path
    + OOV semantics pinned in tests/test_bpe.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.bpe import bpe_segment, train_bpe
    d = _t(spark, sf_dir, "documents")
    _, words = train_bpe(d, n_merges=10)
    return (bpe_segment(d, words)
            .select("doc_id", "n_words", "n_tokens")
            .orderBy("doc_id"))


def q_anchor_texts(spark, sf_dir):
    """Anchor-text aggregation (linkgraph.anchor_texts/top_anchors):
    how the web DESCRIBES each host — per-destination-host anchor
    labels, normalized (ws-collapse/trim/lower), self-links and empty
    anchors dropped, top-3 per host by (n DESC, anchor ASC). The
    DuckDB twin replays the IDENTICAL ANCHOR_RE pattern string, the
    link policy, the normalization, and the window rank."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.linkgraph import (anchor_texts,
                                                        top_anchors)
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sid = i.cast("string")
    url = F.concat(F.lit("https://h"), (i % 5).cast("string"),
                   F.lit(".example.org/d"), sid)
    label = (F.when(i % 4 == 0, F.lit("read more"))
             .when(i % 4 == 1, F.lit("Click  HERE "))  # exercises norm
             .when(i % 4 == 2, F.concat(F.lit("partner "),
                                        (i * 3 % 7).cast("string")))
             .otherwise(F.lit("home page")))
    html = F.concat(
        F.lit('<a href="https://p'), (i * 3 % 7).cast("string"),
        F.lit(".partner.net/x"), sid, F.lit('">'), label, F.lit("</a>"),
        F.when(i % 3 == 0, F.concat(
            F.lit("<a href='//cdn"), (i % 2).cast("string"),
            F.lit(".assets.net/l.js'> CDN  asset </a>")))
         .otherwise(F.lit("")),
        F.lit('<a href="/self">me</a><a href="#t">frag</a>'),
        F.lit('<a href="https://p1.partner.net/y"></a>'))
    docs = d.select(url.alias("url"), html.alias("html"))
    return (top_anchors(anchor_texts(docs), k=3)
            .orderBy("dst_host", "rk"))


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (operators/dsir.py, Xie et al.
    NeurIPS 2023): select the 40 raw documents whose hashed
    unigram+bigram distribution best matches a target slice
    (doc_id % 7 == 0), by per-doc sums of per-bucket log importance
    ratios quantized to integer micro-nats — so the reduction is
    exact integer arithmetic, order-independent, and the DuckDB twin
    replays tokenization, bucket hashing (md5 family), add-one
    smoothing, the round, and the integer sum bit-for-bit."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dsir import (fit_log_ratios,
                                                   importance_scores)
    d = _t(spark, sf_dir, "documents")
    # target lives in the same table under a flag -> the fused
    # one-pass fit (2 corpus scans total instead of 3)
    ratio = fit_log_ratios(
        d.withColumn("is_target", F.col("doc_id") % 7 == 0),
        n_buckets=4096, hash_family="md5")
    raw = d.filter(F.col("doc_id") % 7 != 0)
    return (importance_scores(raw, ratio, n_buckets=4096,
                              hash_family="md5")
            .orderBy(F.desc("logw_micro"), F.asc("doc_id")).limit(40)
            .select("doc_id", "n_grams", "logw_micro"))


def q_page_meta(spark, sf_dir):
    """HTML page-metadata extraction (operators/meta.py): title /
    meta description / canonical URL / og:title / html lang attribute
    — pure Catalyst regexp_extract in the scan stage, zero Python,
    zero shuffle. Exercises attribute-order independence (content
    before name), case-insensitive tags, entity decode (&amp; last),
    whitespace collapse, and missing-field -> ''. The DuckDB twin
    rebuilds the IDENTICAL html strings and replays the IDENTICAL
    pattern constants + replace chain."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.meta import page_meta
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sid = i.cast("string")
    html = F.concat(
        F.lit('<html lang="'),
        F.when(i % 3 == 0, F.lit("EN-us")).when(i % 3 == 1, F.lit("de"))
         .otherwise(F.lit("")),     # empty lang attr never matches
        F.lit('"><head>'),
        F.when(i % 4 != 3, F.concat(
            F.lit("<title> Doc &amp; "), sid,
            F.lit("  &quot;x&quot;\n t</title>"))).otherwise(F.lit("")),
        F.when(i % 2 == 0, F.concat(
            F.lit('<meta content="desc '), sid,
            F.lit('" name="description">'))).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.concat(
            F.lit("<link rel='canonical' href='https://c.example.org/"),
            sid, F.lit("'>"))).otherwise(F.lit("")),
        F.when(i % 6 == 0, F.concat(
            F.lit('<meta property="og:title" content="og &lt;'), sid,
            F.lit('&gt;">'))).otherwise(F.lit("")),
        F.lit("</head><body>b</body></html>"))
    return (page_meta(d.select("doc_id", html.alias("html")))
            .select("doc_id", "title", "meta_description",
                    "canonical_url", "og_title", "html_lang")
            .orderBy("doc_id"))


def q_html_tables(spark, sf_dir):
    """HTML table extraction (operators/tables.py): structured
    (table_idx, row_idx, cells) records out of raw markup — a pure
    Catalyst regexp explode chain, zero Python, ZERO SHUFFLE. Exercises
    case-insensitive tags, mixed th/td rows, inner-tag stripping
    (-> space), entity decode, multi-table docs, and table-less docs
    (absent from output, never null-padded). The DuckDB twin rebuilds
    the IDENTICAL html and replays the IDENTICAL pattern constants."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.tables import extract_tables
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sid = i.cast("string")
    html = F.concat(
        F.lit("<body><p>prose</p>"),
        F.when(i % 7 != 3, F.concat(
            F.lit('<TaBle class="t">\n <TR><TH> H&amp;A </th>'
                  "<th>Col</th></tr>"),
            F.lit("<tr><td> v"), sid, F.lit(" <b>bold</b></td><td>"),
            (i % 5).cast("string"), F.lit("</td></tr>"),
            F.when(i % 2 == 0, F.concat(
                F.lit('<tr><td colspan="2">only '), sid,
                F.lit(" &lt;x&gt;</td></tr>"))).otherwise(F.lit("")),
            F.lit("</table>"))).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.concat(
            F.lit("<table><tr><td>t2 "), sid,
            F.lit("</td></tr></table>"))).otherwise(F.lit("")),
        F.lit("</body>"))
    t = extract_tables(d.select("doc_id", html.alias("html")))
    return (t.select("doc_id", "table_idx", "row_idx", "n_cells", "n_th",
                     F.array_join("cells", "|").alias("cells_joined"))
            .orderBy("doc_id", "table_idx", "row_idx"))


def q_tfidf_keywords(spark, sf_dir):
    """TF-IDF keyword extraction (operators/tfidf.py): top-5 salient
    terms per document. Three irreducible exchanges (partial-agg tf,
    token-window df that reuses the same exchange as its join-back,
    per-doc top-k); idf quantized to integer micro-nats right after the
    ln so the score is exact integer arithmetic (dsir.py discipline)
    and the DuckDB twin replays it bit-for-bit."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.tfidf import tfidf_topk
    d = _t(spark, sf_dir, "documents")
    return (tfidf_topk(d.select("doc_id", "text"), k=5)
            .orderBy("doc_id", "rank"))


def q_c4_filters(spark, sf_dir):
    """C4 cleaning battery (curation.c4_line_filters — Raffel et al.
    2020 §2.2): terminal-punctuation line gate, >=5-words-per-line,
    javascript line drop, lorem-ipsum / curly-brace page drops,
    >=3-sentence page gate — pure array expressions, zero shuffle,
    zero Python. Line structure is injected deterministically (js line
    on %3, extra sentences on %4, lorem on %11, brace on %13). The
    DuckDB twin replays the IDENTICAL regex/threshold constants."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import c4_line_filters
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text2 = F.concat(
        F.lit("Heading\n"),
        F.col("text").substr(1, 40), F.lit(" tail words here."),
        F.lit("\nShort one."),
        F.when(i % 3 == 0, F.lit(
            "\nThis page uses JavaScript. Enable it to proceed now."))
         .otherwise(F.lit("")),
        F.when(i % 4 == 0, F.lit(
            "\nA second proper sentence appears right here! "
            "And a third one follows closely?")).otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit("\nlorem ipsum dolor sit amet."))
         .otherwise(F.lit("")),
        F.when(i % 13 == 0, F.lit(
            "\nvar x = { a: 1 }; window.onload fires soon."))
         .otherwise(F.lit("")))
    out = c4_line_filters(d.select("doc_id", text2.alias("text")))
    return (out.select(
        "doc_id", "n_lines", "n_lines_kept", "n_sentences",
        F.md5(F.encode("clean_text", "UTF-8")).alias("clean_fp"),
        "keep").orderBy("doc_id"))


def q_gopher_rules(spark, sf_dir):
    """Gopher line-structure quality battery (curation.py,
    gopher_line_features — Rae et al. 2021 A1): duplicate-line /
    duplicate-paragraph / duplicate-line-CHAR fractions, bullet and
    ellipsis line fractions, alphabetic-word fraction, stopword
    count, and the composed keep gate — all pure array expressions,
    zero shuffle. Line structure is injected deterministically (dup
    lines on %7==0, bullets on %5==0, ellipsis tails on %4==0). The
    DuckDB twin replays every fraction with list functions over the
    same splits and the IDENTICAL regex/threshold constants."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import gopher_line_features
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text2 = F.concat(
        F.col("text"),
        F.when(i % 7 == 0, F.lit("\nsame line\nsame line\nsame line"))
         .otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("\n- bullet one\n- bullet two"))
         .otherwise(F.lit("")),
        F.when(i % 4 == 0, F.lit("\ntrailing thought...\nmore…"))
         .otherwise(F.lit("")),
        F.when(i % 3 == 0, F.lit("\n\nrepeated para\n\nrepeated para"))
         .otherwise(F.lit("")))
    feats = gopher_line_features(
        d.select("doc_id", text2.alias("text")))
    round6 = [F.round(c, 6).alias(c)
              for c in ("dup_line_frac", "dup_para_frac",
                        "dup_line_char_frac", "bullet_line_frac",
                        "ellipsis_line_frac", "alpha_word_frac")]
    return (feats.select("doc_id", "n_lines", "n_stopwords",
                         *round6, "keep")
            .orderBy("doc_id"))


def q_quality_classifier(spark, sf_dir):
    """fastText-style hashed bag-of-ngrams quality classifier
    (operators/classifier.py): integer-weight batch perceptron over
    md5-hashed unigram counts, trained 3 rounds on lang=='en' as the
    positive label, then a zero-shuffle map-only scoring pass. Every
    quantity is an INTEGER, so training is exact, order-independent,
    and the DuckDB oracle UNROLLS all 3 rounds as chained CTEs (the
    host_pagerank sequential-replay discipline) — the driver hash
    compare certifies the distributed training loop itself."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.classifier import (score_documents,
                                                         train_perceptron)
    d = _t(spark, sf_dir, "documents")
    labelled = d.withColumn(
        "y", F.when(F.col("lang") == "en", 1).otherwise(-1))
    w = train_perceptron(labelled, label_col="y", n_buckets=1024,
                         iters=3, hash_family="md5")
    return (score_documents(d, w)
            .select("doc_id", "score", "pred")
            .orderBy("doc_id"))


def q_dedup_canonical(spark, sf_dir):
    """Quality-aware canonical selection per near-dup cluster
    (cc.canonical_docs): connected components over the exact Jaccard
    pair graph, then per component keep the LONGEST member (n_chars
    argmax, ties to smaller id) — the keep-the-best policy real dedup
    pipelines apply, vs dedup_clusters' min-id survivor. Integer rank
    -> exact argmax. The DuckDB oracle closes the same graph with a
    recursive CTE and replays the argmax via row_number."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cc import canonical_docs
    from dxnn_ocr_cpp_spark.operators.dedup import ngram_jaccard_pairs
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.4)
    return (canonical_docs(pairs, d)
            .select(F.col("component").cast("long").alias("component"),
                    "canonical_doc", "n_docs", "canonical_rank")
            .orderBy("component"))


def q_fuzzy_dedup_keeplist(spark, sf_dir):
    """END-TO-END fuzzy dedup, oracle-certified at every stage:
    MinHash-LSH candidate pairs (md5 family — DuckDB replays the
    banding and exact-Jaccard verify bit-for-bit), alternating-star
    connected components over the pair graph, keep-the-longest
    canonical per component (integer argmax, ties to smaller id),
    and the survivor anti-join. This is the composition a real
    pipeline runs as ONE job; the recursive-CTE twin certifies the
    whole path, not just the pair stage.

    Scale shape: pair graph and cluster map are result-sized; the
    corpus-side cost is the signature build (narrow map) + band
    shuffle from minhash_lsh_pairs, then one result-sized argmax and
    one anti-join keyed on doc_id."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cc import connected_components
    from dxnn_ocr_cpp_spark.operators.dedup import minhash_lsh_pairs
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.4, hash_family="md5",
                              carry="auto")
    comp = connected_components(pairs, "a", "b")
    ranked = comp.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node")
    canon = ranked.groupBy("component").agg(
        F.max_by("node", F.struct(F.col("n_chars"), -F.col("node")))
        .alias("keep_node"))
    drops = (ranked.join(canon, "component")
             .filter(F.col("node") != F.col("keep_node"))
             .select(F.col("node").alias("doc_id")))
    return (d.join(drops, "doc_id", "left_anti")
            .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
            .orderBy("doc_id"))


def q_publish_dates(spark, sf_dir):
    """Publish-date extraction (operators/meta.py publish_dates) —
    the freshness signal for recency weighting: article:published_time
    meta tag, first <time datetime>, date-shaped URL segments, in that
    priority, each requiring a syntactically valid YYYY-MM-DD prefix
    (invalid values fall through). Planted arithmetic: doc_id %% 4
    picks the source, doc_id %% 7 == 0 plants an INVALID value at that
    source so the driver certifies the fall-through; the DuckDB twin
    replays only the arithmetic, no regex."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.meta import publish_dates
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sel = i % 4
    bad = i % 7 == 0
    y = (F.lit(2000) + i % 25).cast("string")
    mm = F.lpad((i % 12 + 1).cast("string"), 2, "0")
    dd = F.lpad((i % 28 + 1).cast("string"), 2, "0")
    iso = F.concat(y, F.lit("-"), mm, F.lit("-"), dd)
    meta_content = (F.when(bad, F.concat(y, F.lit("-13-40T00:00:00Z")))
                    .otherwise(F.concat(iso, F.lit("T08:30:00+00:00"))))
    time_content = (F.when(bad, F.lit("31-12-2023"))
                    .otherwise(F.concat(iso, F.lit(" 10:00"))))
    html = F.concat(
        F.lit("<html><head>"),
        F.when(sel == 0, F.concat(
            F.lit('<meta property="article:published_time" content="'),
            meta_content, F.lit('">'))).otherwise(F.lit("")),
        F.when(sel == 1, F.concat(
            F.lit('<article><time datetime="'), time_content,
            F.lit('">x</time></article>'))).otherwise(F.lit("")),
        F.lit("</head><body>b</body></html>"))
    url = (F.when(sel == 0, F.concat(
               F.lit("https://d.example.org/"), y, F.lit("/"), mm,
               F.lit("/"), dd, F.lit("/post")))
           .when(sel == 2, F.concat(
               F.lit("https://d.example.org/"), y, F.lit("/"), mm,
               F.lit("/post-"), i.cast("string")))
           .otherwise(F.concat(F.lit("https://d.example.org/post-"),
                               i.cast("string"))))
    return (publish_dates(
                d.select("doc_id", url.alias("url"), html.alias("html")))
            .select("doc_id", "pub_date", "pub_source")
            .orderBy("doc_id"))


def q_corpus_to_shards(spark, sf_dir):
    """THE end-to-end story in one job: Common-Crawl-style html ->
    extracted main content (stage 1-3) -> whitespace token counts ->
    short-doc gate (>= 40 tokens) -> fixed-token-budget training-shard
    assignment via the bucketed distributed prefix sum. This is the
    composition a training-data pipeline actually runs from a crawl
    table to tokenizer-ready shards; everything upstream of
    pack_shards is the zero-shuffle extraction plan. Input is the
    seeded 200-doc corpus, so the oracle is a frozen expected parquet
    (tools/freeze_extract_expected.py; staleness caught first by
    tests/test_golden.py-style fixture-fresh test in
    tests/test_markdown.py's sibling below)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.operators.shards import pack_shards
    from dxnn_ocr_cpp_spark.operators.textstats import token_count
    from dxnn_ocr_cpp_spark.pipeline import extract
    # few generation partitions: a 200-doc fixture across 32 tasks
    # pays ~6s of python-worker spin-up for ~6 docs/task (measured);
    # 4 tasks amortize the Arrow round-trip and leave output identical
    # (content is a pure function of doc id)
    docs = generate_documents_df(spark, N_DOCS_ENTRY, partitions=4)
    ext = extract(docs)
    kept = (ext.select(
                "url",
                F.regexp_extract("url", r"page-(\d+)$", 1)
                 .cast("long").alias("doc_no"),
                token_count(F.col("text")).cast("long")
                 .alias("n_tokens"))
            .filter(F.col("n_tokens") >= 40))
    packed = pack_shards(kept, tokens_col="n_tokens",
                         order_col="doc_no",
                         shard_tokens=20_000, bucket_width=32)
    return packed.select("url", "doc_no", "n_tokens",
                         F.col("cum_tokens").cast("long")
                          .alias("cum_tokens"),
                         F.col("shard_id").cast("long").alias("shard_id"))


def q_corpus_stats(spark, sf_dir):
    """Corpus monitoring rollup: doc and char totals per
    (lang, source) with CUBE subtotals — the per-slice accounting
    table a mixture-weighted training run reads (the A5/A6 counters
    generalized to slices). One pass, one shuffle: Spark plans CUBE
    as a single expand+aggregate; grouping flags are computed
    explicitly (grouping(lang)*2 + grouping(source)) so both engines
    agree on the bit order."""
    _prep(spark)
    d = _t(spark, sf_dir, "documents")
    gid = (F.grouping("lang") * 2 + F.grouping("source")).cast("int")
    return (d.cube("lang", "source")
            .agg(gid.alias("gid"),
                 F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .select(F.coalesce("lang", F.lit("<all>")).alias("lang"),
                    F.coalesce("source", F.lit("<all>")).alias("source"),
                    "gid", "n_docs", "total_chars")
            .orderBy("gid", "lang", "source"))


PHRASE_QUERIES = ["table table", "big data", "slow query"]
BM25_TERMS = ["dup", "spark", "scan"]   # df 25/385/398 of 500 — spread idf
BM25_K = 20


def q_phrase_search(spark, sf_dir):
    """Positional phrase search (operators/search.py): for each query
    phrase, the docs where it occurs as consecutive tokens plus the
    overlap-aware start count. One postings build (posexplode + one
    partial-agg exchange) shared across phrases; per-phrase matching is
    a pushed-down token IN-filter + per-doc fan-in + pure higher-order
    array predicate (exists p: pos_i contains p+i) — zero Python. The
    DuckDB twin recomputes starts from the raw token list with a
    list_filter lambda, so the index+probe path is certified against a
    direct positional scan. 'table table' pins the repeated-token slot
    case; overlap counting is pinned in tests/test_search.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.search import (build_postings,
                                                     phrase_match)
    d = _t(spark, sf_dir, "documents")
    p = build_postings(d)
    out = None
    for ph in PHRASE_QUERIES:
        m = (phrase_match(p, ph.split())
             .select(F.lit(ph).alias("phrase"),
                     F.col("doc_id").cast("long").alias("doc_id"),
                     F.col("n_starts")))
        out = m if out is None else out.unionAll(m)
    return out.orderBy("phrase", "doc_id")


def q_bm25_rank(spark, sf_dir):
    """BM25 top-k retrieval (operators/search.py, Okapi k1=1.2 b=0.75)
    for a fixed disjunctive term set with spread document frequencies.
    Integer micro-nat discipline: ln is the only transcendental,
    quantized per term immediately; the tf-normalization fraction is
    correctly-rounded IEEE rational arithmetic; per-term scores are
    BIGINT before the per-doc sum, so the DuckDB twin replays the
    score bit-for-bit. Top-k is TakeOrderedAndProject (distributed
    partial top-k), never a global single-partition window — pinned in
    tests/test_search.py."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.search import bm25_topk
    d = _t(spark, sf_dir, "documents")
    return (bm25_topk(d.select("doc_id", "text"), BM25_TERMS, k=BM25_K)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "score_micro", "n_terms_hit", "rank")
            .orderBy("rank"))


def _trap_urls(spark, sf_dir):
    """Deterministic URL corpus for the crawl-trap family, planted
    from doc_id arithmetic (the media_decode discipline): host t0
    carries a calendar trap (/cal/2024/M/D), t1 a session-id query
    trap (/view?sid=<md5>&page=N), t2 only static pages; every 7th doc
    also contributes a hex-id path (/s/<md5[0:10]> -> {H} marker). The
    DuckDB twin rebuilds the identical strings."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    host = F.concat(F.lit("https://t"), (i % 3).cast("string"),
                    F.lit(".example.org"))
    url = F.when(i % 3 == 0, F.concat(
        host, F.lit("/cal/2024/"), (i % 12 + 1).cast("string"),
        F.lit("/"), (i % 28 + 1).cast("string"))) \
        .when(i % 3 == 1, F.concat(
            host, F.lit("/view?sid="),
            F.substring(F.md5(i.cast("string")), 1, 12),
            F.lit("&page="), (i % 9).cast("string"))) \
        .otherwise(F.concat(
            host, F.when(i % 2 == 0, F.lit("/about"))
                   .otherwise(F.lit("/contact"))))
    hexed = F.concat(host, F.lit("/s/"),
                     F.substring(F.md5(i.cast("string")), 1, 10))
    return (d.select(url.alias("url"))
            .unionByName(d.where(i % 7 == 0)
                         .select(hexed.alias("url"))))


def q_crawl_traps(spark, sf_dir):
    """Crawl-trap detection (urls.crawl_traps): URL-template explosion
    — calendar labyrinths, session-id spaces, faceted blowups — the
    frontier gate that keeps an infinite URL space from eating crawl
    budget. Template = path with hex-id/digit runs collapsed to
    {H}/{N} + sorted query param names; a (host, template) group traps
    when it generalized something AND holds >= min_urls distinct URLs.
    Two keyed exchanges, output template-universe-sized. The DuckDB
    twin replays the IDENTICAL regex strings over the same planted
    URLs."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import crawl_traps
    return (crawl_traps(_trap_urls(spark, sf_dir), min_urls=20)
            .orderBy("host", "template"))


def q_host_quality_prior(spark, sf_dir):
    """Host-level quality prior (curation.host_quality_prior): per-doc
    quality scores quantized to integer micro-units, summed per host
    (hosts from doc_id arithmetic), shrunk toward the corpus mean with
    pseudo-count m=20 — the host-reputation feature curation gates mix
    in. One corpus groupBy (localCheckpoint-pinned so the global
    aggregate reuses it), 1-row global broadcast. The DuckDB twin
    replays the score formula, the micro quantization, the integer
    sums, and the two final divisions in identical op order."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import host_quality_prior
    from dxnn_ocr_cpp_spark.operators.textstats import quality_score
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 17).cast("string"),
                 F.lit(".example.org")).alias("host"),
        quality_score(F.col("text")).alias("quality_score"))
    return host_quality_prior(docs, m=20).orderBy("host")


CMS_TERMS = ("agg", "neverseen", "spark", "table", "window")
CMS_DEPTH, CMS_WIDTH = 4, 512


def q_cms_term_counts(spark, sf_dir):
    """Count-Min Sketch term-frequency estimates vs exact counts
    (operators/cms.py, Cormode & Muthukrishnan 2005): the mergeable
    fixed-size frequency grid a 100 TB corpus keeps where an exact
    token groupBy is too wide. Build is ONE partial-aggregated
    groupBy bounded by depth*width (never vocabulary size); lookup is
    a broadcast probe join; the md5 Carter-Wegman row hashes make the
    ENTIRE sketch DuckDB-replayable, so the twin certifies build +
    lookup bit-for-bit AND the classic one-sided guarantee
    (est >= exact, the never_under column) is value-checked per term
    — including a never-seen term whose estimate is pure collision
    noise."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.cms import (CMS_TOKEN_RE,
                                                  cms_build, cms_lookup)
    d = _t(spark, sf_dir, "documents")
    sketch = cms_build(d, text_col="text",
                       depth=CMS_DEPTH, width=CMS_WIDTH)
    terms = spark.createDataFrame([(t,) for t in CMS_TERMS],
                                  "term string")
    est = cms_lookup(sketch, terms, depth=CMS_DEPTH, width=CMS_WIDTH)
    exact = (d.select(F.explode(F.regexp_extract_all(
                F.lower("text"), F.lit(CMS_TOKEN_RE), 0)).alias("term"))
             .where(F.col("term").isin(*CMS_TERMS))
             .groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("exact")))
    return (est.join(exact, "term", "left")
            .select("term", "est",
                    F.coalesce("exact", F.lit(0).cast("long"))
                     .alias("exact"),
                    (F.col("est")
                     >= F.coalesce("exact", F.lit(0).cast("long")))
                    .alias("never_under"))
            .orderBy("term"))


def q_epoch_plan(spark, sf_dir):
    """Data-constrained epoch planner (mixing.epoch_plan): per-domain
    epochs/realized/shortfall against a 500k-token budget at target
    shares, repetition capped at 4 epochs (Muennighoff et al. 2023).
    Runs on the GROUP table (one partial-agg groupBy over the corpus,
    then small-table arithmetic); the DuckDB twin replays the token
    rollup, share normalization, cap and shortfall in identical op
    order."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.mixing import epoch_plan
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    toks = (d.select(
        F.when(i % 20 < 12, "web").when(i % 20 < 17, "news")
        .when(i % 20 < 19, "code").otherwise(F.lit("wiki"))
        .alias("domain"),
        F.col("n_chars"))
        .groupBy("domain")
        .agg(F.sum("n_chars").cast("long").alias("n_tokens")))
    weights = spark.createDataFrame(
        [("web", 0.4), ("news", 0.3), ("code", 0.2), ("wiki", 0.1)],
        "domain string, weight double")
    plan = epoch_plan(toks, weights, budget_tokens=500_000,
                      max_epochs=4.0)
    return (plan.select("domain", "n_tokens",
                        F.round("share", 6).alias("share"),
                        F.round("target_tokens", 4)
                        .alias("target_tokens"),
                        F.round("epochs", 6).alias("epochs"),
                        F.round("realized_tokens", 4)
                        .alias("realized_tokens"),
                        F.round("shortfall", 4).alias("shortfall"))
            .orderBy("domain"))


def q_host_hits(spark, sf_dir):
    """Weighted HITS hubs/authorities over the harvested host graph
    (linkgraph.host_hits, Kleinberg JACM 1999) — the mutual-
    reinforcement complement of host_pagerank: 3 L1-normalized
    rounds, dangling hosts kept at 0. The DuckDB oracle unrolls the
    SAME 3 rounds as chained CTEs (linkgraph.hits_oracle_sql), so
    value equality certifies the distributed two-joins-per-round
    decomposition against a sequential replay."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.linkgraph import (host_edges,
                                                        host_hits)
    edges = host_edges(_linky_docs(spark, sf_dir))
    return (host_hits(edges, iters=3)
            .select("host", F.round("hub", 6).alias("hub"),
                    F.round("authority", 6).alias("authority"))
            .orderBy("host"))


def q_curation_funnel(spark, sf_dir):
    """Drop-reason funnel (curation.drop_reasons): per-doc attribution
    of WHICH gate removed it — empty -> duplicate -> low_quality ->
    wrong_lang in pipeline order, first failing gate wins, 'kept'
    otherwise. The audit view next to curate_keeplist's keep-list:
    same legs (md5 fingerprint survivorship window, quality_score,
    lang_id), now labelling the rejects instead of dropping them. The
    DuckDB twin replays the same CTEs with an identical CASE chain
    (coalesce-totalized predicates, same order)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import drop_reasons
    from dxnn_ocr_cpp_spark.operators.textstats import (fingerprint,
                                                        lang_id,
                                                        quality_score)
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint")
    s = (d.select("doc_id", "text",
                  fingerprint(F.col("text")).alias("fingerprint"),
                  F.round(quality_score(F.col("text")), 6)
                  .alias("quality_score"),
                  lang_id(F.col("text")).alias("lang_pred"))
         .withColumn("keep_id", F.min("doc_id").over(w)))
    gates = [
        ("empty", F.trim(F.col("text")) != ""),
        ("duplicate", F.col("doc_id") == F.col("keep_id")),
        ("low_quality", F.col("quality_score") >= 0.5),
        ("wrong_lang", F.col("lang_pred") == "en"),
    ]
    return (drop_reasons(s, gates)
            .select("doc_id", "drop_reason", "quality_score",
                    "lang_pred")
            .orderBy("doc_id"))


def q_dataset_mix_temperature(spark, sf_dir):
    """Temperature-scaled dataset mixing (mixing.temperature_weights
    -> mix_rates -> mix_sample): weights ∝ n^tau with tau=0.5 — the
    XLM-R/mC4 alpha-sampling knob that upsamples rare domains without
    a hand-written weight table. Weights are quantized to integer
    micro-units (round(n^tau * 1e6)) so the DuckDB twin replays the
    pow() on identical integers; the twin then replays the
    feasibility bound, the rate arithmetic in the same op order, and
    the md5 bucket compare bit-for-bit (dataset_mix discipline).
    Corpus side: one broadcast join + codegen'd filter, zero corpus
    shuffle."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.mixing import (mix_rates,
                                                     mix_sample,
                                                     temperature_weights)
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    docs = d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 i.cast("string")).alias("url"),
        F.when(i % 20 < 12, "web").when(i % 20 < 17, "news")
        .when(i % 20 < 19, "code").otherwise(F.lit("wiki"))
        .alias("domain"),
        "doc_id")
    counts = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
    weights = temperature_weights(counts, tau=0.5)
    rates = mix_rates(counts, weights)
    kept = mix_sample(docs, rates, hash_family="md5")
    return (kept.groupBy("domain")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("sum_doc_id"))
            .orderBy("domain"))


def q_meta_robots_gate(spark, sf_dir):
    """Robots META directives (meta.robots_directives): per-page
    noindex/nofollow out of <meta name="robots"> — the in-page analog
    of the robots.txt gate; noindex pages leave the published corpus,
    nofollow pages contribute no link-graph edges. Exercises
    attribute-order independence (content before name), case
    (NOFOLLOW / name="ROBOTS"), the 'none' shorthand (both flags),
    token boundaries (comma/space lists), absent tags, and a
    name="googlebot" tag that must NOT match. Pure Catalyst regexp in
    the scan stage, zero Python, zero shuffle; the DuckDB twin
    rebuilds identical html and replays the IDENTICAL pattern
    constants."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.meta import robots_directives
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    robots = (
        F.when(i % 6 == 0,
               F.lit('<meta name="robots" content="noindex, follow">'))
        .when(i % 6 == 1,
              F.lit('<meta content="NOFOLLOW" name="ROBOTS">'))
        .when(i % 6 == 2, F.lit("<meta name='robots' content='none'>"))
        .when(i % 6 == 3, F.lit(""))
        .when(i % 6 == 4,
              F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(
            F.lit('<meta name="googlebot" content="noindex">')))
    html = F.concat(
        F.lit('<html><head><meta name="description" content="d">'),
        robots, F.lit("</head><body>b</body></html>"))
    out = robots_directives(d.select("doc_id", html.alias("html")))
    return (out.select("doc_id", "robots_noindex", "robots_nofollow",
                       (~F.col("robots_noindex")).alias("indexable"))
            .orderBy("doc_id"))


def q_script_mix(spark, sf_dir):
    """Unicode-script mix (textstats.script_mix): per-script letter
    counts + dominant script — the coarse router above lang_id in a
    multilingual curation stack (CCNet buckets by script before LM
    scoring; marker-n-gram lang-id only covers Latin-script
    languages). Planted text: per-script runs whose lengths derive
    from doc_id arithmetic, so dominance varies and ties exercise the
    fixed priority order (when-chain first-match = SQL CASE). Pure
    Catalyst length-difference counting, zero Python, zero shuffle;
    the twin replays the IDENTICAL literal-range classes with
    regexp_replace(..., 'g')."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import script_mix
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text = F.concat_ws(
        " ",
        F.lit("123 !?"),
        F.repeat(F.lit("ab"), (i % 7).cast("int")),
        F.repeat(F.lit("юя"), (i % 5).cast("int")),
        F.repeat(F.lit("αβ"), (i % 4).cast("int")),
        F.repeat(F.lit("你好"), (i % 3).cast("int")),
        F.repeat(F.lit("مر"), (i % 2).cast("int")),
        F.repeat(F.lit("한국"), (i % 6).cast("int")))
    out = script_mix(d.select("doc_id", text.alias("text")))
    frac = (F.when(F.col("n_script_chars") > 0,
                   F.col("n_latin").cast("double")
                   / F.col("n_script_chars"))
            .otherwise(F.lit(0.0)))
    return (out.select("doc_id", "n_latin", "n_cyrillic", "n_greek",
                       "n_cjk", "n_arabic", "n_hangul",
                       "n_script_chars", "dominant_script",
                       frac.alias("latin_frac"))
            .orderBy("doc_id"))


# ---------------- planted-recall rows for the xxhash/blake families --

# clone ids live far above any real doc_id (sf1 would be ~6M docs)
_CLONE_OFFSET = 100_000_000


def _planted_clone_docs(spark, sf_dir, mod: int, rem: int):
    """(doc_id, text) frame planting ground-truth near-dup pairs for
    the ENGINE-NATIVE hash families (xxhash64 minhash, blake2b simhash,
    xxhash winnowing) whose mixing DuckDB cannot replay: every source
    doc with doc_id % mod == rem (and enough text to fingerprint) gets
    a clone at doc_id + 100_000_000 with IDENTICAL text. Identical text
    means identical shingle/token/k-gram sets, hence identical
    signatures under ANY hash family — so each (src, src+offset) pair
    is a deterministic, hash-independent must-recover: minhash collides
    in every band, simhash sits at hamming 0, winnowing shares its full
    fingerprint set. The oracle enumerates the planted pairs by pure
    doc_id arithmetic — a value-level driver check for the families
    that previously had rows-only rows (their pair-mining logic is
    separately certified end-to-end by the md5-family twins)."""
    d = (_t(spark, sf_dir, "documents")
         .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
         .filter((F.col("doc_id") % mod == rem)
                 & (F.length("text") >= 100)))
    clones = d.select((F.col("doc_id") + _CLONE_OFFSET).alias("doc_id"),
                      "text")
    return d.unionByName(clones)


def _planted_pair_sql(mod: int, rem: int, extra_cols: str = "") -> str:
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS a,
           CAST(doc_id + {_CLONE_OFFSET} AS BIGINT) AS b{extra_cols}
    FROM documents
    WHERE doc_id % {mod} = {rem} AND length(text) >= 100
    ORDER BY a"""


def q_minhash_planted_recall(spark, sf_dir):
    """xxhash64 MinHash+LSH over the planted-clone corpus — the
    value-level driver row for the engine-native family (the md5 twin
    certifies the pair-mining logic; THIS certifies that the xxhash64
    signature build + banding loses none of the k planted pairs and
    scores each at exact Jaccard 1.0). Output filtered to the planted
    pair ids by pure arithmetic (b == a + offset), so extra template
    near-dups among the sources never enter the compare."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import minhash_lsh_pairs
    d = _planted_clone_docs(spark, sf_dir, 17, 3)
    out = minhash_lsh_pairs(d, threshold=0.4, carry="ride_along")
    return (out.filter(F.col("b") == F.col("a") + _CLONE_OFFSET)
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"), "jaccard")
            .orderBy("a"))


def q_simhash_planted_recall(spark, sf_dir):
    """blake2b SimHash over the planted-clone corpus: every planted
    pair must surface at hamming 0 through the pigeonhole candidate
    join — the value-level driver row for the engine-native bit
    mixing (md5 twin certifies the join/filter logic)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.dedup import simhash_pairs
    d = _planted_clone_docs(spark, sf_dir, 17, 3)
    out = simhash_pairs(d, max_hamming=3)
    return (out.filter(F.col("b") == F.col("a") + _CLONE_OFFSET)
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("hamming").cast("long").alias("hamming"))
            .orderBy("a"))


def q_winnow_planted_recall(spark, sf_dir):
    """xxhash winnowing over the planted-clone corpus: identical text
    shares its entire fingerprint set, so min_common=1 must recover
    every planted pair regardless of which window minima the hash
    mixing selects. n_common itself is hash-dependent (distinct
    selected fingerprints) and is deliberately NOT in the output —
    presence of each pair is the hash-independent invariant."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.textstats import winnow_pairs
    d = _planted_clone_docs(spark, sf_dir, 37, 5)
    out = winnow_pairs(d, min_common=1, strategy="count")
    return (out.filter(F.col("b") == F.col("a") + _CLONE_OFFSET)
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"))
            .orderBy("a"))


def q_url_wordlist_score(spark, sf_dir):
    """RefinedWeb-style graded URL filter (urls.url_wordlist_score):
    severity-weighted substring scoring over the normalized url
    (lowercase, obfuscation separators stripped — so the planted
    'b-a-d-a-l-p-h-a' path segment still hits 'badalpha'), blocked at
    score >= 1.0. Markers planted by doc_id arithmetic with PRESENCE
    semantics (a word seen twice still contributes once); the DuckDB
    twin computes the expected score from the arithmetic alone —
    never probing strings — so the two engines cannot agree by
    sharing a matching bug."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.urls import url_wordlist_score
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (i % 17).cast("string"),
        F.lit(".example.org/page/"), i.cast("string"),
        F.when(i % 9 == 2, F.lit("/badalpha-clip")).otherwise(F.lit("")),
        F.when(i % 13 == 5, F.lit("/b-a-d-a-l-p-h-a"))
         .otherwise(F.lit("")),
        F.when(i % 7 == 3, F.lit("/riskbeta")).otherwise(F.lit("")),
        F.when(i % 11 == 4, F.lit("/riskbeta-badalpha"))
         .otherwise(F.lit("")))
    out = url_wordlist_score(
        d.select(F.col("doc_id").cast("long").alias("doc_id"),
                 url.alias("url")),
        weighted_words=[("badalpha", 1.0), ("riskbeta", 0.4)],
        threshold=1.0)
    return (out.select("doc_id", "url_word_score", "url_word_blocked")
            .orderBy("doc_id"))


def q_wordlist_filter(spark, sf_dir):
    """C4 §2.2 'bad words' page gate (curation.wordlist_page_filter,
    regex strategy): drop any page containing a blocklisted word or
    phrase, word-boundary and case-insensitive. Markers are planted
    by doc_id arithmetic — including substring CONTROLS
    (xblockedalpha / blockedalphax) that must NOT match — and the
    DuckDB twin replays the IDENTICAL module-built pattern
    (curation.wordlist_regex, the _marker_regex one-source-of-truth
    discipline). The list itself is operator-supplied in production
    (C4 uses the public LDNOOBW list); the planted tokens here are
    neutral by design."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.curation import wordlist_page_filter
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text2 = F.concat(
        F.col("text"),
        F.when(i % 7 == 0, F.lit(" blockedalpha")).otherwise(F.lit("")),
        F.when(i % 14 == 0, F.lit(" blockedalpha blockedalpha"))
         .otherwise(F.lit("")),
        F.when(i % 11 == 3, F.lit(" some blockedbeta gamma tail"))
         .otherwise(F.lit("")),
        F.when(i % 5 == 1, F.lit(" xblockedalpha blockedalphax"))
         .otherwise(F.lit("")))
    out = wordlist_page_filter(
        d.select(F.col("doc_id").cast("long").alias("doc_id"),
                 text2.alias("text")),
        words=["blockedalpha", "blockedbeta gamma"])
    return out.orderBy("doc_id")


# ---------------- planted BPE twins (the last rows-only family) -----

_BPE_PLANT_WORDS = 12   # 'ab','cd',...,'wx' — letters pairwise disjoint
_BPE_PLANT_MERGES = 8   # fully merges words 0..3, leaves 4..11 split


def _planted_bpe_docs(spark, sf_dir):
    """Corpus whose BPE merge sequence is provable by construction,
    making the iterative trainer SQL-certifiable: every doc's text is
    word_k = chr(97+2k)+chr(97+2k+1) repeated (12-k) times, k
    ascending. Because each letter occurs in exactly ONE word, merges
    never interact across words, so the driver-looped argmax
    degenerates to rank-by-frequency — which plain SQL can replay:

      * global count of word_k is n_docs*(12-k): strictly decreasing,
        all >= 2, no cross-word ties;
      * within word_k the two candidate pairs 'L1 L2' and 'L2 </w>'
        tie at that count; the trainer's documented tie-break
        (count DESC, pair string ASC) picks 'L1 L2' first (L1 < L2 by
        construction), then the merged 'L1L2 </w>' still holds the
        same max count and completes the word;
      * so merges 2k and 2k+1 are exactly (L1,L2) then (L1L2,'</w>')
        of the k-th most frequent word — a pure function of doc count.

    The real corpus keeps its rows-only query (bpe_train) + the exact
    sequential-parity pytest pin; THIS pair gives the family a
    value-level oracle row (the embedding-planted discipline)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    parts = []
    for k in range(_BPE_PLANT_WORDS):
        w = chr(97 + 2 * k) + chr(97 + 2 * k + 1)
        parts.extend([w] * (_BPE_PLANT_WORDS - k))
    return d.select("doc_id", F.lit(" ".join(parts)).alias("text"))


def q_bpe_train_planted(spark, sf_dir):
    """Distributed BPE training over the planted corpus — the full
    iterative machinery (word-count groupBy, per-round pair explode +
    argmax + Catalyst merge fold) runs for real; the planted
    construction (see _planted_bpe_docs) makes its output an exact
    SQL-replayable function of the document count."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.bpe import merges_df, train_bpe
    d = _planted_bpe_docs(spark, sf_dir)
    merges, _ = train_bpe(d, n_merges=_BPE_PLANT_MERGES)
    return merges_df(spark, merges).orderBy("merge_idx")


def q_bpe_tokenize_planted(spark, sf_dir):
    """BPE segmentation under the planted-trained vocabulary: words
    0..3 are fully merged (1 symbol each), words 4..11 stay split
    (2 chars + '</w>' = 3 symbols), so per doc n_words =
    sum(12-k) = 78 and n_tokens = (12+11+10+9)*1 + (8+...+1)*3 = 150
    — certifying the train->segment join path at value level."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.operators.bpe import bpe_segment, train_bpe
    d = _planted_bpe_docs(spark, sf_dir)
    _, words = train_bpe(d, n_merges=_BPE_PLANT_MERGES)
    return (bpe_segment(d, words)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "n_words", "n_tokens")
            .orderBy("doc_id"))


# ---------------- per-row task_cfg driver row (X11 analog) ----------

def q_task_config_mixed(spark, sf_dir):
    """ONE batch mixing three extraction policies via the per-row
    `task_cfg` struct (config.task_config_col + emit.span_filter — the
    OCRTaskConfig analog, /root/reference/include/pipeline/
    ocr_pipeline.h:59-77: per-REQUEST thresholds flowing through the
    pipeline decoupled from engine init, ocr_pipeline.cpp:457-461).

    The scored-block array is PLANTED arithmetic (score / char counts
    are pure functions of (doc_id, block_id)), so the DuckDB oracle
    replays the whole emission stage: per-policy coalesce fallback to
    run-level defaults, the 4-predicate keep filter, canonical
    (pos, depth, block_id) ordering, re-index, and '\\n' concat.
    Policies: doc_id%3==0 raises box_thresh to 0.75; ==1 raises
    rec_score_thresh to 0.65 and min_text_chars to 12; ==2 passes an
    all-NULL struct (pure fallback). Still zero shuffle, zero Python —
    per-row variation costs nothing in plan shape
    (tests/test_plans.py discipline)."""
    _prep(spark)
    from dxnn_ocr_cpp_spark.config import (DEFAULT_CONFIG,
                                           TASK_CONFIG_COL,
                                           task_config_col)
    from dxnn_ocr_cpp_spark.operators.emit import (with_final_text,
                                                   with_spans)
    d = _t(spark, sf_dir, "documents") \
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    i = F.col("doc_id")

    def block(j: int):
        return F.struct(
            F.lit(j).cast("int").alias("block_id"),
            F.lit(j).cast("int").alias("pos"),
            F.lit(j % 3).cast("int").alias("depth"),
            F.concat(F.lit(f"blk{j}_"), i.cast("string")).alias("text"),
            (((i * 7 + j * 13) % 100).cast("double") / 100.0)
            .alias("score"),
            (1 + (i + j) % 40).cast("int").alias("n_text_chars"),
            ((i * (j + 1)) % 30).cast("int").alias("n_link_chars"),
        )

    m = i % 3
    scored = d.select(
        "doc_id",
        F.array(*[block(j) for j in range(4)]).alias("scored"),
        F.when(m == 0, task_config_col(box_thresh=0.75))
         .when(m == 1, task_config_col(rec_score_thresh=0.65,
                                       min_text_chars=12))
         .otherwise(task_config_col()).alias(TASK_CONFIG_COL))
    out = with_final_text(
        with_spans(scored, DEFAULT_CONFIG, task_col=TASK_CONFIG_COL))
    return (out.select("doc_id", m.cast("long").alias("policy"),
                       F.size("spans").cast("long").alias("n_spans"),
                       "text")
            .orderBy("doc_id"))


# ---------------- driver-visible streaming row ----------------------

def q_stream_dedup_urls(spark, sf_dir):
    """The streaming url-dedup path (streaming.stream_dedup_urls:
    dropDuplicatesWithinWatermark — bounded state, the 10^12-doc
    crawler shape) driven end-to-end as a REAL streaming query:
    documents-derived rows staged to parquet, readStream ->
    watermark + dedup -> memory sink, availableNow trigger. Duplicate
    rows are IDENTICAL by construction (every column derives from the
    url group, not doc_id), so whichever physical row wins the race is
    the same logical row and the output is deterministic — the DuckDB
    twin replays it as DISTINCT over the group arithmetic. One
    micro-batch (single staged file), so watermark expiry cannot
    re-admit a duplicate. Reference analog: the bounded work-queue
    ingest of /root/reference/src/pipeline/ocr_pipeline.cpp:353-355."""
    _prep(spark)
    import shutil
    import uuid
    from dxnn_ocr_cpp_spark.streaming import (read_documents_stream,
                                              stream_dedup_urls)
    g = F.col("doc_id") % 500
    staged = (_t(spark, sf_dir, "documents")
              .select(
                  F.concat(F.lit("https://h"), (g % 17).cast("string"),
                           F.lit(".example.org/page/"),
                           g.cast("string")).alias("url"),
                  (F.lit(1700000000).cast("long") + g * 60)
                  .cast("timestamp").alias("warc_ts"),
                  F.encode(F.concat(F.lit("<p>planted "),
                                    g.cast("string"), F.lit("</p>")),
                           "UTF-8").alias("html"),
                  F.concat(F.lit("planted "), g.cast("string"))
                  .alias("text"),
                  F.lit("en").alias("lang")))
    run = uuid.uuid4().hex[:12]
    staging = f"/tmp/spark_graft_stream/in_{run}"
    ckpt = f"/tmp/spark_graft_stream/ckpt_{run}"
    table = f"stream_dedup_{run}"
    staged.coalesce(1).write.mode("overwrite").parquet(staging)
    q = (stream_dedup_urls(read_documents_stream(spark, staging))
         .writeStream.format("memory").queryName(table)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return (spark.table(table)
            .select("url", _epoch(F.col("warc_ts")).alias("ts"),
                    F.length("text").cast("long").alias("n_chars"))
            .orderBy("url"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Query registry, ordered for the driver's correctness window.

    The driver compares the FIRST 50 entries against ``oracle_sql()``
    (rows + schema + value-hash at sf0.01); everything past the window
    is still pinned by ``tests/test_oracle_parity.py`` but earns no
    driver row. Ordering policy — the window ROTATES each round so
    every oracle-backed query eventually earns a driver row
    (round-4 rotation per VERDICT r3 ask #2):

      1. composed end-to-end pipelines (extraction, fuzzy dedup,
         crawl frontier, curation, classifier, PageRank, DSIR, ...)
         stay in slots 1-15 every round;
      2. slots 16-50 hold the queries with NO prior driver row:
         this round the new streaming / per-row-task_cfg /
         planted-recall rows, then the 24 never-certified operator
         twins, then re-pins of verdict-named families;
      3. queries certified in earlier rounds (CORRECTNESS_r0*.json)
         move past the window — their oracle pin stays live in
         tests/test_oracle_parity.py, which runs the same
         rows+schema+hash compare;
      4. the genuinely hash-mixing-bound ``no_oracle`` families LAST
         so they can never occupy a checkable slot.

    Round-5 rotation (EXECUTED, per the plan committed in r4): after
    CORRECTNESS_r04 landed 50/50 green, the only oracle-backed
    queries without a driver row were the two planted BPE twins, the
    C4 wordlist gate, and the graded URL scorer (bpe_train_planted /
    bpe_tokenize_planted / wordlist_filter / url_wordlist_score —
    added after the r4 window froze). They now hold slots 16-19; the
    four r4-certified rows they displace (events_sessionize,
    events_json_props, sitemap_harvest, media_decode) moved past the
    window, where test_oracle_parity.py keeps their oracle pin live.
    With this window green, every oracle-backed query has a driver
    row in some round's CORRECTNESS file (112/112).
    """
    return {
        # -- tier 1: composed pipelines (the engine's headline work) --
        "extract_corpus": q_extract_corpus,
        "extract_markdown": q_extract_markdown,
        "corpus_to_shards": q_corpus_to_shards,
        "fuzzy_dedup_keeplist": q_fuzzy_dedup_keeplist,
        "incremental_dedup": q_incremental_dedup,
        "frontier_build": q_frontier_build,
        "curate_keeplist": q_curate_keeplist,
        "quality_classifier": q_quality_classifier,
        "host_pagerank": q_host_pagerank,
        "dsir_select": q_dsir_select,
        "gopher_rules": q_gopher_rules,
        "c4_filters": q_c4_filters,
        "dedup_clusters": q_dedup_clusters,
        "dedup_canonical": q_dedup_canonical,
        "snapshot_diff": q_snapshot_diff,
        # -- tier 2 (rotated r5): the four queries added after the r4
        #    window froze — the ONLY oracle-backed queries without a
        #    driver row — occupy slots 16-19 per the committed plan --
        "bpe_train_planted": q_bpe_train_planted,
        "bpe_tokenize_planted": q_bpe_tokenize_planted,
        "wordlist_filter": q_wordlist_filter,
        "url_wordlist_score": q_url_wordlist_score,
        # r4-certified rows (CORRECTNESS_r04.json green) fill the rest
        "stream_dedup_urls": q_stream_dedup_urls,
        "task_config_mixed": q_task_config_mixed,
        "minhash_planted_recall": q_minhash_planted_recall,
        "simhash_planted_recall": q_simhash_planted_recall,
        "winnow_planted_recall": q_winnow_planted_recall,
        "containment_pairs": q_containment_pairs,
        "containment_keeplist": q_containment_keeplist,
        "host_trustrank": q_host_trustrank,
        "host_hits": q_host_hits,
        "compression_quality": q_compression_quality,
        "cms_term_counts": q_cms_term_counts,
        "crawl_traps": q_crawl_traps,
        "host_quality_prior": q_host_quality_prior,
        "host_template_lines": q_host_template_lines,
        "incremental_refresh": q_incremental_refresh,
        "paragraph_dedup": q_paragraph_dedup,
        "crawl_schedule": q_crawl_schedule,
        "image_dhash_pairs": q_image_dhash_pairs,
        "audio_fp_pairs": q_audio_fp_pairs,
        "media_dedup_keeplist": q_media_dedup_keeplist,
        "publish_dates": q_publish_dates,
        "robots_sitemaps": q_robots_sitemaps,
        "canonical_collapse": q_canonical_collapse,
        "epoch_plan": q_epoch_plan,
        "curation_funnel": q_curation_funnel,
        "dataset_mix_temperature": q_dataset_mix_temperature,
        "meta_robots_gate": q_meta_robots_gate,
        "script_mix": q_script_mix,
        "corpus_stats": q_corpus_stats,
        # re-pins of verdict-named families (r1/r2-certified)
        "events_asof_join": q_events_asof_join,
        "events_tumbling": q_events_tumbling,
        # ---- driver window (first 50) ends here ----
        # -- tier 3: oracle-backed but past the window (pytest-pinned
        #    by test_oracle_parity.py, same compare as the driver;
        #    every one of these holds a green row in some round's
        #    CORRECTNESS_r0*.json — with slots 16-19 certified this
        #    round, cumulative driver coverage is 112/112) --
        "events_sessionize": q_events_sessionize,
        "events_json_props": q_events_json_props,
        "sitemap_harvest": q_sitemap_harvest,
        "media_decode": q_media_decode,
        "lang_spans": q_lang_spans,
        "lm_quality": q_lm_quality,
        "lm_ppl_buckets": q_lm_ppl_buckets,
        "page_meta": q_page_meta,
        "html_tables": q_html_tables,
        "tfidf_keywords": q_tfidf_keywords,
        "phrase_search": q_phrase_search,
        "bm25_rank": q_bm25_rank,
        "link_graph": q_link_graph,
        "anchor_texts": q_anchor_texts,
        "dataset_mix": q_dataset_mix,
        "robots_gate": q_robots_gate,
        "robots_parse": q_robots_parse,
        "line_dedup": q_line_dedup,
        "duplicate_spans": q_duplicate_spans,
        "span_dedup": q_span_dedup,
        "chunk_documents": q_chunk_documents,
        "pack_shards": q_pack_shards,
        "url_canonicalize": q_url_canonicalize,
        "url_blocklist": q_url_blocklist,
        "recrawl_latest": q_recrawl_latest,
        "pii_redact": q_pii_redact,
        "repetition_filters": q_repetition_filters,
        "decontaminate": q_decontaminate,
        "fix_mojibake": q_fix_mojibake,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_pairs_md5": q_minhash_lsh_pairs_md5,
        "simhash_pairs_md5": q_simhash_pairs_md5,
        "winnow_pairs_md5": q_winnow_pairs_md5,
        "embedding_topk": q_embedding_topk,
        "embedding_lsh_topk_planted": q_embedding_lsh_topk_planted,
        "embedding_ivf_topk_planted": q_embedding_ivf_topk_planted,
        "embedding_cosine_dups_scale_planted":
            q_embedding_cosine_dups_scale_planted,
        "semantic_dedup_planted": q_semantic_dedup_planted,
        "embedding_cosine_dups": q_embedding_cosine_dups,
        "rss_harvest": q_rss_harvest,
        "nfc_normalize": q_nfc_normalize,
        "quality_scores": q_quality_scores,
        "token_counts": q_token_counts,
        "lang_id_hist": q_lang_id_hist,
        "media_pipeline": q_media_pipeline,
        "warc_roundtrip": q_warc_roundtrip,
        "pdf_roundtrip": q_pdf_roundtrip,
        "base64_roundtrip": q_base64_roundtrip,
        "validate_rejects": q_validate_rejects,
        "latency_percentiles": q_latency_percentiles,
        "url_host_salt_plan": q_url_host_salt_plan,
        "quota_sample": q_quota_sample,
        "sketch_accuracy": q_sketch_accuracy,
        "dataset_split": q_dataset_split,
        "pricing_summary": q_pricing_summary,
        "top_orders_per_cust": q_top_orders_per_cust,
        "cust_nation_region": q_cust_nation_region,
        "order_revenue_by_priority": q_order_revenue_by_priority,
        "union_nationkeys": q_union_nationkeys,
        "group_concat_customers": q_group_concat_customers,
        "len_bucket_histogram": q_len_bucket_histogram,
        # -- tier 4: no_oracle families (hash-mixing / iterative) LAST --
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "winnow_pairs": q_winnow_pairs,
        "embedding_lsh_topk": q_embedding_lsh_topk,
        "embedding_ivf_topk": q_embedding_ivf_topk,
        "embedding_cosine_dups_scale": q_embedding_cosine_dups_scale,
        "semantic_dedup": q_semantic_dedup,
        "bpe_train": q_bpe_train,
        "bpe_tokenize": q_bpe_tokenize,
    }


# ---------------- DuckDB oracles ----------------

# marker/stopword lists come FROM the engine module — one source of
# truth, so tuning textstats.py can never desynchronize the oracles
from dxnn_ocr_cpp_spark.operators.textstats import (LANG_MARKERS,
                                                    STOPWORDS_EN,
                                                    _marker_regex)

_STOP_RE = _marker_regex(STOPWORDS_EN)
_EN_RE = _marker_regex(LANG_MARKERS["en"])
_DE_RE = _marker_regex(LANG_MARKERS["de"])
_ES_RE = _marker_regex(LANG_MARKERS["es"])
_FR_RE = _marker_regex(LANG_MARKERS["fr"])

_QUALITY_SQL = f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop
  FROM documents)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_alpha / greatest(n_chars, 1)::DOUBLE, 6) AS alpha_ratio,
       round(n_stop / greatest(n_tokens, 1)::DOUBLE, 6) AS stopword_ratio,
       round(least(n_tokens / 20.0, 1.0)
             * least(n_alpha / greatest(n_chars, 1)::DOUBLE * 1.25, 1.0)
             * least(n_stop / greatest(n_tokens, 1)::DOUBLE * 4.0, 1.0), 6)
         AS quality_score
FROM f
"""

# argmax with ties broken by lang-name order (de<en<es<fr) — exactly
# the Spark lang_id() loop semantics (strict > over sorted langs)
_LANG_SQL = f"""
WITH s AS (
  SELECT len(regexp_extract_all(lower(text), '{_DE_RE}')) AS de,
         len(regexp_extract_all(lower(text), '{_EN_RE}')) AS en,
         len(regexp_extract_all(lower(text), '{_ES_RE}')) AS es,
         len(regexp_extract_all(lower(text), '{_FR_RE}')) AS fr
  FROM documents),
p AS (
  SELECT CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
              WHEN de = greatest(de, en, es, fr) THEN 'de'
              WHEN en = greatest(de, en, es, fr) THEN 'en'
              WHEN es = greatest(de, en, es, fr) THEN 'es'
              ELSE 'fr' END AS lang_pred
  FROM s)
SELECT lang_pred, count(*) AS n_docs FROM p GROUP BY lang_pred ORDER BY lang_pred
"""

_SHINGLE_CTE = """
words AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_sort(list_distinct(
                     [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                      for i in range(1, len(w) - 1)]))
              ELSE [array_to_string(w, ' ')] END AS sh
  FROM words)
"""

# df-capped inverted-index Jaccard pair chain (shared by the pair query
# and the connected-components cluster oracle)
_JACCARD_CTE = f"""{_SHINGLE_CTE},
ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh),
freq AS (SELECT g, count(*) AS c FROM ex GROUP BY g),
exf AS (SELECT ex.doc_id, ex.n, ex.g
        FROM ex JOIN freq USING (g) WHERE freq.c <= 1000),
jpairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         count(*)::DOUBLE AS common,
         any_value(x.n) AS na, any_value(y.n) AS nb
  FROM exf x JOIN exf y USING (g)
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2)
"""

ORACLES: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "top_orders_per_cust": """
        SELECT o_custkey, rank, o_orderkey, totalprice FROM (
          SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders) WHERE rank <= 3
    """,
    "cust_nation_region": """
        SELECT r_name, count(*) AS n_customers,
               round(avg(c_acctbal), 4) AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "order_revenue_by_priority": """
        SELECT o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "union_nationkeys": """
        SELECT DISTINCT CAST(nationkey AS BIGINT) AS nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier)
    """,
    "group_concat_customers": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               string_agg(c_name, ',' ORDER BY c_name) AS names,
               count(*) AS n
        FROM customer WHERE c_custkey <= 100 GROUP BY c_nationkey
    """,
    "len_bucket_histogram": """
        SELECT CAST(floor(n_chars / 256) AS BIGINT) AS len_bucket,
               count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "events_tumbling": """
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS win, event_type,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": """
        WITH g AS (
          SELECT user_id,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      THEN 1
                      WHEN lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events)
        SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM g GROUP BY user_id
    """,
    "latency_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "token_counts": """
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END AS BIGINT) AS n_tokens
        FROM documents
    """,
    "quality_scores": _QUALITY_SQL,
    "lang_id_hist": _LANG_SQL,
    "exact_dedup": """
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                 AS fingerprint,
               min(doc_id) AS keep_id, count(*) AS n_dupes
        FROM documents GROUP BY 1
    """,
    # mirrors the engine exactly, INCLUDING the hot-shingle df cap
    # (df > 1000 shingles are dropped from the inverted index before
    # pair counting, while set sizes na/nb stay pre-cap — the same
    # skew-guard semantics the Spark operator implements)
    "ngram_jaccard_pairs": f"""
        WITH {_JACCARD_CTE}
        SELECT a, b, round(common / (na + nb - common), 6) AS jaccard
        FROM jpairs WHERE common / (na + nb - common) >= 0.4
    """,
    # same df-capped inverted index, read asymmetrically: each
    # unordered intersection row yields its two directed containment
    # readings |SRC∩DST| / |SRC| (the Spark side fans out via one
    # inline explode; the oracle via UNION ALL — same rowset)
    "containment_pairs": f"""
        WITH {_JACCARD_CTE},
        directed AS (
          SELECT a AS src, b AS dst, common / na AS containment
          FROM jpairs
          UNION ALL
          SELECT b, a, common / nb FROM jpairs)
        SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
               round(containment, 6) AS containment
        FROM directed WHERE containment >= 0.5
    """,
    # composed keep-list: EXISTS a longer (or equal-length,
    # smaller-id) container at containment >= 0.9 -> dropped
    "containment_keeplist": f"""
        WITH {_JACCARD_CTE},
        directed AS (
          SELECT a AS src, b AS dst, common / na AS c FROM jpairs
          UNION ALL
          SELECT b, a, common / nb FROM jpairs),
        lens AS (SELECT doc_id AS id, length(text) AS len
                 FROM documents),
        dropped AS (
          SELECT DISTINCT d.src AS id
          FROM directed d
          JOIN lens ls ON d.src = ls.id
          JOIN lens ld ON d.dst = ld.id
          WHERE d.c >= 0.9
            AND (ld.len > ls.len
                 OR (ld.len = ls.len AND d.dst < d.src)))
        SELECT CAST(l.id AS BIGINT) AS doc_id,
               dropped.id IS NULL AS keep
        FROM lens l LEFT JOIN dropped ON l.id = dropped.id
        ORDER BY doc_id
    """,
    # independent component closure: the recursive CTE enumerates every
    # (node, reachable node) pair and takes the min — O(comp_size^2)
    # rows, fine at oracle scale; the Spark side is the O(log^2 n)
    # alternating-star algorithm (operators/cc.py) — agreement checks
    # semantics, not a shared implementation
    "dedup_clusters": f"""
        WITH RECURSIVE {_JACCARD_CTE},
        jp AS (SELECT a, b FROM jpairs
               WHERE common / (na + nb - common) >= 0.4),
        e AS (SELECT a AS u, b AS v FROM jp
              UNION SELECT b, a FROM jp),
        reach(v, r) AS (
          SELECT u, u FROM e
          UNION
          SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v),
        comp AS (SELECT v AS node, min(r) AS component
                 FROM reach GROUP BY v)
        SELECT CAST(component AS BIGINT) AS component,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(node) AS BIGINT) AS max_doc
        FROM comp GROUP BY component ORDER BY component
    """,
    # bit-for-bit replay of the md5 MinHash family: h_i(g) = md5(i:g),
    # minimum lexicographic over hex digests; band key = '|'-joined
    # minhashes of the band's 4 seeds in seed order (= Spark's
    # concat_ws over sig[4b..4b+3]); candidate pairs from band-bucket
    # equality; exact-Jaccard verify on the distinct gram sets
    # (shared CTE chain _MINHASH_MD5_CTE — also closes the
    # fuzzy_dedup_keeplist oracle)
    "minhash_lsh_pairs_md5": None,  # filled below from _MINHASH_MD5_CTE
    # rebuilds every SimHash signature bit: token hash = first 8 md5
    # digest bytes big-endian (CAST('0x'||substr(md5,1,16)) — the exact
    # uint64 the kernel's int.from_bytes produces), bit_j majority vote
    # over the doc's distinct word-2-grams (strict >, ties -> 0), then
    # an exhaustive hamming<=3 pair scan — valid as the oracle because
    # the pigeonhole join's recall is complete (pieces = d+1)
    "simhash_pairs_md5": """
        WITH words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)),
                                             '\\s+', ' ', 'g'), ' ') AS w
          FROM documents),
        toks AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 2
                      THEN list_distinct([w[i] || ' ' || w[i+1]
                                          for i in range(1, len(w))])
                      ELSE [array_to_string(w, ' ')] END AS tk
          FROM words),
        t AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS tk FROM toks),
        h AS (SELECT doc_id, n,
                     CAST('0x' || substr(md5(tk), 1, 16) AS UBIGINT) AS u
              FROM t),
        bits AS (
          SELECT doc_id, n, b, CAST((u >> b) & 1 AS BIGINT) AS bit
          FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
        sig AS (
          SELECT doc_id, b,
                 CASE WHEN 2 * sum(bit) > any_value(n)
                      THEN 1 ELSE 0 END AS sbit
          FROM bits GROUP BY doc_id, b),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 sum(CASE WHEN x.sbit <> y.sbit THEN 1 ELSE 0 END) AS hamming
          FROM sig x JOIN sig y ON x.b = y.b AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT a, b, CAST(hamming AS BIGINT) AS hamming
        FROM pairs WHERE hamming <= 3
    """,
    # replays robust winnowing (k=8, w=16) over md5 char-k-gram hashes:
    # tie-break key h || lpad(10^9-1-pos) makes min(key) the RIGHTMOST
    # window minimum; kept only at window-start rows pos <= ng-w+1
    # (short docs: the single pos=1 start covers the whole doc); then
    # the df-capped (<=1000) inverted-index pair count at min_common=14
    "winnow_pairs_md5": """
        WITH d AS (
          SELECT doc_id AS id,
                 regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS c
          FROM documents),
        d2 AS (
          SELECT id, c, greatest(length(c) - 7, 1) AS ng
          FROM d WHERE length(c) > 0),
        grams AS (
          SELECT id, ng, unnest(range(1, ng + 1)) AS pos, c
          FROM d2),
        keyed AS (
          SELECT id, ng, pos,
                 md5(substr(c, pos::INT, 8))
                   || lpad((999999999 - pos)::VARCHAR, 9, '0') AS key
          FROM grams),
        winmin AS (
          SELECT id, ng, pos,
                 min(key) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW
                                AND 15 FOLLOWING) AS mk
          FROM keyed),
        sel AS (
          SELECT DISTINCT id, substr(mk, 1, 32) AS h
          FROM winmin WHERE pos <= greatest(ng - 15, 1)),
        freq AS (SELECT h, count(*) AS c FROM sel GROUP BY h),
        sf AS (SELECT sel.id, sel.h
               FROM sel JOIN freq USING (h) WHERE freq.c <= 1000)
        SELECT x.id AS a, y.id AS b, CAST(count(*) AS BIGINT) AS n_common
        FROM sf x JOIN sf y USING (h)
        WHERE x.id < y.id
        GROUP BY 1, 2 HAVING count(*) >= 14
    """,
    "pdf_roundtrip": """
        SELECT doc_id, CAST(true AS BOOLEAN) AS roundtrip_ok
        FROM documents
    """,
    "curate_keeplist": f"""
        WITH f AS (
          SELECT doc_id,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   AS fingerprint,
                 length(text) AS n_chars,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS n_tokens,
                 length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                 len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop,
                 len(regexp_extract_all(lower(text), '{_DE_RE}')) AS de,
                 len(regexp_extract_all(lower(text), '{_EN_RE}')) AS en,
                 len(regexp_extract_all(lower(text), '{_ES_RE}')) AS es,
                 len(regexp_extract_all(lower(text), '{_FR_RE}')) AS fr
          FROM documents),
        s AS (
          SELECT doc_id, fingerprint,
                 round(least(n_tokens / 20.0, 1.0)
                       * least(n_alpha / greatest(n_chars, 1)::DOUBLE * 1.25, 1.0)
                       * least(n_stop / greatest(n_tokens, 1)::DOUBLE * 4.0, 1.0),
                       6) AS quality_score,
                 CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                      WHEN de = greatest(de, en, es, fr) THEN 'de'
                      WHEN en = greatest(de, en, es, fr) THEN 'en'
                      WHEN es = greatest(de, en, es, fr) THEN 'es'
                      ELSE 'fr' END AS lang_pred,
                 min(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
          FROM f)
        SELECT doc_id, fingerprint, quality_score, lang_pred
        FROM s
        WHERE doc_id = keep_id AND quality_score >= 0.5
          AND lang_pred = 'en'
    """,
    "base64_roundtrip": """
        SELECT doc_id,
               substring(to_base64(text::BLOB), 1, 32) AS b64_head,
               from_base64(to_base64(text::BLOB))::VARCHAR = text
                 AS roundtrip_ok
        FROM documents
    """,
    "embedding_cosine_dups": """
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        p AS (
          SELECT x.id AS a, y.id AS b,
                 round(list_dot_product(x.v, y.v)
                       / greatest(sqrt(list_dot_product(x.v, x.v))
                                  * sqrt(list_dot_product(y.v, y.v)),
                                  1e-12), 4) AS sim
          FROM e x JOIN e y ON x.id < y.id)
        SELECT a, b, sim FROM p WHERE sim >= 0.4
    """,
    # Mirrors q_validate_rejects: same doc_id%50 mangling, same rule
    # order (null -> too_long -> no_scheme -> oversize), same 2083 URL
    # cap and 4*max_html_bytes=4096 byte threshold as validate.py.
    "validate_rejects": r"""
        WITH base AS (
          SELECT CASE WHEN doc_id % 50 = 0 THEN NULL
                      WHEN doc_id % 50 = 1 THEN ''
                      WHEN doc_id % 50 = 2 THEN 'example.com/doc/' || doc_id
                      WHEN doc_id % 50 = 3 THEN 'https://h/' || repeat('a', 3000)
                      ELSE 'https://example.com/doc/' || doc_id END AS url,
                 CASE WHEN doc_id % 50 = 4 THEN repeat('x', 5000)
                      ELSE text END AS body
          FROM documents),
        tagged AS (
          SELECT CASE
                   WHEN url IS NULL OR length(url) = 0 THEN 'null_url'
                   WHEN length(url) > 2083 THEN 'url_too_long'
                   WHEN NOT regexp_matches(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://')
                     THEN 'no_scheme'
                   WHEN octet_length(encode(body)) > 4096 THEN 'html_too_large'
                   ELSE NULL END AS reject_reason
          FROM base)
        SELECT reject_reason, CAST(count(*) AS BIGINT) AS n
        FROM tagged WHERE reject_reason IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    # Mirrors q_media_pipeline: same doc_id-derived media table, same
    # resize geometry (np.rint half-to-even emulated via the floor-
    # parity CASE), same frame count max(trunc(duration/1000), 1) for
    # videos. feature_ok is asserted all-true (the stub feature is 16
    # uint16/65535 floats by construction) so a featurizer regression
    # fails the value hash.
    "media_pipeline": """
        WITH m AS (
          SELECT 'm' || doc_id AS media_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS kind,
                 -- NULL text -> NULL payload -> the featurizer counts
                 -- 0 bytes; mirror that (encode(NULL) is NULL here)
                 coalesce(octet_length(encode(text)), 0) AS n_bytes,
                 64 + doc_id % 512 AS w,
                 64 + (doc_id * 13) % 512 AS h,
                 (doc_id % 7) * 1500 AS duration_ms
          FROM documents),
        g AS (
          SELECT *,
                 CASE WHEN greatest(w, h) > 224
                      THEN 224.0 / greatest(w, h) ELSE 1.0 END AS scale
          FROM m),
        r AS (
          SELECT *,
                 w * scale AS xw, h * scale AS xh,
                 floor(w * scale) AS fw, floor(h * scale) AS fh
          FROM g)
        SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(true AS BOOLEAN) AS feature_ok,
               greatest(CASE WHEN xw - fw = 0.5
                             THEN CAST(fw AS BIGINT) + CAST(fw AS BIGINT) % 2
                             ELSE CAST(round(xw) AS BIGINT) END, 1)
                 AS out_width,
               greatest(CASE WHEN xh - fh = 0.5
                             THEN CAST(fh AS BIGINT) + CAST(fh AS BIGINT) % 2
                             ELSE CAST(round(xh) AS BIGINT) END, 1)
                 AS out_height,
               CASE WHEN kind = 'video'
                    THEN greatest(CAST(trunc(duration_ms / 1000.0) AS BIGINT), 1)
                    ELSE 0 END AS n_frames
        FROM r
    """,
    # Mirrors q_sitemap_harvest with NO XML at all: the expected rows
    # are recomputed from the same doc_id arithmetic the Catalyst
    # fixture used to BUILD the XML, so equality certifies the whole
    # parse chain (block split, trim, entity decode, conditional
    # lastmod, urlset-vs-index detection).
    "sitemap_harvest": """
        WITH m AS (
          SELECT doc_id, doc_id % 13 = 0 AS idx,
                 CASE WHEN doc_id % 13 = 0 THEN 2
                      ELSE doc_id % 5 + 1 END AS n
          FROM documents),
        e AS (SELECT doc_id, idx, unnest(range(n)) AS i FROM m)
        SELECT doc_id,
               CASE WHEN idx THEN 'sitemapindex'
                    ELSE 'urlset' END AS kind,
               CAST(i AS INTEGER) AS pos,
               CASE WHEN idx
                    THEN 'https://h' || (doc_id % 23)
                         || '.ex.com/sitemap-' || i || '.xml'
                    ELSE 'https://h' || (doc_id % 23) || '.ex.com/p/'
                         || doc_id || '/' || i || '&x'
               END AS loc,
               CASE WHEN NOT idx AND (doc_id + i) % 2 = 0
                    THEN '2024-0' || ((doc_id + i) % 9 + 1) || '-15'
                    ELSE '' END AS lastmod
        FROM e
    """,
    # Mirrors q_robots_parse: the expected rule rows recomputed from
    # the planted arithmetic with no text — three chained unnests
    # (groups, agents, rules), the empty-path idiom filtered exactly
    # where the fixture planted it.
    "robots_parse": """
        WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS g FROM documents),
        j AS (SELECT doc_id, unnest(range(g)) AS j FROM d),
        ja AS (SELECT doc_id, j, 1 + (doc_id + j) % 2 AS na,
                      1 + (doc_id * 7 + j) % 3 AS nr
               FROM j),
        a AS (SELECT doc_id, j, nr, unnest(range(na)) AS a FROM ja),
        k AS (SELECT doc_id, j, a, unnest(range(nr)) AS k FROM a)
        SELECT 'h' || (doc_id % 23) || '.ex.com' AS host,
               CASE WHEN a = 0 THEN 'bot' || j
                    ELSE 'crawler' || j END AS agent,
               (doc_id + j + k) % 2 = 0 AS allow,
               '/p' || j || '/' || k AS prefix
        FROM k
        WHERE (doc_id + j + k) % 5 <> 0
    """,
    # Mirrors q_rss_harvest: same planted arithmetic, covering the
    # RSS link-body-text form, the Atom href-attribute form, the
    # xmlns-based dialect split, and the conditionally-absent pubDate.
    "rss_harvest": """
        WITH m AS (
          SELECT doc_id, doc_id % 2 = 0 AS rss, doc_id % 4 + 1 AS n
          FROM documents),
        e AS (SELECT doc_id, rss, unnest(range(n)) AS i FROM m)
        SELECT doc_id,
               CASE WHEN rss THEN 'rss' ELSE 'atom' END AS kind,
               CAST(i AS INTEGER) AS pos,
               'https://h' || (doc_id % 23) || '.ex.com/a/'
                 || doc_id || '/' || i AS link,
               CASE WHEN rss THEN 'T ' || doc_id || ' ' || i || '&z'
                    ELSE 'T ' || doc_id || ' ' || i END AS title,
               CASE WHEN rss
                    THEN (CASE WHEN (doc_id + i) % 3 = 0 THEN NULL
                               ELSE '2024-01-0'
                                    || ((doc_id + i) % 9 + 1) END)
                    ELSE '2024-02-0' || ((doc_id + i) % 9 + 1)
               END AS published
        FROM e
    """,
    # Mirrors q_fix_mojibake WITHOUT any charset machinery: DuckDB
    # only rebuilds the planted original (plant char || ' ' || text)
    # and hashes it. Spark must mangle, gate, and invert byte-exactly
    # to produce the same md5 — and must NOT alter the clean rows
    # (a false-positive repair flips both changed and the hash).
    "fix_mojibake": """
        SELECT doc_id,
               doc_id % 3 = 1 AS was_mangled,
               doc_id % 3 = 1 AS changed,
               md5(CASE CAST(doc_id % 5 AS INTEGER)
                     WHEN 0 THEN 'é' WHEN 1 THEN '“'
                     WHEN 2 THEN '€' WHEN 3 THEN '中'
                     ELSE 'Ã' END || ' ' || text) AS fixed_md5
        FROM documents
    """,
    # Mirrors q_media_decode: the planted-value arithmetic of
    # synthesize_media replayed as pure doc_id integer functions —
    # the oracle never touches payload bytes, so a value match
    # certifies decode_image/decode_wav read them back correctly
    # (solid-color mean == planted channel; constant-amplitude
    # mean|x| == planted amp; truncated rows -> decode-error nulls).
    "media_decode": """
        WITH m AS (
          SELECT doc_id,
                 doc_id % 3 AS sel,
                 doc_id % 17 = 0 AS corrupt,
                 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
                 (doc_id * 37) % 256 AS r, (doc_id * 59) % 256 AS g,
                 (doc_id * 83) % 256 AS b,
                 200 + doc_id % 50 AS n, (doc_id * 29) % 2000 AS amp,
                 8000 + (doc_id % 5) * 1000 AS rate
          FROM documents)
        SELECT 'm' || doc_id AS media_id,
               CASE WHEN corrupt THEN NULL
                    WHEN sel = 0 THEN 'ppm'
                    WHEN sel = 1 THEN 'bmp'
                    ELSE 'wav' END AS fmt,
               CAST(CASE WHEN NOT corrupt AND sel < 2 THEN w END
                    AS INTEGER) AS width,
               CAST(CASE WHEN NOT corrupt AND sel < 2 THEN h END
                    AS INTEGER) AS height,
               CAST(CASE WHEN NOT corrupt AND sel < 2 THEN r END
                    AS INTEGER) AS mean_r,
               CAST(CASE WHEN NOT corrupt AND sel < 2 THEN g END
                    AS INTEGER) AS mean_g,
               CAST(CASE WHEN NOT corrupt AND sel < 2 THEN b END
                    AS INTEGER) AS mean_b,
               CAST(CASE WHEN NOT corrupt AND sel = 2 THEN n END
                    AS INTEGER) AS n_samples,
               CAST(CASE WHEN NOT corrupt AND sel = 2 THEN amp END
                    AS INTEGER) AS mean_abs,
               CAST(CASE WHEN NOT corrupt AND sel = 2 THEN rate END
                    AS INTEGER) AS sample_rate,
               CASE WHEN corrupt THEN 'decode-error'
                    ELSE 'decoded' END AS decode_status
        FROM m
    """,
    "events_json_props": """
        SELECT event_type,
               CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT)
                          / 10) AS BIGINT) AS k_decile,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # Mirrors q_url_host_salt_plan: same floor(sqrt(doc_id % 1024)) host
    # index, same host_of() regex '^[a-z]+://([^/]+)/', same
    # ceil(n/40) salt-bucket count.
    "url_host_salt_plan": """
        WITH u AS (
          SELECT 'https://h' || CAST(floor(sqrt(doc_id % 1024)) AS BIGINT)
                 || '.example.com/doc/' || doc_id AS url
          FROM documents),
        h AS (
          SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host
          FROM u)
        SELECT host, count(*) AS n_docs,
               CAST(ceil(count(*) / 40.0) AS BIGINT) AS n_salt
        FROM h GROUP BY host ORDER BY host
    """,
    # Exact legs (n_users, p50) checked for real; the sketch legs are
    # asserted within documented error (hll_ok/pctl_ok all-true), so a
    # sketch regression fails the value hash like pdf_roundtrip's.
    "sketch_accuracy": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(quantile_cont(value, 0.5), 6) AS p50,
               CAST(true AS BOOLEAN) AS hll_ok,
               CAST(true AS BOOLEAN) AS pctl_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # ("dataset_split" is appended after the dict: its thresholds are
    # inlined from the SAME helper the engine uses,
    # partitioning.split_hex_thresholds — one source of truth)
    # independent formulation of the as-of semantics: correlated
    # LATERAL top-1 per probe row (DuckDB decorrelates it); the Spark
    # side is the union+window single-shuffle plan — agreement checks
    # the SEMANTICS, not a shared implementation
    "events_asof_join": """
        WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
             v AS (SELECT * FROM events WHERE event_type = 'view')
        SELECT c.event_id AS click_id,
               c.user_id AS user_id,
               CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts,
               m.event_id AS view_id,
               CAST(floor(epoch(c.ts)) - floor(epoch(m.ts)) AS BIGINT)
                 AS gap_sec,
               round(m.value, 2) AS view_value
        FROM c LEFT JOIN LATERAL (
            SELECT v.event_id, v.ts, v.value
            FROM v
            WHERE v.user_id = c.user_id
              AND v.ts <= c.ts
              AND v.ts >= c.ts - INTERVAL 7200 SECONDS
            ORDER BY v.ts DESC, v.event_id DESC
            LIMIT 1
        ) m ON true
    """,
    "embedding_topk": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS nb_id, embedding::DOUBLE[] AS nv FROM embeddings),
        sims AS (
          SELECT query_id, nb_id,
                 round(list_dot_product(qv, nv)
                       / greatest(sqrt(list_dot_product(qv, qv))
                                  * sqrt(list_dot_product(nv, nv)), 1e-12),
                       4) AS sim
          FROM q, c WHERE nb_id <> query_id),
        r AS (SELECT query_id, nb_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, nb_id) AS rank
              FROM sims)
        SELECT query_id, rank, nb_id, sim FROM r WHERE rank <= 5
    """,
}


def _dataset_split_oracle() -> str:
    from dxnn_ocr_cpp_spark.partitioning import split_hex_thresholds
    (tr, t1), (va, t2) = split_hex_thresholds()
    return f"""
        WITH u AS (SELECT doc_id,
                          'https://example.com/doc/' ||
                          CAST(doc_id AS VARCHAR) AS url
                   FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN substr(md5(url), 1, 6) < '{t1}' THEN '{tr}'
                          WHEN substr(md5(url), 1, 6) < '{t2}' THEN '{va}'
                          ELSE 'test' END AS split
              FROM u)
        SELECT split, count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM s GROUP BY split ORDER BY split
    """


ORACLES["dataset_split"] = _dataset_split_oracle()

# Planted-ground-truth ANN twins (see _planted_embeddings): the oracle
# recomputes the expected neighbours/groups from the doc_id arithmetic
# alone — no vectors, no hyperplanes, no k-means — because the planted
# construction makes the approximate operators' output provably
# hash-independent.
ORACLES["embedding_lsh_topk_planted"] = """
    WITH e AS (SELECT doc_id AS vec_id, doc_id % 16 AS g FROM documents),
    q AS (SELECT vec_id, g FROM e WHERE vec_id < 5),
    r AS (SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY c.vec_id) AS rank
          FROM q JOIN e c ON c.g = q.g AND c.vec_id <> q.vec_id)
    SELECT query_id, rank, nb_id, CAST(1.0 AS DOUBLE) AS sim
    FROM r WHERE rank <= 5 ORDER BY query_id, rank
"""
ORACLES["embedding_ivf_topk_planted"] = \
    ORACLES["embedding_lsh_topk_planted"]
ORACLES["semantic_dedup_planted"] = """
    WITH e AS (SELECT doc_id AS vec_id, doc_id % 16 AS g FROM documents)
    SELECT vec_id AS id,
           MIN(vec_id) OVER (PARTITION BY g) AS group_id,
           vec_id = MIN(vec_id) OVER (PARTITION BY g) AS keep
    FROM e ORDER BY id
"""
ORACLES["embedding_cosine_dups_scale_planted"] = """
    WITH e AS (SELECT doc_id AS vec_id, doc_id % 16 AS g FROM documents)
    SELECT x.vec_id AS a, y.vec_id AS b, CAST(1.0 AS DOUBLE) AS sim
    FROM e x JOIN e y ON x.g = y.g AND x.vec_id < y.vec_id
    ORDER BY a, b
"""


def _pii_oracle() -> str:
    """Chained-replace + per-kind counts built FROM curation.PII_PATTERNS
    — the oracle runs the IDENTICAL pattern strings (Java/RE2-common
    subset), so a pattern edit can never desynchronize the two sides."""
    from dxnn_ocr_cpp_spark.operators.curation import PII_PATTERNS
    red = "text2"
    counts = []
    for name, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
        counts.append(f"CAST(len(regexp_extract_all(text2, '{pat}')) "
                      f"AS BIGINT) AS n_{name}")
    counts_sql = ",\n               ".join(counts)
    return f"""
        WITH inj AS (
          SELECT doc_id,
                 text || CASE doc_id % 10
                   WHEN 0 THEN ' contact bob' || CAST(doc_id AS VARCHAR)
                               || '@example.com now'
                   WHEN 1 THEN ' call 555-123-'
                               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                               || ' today'
                   WHEN 2 THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
                               || '.0.' || CAST(doc_id % 200 AS VARCHAR)
                               || ' net'
                   WHEN 3 THEN ' contact bob' || CAST(doc_id AS VARCHAR)
                               || '@example.com now'
                               || ' call 555-123-'
                               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                               || ' today'
                               || ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
                               || '.0.' || CAST(doc_id % 200 AS VARCHAR)
                               || ' net'
                   ELSE '' END AS text2
          FROM documents)
        SELECT doc_id,
               {counts_sql},
               md5({red}) AS redacted_fp
        FROM inj
    """


ORACLES["pii_redact"] = _pii_oracle()


def _repetition_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.curation import (
        DUP_2GRAM_FRAC_MAX, DUP_WORD_FRAC_MAX, MEAN_WORD_LEN_RANGE)
    lo, hi = MEAN_WORD_LEN_RANGE
    return f"""
        WITH w0 AS (
          SELECT doc_id, text,
                 string_split(regexp_replace(lower(trim(text)),
                                             '\\s+', ' ', 'g'), ' ') AS w
          FROM documents),
        f AS (
          SELECT doc_id, w,
                 CASE WHEN trim(text) = '' THEN 0 ELSE len(w) END AS n
          FROM w0),
        g AS (
          SELECT doc_id, n,
                 CASE WHEN n > 0
                      THEN 1.0 - len(list_distinct(w))::DOUBLE / n
                      ELSE 0.0 END AS dwf,
                 CASE WHEN n >= 2
                      THEN 1.0 - len(list_distinct(list_transform(
                             range(1, len(w)),
                             i -> w[i] || ' ' || w[i+1])))::DOUBLE / (n - 1)
                      ELSE 0.0 END AS d2f,
                 CASE WHEN n > 0
                      THEN list_aggregate(list_transform(w, x -> len(x)),
                                          'sum')::DOUBLE / n
                      ELSE 0.0 END AS mwl
          FROM f)
        SELECT doc_id, CAST(n AS BIGINT) AS n_words,
               round(dwf, 6) AS dup_word_frac,
               round(d2f, 6) AS dup_2gram_frac,
               round(mwl, 6) AS mean_word_len,
               (dwf <= {DUP_WORD_FRAC_MAX} AND d2f <= {DUP_2GRAM_FRAC_MAX}
                AND mwl >= {lo} AND mwl <= {hi}) AS keep
        FROM g
    """


ORACLES["repetition_filters"] = _repetition_oracle()

# same gram universe as the dedup families (_SHINGLE_CTE); eval slice =
# doc_id % 41 = 0; sh is already per-doc-distinct, so count(*) counts
# distinct shared grams
ORACLES["decontaminate"] = f"""
    WITH {_SHINGLE_CTE},
    ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 41 = 0),
    tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 41 <> 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (g)
    GROUP BY doc_id HAVING count(*) >= 3 ORDER BY doc_id
"""

# the blob build is deterministic string concat, so the expected parse
# output is reconstructible WITHOUT parsing: ok-rows straight from
# documents, plus one planted truncated record per fifth blob
# replay of quota_sample's md5 family: u = first-6-hex md5 / 16^6
# (24-bit value over 2^24 — exact in double on both engines), pre-thin
# threshold least(1, oversample*cap/n_host), rank over (u, url)
ORACLES["quota_sample"] = """
    WITH urls AS (
      SELECT 'https://h'
             || CAST(CAST(floor(sqrt(doc_id % 1024)) AS BIGINT) AS VARCHAR)
             || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    h AS (SELECT url,
                 regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host
          FROM urls),
    n AS (SELECT host, count(*) AS n FROM h GROUP BY host),
    t AS (SELECT h.host, h.url,
                 CAST(('0x' || substr(md5(url), 1, 6)) AS BIGINT)::DOUBLE
                   / 16777216 AS u,
                 least(1.0, 30.0 / n.n) AS thr
          FROM h JOIN n USING (host)),
    f AS (SELECT host, url, u,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY u, url) AS rk
          FROM t WHERE u < thr)
    SELECT host, url, u, CAST(rk AS BIGINT) AS rk
    FROM f WHERE rk <= 15 ORDER BY host, rk
"""

ORACLES["warc_roundtrip"] = """
    SELECT CAST(doc_id % 25 AS BIGINT) AS blob_id,
           'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
           'ok' AS status,
           CAST(200 AS BIGINT) AS http_status,
           'text/html' AS content_type,
           CAST(strlen(text) AS BIGINT) AS n_body,
           md5(text) AS body_fp
    FROM documents
    UNION ALL
    SELECT CAST(g AS BIGINT), 'https://bad.example/x', 'truncated',
           NULL, NULL, CAST(0 AS BIGINT), md5('')
    FROM range(0, 25) t(g) WHERE g % 5 = 0
    ORDER BY blob_id, url
"""

# chr(769)=U+0301 combining acute, chr(776)=U+0308 combining diaeresis —
# the same decomposed injection the Spark side makes; nfc_normalize is
# DuckDB's independent Unicode implementation
ORACLES["nfc_normalize"] = """
    WITH inj AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
                          THEN ' cafe' || chr(769) || ' u' || chr(776)
                               || 'mlaut'
                          ELSE '' END AS text2
      FROM documents)
    SELECT doc_id,
           CAST(length(text2) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(text2)) AS BIGINT) AS len_nfc,
           (text2 <> nfc_normalize(text2)) AS changed,
           md5(nfc_normalize(text2)) AS nfc_fp
    FROM inj
"""


# Composed crawl-frontier twin (q_frontier_build): URL arithmetic +
# the generated canonicalization SQL + the planted blocklist/robots
# predicates, ending in the same dedup-with-counts. One oracle
# certifies the sitemap-parse -> canonicalize -> blocklist -> robots
# -> dedup CHAIN, not just its stages.
def _frontier_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.urls import oracle_url_sql
    return f"""
    WITH m AS (
      SELECT doc_id, doc_id % 23 AS k, doc_id % 5 + 1 AS n
      FROM documents WHERE doc_id % 13 <> 0),
    e AS (SELECT doc_id, k, unnest(range(n)) AS i FROM m),
    r AS (SELECT doc_id, k,
                 'https://h' || k || '.ex.com/p/' || doc_id || '/'
                   || (i % 2) || '?utm_source=t&q=' || (i % 2) AS raw
          FROM e),
    c AS (SELECT {oracle_url_sql('raw')} AS url, k FROM r)
    SELECT url, CAST(count(*) AS BIGINT) AS n_refs
    FROM c
    WHERE k NOT IN (3, 7) AND k % 4 <> 1
    GROUP BY url
    """


ORACLES["frontier_build"] = _frontier_oracle()


# URL canonicalization twin: injection arithmetic inline, the
# canonicalization expression generated by the SAME module that builds
# the Spark column (urls.oracle_url_sql — shared regex constants)
def _url_canon_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.urls import oracle_url_sql
    return f"""
    WITH inj AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END)
             || (CASE WHEN doc_id % 2 = 0 THEN 'Host' ELSE 'host' END)
             || CAST(doc_id % 20 AS VARCHAR) || '.Example.org'
             || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0 THEN ''
                      ELSE '/p/' || CAST(doc_id AS VARCHAR) END)
             || (CASE WHEN doc_id % 3 = 1 THEN '?b=2&a=1&utm_source=feed'
                      WHEN doc_id % 3 = 2 THEN '?utm_campaign=x'
                      ELSE '' END)
             || (CASE WHEN doc_id % 2 = 1 THEN '#sec' ELSE '' END) AS url2
      FROM documents)
    SELECT doc_id, url2, {oracle_url_sql('url2')} AS canon,
           ({oracle_url_sql('url2')} <> url2) AS changed
    FROM inj
"""


ORACLES["url_canonicalize"] = _url_canon_oracle()

# Line-level boilerplate dedup twin: same injection arithmetic, df
# count over trimmed nonblank lines, anti-join classification, ordered
# reassembly (string_agg ORDER BY pos == array_sort struct order —
# pos is unique per doc). No WITH ORDINALITY in this DuckDB build, so
# positions come from a struct-list comprehension + recursive unnest.
ORACLES["line_dedup"] = """
    WITH inj AS (
      SELECT doc_id,
             'Accept cookies to continue' || chr(10)
             || (CASE WHEN doc_id % 4 = 0
                      THEN 'Subscribe to our newsletter' || chr(10)
                      ELSE '' END)
             || text
             || (CASE WHEN doc_id % 2 = 0
                      THEN chr(10) || '© 2026 Example Corp'
                      ELSE '' END) AS text2
      FROM documents),
    splits AS (SELECT doc_id, string_split(text2, chr(10)) AS l FROM inj),
    lines AS (
      SELECT doc_id,
             unnest([{'pos': CAST(i - 1 AS BIGINT), 'line': l[i]}
                     for i in range(1, len(l) + 1)], recursive := true)
      FROM splits),
    dfreq AS (
      SELECT md5(trim(line)) AS lkey, count(DISTINCT doc_id) AS line_df
      FROM lines WHERE trim(line) <> '' GROUP BY 1),
    boiler AS (SELECT lkey FROM dfreq WHERE line_df >= 5),
    kept AS (
      SELECT l.doc_id, l.pos, l.line FROM lines l
      LEFT JOIN boiler b ON md5(trim(l.line)) = b.lkey
      WHERE b.lkey IS NULL),
    totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
               FROM lines GROUP BY doc_id)
    SELECT t.doc_id, t.n_lines,
           CAST(t.n_lines - count(k.line) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), ''))
             AS clean_fp
    FROM totals t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.n_lines
"""

# dHash image-dedup twin: replays the planted group + corruption
# arithmetic of synthesize_patterned_images without touching bytes or
# hashes. Same-group images are byte-identical (hamming 0) and groups
# are measured >= 8 bits apart (pinned in tests/test_image_dhash.py),
# so a radius-2 search must return EXACTLY the same-group pairs over
# the non-corrupt rows.
ORACLES["image_dhash_pairs"] = """
    WITH ok AS (
      SELECT doc_id, doc_id % 25 AS grp
      FROM documents
      WHERE doc_id < 200 AND doc_id % 37 <> 0)
    SELECT a.doc_id AS a, b.doc_id AS b, CAST(0 AS INTEGER) AS hamming
    FROM ok a JOIN ok b ON a.grp = b.grp AND a.doc_id < b.doc_id
"""

# robots Sitemap-discovery twin: replay the plant arithmetic (which
# directives were planted, which are relative, which duplicate).
ORACLES["robots_sitemaps"] = """
    WITH d AS (
      SELECT doc_id, 'h' || doc_id || '.ex' AS host,
             'https://h' || doc_id || '.ex' AS base
      FROM documents),
    sm AS (
      SELECT host, base || '/sm-' || doc_id || '.xml' AS sitemap_url
      FROM d WHERE doc_id % 2 = 0
      UNION ALL
      SELECT host, base || '/extra.xml' FROM d WHERE doc_id % 3 = 0)
    SELECT host, sitemap_url FROM sm ORDER BY host, sitemap_url
"""

# canonical-collapse twin: arithmetic replay + row_number winner.
ORACLES["canonical_collapse"] = """
    WITH d AS (
      SELECT 'https://s.ex/v/' || doc_id AS url,
             CASE WHEN doc_id % 3 = 0
                  THEN 'https://c.ex/g' || (doc_id % 40)
                  ELSE NULL END AS canon,
             CAST((doc_id * 7) % 100 AS BIGINT) AS ts
      FROM documents),
    k AS (SELECT coalesce(canon, url) AS canon_key, url, ts FROM d),
    r AS (SELECT canon_key, url, ts,
                 row_number() OVER (PARTITION BY canon_key
                                    ORDER BY ts DESC, url DESC) AS rn,
                 count(*) OVER (PARTITION BY canon_key) AS n_captures
          FROM k)
    SELECT canon_key, url, ts, CAST(n_captures AS BIGINT) AS n_captures
    FROM r WHERE rn = 1 ORDER BY canon_key
"""

# Publish-date twin: replay only the planted arithmetic (source
# select, invalid plant, fall-through priority) — no regex, no HTML.
ORACLES["publish_dates"] = """
    WITH d AS (
      SELECT doc_id,
             doc_id % 4 AS sel,
             doc_id % 7 = 0 AS bad,
             CAST(2000 + doc_id % 25 AS VARCHAR) AS y,
             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
      FROM documents)
    SELECT doc_id,
      CASE WHEN sel = 0 THEN y || '-' || mm || '-' || dd
           WHEN sel = 1 AND NOT bad THEN y || '-' || mm || '-' || dd
           WHEN sel = 2 THEN y || '-' || mm || '-01'
           ELSE '' END AS pub_date,
      CASE WHEN sel = 0 AND NOT bad THEN 'meta'
           WHEN sel = 0 AND bad THEN 'url'
           WHEN sel = 1 AND NOT bad THEN 'time'
           WHEN sel = 2 THEN 'url'
           ELSE '' END AS pub_source
    FROM d ORDER BY doc_id
"""

# Media dedup keep-list twin: per planted group keep min(doc_id) over
# the decodable rows; corrupt rows (no signature) are NEVER dropped.
ORACLES["media_dedup_keeplist"] = """
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    ok AS (SELECT doc_id, doc_id % 25 AS grp FROM ids
           WHERE doc_id % 37 <> 0),
    keepers AS (SELECT min(doc_id) AS media_id FROM ok GROUP BY grp),
    corrupt AS (SELECT doc_id AS media_id FROM ids WHERE doc_id % 37 = 0)
    SELECT media_id FROM keepers
    UNION ALL
    SELECT media_id FROM corrupt
    ORDER BY media_id
"""

# Audio-fingerprint twin: identical planted-arithmetic replay as
# image_dhash_pairs (same groups, same corruption rule).
ORACLES["audio_fp_pairs"] = """
    WITH ok AS (
      SELECT doc_id, doc_id % 25 AS grp
      FROM documents
      WHERE doc_id < 200 AND doc_id % 37 <> 0)
    SELECT a.doc_id AS a, b.doc_id AS b, CAST(0 AS INTEGER) AS hamming
    FROM ok a JOIN ok b ON a.grp = b.grp AND a.doc_id < b.doc_id
"""

# Host-scoped template gate twin: replays injection, per-host page
# counts, the (host, line) document-frequency fraction gate, and
# ordered reassembly. 0.5 * hp is exact in binary floating point, so
# the frac compare cannot drift between engines.
ORACLES["host_template_lines"] = """
    WITH inj AS (
      SELECT doc_id,
             'h' || (doc_id % 7) || '.example.org' AS host,
             'Navigation for h' || (doc_id % 7) || '.example.org'
             || chr(10)
             || (CASE WHEN doc_id % 3 = 0
                      THEN 'Trending on h' || (doc_id % 7)
                           || '.example.org' || chr(10)
                      ELSE '' END)
             || text AS text2
      FROM documents),
    splits AS (SELECT doc_id, host, string_split(text2, chr(10)) AS l
               FROM inj),
    lines AS (
      SELECT doc_id, host,
             unnest([{'pos': CAST(i - 1 AS BIGINT), 'line': l[i]}
                     for i in range(1, len(l) + 1)], recursive := true)
      FROM splits),
    host_pages AS (SELECT host, count(DISTINCT doc_id) AS hp
                   FROM inj GROUP BY host),
    dfreq AS (
      SELECT host, md5(trim(line)) AS lkey,
             count(DISTINCT doc_id) AS line_df
      FROM lines WHERE trim(line) <> '' GROUP BY 1, 2),
    template AS (
      SELECT d.host, d.lkey FROM dfreq d JOIN host_pages h USING (host)
      WHERE d.line_df >= GREATEST(2.0, 0.5 * h.hp)),
    kept AS (
      SELECT l.doc_id, l.pos, l.line FROM lines l
      LEFT JOIN template t
        ON l.host = t.host AND md5(trim(l.line)) = t.lkey
      WHERE t.lkey IS NULL),
    totals AS (SELECT doc_id, host, CAST(count(*) AS BIGINT) AS n_lines
               FROM lines GROUP BY doc_id, host)
    SELECT t.doc_id, t.host, t.n_lines,
           CAST(t.n_lines - count(k.line) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), ''))
             AS clean_fp
    FROM totals t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.host, t.n_lines
"""

ORACLES["crawl_schedule"] = """
    WITH frontier AS (
      SELECT 'https://h' || (doc_id % 7) || '.example.org/p' || doc_id
               AS url,
             'h' || (doc_id % 7) || '.example.org' AS host,
             CAST(doc_id % 13 AS BIGINT) AS prio
      FROM documents),
    delays AS (
      SELECT 'h' || i || '.example.org' AS host,
             CAST(200 * (i + 1) AS BIGINT) AS delay_ms
      FROM range(7) t(i) WHERE i % 2 = 0),
    ranked AS (
      SELECT url, host,
             CAST(row_number() OVER (PARTITION BY host
                                     ORDER BY prio DESC, url) - 1
                  AS BIGINT) AS "rank"
      FROM frontier)
    SELECT r.url, r.host, r."rank",
           coalesce(d.delay_ms, 1000) AS delay_ms,
           CAST(r."rank" * coalesce(d.delay_ms, 1000) AS BIGINT)
             AS fetch_offset_ms,
           r."rank" < 40 AS scheduled
    FROM ranked r LEFT JOIN delays d USING (host)
"""

ORACLES["paragraph_dedup"] = f"""
    WITH inj AS (
      SELECT doc_id,
             '{_PD_COOKIE}' || chr(10) || chr(10) || text
             || (CASE WHEN doc_id % 3 = 0
                      THEN chr(10) || chr(10) || '{_PD_PROMO}'
                      ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0
                      THEN chr(10) || chr(10) || '{_PD_COOKIE}'
                      ELSE '' END) AS text3
      FROM documents),
    splits AS (SELECT doc_id,
                      string_split(text3, chr(10) || chr(10)) AS l
               FROM inj),
    paras AS (
      SELECT doc_id,
             unnest([{{'pos': CAST(i - 1 AS BIGINT), 'para': l[i]}}
                     for i in range(1, len(l) + 1)], recursive := true)
      FROM splits),
    keyed AS (SELECT doc_id, pos, para, md5(trim(para)) AS pkey
              FROM paras),
    winners AS (
      SELECT pkey, doc_id, pos FROM (
        SELECT pkey, doc_id, pos,
               row_number() OVER (PARTITION BY pkey
                                  ORDER BY doc_id, pos) AS rn
        FROM keyed WHERE trim(para) <> '') WHERE rn = 1),
    kept AS (
      SELECT k.doc_id, k.pos, k.para FROM keyed k
      JOIN winners w
        ON k.pkey = w.pkey AND k.doc_id = w.doc_id AND k.pos = w.pos
      UNION ALL
      SELECT doc_id, pos, para FROM keyed WHERE trim(para) = ''),
    totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras
               FROM paras GROUP BY doc_id)
    SELECT t.doc_id, t.n_paras,
           CAST(t.n_paras - count(k.para) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(k.para, chr(10) || chr(10)
                                   ORDER BY k.pos), '')) AS dedup_fp
    FROM totals t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.n_paras
"""

# Content-defined-chunking twins (operators/cdc.py, md5 family,
# w=16, p=32): the shared CTE block replays injection (same
# _CDC_BOILER constant the Spark query splices — one source of
# truth), the per-position md5 cut rule, chunk assembly, and the
# cross-doc window. duplicate_spans checks detection; span_dedup
# checks keep='first' removal + byte-exact reassembly (clean_fp).
_CDC_CTES = f"""
    inj AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               substr(text, 1, CAST(doc_id % 37 AS INT))
               || '{_CDC_BOILER}'
               || substr(text, CAST(doc_id % 37 AS INT) + 1, len(text))
             ELSE text END AS text
      FROM documents),
    live AS (SELECT doc_id, text FROM inj
             WHERE text IS NOT NULL AND len(text) > 0),
    pos AS (SELECT doc_id, text, unnest(range(16, len(text))) AS i
            FROM live WHERE len(text) > 16),
    cuts AS (
      SELECT doc_id, i FROM pos
      WHERE substr(md5(substr(text, i - 15, 16)), 1, 1) = '0'
        AND substr(md5(substr(text, i - 15, 16)), 2, 1)
            BETWEEN '0' AND '7'),
    cl AS (SELECT doc_id, list_sort(list(i)) AS cs
           FROM cuts GROUP BY doc_id),
    bounds AS (
      SELECT d.doc_id, d.text,
             list_prepend(CAST(1 AS BIGINT),
                          [c + 1 for c in coalesce(cl.cs, [])]) AS starts,
             list_append(coalesce(cl.cs, []),
                         CAST(len(d.text) AS BIGINT)) AS ends
      FROM live d LEFT JOIN cl USING (doc_id)),
    idx AS (SELECT doc_id, text, starts, ends,
                   unnest(range(1, len(starts) + 1)) AS k
            FROM bounds),
    chunks AS (
      SELECT doc_id, CAST(starts[k] AS BIGINT) AS start,
             CAST(ends[k] - starts[k] + 1 AS BIGINT) AS length,
             md5(substr(text, CAST(starts[k] AS INT),
                        CAST(ends[k] - starts[k] + 1 AS INT)))
               AS chunk_key
      FROM idx),
    win AS (
      SELECT doc_id, start, length, chunk_key,
             CAST(count(*) OVER (PARTITION BY chunk_key) AS BIGINT)
               AS n_copies,
             min(doc_id) OVER (PARTITION BY chunk_key)
               <> max(doc_id) OVER (PARTITION BY chunk_key) AS crossdoc,
             row_number() OVER (PARTITION BY chunk_key
                                ORDER BY doc_id, start) AS rn
      FROM chunks)
"""

# Domain-blocklist twin: the host regex is imported from the engine
# module (one source of truth); suffix-match semantics expressed as
# EXISTS (exact-or-'.'-prefixed-suffix), provably identical to the
# operator's label-boundary suffix equality.
from dxnn_ocr_cpp_spark.operators.urls import AUTHORITY_RE as _AUTH_RE

ORACLES["url_blocklist"] = f"""
    WITH u AS (
      SELECT doc_id,
             'https://' || CASE WHEN doc_id % 7 = 0
                THEN 'sub' || CAST(doc_id % 3 AS VARCHAR) || '.blocked.net'
                ELSE 'host' || CAST(doc_id % 20 AS VARCHAR)
                     || '.example.org' END
             || '/p/' || CAST(doc_id AS VARCHAR) AS url2
      FROM documents),
    bl AS (SELECT * FROM (VALUES ('blocked.net'),
                                 ('host3.example.org')) b(domain)),
    h AS (SELECT doc_id, url2,
                 lower(regexp_extract(url2, '{_AUTH_RE}', 1)) AS host
          FROM u)
    SELECT doc_id, url2,
           EXISTS (SELECT 1 FROM bl WHERE h.host = bl.domain
                   OR h.host LIKE '%.' || bl.domain) AS blocked
    FROM h
"""

# Shard-packing twin: the oracle is the NAIVE sequential prefix sum
# (one ORDER BY window) — exactly the formulation the Spark operator
# decomposes into bucket sums + within-bucket windows to avoid a
# single-partition stage; value equality certifies the decomposition.
ORACLES["pack_shards"] = """
    WITH c AS (
      SELECT doc_id, n_chars,
             CAST(coalesce(sum(n_chars) OVER (
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS cum
      FROM documents),
    s AS (SELECT doc_id, n_chars,
                 CAST(cum // 20000 AS BIGINT) AS shard_id FROM c)
    SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM s GROUP BY shard_id
"""

ORACLES["duplicate_spans"] = f"""
    WITH {_CDC_CTES}
    SELECT doc_id, start, length, n_copies
    FROM win WHERE crossdoc AND n_copies >= 2
"""

ORACLES["span_dedup"] = f"""
    WITH {_CDC_CTES},
    kept AS (SELECT doc_id, start, length FROM win
             WHERE NOT crossdoc OR rn = 1),
    agg AS (
      SELECT w.doc_id,
             string_agg(substr(l.text, CAST(w.start AS INT),
                               CAST(w.length AS INT)),
                        '' ORDER BY w.start) AS txt
      FROM kept w JOIN live l USING (doc_id) GROUP BY w.doc_id)
    SELECT d.doc_id,
           CAST(len(coalesce(a.txt, '')) AS BIGINT) AS clean_len,
           md5(coalesce(a.txt, '')) AS clean_fp
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# Token-window chunking twin (max_tokens=16, overlap=4, stride=12).
# Slice ends clamp in both engines; empty/blank docs produce no rows.
ORACLES["chunk_documents"] = """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents),
    nc AS (
      SELECT doc_id, t,
             CASE WHEN len(t) <= 16 THEN least(len(t), 1)
                  ELSE CAST(ceil((len(t) - 4) / 12.0) AS INT) END AS k
      FROM toks),
    chunks AS (
      SELECT doc_id, t, unnest(range(0, k)) AS chunk_id
      FROM nc WHERE k > 0)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(least(len(t) - chunk_id * 12, 16) AS BIGINT) AS n_tokens,
           md5(array_to_string(
               t[chunk_id * 12 + 1 : chunk_id * 12 + 16], ' ')) AS chunk_fp
    FROM chunks
"""

# The extraction flagship: input is the seeded synthetic corpus (no
# external data), so expected output is a frozen parquet fixture
# (tools/freeze_extract_expected.py). The md5-of-text column makes the
# driver's value-hash compare pin the north-rule byte-identity
# invariant end-to-end; staleness is caught first by
# tests/test_golden.py::test_extract_corpus_fixture_fresh.
ORACLES["extract_corpus"] = """
    SELECT url, n_spans, n_candidates, charset, text_len, text_md5
    FROM read_parquet('/root/repo/tests/golden/extract_corpus_expected.parquet')
"""

# Markdown rendering twin — same frozen-fixture discipline; staleness
# caught first by tests/test_markdown.py::test_markdown_fixture_fresh.
ORACLES["extract_markdown"] = """
    SELECT url, md_len, md_md5, n_headings, n_list_items
    FROM read_parquet('/root/repo/tests/golden/extract_markdown_expected.parquet')
"""

# End-to-end corpus->shards twin — frozen-fixture discipline;
# staleness caught first by tests/test_shards_pipeline.py.
ORACLES["corpus_to_shards"] = """
    SELECT url, doc_no, n_tokens, cum_tokens, shard_id
    FROM read_parquet('/root/repo/tests/golden/corpus_to_shards_expected.parquet')
"""

# Unigram-LM quality twin: replays the dedup-family tokenization, the
# deterministic top-512 vocabulary cutoff (count DESC, token ASC), the
# add-one smoothing logp(t) = ln(c+1) - ln(T + K + 1), and the per-doc
# mean. Both sides round to 4 dp before the keep-gate compare so libm
# last-ulp drift between engines cannot flip either the hash or the
# boolean. sum(c) is cast to DOUBLE before ln (DuckDB would make it
# HUGEINT).
ORACLES["lm_quality"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               ' ')) AS token
      FROM documents WHERE trim(text) <> ''),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    kept AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT 512),
    konst AS (SELECT CAST((SELECT sum(c) FROM cnt) AS DOUBLE)
                     + CAST((SELECT count(*) FROM kept) AS DOUBLE)
                     + 1.0 AS denom),
    sc AS (
      SELECT t.doc_id,
             ln(coalesce(k.c, 0) + 1.0) - ln(konst.denom) AS lp
      FROM tok t LEFT JOIN kept k USING (token) CROSS JOIN konst),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(lp), 4) AS avg_logp
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           coalesce(a.avg_logp, 0.0) AS avg_logp,
           (coalesce(a.n_tokens, 0) > 0
            AND coalesce(a.avg_logp, 0.0) >= -3.41) AS keep
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
"""

# Re-crawl latest-capture twin: same url/cap_ts synthesis arithmetic;
# Spark's max_by(struct(cap_ts, doc_id)) == row_number over
# (cap_ts DESC, doc_id DESC) = 1.
ORACLES["recrawl_latest"] = """
    WITH caps AS (
      SELECT doc_id,
             'https://h' || (doc_id % 5) || '.example.org/p'
               || (doc_id % 100) AS url,
             CAST(1700000000 + (doc_id * 37 % 100000) * 60 + doc_id
                  AS BIGINT) AS cap_ts
      FROM documents),
    ranked AS (
      SELECT url, cap_ts, doc_id,
             row_number() OVER (PARTITION BY url
                                ORDER BY cap_ts DESC, doc_id DESC) AS rk,
             count(*) OVER (PARTITION BY url) AS n_captures
      FROM caps)
    SELECT url, CAST(n_captures AS BIGINT) AS n_captures,
           cap_ts AS latest_ts, doc_id AS latest_doc
    FROM ranked WHERE rk = 1 ORDER BY url
"""


ORACLES["lm_ppl_buckets"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               ' ')) AS token
      FROM documents WHERE trim(text) <> ''),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    kept AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT 512),
    konst AS (SELECT CAST((SELECT sum(c) FROM cnt) AS DOUBLE)
                     + CAST((SELECT count(*) FROM kept) AS DOUBLE)
                     + 1.0 AS denom),
    sc AS (
      SELECT t.doc_id,
             ln(coalesce(k.c, 0) + 1.0) - ln(konst.denom) AS lp
      FROM tok t LEFT JOIN kept k USING (token) CROSS JOIN konst),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(lp), 4) AS avg_logp
            FROM sc GROUP BY doc_id),
    alldocs AS (
      SELECT d.doc_id,
             CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
             coalesce(a.avg_logp, 0.0) AS avg_logp
      FROM documents d LEFT JOIN agg a USING (doc_id)),
    cuts AS (
      SELECT round(quantile_cont(avg_logp, 1.0/3.0), 6) AS c1,
             round(quantile_cont(avg_logp, 2.0/3.0), 6) AS c2
      FROM alldocs WHERE n_tokens > 0)
    SELECT f.doc_id, f.n_tokens, f.avg_logp,
           CASE WHEN f.n_tokens = 0 THEN 'empty'
                WHEN f.avg_logp >= cuts.c2 THEN 'head'
                WHEN f.avg_logp >= cuts.c1 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM alldocs f CROSS JOIN cuts
    ORDER BY f.doc_id
"""

ORACLES["lang_spans"] = """
    WITH mixed AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0 THEN
                  chr(10) || chr(10) ||
                  'der die und ist nicht der die und ist nicht.'
                ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN
                  chr(10) || chr(10) ||
                  'el la los es una el la los es una.'
                ELSE '' END AS text
      FROM documents),
    pl AS (SELECT doc_id,
                  string_split_regex(text, '\\n{2,}') AS paras
           FROM mixed),
    idx AS (SELECT doc_id, paras,
                   unnest(range(1, len(paras) + 1)) AS k
            FROM pl),
    para AS (
      SELECT doc_id, CAST(k AS INT) AS pos, paras[k] AS para
      FROM idx WHERE trim(paras[k]) <> ''),
    scored AS (
      SELECT doc_id, pos, para,
             len(regexp_extract_all(lower(para),
                 '\\b(der|die|und|ist|nicht)\\b')) AS de,
             len(regexp_extract_all(lower(para),
                 '\\b(the|and|of|to|is)\\b')) AS en,
             len(regexp_extract_all(lower(para),
                 '\\b(el|la|los|es|una)\\b')) AS es,
             len(regexp_extract_all(lower(para),
                 '\\b(le|les|des|est|une)\\b')) AS fr
      FROM para),
    langed AS (
      SELECT doc_id, pos, para,
             CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                  WHEN de = greatest(de, en, es, fr) THEN 'de'
                  WHEN en = greatest(de, en, es, fr) THEN 'en'
                  WHEN es = greatest(de, en, es, fr) THEN 'es'
                  ELSE 'fr' END AS lang
      FROM scored),
    runs AS (
      SELECT doc_id, pos, para, lang,
             CASE WHEN lag(lang) OVER w IS NULL
                       OR lag(lang) OVER w <> lang
                  THEN 1 ELSE 0 END AS new_run
      FROM langed
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    spanned AS (
      SELECT doc_id, pos, para, lang,
             CAST(sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) - 1
                  AS INT) AS span_idx
      FROM runs)
    SELECT doc_id, span_idx,
           min(lang) AS lang,
           CAST(count(*) AS INT) AS n_paras,
           md5(string_agg(para, chr(10) || chr(10) ORDER BY pos))
             AS span_md5
    FROM spanned
    GROUP BY doc_id, span_idx
    ORDER BY doc_id, span_idx
"""

ORACLES["snapshot_diff"] = """
    WITH base AS (
      SELECT doc_id,
             'https://h' || (doc_id % 5) || '.example.org/d'
               || doc_id AS url,
             text
      FROM documents),
    old AS (SELECT url, max(md5(text)) AS old_fp
            FROM base WHERE doc_id % 11 <> 3 GROUP BY url),
    new AS (SELECT url,
                   max(md5(CASE WHEN doc_id % 7 = 0
                                THEN text || ' [rev2]'
                                ELSE text END)) AS new_fp
            FROM base WHERE doc_id % 13 <> 5 GROUP BY url)
    SELECT coalesce(o.url, n.url) AS url,
           CASE WHEN o.url IS NULL THEN 'added'
                WHEN n.url IS NULL THEN 'removed'
                WHEN o.old_fp IS NOT DISTINCT FROM n.new_fp
                  THEN 'unchanged'
                ELSE 'changed' END AS status,
           coalesce(o.old_fp, '') AS old_fp,
           coalesce(n.new_fp, '') AS new_fp
    FROM old o FULL OUTER JOIN new n ON o.url = n.url
    ORDER BY 1
"""

# the refresh CONTRACT is row-identity with processing the new
# snapshot outright — the oracle computes that directly; the Spark
# side takes the reuse/reprocess path to get there
ORACLES["incremental_refresh"] = """
    WITH base AS (
      SELECT doc_id,
             'https://h' || (doc_id % 5) || '.example.org/d'
               || doc_id AS url,
             text
      FROM documents),
    new AS (SELECT url,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                        ELSE text END AS text
            FROM base WHERE doc_id % 13 <> 5)
    SELECT url, CAST(length(text) AS BIGINT) AS n_chars_out,
           md5(text) AS text_md5
    FROM new ORDER BY url
"""


def _link_edges_sql() -> str:
    """DuckDB query yielding the (u, v, w) host edge list of
    q_link_graph's synthetic corpus — the IDENTICAL HREF_RE pattern
    string and link policy as operators/linkgraph.host_edges. Shared
    by the link_graph and host_pagerank oracles."""
    from dxnn_ocr_cpp_spark.operators.linkgraph import HREF_RE
    from dxnn_ocr_cpp_spark.operators.urls import AUTHORITY_RE
    href = HREF_RE.replace("'", "''")
    auth = AUTHORITY_RE

    def host(expr: str) -> str:
        return (f"string_split(string_split("
                f"lower(regexp_extract({expr}, '{auth}', 1)), "
                f"'@')[-1], ':')[1]")

    return f"""
    WITH docs AS (
      SELECT 'https://h' || (doc_id % 5) || '.example.org/d' || doc_id
               AS url,
             '<html><body><a href="https://p' || (doc_id * 3 % 7)
             || '.partner.net/x' || doc_id || '">p</a>'
             || CASE WHEN doc_id % 3 = 0
                  THEN '<a href=''//cdn' || (doc_id % 2)
                       || '.assets.net/lib.js''>c</a>'
                  ELSE '' END
             || '<a href="/about">rel</a><a href="#top">frag</a>'
             || '</body></html>' AS html
      FROM documents),
    harvested AS (
      SELECT {host('url')} AS src_host,
             unnest(regexp_extract_all(html, '{href}', 1)) AS link
      FROM docs),
    resolved AS (
      SELECT src_host,
             CASE WHEN regexp_matches(link, '^(?i)https?://')
                    THEN {host('link')}
                  WHEN link LIKE '//%'
                    THEN {host("'http:' || link")}
                  ELSE src_host END AS dst_host
      FROM harvested)
    SELECT src_host AS u, dst_host AS v,
           CAST(count(*) AS BIGINT) AS w
    FROM resolved
    WHERE dst_host <> src_host AND dst_host <> '' AND src_host <> ''
    GROUP BY 1, 2
    """


def _anchor_oracle() -> str:
    """DuckDB replay of q_anchor_texts: IDENTICAL ANCHOR_RE pattern
    string, link policy, normalization, and window rank."""
    from dxnn_ocr_cpp_spark.operators.linkgraph import ANCHOR_RE
    from dxnn_ocr_cpp_spark.operators.urls import AUTHORITY_RE
    anc = ANCHOR_RE.replace("'", "''")
    auth = AUTHORITY_RE

    def host(expr: str) -> str:
        return (f"string_split(string_split("
                f"lower(regexp_extract({expr}, '{auth}', 1)), "
                f"'@')[-1], ':')[1]")

    return f"""
    WITH docs AS (
      SELECT 'https://h' || (doc_id % 5) || '.example.org/d' || doc_id
               AS url,
             '<a href="https://p' || (doc_id * 3 % 7)
             || '.partner.net/x' || doc_id || '">'
             || CASE WHEN doc_id % 4 = 0 THEN 'read more'
                     WHEN doc_id % 4 = 1 THEN 'Click  HERE '
                     WHEN doc_id % 4 = 2
                       THEN 'partner ' || (doc_id * 3 % 7)
                     ELSE 'home page' END
             || '</a>'
             || CASE WHEN doc_id % 3 = 0
                  THEN '<a href=''//cdn' || (doc_id % 2)
                       || '.assets.net/l.js''> CDN  asset </a>'
                  ELSE '' END
             || '<a href="/self">me</a><a href="#t">frag</a>'
             || '<a href="https://p1.partner.net/y"></a>' AS html
      FROM documents),
    harvested AS (
      SELECT {host('url')} AS src_host,
             unnest(regexp_extract_all(html, '{anc}', 0)) AS el
      FROM docs),
    parsed AS (
      SELECT src_host,
             regexp_extract(el, '{anc}', 1) AS link,
             lower(trim(regexp_replace(
               regexp_extract(el, '{anc}', 2), '\\s+', ' ', 'g')))
               AS anchor
      FROM harvested),
    resolved AS (
      SELECT src_host, anchor,
             CASE WHEN regexp_matches(link, '^(?i)https?://')
                    THEN {host('link')}
                  WHEN link LIKE '//%'
                    THEN {host("'http:' || link")}
                  ELSE src_host END AS dst_host
      FROM parsed),
    agg AS (
      SELECT dst_host, anchor, CAST(count(*) AS BIGINT) AS n
      FROM resolved
      WHERE dst_host <> src_host AND dst_host <> ''
            AND src_host <> '' AND anchor <> ''
      GROUP BY 1, 2),
    ranked AS (
      SELECT dst_host, anchor, n,
             CAST(row_number() OVER (PARTITION BY dst_host
                                     ORDER BY n DESC, anchor)
                  AS BIGINT) AS rk
      FROM agg)
    SELECT dst_host, anchor, n, rk FROM ranked WHERE rk <= 3
    ORDER BY dst_host, rk
    """


ORACLES["anchor_texts"] = _anchor_oracle()


def _robots_oracle() -> str:
    """Relational replay of q_robots_gate: join + row_number argmax
    over (length DESC, allow DESC) — TRUE sorts above FALSE, the same
    tie-break as the Spark side's struct array_max."""
    from dxnn_ocr_cpp_spark.operators.urls import AUTHORITY_RE, PATH_RE
    host = ("string_split(string_split(lower(regexp_extract(url2, "
            f"'{AUTHORITY_RE}', 1)), '@')[-1], ':')[1]")
    return f"""
    WITH docs AS (
      SELECT doc_id,
             'https://h' || (doc_id % 4) || '.example.org' ||
             CASE WHEN doc_id % 5 = 0 THEN '/private/pub/x' || doc_id
                  WHEN doc_id % 5 = 1 THEN '/private/x' || doc_id
                  WHEN doc_id % 5 = 2 THEN '/p/x' || doc_id
                  WHEN doc_id % 5 = 3 THEN ''
                  ELSE '/docs/x' || doc_id END AS url2
      FROM documents),
    parsed AS (
      SELECT doc_id, url2, {host} AS host,
             CASE WHEN regexp_extract(url2, '{PATH_RE}', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(url2, '{PATH_RE}', 1) END AS path
      FROM docs),
    rules AS (SELECT * FROM (VALUES
      ('h0.example.org', '/', TRUE),
      ('h0.example.org', '/private', FALSE),
      ('h0.example.org', '/private/pub', TRUE),
      ('h1.example.org', '/p', FALSE),
      ('h1.example.org', '/p', TRUE),
      ('h2.example.org', '/docs', FALSE)) t(host, prefix, allow)),
    m AS (
      SELECT p.doc_id, r.allow,
             row_number() OVER (PARTITION BY p.doc_id
                                ORDER BY length(r.prefix) DESC,
                                         r.allow DESC) AS rk
      FROM parsed p JOIN rules r
        ON p.host = r.host AND starts_with(p.path, r.prefix))
    SELECT d.doc_id, d.url2, coalesce(m.allow, TRUE) AS allowed
    FROM docs d LEFT JOIN m ON d.doc_id = m.doc_id AND m.rk = 1
    ORDER BY d.doc_id
    """


ORACLES["robots_gate"] = _robots_oracle()

# md5 MinHash family pair mining (band keys + candidate join + exact
# Jaccard verify) as a reusable CTE chain ending in mh_pairs(a, b).
# Family constants come FROM operators/dedup.py (one source of truth):
# x(g) = first-8-hex of md5(g) mod P, h_i = (a_i*x + b_i) mod P.
from dxnn_ocr_cpp_spark.operators.dedup import (MH_A_MULT, MH_B_MULT,
                                                MH_P)

_MINHASH_MD5_CTE = f"""{_SHINGLE_CTE},
    g AS (SELECT doc_id, unnest(sh) AS gr FROM sh),
    gx AS (SELECT doc_id,
             CAST('0x' || substr(md5(gr), 1, 8) AS BIGINT) % {MH_P} AS x
           FROM g),
    mh AS (
      SELECT doc_id, seed,
             min((x * (({MH_A_MULT} * (seed + 1)) % {MH_P})
                  + (({MH_B_MULT} * (seed + 7)) % {MH_P})) % {MH_P}) AS h
      FROM gx CROSS JOIN (SELECT unnest(range(0, 64)) AS seed)
      GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(h, '|' ORDER BY seed) AS bucket
      FROM mh GROUP BY doc_id, seed // 4),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id),
    ver AS (
      SELECT c.a, c.b,
             len(list_intersect(x.sh, y.sh))::DOUBLE AS inter,
             (len(x.sh) + len(y.sh))::DOUBLE AS tot
      FROM cand c
      JOIN sh x ON x.doc_id = c.a
      JOIN sh y ON y.doc_id = c.b),
    mh_pairs AS (
      SELECT a, b, round(inter / greatest(tot - inter, 1.0), 6) AS jaccard
      FROM ver WHERE inter / greatest(tot - inter, 1.0) >= 0.4)"""

ORACLES["minhash_lsh_pairs_md5"] = f"""
    WITH {_MINHASH_MD5_CTE}
    SELECT a, b, jaccard FROM mh_pairs
"""

# end-to-end fuzzy dedup: MinHash-LSH pairs (md5 family, replayed
# bit-for-bit) -> recursive component closure -> keep-the-longest
# canonical per component -> anti-join survivors. One oracle certifies
# the WHOLE fuzzy-dedup path, not just the pair stage.
ORACLES["fuzzy_dedup_keeplist"] = f"""
    WITH RECURSIVE {_MINHASH_MD5_CTE},
    e AS (SELECT a AS u, b AS v FROM mh_pairs
          UNION SELECT b, a FROM mh_pairs),
    reach(v, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v),
    comp AS (SELECT v AS node, min(r) AS component
             FROM reach GROUP BY v),
    ranked AS (
      SELECT c.node, c.component, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.node ASC)
               AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.node)
    SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM ranked r
                      WHERE r.node = d.doc_id AND r.rk > 1)
    ORDER BY d.doc_id
"""


# incremental dedup vs a persisted index: the md5 CTE mines ALL pairs
# at the same threshold, so the oracle derives both stages from it —
# cross (batch x corpus) matches feed the argmax (rounded jaccard DESC,
# corpus id ASC); batch-internal pairs among the survivors close under
# a recursive CTE with min-id representatives.
ORACLES["incremental_dedup"] = f"""
    WITH RECURSIVE {_MINHASH_MD5_CTE},
    batch AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
    xm AS (
      SELECT CASE WHEN a % 10 = 0 THEN a ELSE b END AS nid,
             CASE WHEN a % 10 = 0 THEN b ELSE a END AS cid,
             jaccard
      FROM mh_pairs
      WHERE (a % 10 = 0) <> (b % 10 = 0)),
    best AS (
      SELECT nid, cid, jaccard,
             row_number() OVER (PARTITION BY nid
                                ORDER BY jaccard DESC, cid ASC) AS rk
      FROM xm),
    surv AS (SELECT doc_id FROM batch
             WHERE doc_id NOT IN (SELECT nid FROM best)),
    bp AS (SELECT a, b FROM mh_pairs
           WHERE a IN (SELECT doc_id FROM surv)
             AND b IN (SELECT doc_id FROM surv)),
    e AS (SELECT a AS u, b AS v FROM bp UNION SELECT b, a FROM bp),
    reach(v, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v),
    comp AS (SELECT v AS node, min(r) AS component
             FROM reach GROUP BY v)
    SELECT b.doc_id AS id,
           coalesce(bm.cid,
                    CASE WHEN c.component <> b.doc_id
                         THEN c.component END) AS dup_of,
           bm.jaccard AS jaccard,
           (bm.cid IS NULL
            AND coalesce(c.component, b.doc_id) = b.doc_id) AS keep
    FROM batch b
    LEFT JOIN (SELECT nid, cid, jaccard FROM best WHERE rk = 1) bm
      ON bm.nid = b.doc_id
    LEFT JOIN comp c ON c.node = b.doc_id
    ORDER BY b.doc_id
"""


def _meta_oracle() -> str:
    """Full twin of q_page_meta: rebuilds the identical html strings,
    replays the IDENTICAL pattern constants from operators/meta.py and
    the same entity-replace chain (amp last) + ws collapse + trim."""
    from dxnn_ocr_cpp_spark.operators import meta as M

    def rx(pat: str) -> str:
        return pat.replace("'", "''")

    def clean(expr: str) -> str:
        for ent, rep in M.ENTITIES:
            e, r = ent.replace("'", "''"), rep.replace("'", "''")
            expr = f"replace({expr}, '{e}', '{r}')"
        return (f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))")

    title = clean(f"regexp_extract(html, '{rx(M.TITLE_RE)}', 1)")
    desc = clean(f"regexp_extract(regexp_extract(html, "
                 f"'{rx(M.DESC_TAG_RE)}', 0), "
                 f"'{rx(M.CONTENT_ATTR_RE)}', 1)")
    og = clean(f"regexp_extract(regexp_extract(html, "
               f"'{rx(M.OG_TITLE_TAG_RE)}', 0), "
               f"'{rx(M.CONTENT_ATTR_RE)}', 1)")
    canon = (f"trim(regexp_extract(regexp_extract(html, "
             f"'{rx(M.CANONICAL_TAG_RE)}', 0), "
             f"'{rx(M.HREF_ATTR_RE)}', 1))")
    lang = f"lower(regexp_extract(html, '{rx(M.LANG_ATTR_RE)}', 1))"
    return f"""
    WITH docs AS (
      SELECT doc_id,
        '<html lang="' ||
        CASE WHEN doc_id % 3 = 0 THEN 'EN-us'
             WHEN doc_id % 3 = 1 THEN 'de' ELSE '' END ||
        '"><head>' ||
        CASE WHEN doc_id % 4 <> 3
             THEN '<title> Doc &amp; ' || doc_id
                  || '  &quot;x&quot;' || chr(10) || ' t</title>'
             ELSE '' END ||
        CASE WHEN doc_id % 2 = 0
             THEN '<meta content="desc ' || doc_id
                  || '" name="description">'
             ELSE '' END ||
        CASE WHEN doc_id % 5 = 0
             THEN '<link rel=''canonical'' href=''https://c.example.org/'
                  || doc_id || '''>'
             ELSE '' END ||
        CASE WHEN doc_id % 6 = 0
             THEN '<meta property="og:title" content="og &lt;' || doc_id
                  || '&gt;">'
             ELSE '' END ||
        '</head><body>b</body></html>' AS html
      FROM documents)
    SELECT doc_id, {title} AS title, {desc} AS meta_description,
           {canon} AS canonical_url, {og} AS og_title,
           {lang} AS html_lang
    FROM docs ORDER BY doc_id
    """


ORACLES["page_meta"] = _meta_oracle()


def _tables_oracle() -> str:
    """Full twin of q_html_tables: rebuilds the identical html strings
    and replays the IDENTICAL pattern constants from operators/tables.py
    (table -> row -> cell regexp chain, tag-strip -> entity decode ->
    ws collapse cell cleaning, per-row th count)."""
    from dxnn_ocr_cpp_spark.operators import meta as M
    from dxnn_ocr_cpp_spark.operators import tables as T

    def rx(pat: str) -> str:
        return pat.replace("'", "''")

    expr = f"regexp_replace(c, '{rx(T.TAG_RE)}', ' ', 'g')"
    for ent, rep in M.ENTITIES:
        e, r = ent.replace("'", "''"), rep.replace("'", "''")
        expr = f"replace({expr}, '{e}', '{r}')"
    cell_clean = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"

    return f"""
    WITH docs AS (
      SELECT doc_id,
        '<body><p>prose</p>' ||
        CASE WHEN doc_id % 7 <> 3 THEN
          '<TaBle class="t">' || chr(10) ||
          ' <TR><TH> H&amp;A </th><th>Col</th></tr>' ||
          '<tr><td> v' || doc_id || ' <b>bold</b></td><td>' ||
          (doc_id % 5) || '</td></tr>' ||
          CASE WHEN doc_id % 2 = 0 THEN
            '<tr><td colspan="2">only ' || doc_id
            || ' &lt;x&gt;</td></tr>'
          ELSE '' END || '</table>'
        ELSE '' END ||
        CASE WHEN doc_id % 4 = 0 THEN
          '<table><tr><td>t2 ' || doc_id || '</td></tr></table>'
        ELSE '' END || '</body>' AS html
      FROM documents),
    t AS (SELECT doc_id,
            regexp_extract_all(html, '{rx(T.TABLE_RE)}', 1) AS tbls
          FROM docs),
    tb AS (SELECT doc_id, generate_subscripts(tbls, 1) - 1 AS table_idx,
                  unnest(tbls) AS tbody FROM t),
    r AS (SELECT doc_id, table_idx,
            regexp_extract_all(tbody, '{rx(T.ROW_RE)}', 1) AS trs
          FROM tb),
    rw AS (SELECT doc_id, table_idx,
                  generate_subscripts(trs, 1) - 1 AS row_idx,
                  unnest(trs) AS rowhtml FROM r),
    cl AS (SELECT doc_id, table_idx, row_idx,
             list_transform(
               regexp_extract_all(rowhtml, '{rx(T.CELL_RE)}', 1),
               c -> {cell_clean}) AS cells,
             len(regexp_extract_all(rowhtml, '{rx(T.TH_OPEN_RE)}', 0))
               AS n_th
           FROM rw)
    SELECT doc_id, CAST(table_idx AS BIGINT) AS table_idx,
           CAST(row_idx AS BIGINT) AS row_idx,
           CAST(len(cells) AS BIGINT) AS n_cells,
           CAST(n_th AS BIGINT) AS n_th,
           array_to_string(cells, '|') AS cells_joined
    FROM cl ORDER BY doc_id, table_idx, row_idx
    """


ORACLES["html_tables"] = _tables_oracle()

def _c4_oracle() -> str:
    """Full twin of q_c4_filters: rebuilds the identical injected text
    and replays the IDENTICAL regex/threshold constants from
    operators/curation.py (list_filter line gates, kept-text sentence
    count, page-level blocks)."""
    from dxnn_ocr_cpp_spark.operators import curation as C

    def rx(pat: str) -> str:
        return pat.replace("'", "''")

    return f"""
    WITH inj AS (
      SELECT doc_id,
        'Heading' || chr(10) ||
        substr(text, 1, 40) || ' tail words here.' ||
        chr(10) || 'Short one.' ||
        CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
          'This page uses JavaScript. Enable it to proceed now.'
          ELSE '' END ||
        CASE WHEN doc_id % 4 = 0 THEN chr(10) ||
          'A second proper sentence appears right here! ' ||
          'And a third one follows closely?' ELSE '' END ||
        CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
          'lorem ipsum dolor sit amet.' ELSE '' END ||
        CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
          'var x = {{ a: 1 }}; window.onload fires soon.' ELSE '' END
          AS t
      FROM documents),
    ln AS (SELECT doc_id, t,
             list_filter(list_transform(string_split(t, chr(10)),
                                        x -> trim(x)),
                         x -> x <> '') AS lines
           FROM inj),
    kp AS (SELECT doc_id, t, lines,
             list_filter(lines, x ->
               regexp_matches(x, '{rx(C.C4_TERMINAL_RE)}')
               AND len(string_split_regex(x, '\\s+'))
                   >= {C.C4_MIN_WORDS_PER_LINE}
               AND NOT regexp_matches(x, '{rx(C.C4_JAVASCRIPT_RE)}'))
               AS kept
           FROM ln),
    fin AS (SELECT doc_id,
              CAST(len(lines) AS BIGINT) AS n_lines,
              CAST(len(kept) AS BIGINT) AS n_lines_kept,
              CAST(len(regexp_extract_all(
                array_to_string(kept, chr(10)),
                '{rx(C.C4_SENT_RE)}', 0)) AS BIGINT) AS n_sentences,
              md5(array_to_string(kept, chr(10))) AS clean_fp,
              (NOT regexp_matches(t, '{rx(C.C4_LOREM_RE)}')
               AND NOT contains(t, '{C.C4_BRACE}')) AS page_ok
            FROM kp)
    SELECT doc_id, n_lines, n_lines_kept, n_sentences, clean_fp,
           (page_ok AND n_sentences >= {C.C4_MIN_SENTENCES}) AS keep
    FROM fin ORDER BY doc_id
    """


ORACLES["c4_filters"] = _c4_oracle()

# TF-IDF twin: same tokenization as lm_quality's oracle, identical
# micro-nat quantization point (round AFTER the ln, BEFORE the tf
# multiply) so the integer score replays exactly
ORACLES["tfidf_keywords"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               ' ')) AS token
      FROM documents WHERE trim(text) <> ''),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, token),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    dfq AS (SELECT doc_id, token, tf,
                   CAST(count(*) OVER (PARTITION BY token) AS BIGINT)
                     AS df
            FROM tf),
    sc AS (SELECT doc_id, token, tf, df,
             CAST(round(ln(n.n / CAST(df AS DOUBLE)) * 1000000)
                  AS BIGINT) AS idf_micro
           FROM dfq CROSS JOIN n),
    rk AS (SELECT doc_id, token, tf, df, idf_micro,
             tf * idf_micro AS score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tf * idf_micro DESC, token ASC)
               AS rank
           FROM sc)
    SELECT doc_id, token, tf, df, idf_micro,
           CAST(score_micro AS BIGINT) AS score_micro,
           CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 5 ORDER BY doc_id, rank
"""


def _gopher_oracle() -> str:
    """Full twin of q_gopher_rules: replays every fraction with DuckDB
    list functions over the same splits, the IDENTICAL regex constants
    and the IDENTICAL thresholds from operators/curation.py."""
    from dxnn_ocr_cpp_spark.operators import curation as C
    from dxnn_ocr_cpp_spark.operators.textstats import (STOPWORDS_EN,
                                                        _marker_regex)
    stop_re = _marker_regex(STOPWORDS_EN)
    lo = C.ALPHA_WORD_FRAC_MIN
    return f"""
    WITH inj AS (
      SELECT doc_id, text ||
        CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'same line' || chr(10)
             || 'same line' || chr(10) || 'same line' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN chr(10) || '- bullet one'
             || chr(10) || '- bullet two' ELSE '' END ||
        CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'trailing thought...'
             || chr(10) || 'more…' ELSE '' END ||
        CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10)
             || 'repeated para' || chr(10) || chr(10) || 'repeated para'
             ELSE '' END AS t
      FROM documents),
    arrs AS (
      SELECT doc_id,
        list_filter(list_transform(string_split(t, chr(10)),
                                   x -> trim(x)), x -> x <> '') AS ln,
        list_filter(list_transform(
            regexp_split_to_array(t, '\\n{{2,}}'), x -> trim(x)),
            x -> x <> '') AS pa,
        CASE WHEN trim(t) = '' THEN []
             ELSE string_split(regexp_replace(lower(trim(t)),
                                              '\\s+', ' ', 'g'), ' ')
        END AS w,
        len(regexp_extract_all(lower(t), '{stop_re}')) AS n_stop
      FROM inj),
    f AS (
      SELECT doc_id,
        len(ln) AS n_lines, n_stop,
        CASE WHEN len(ln) > 0 THEN
          (len(ln) - len(list_distinct(ln))) / len(ln)::DOUBLE
          ELSE 0.0 END AS dlf,
        CASE WHEN len(pa) > 0 THEN
          (len(pa) - len(list_distinct(pa))) / len(pa)::DOUBLE
          ELSE 0.0 END AS dpf,
        CASE WHEN coalesce(list_sum(list_transform(ln,
                 x -> length(x))), 0) > 0 THEN
          coalesce(list_sum(list_transform(ln,
            x -> CASE WHEN len(list_filter(ln, y -> y = x)) > 1
                      THEN length(x) ELSE 0 END)), 0)
          / coalesce(list_sum(list_transform(ln,
              x -> length(x))), 0)::DOUBLE
          ELSE 0.0 END AS dlcf,
        CASE WHEN len(ln) > 0 THEN
          len(list_filter(ln, x -> regexp_matches(x, '^[-*•·]')))
          / len(ln)::DOUBLE ELSE 0.0 END AS blf,
        CASE WHEN len(ln) > 0 THEN
          len(list_filter(ln,
              x -> regexp_matches(x, '(\\.\\.\\.|…)$')))
          / len(ln)::DOUBLE ELSE 0.0 END AS elf,
        CASE WHEN len(w) > 0 THEN
          len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
          / len(w)::DOUBLE ELSE 0.0 END AS awf
      FROM arrs)
    SELECT doc_id, CAST(n_lines AS INTEGER) AS n_lines,
           CAST(n_stop AS INTEGER) AS n_stopwords,
           round(dlf, 6) AS dup_line_frac,
           round(dpf, 6) AS dup_para_frac,
           round(dlcf, 6) AS dup_line_char_frac,
           round(blf, 6) AS bullet_line_frac,
           round(elf, 6) AS ellipsis_line_frac,
           round(awf, 6) AS alpha_word_frac,
           (dlf <= {C.DUP_LINE_FRAC_MAX} AND dpf <= {C.DUP_PARA_FRAC_MAX}
            AND dlcf <= {C.DUP_LINE_CHAR_FRAC_MAX}
            AND blf <= {C.BULLET_LINE_FRAC_MAX}
            AND elf <= {C.ELLIPSIS_LINE_FRAC_MAX}
            AND awf >= {lo} AND n_stop >= {C.MIN_STOPWORDS}) AS keep
    FROM f ORDER BY doc_id
    """


ORACLES["gopher_rules"] = _gopher_oracle()


def _classifier_oracle(n_buckets: int = 1024, iters: int = 3) -> str:
    """Full twin of q_quality_classifier: UNROLLS the integer batch
    perceptron's training rounds as chained CTEs (the host_pagerank
    sequential-replay discipline) — round 1 starts from w=0 so every
    doc is misclassified and w1 is the class-difference count vector;
    rounds k>=2 rescore under w_{{k-1}}, update on y*s<=0. All
    integer arithmetic, so agreement is exact."""
    parts = [f"""
    WITH tok AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS w
      FROM documents WHERE trim(text) <> ''),
    feats AS (
      SELECT doc_id, y,
             CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
               % {n_buckets} AS b,
             CAST(count(*) AS BIGINT) AS x
      FROM (SELECT doc_id, y, unnest(w) AS g FROM tok) t
      GROUP BY doc_id, y, b),
    w1 AS (SELECT b, sum(y * x) AS w FROM feats GROUP BY b)"""]
    for k in range(2, iters + 1):
        parts.append(f""",
    s{k} AS (
      SELECT f.doc_id, any_value(f.y) AS y,
             coalesce(sum(f.x * w{k - 1}.w), 0) AS s
      FROM feats f LEFT JOIN w{k - 1} USING (b) GROUP BY f.doc_id),
    m{k} AS (SELECT doc_id FROM s{k} WHERE y * s <= 0),
    g{k} AS (SELECT f.b, sum(f.y * f.x) AS g
             FROM feats f JOIN m{k} USING (doc_id) GROUP BY f.b),
    w{k} AS (
      SELECT coalesce(w{k - 1}.b, g{k}.b) AS b,
             coalesce(w{k - 1}.w, 0) + coalesce(g{k}.g, 0) AS w
      FROM w{k - 1} FULL JOIN g{k} ON w{k - 1}.b = g{k}.b)""")
    parts.append(f""",
    scores AS (
      SELECT f.doc_id, coalesce(sum(f.x * w{iters}.w), 0) AS score
      FROM feats f LEFT JOIN w{iters} USING (b) GROUP BY f.doc_id)
    SELECT d.doc_id, CAST(coalesce(s.score, 0) AS BIGINT) AS score,
           coalesce(s.score, 0) > 0 AS pred
    FROM documents d LEFT JOIN scores s USING (doc_id)
    ORDER BY d.doc_id""")
    return "".join(parts)


ORACLES["quality_classifier"] = _classifier_oracle()

ORACLES["dedup_canonical"] = f"""
    WITH RECURSIVE {_JACCARD_CTE},
    jp AS (SELECT a, b FROM jpairs
           WHERE common / (na + nb - common) >= 0.4),
    e AS (SELECT a AS u, b AS v FROM jp
          UNION SELECT b, a FROM jp),
    reach(v, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v),
    comp AS (SELECT v AS node, min(r) AS component
             FROM reach GROUP BY v),
    ranked AS (
      SELECT c.node, c.component, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.node ASC)
               AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.node)
    SELECT CAST(component AS BIGINT) AS component,
           CAST(max(CASE WHEN rk = 1 THEN node END) AS BIGINT)
             AS canonical_doc,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_chars) AS BIGINT) AS canonical_rank
    FROM ranked GROUP BY component ORDER BY component
"""

ORACLES["corpus_stats"] = """
    SELECT coalesce(lang, '<all>') AS lang,
           coalesce(source, '<all>') AS source,
           CAST(grouping(lang) * 2 + grouping(source) AS INTEGER)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY CUBE (lang, source)
    ORDER BY 3, 1, 2
"""

ORACLES["link_graph"] = f"""
    SELECT u AS src_host, v AS dst_host, w AS n_links
    FROM ({_link_edges_sql()})
    ORDER BY 1, 2
"""


def _pagerank_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.linkgraph import pagerank_oracle_sql
    inner = pagerank_oracle_sql(f"SELECT * FROM ({_link_edges_sql()})",
                                damping=0.85, iters=3)
    return (f"SELECT host, round(rank, 6) AS rank FROM ({inner}) "
            f"ORDER BY host")


ORACLES["host_pagerank"] = _pagerank_oracle()


def _trustrank_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.linkgraph import trustrank_oracle_sql
    edges = f"SELECT * FROM ({_link_edges_sql()})"
    seeds = (f"SELECT host FROM ("
             f"SELECT DISTINCT u AS host FROM ({_link_edges_sql()}) "
             f"UNION SELECT DISTINCT v FROM ({_link_edges_sql()})) "
             f"ORDER BY host LIMIT 3")
    inner = trustrank_oracle_sql(edges, seeds, damping=0.85, iters=3)
    return (f"SELECT host, round(trust, 6) AS trust FROM ({inner}) "
            f"ORDER BY host")


ORACLES["host_trustrank"] = _trustrank_oracle()


def _hits_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.linkgraph import hits_oracle_sql
    inner = hits_oracle_sql(f"SELECT * FROM ({_link_edges_sql()})",
                            iters=3)
    return (f"SELECT host, round(hub, 6) AS hub, "
            f"round(authority, 6) AS authority FROM ({inner}) "
            f"ORDER BY host")


ORACLES["host_hits"] = _hits_oracle()

# planted-class twin: bucket is a pure function of doc_id parity (the
# ratio margins are >=0.3 on each side of the 0.25 cut) — the oracle
# needs no zlib, so the check is robust to zlib-version drift
ORACLES["compression_quality"] = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'template'
                ELSE 'entropy' END AS bucket
    FROM documents ORDER BY doc_id
"""

# mirrors operators/mixing.py arithmetic IN THE SAME OP ORDER so the
# doubles agree bit-for-bit: share = w / sum(w); feasible total =
# min(n_avail / share); rate = (share * total) / n_avail; threshold =
# floor(rate * 1e6); keep iff md5-60bit % 1e6 < threshold.
ORACLES["dataset_mix"] = """
    WITH docs AS (
      SELECT 'https://example.com/doc/' || doc_id AS url,
             CASE WHEN doc_id % 10 < 6 THEN 'web'
                  WHEN doc_id % 10 < 9 THEN 'code'
                  ELSE 'reference' END AS domain,
             doc_id
      FROM documents),
    counts AS (SELECT domain, count(*) AS n FROM docs GROUP BY domain),
    w AS (SELECT * FROM (VALUES ('web', 0.5), ('code', 0.3),
                                ('reference', 0.2)) t(domain, weight)),
    sh AS (SELECT domain,
                  weight / (SELECT sum(weight) FROM w) AS share
           FROM w),
    j AS (SELECT coalesce(c.domain, s.domain) AS domain,
                 coalesce(c.n, 0) AS n_avail,
                 coalesce(s.share, 0.0) AS share
          FROM counts c FULL OUTER JOIN sh s ON c.domain = s.domain),
    t AS (SELECT min(n_avail / share) AS tt FROM j WHERE share > 0),
    thr AS (SELECT domain,
                   CAST(floor(CASE WHEN n_avail > 0
                                THEN share * tt / n_avail
                                ELSE 0.0 END * 1000000) AS BIGINT)
                     AS thr
            FROM j CROSS JOIN t),
    kept AS (SELECT d.domain, d.doc_id
             FROM docs d JOIN thr ON d.domain = thr.domain
             WHERE CAST('0x' || substr(md5(d.url), 1, 15) AS BIGINT)
                     % 1000000 < thr.thr)
    SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM kept GROUP BY domain ORDER BY domain
"""

# epoch-plan twin: token rollup -> share normalization -> capped
# epochs -> shortfall, identical op order, outputs rounded identically
# in both engines (sum(n_chars) cast from HUGEINT, the
# len_bucket_histogram lesson).
ORACLES["epoch_plan"] = """
    WITH dt AS (
      SELECT CASE WHEN doc_id % 20 < 12 THEN 'web'
                  WHEN doc_id % 20 < 17 THEN 'news'
                  WHEN doc_id % 20 < 19 THEN 'code'
                  ELSE 'wiki' END AS domain,
             CAST(sum(n_chars) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
    w AS (SELECT * FROM (VALUES ('web', 0.4), ('news', 0.3),
                                ('code', 0.2), ('wiki', 0.1))
          t(domain, weight)),
    sh AS (SELECT domain,
                  weight / (SELECT sum(weight) FROM w) AS share
           FROM w),
    j AS (SELECT coalesce(d.domain, s.domain) AS domain,
                 coalesce(d.n_tokens, 0) AS n_tokens,
                 coalesce(s.share, 0.0) AS share
          FROM dt d FULL OUTER JOIN sh s ON d.domain = s.domain),
    p AS (SELECT domain, n_tokens, share,
                 share * 500000 AS target,
                 CASE WHEN n_tokens > 0
                      THEN least(4.0, share * 500000 / n_tokens)
                      ELSE 0.0 END AS epochs
          FROM j)
    SELECT domain, n_tokens, round(share, 6) AS share,
           round(target, 4) AS target_tokens,
           round(epochs, 6) AS epochs,
           round(epochs * n_tokens, 4) AS realized_tokens,
           round(target - epochs * n_tokens, 4) AS shortfall
    FROM p ORDER BY domain
"""

# funnel twin: the curate_keeplist CTEs with an identical
# coalesce-totalized CASE chain instead of the WHERE — first failing
# gate in pipeline order wins, 'kept' otherwise.
ORACLES["curation_funnel"] = f"""
    WITH f AS (
      SELECT doc_id, text,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             length(text) AS n_chars,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop,
             len(regexp_extract_all(lower(text), '{_DE_RE}')) AS de,
             len(regexp_extract_all(lower(text), '{_EN_RE}')) AS en,
             len(regexp_extract_all(lower(text), '{_ES_RE}')) AS es,
             len(regexp_extract_all(lower(text), '{_FR_RE}')) AS fr
      FROM documents),
    s AS (
      SELECT doc_id, text,
             round(least(n_tokens / 20.0, 1.0)
                   * least(n_alpha / greatest(n_chars, 1)::DOUBLE * 1.25, 1.0)
                   * least(n_stop / greatest(n_tokens, 1)::DOUBLE * 4.0, 1.0),
                   6) AS quality_score,
             CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                  WHEN de = greatest(de, en, es, fr) THEN 'de'
                  WHEN en = greatest(de, en, es, fr) THEN 'en'
                  WHEN es = greatest(de, en, es, fr) THEN 'es'
                  ELSE 'fr' END AS lang_pred,
             min(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
      FROM f)
    SELECT doc_id,
           CASE WHEN NOT coalesce(trim(text) <> '', false)
                  THEN 'empty'
                WHEN NOT coalesce(doc_id = keep_id, false)
                  THEN 'duplicate'
                WHEN NOT coalesce(quality_score >= 0.5, false)
                  THEN 'low_quality'
                WHEN NOT coalesce(lang_pred = 'en', false)
                  THEN 'wrong_lang'
                ELSE 'kept' END AS drop_reason,
           quality_score, lang_pred
    FROM s ORDER BY doc_id
"""

# temperature-mixing twin: the dataset_mix replay with the weight
# table coming from round(pow(n, tau) * 1e6) — integer micro-units
# (dsir micro-nat discipline), so a last-ulp pow() divergence between
# engines cannot reach the thresholds. pow(x, 0.5) is sqrt in both
# fdlibm and glibc (special-cased), so the quantized weights are
# bit-identical.
ORACLES["dataset_mix_temperature"] = """
    WITH docs AS (
      SELECT 'https://example.com/doc/' || doc_id AS url,
             CASE WHEN doc_id % 20 < 12 THEN 'web'
                  WHEN doc_id % 20 < 17 THEN 'news'
                  WHEN doc_id % 20 < 19 THEN 'code'
                  ELSE 'wiki' END AS domain,
             doc_id
      FROM documents),
    counts AS (SELECT domain, count(*) AS n FROM docs GROUP BY domain),
    w AS (SELECT domain,
                 round(pow(CAST(n AS DOUBLE), 0.5) * 1000000) AS weight
          FROM counts),
    sh AS (SELECT domain,
                  weight / (SELECT sum(weight) FROM w) AS share
           FROM w),
    j AS (SELECT coalesce(c.domain, s.domain) AS domain,
                 coalesce(c.n, 0) AS n_avail,
                 coalesce(s.share, 0.0) AS share
          FROM counts c FULL OUTER JOIN sh s ON c.domain = s.domain),
    t AS (SELECT min(n_avail / share) AS tt FROM j WHERE share > 0),
    thr AS (SELECT domain,
                   CAST(floor(CASE WHEN n_avail > 0
                                THEN share * tt / n_avail
                                ELSE 0.0 END * 1000000) AS BIGINT)
                     AS thr
            FROM j CROSS JOIN t),
    kept AS (SELECT d.domain, d.doc_id
             FROM docs d JOIN thr ON d.domain = thr.domain
             WHERE CAST('0x' || substr(md5(d.url), 1, 15) AS BIGINT)
                     % 1000000 < thr.thr)
    SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM kept GROUP BY domain ORDER BY domain
"""


def _robots_oracle() -> str:
    """Full twin of q_meta_robots_gate: identical html, IDENTICAL
    pattern constants from operators/meta.py (tag isolator + content
    pull + token tests)."""
    from dxnn_ocr_cpp_spark.operators import meta as M

    def rx(pat: str) -> str:
        return pat.replace("'", "''")

    content = (f"regexp_extract(regexp_extract(html, "
               f"'{rx(M.ROBOTS_TAG_RE)}', 0), "
               f"'{rx(M.CONTENT_ATTR_RE)}', 1)")
    return f"""
    WITH docs AS (
      SELECT doc_id,
        '<html><head><meta name="description" content="d">' ||
        CASE
          WHEN doc_id % 6 = 0
            THEN '<meta name="robots" content="noindex, follow">'
          WHEN doc_id % 6 = 1
            THEN '<meta content="NOFOLLOW" name="ROBOTS">'
          WHEN doc_id % 6 = 2
            THEN '<meta name=''robots'' content=''none''>'
          WHEN doc_id % 6 = 3 THEN ''
          WHEN doc_id % 6 = 4
            THEN '<meta name="robots" content="index, follow">'
          ELSE '<meta name="googlebot" content="noindex">'
        END || '</head><body>b</body></html>' AS html
      FROM documents),
    c AS (SELECT doc_id, {content} AS content FROM docs)
    SELECT doc_id,
           regexp_matches(content, '{rx(M.NOINDEX_RE)}')
             AS robots_noindex,
           regexp_matches(content, '{rx(M.NOFOLLOW_RE)}')
             AS robots_nofollow,
           NOT regexp_matches(content, '{rx(M.NOINDEX_RE)}')
             AS indexable
    FROM c ORDER BY doc_id
    """


ORACLES["meta_robots_gate"] = _robots_oracle()


def _script_mix_oracle() -> str:
    """Full twin of q_script_mix: identical planted text (repeat runs
    from doc_id arithmetic), IDENTICAL literal-range classes from
    textstats.SCRIPT_CLASSES via the length-difference idiom, and the
    same CASE chain for dominance (first match wins = the Spark
    when-chain)."""
    from dxnn_ocr_cpp_spark.operators.textstats import SCRIPT_CLASSES
    names = [n for n, _ in SCRIPT_CLASSES]
    cnt = ",\n             ".join(
        f"length(text) - length(regexp_replace(text, '{cls}', '', 'g'))"
        f" AS n_{name}"
        for name, cls in SCRIPT_CLASSES)
    total = " + ".join(f"n_{n}" for n in names)
    branches = "\n           ".join(
        "WHEN n_{0} > 0 AND {1} THEN '{0}'".format(
            name, " AND ".join(f"n_{name} >= n_{o}"
                               for o in names if o != name))
        for name in names)
    return f"""
    WITH docs AS (
      SELECT doc_id,
             concat_ws(' ', '123 !?',
                       repeat('ab', CAST(doc_id % 7 AS INT)),
                       repeat('юя', CAST(doc_id % 5 AS INT)),
                       repeat('αβ', CAST(doc_id % 4 AS INT)),
                       repeat('你好', CAST(doc_id % 3 AS INT)),
                       repeat('مر', CAST(doc_id % 2 AS INT)),
                       repeat('한국', CAST(doc_id % 6 AS INT))) AS text
      FROM documents),
    c AS (
      SELECT doc_id,
             {cnt}
      FROM docs),
    tot AS (SELECT *, CAST({total} AS BIGINT) AS n_script_chars FROM c)
    SELECT doc_id,
           {", ".join(f"CAST(n_{n} AS BIGINT) AS n_{n}" for n in names)},
           n_script_chars,
           CASE {branches}
           ELSE 'none' END AS dominant_script,
           CASE WHEN n_script_chars > 0
                THEN CAST(n_latin AS DOUBLE) / n_script_chars
                ELSE 0.0 END AS latin_frac
    FROM tot ORDER BY doc_id
    """


ORACLES["script_mix"] = _script_mix_oracle()

# DSIR twin: same tokenization as lm_quality's oracle, unigrams+bigrams
# WITH multiplicity, md5 bucket hashing (mixing-family '0x'||15-hex),
# add-one smoothing with the SAME ln-term order as dsir.log_ratio_table,
# micro-nat quantization, exact integer per-doc sums. Zero-gram raw docs
# ride the final LEFT JOIN with logw 0 (Spark explode_outer analog).
ORACLES["dsir_select"] = """
    WITH tok AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS w
      FROM documents WHERE trim(text) <> ''),
    grams AS (
      SELECT doc_id, unnest(w) AS g FROM tok
      UNION ALL
      SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                             for i in range(1, len(w))]) AS g
      FROM tok WHERE len(w) >= 2),
    buck AS (
      SELECT doc_id, doc_id % 7 = 0 AS is_t,
             CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 4096
               AS bucket
      FROM grams),
    tc AS (SELECT bucket, count(*) AS c FROM buck WHERE is_t
           GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS c FROM buck WHERE NOT is_t
           GROUP BY bucket),
    tot AS (SELECT CAST((SELECT coalesce(sum(c), 0) FROM tc) AS DOUBLE)
                     AS tt,
                   CAST((SELECT coalesce(sum(c), 0) FROM rc) AS DOUBLE)
                     AS tr),
    ratio AS (
      SELECT rc.bucket,
             CAST(round((ln(coalesce(tc.c, 0) + 1.0) - ln(tot.tt + 4096.0)
                         - ln(rc.c + 1.0) + ln(tot.tr + 4096.0))
                        * 1000000, 0) AS BIGINT) AS lr
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot),
    scored AS (
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(r.lr) AS BIGINT) AS logw
      FROM buck b JOIN ratio r USING (bucket)
      WHERE NOT b.is_t GROUP BY b.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(s.logw, 0) AS BIGINT) AS logw_micro
    FROM documents d LEFT JOIN scored s USING (doc_id)
    WHERE d.doc_id % 7 <> 0
    ORDER BY logw_micro DESC, d.doc_id LIMIT 40
"""


def _phrase_oracle() -> str:
    """Twin of q_phrase_search that never builds the inverted index:
    DuckDB recomputes start counts directly from the token list with a
    list_filter lambda (p is a start iff w[p+i] = phrase[i] for all i,
    1-indexed lists), so the postings-build + slot-probe path is
    certified against a straight positional scan. Phrases come from
    the same PHRASE_QUERIES constant the Spark query uses."""
    arms = []
    for ph in PHRASE_QUERIES:
        ts = ph.split()
        cond = " AND ".join(
            f"w[p + {i}] = '{t}'" for i, t in enumerate(ts))
        arms.append(f"""
      SELECT '{ph}' AS phrase, CAST(doc_id AS BIGINT) AS doc_id,
             CAST(len(list_filter(range(1, len(w) - {len(ts)} + 2),
                                  p -> {cond})) AS BIGINT) AS n_starts
      FROM tok""")
    body = "\n      UNION ALL".join(arms)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS w
      FROM documents WHERE trim(text) <> ''),
    m AS ({body})
    SELECT phrase, doc_id, n_starts FROM m
    WHERE n_starts > 0 ORDER BY phrase, doc_id
"""


def _bm25_oracle() -> str:
    """Full twin of q_bm25_rank: replays Okapi BM25 with the IDENTICAL
    constants from operators/search.py and the same integer micro-nat
    quantization points (ln -> idf_micro per term, then per-term score
    re-quantized to BIGINT before the per-doc sum). N counts ALL docs
    (matching df.count() on the unfiltered table); avgdl is the exact
    integer-ratio division, bit-identical to the Spark literal."""
    from dxnn_ocr_cpp_spark.operators.search import BM25_B, BM25_K1
    terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_TERMS)))
    return f"""
    WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    tok AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS w
      FROM documents WHERE trim(text) <> ''),
    dl AS (
      SELECT d.doc_id,
             CAST(coalesce(len(t.w), 0) AS BIGINT) AS dl
      FROM documents d LEFT JOIN tok t USING (doc_id)),
    avg AS (SELECT CAST(sum(dl) AS DOUBLE) / n.n AS avgdl
            FROM dl CROSS JOIN n GROUP BY n.n),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(w) AS token FROM tok)
      WHERE token IN ({terms}) GROUP BY doc_id, token),
    hit AS (
      SELECT doc_id, token, tf,
             CAST(count(*) OVER (PARTITION BY token) AS BIGINT)
               AS term_df
      FROM tf),
    sc AS (
      SELECT h.doc_id,
             CAST(round(ln((n.n - h.term_df + 0.5) / (h.term_df + 0.5)
                           + 1.0) * 1000000) AS BIGINT) AS idf_micro,
             CAST(h.tf AS DOUBLE) * {BM25_K1 + 1.0!r}
               / (CAST(h.tf AS DOUBLE)
                  + {BM25_K1!r} * (1.0 - {BM25_B!r}
                                   + {BM25_B!r}
                                     * CAST(d.dl AS DOUBLE) / a.avgdl))
               AS frac
      FROM hit h JOIN dl d USING (doc_id)
      CROSS JOIN n CROSS JOIN avg a),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(CAST(round(idf_micro * frac) AS BIGINT))
                  AS BIGINT) AS score_micro,
             CAST(count(*) AS BIGINT) AS n_terms_hit
      FROM sc GROUP BY doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, score_micro, n_terms_hit,
           CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)
                AS BIGINT) AS rank
    FROM per_doc ORDER BY score_micro DESC, doc_id ASC LIMIT {BM25_K}
"""


ORACLES["phrase_search"] = _phrase_oracle()
ORACLES["bm25_rank"] = _bm25_oracle()


def _cms_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.cms import cms_oracle_cells_sql
    terms = ", ".join(f"('{t}')" for t in CMS_TERMS)
    from dxnn_ocr_cpp_spark.operators.dedup import (MH_A_MULT, MH_B_MULT,
                                                    MH_P)
    probe_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, (({MH_A_MULT} * ({r} + 1)) % {MH_P}) AS a, "
        f"(({MH_B_MULT} * ({r} + 7)) % {MH_P}) AS b"
        for r in range(CMS_DEPTH))
    return ("WITH " + cms_oracle_cells_sql(
        "SELECT text FROM documents WHERE text IS NOT NULL", "text",
        depth=CMS_DEPTH, width=CMS_WIDTH) + f""",
    terms(term) AS (VALUES {terms}),
    prows AS ({probe_rows}),
    probes AS (
      SELECT t.term, p.r,
             (((CAST('0x' || substr(md5(lower(t.term)), 1, 8) AS BIGINT)
                % {MH_P}) * p.a + p.b) % {MH_P}) % {CMS_WIDTH} AS bucket
      FROM terms t CROSS JOIN prows p
    ),
    est AS (
      SELECT p.term,
             min(coalesce(g.n, CAST(0 AS BIGINT))) AS est
      FROM probes p LEFT JOIN grid g
        ON g.r = p.r AND g.bucket = p.bucket
      GROUP BY p.term
    ),
    exact_t AS (
      SELECT tok AS term, CAST(count(*) AS BIGINT) AS exact
      FROM toks WHERE tok IN (SELECT term FROM terms)
      GROUP BY tok
    )
    SELECT e.term, e.est,
           coalesce(x.exact, CAST(0 AS BIGINT)) AS exact,
           e.est >= coalesce(x.exact, CAST(0 AS BIGINT)) AS never_under
    FROM est e LEFT JOIN exact_t x USING (term)
    ORDER BY e.term""")


ORACLES["cms_term_counts"] = _cms_oracle()


def _crawl_traps_oracle() -> str:
    from dxnn_ocr_cpp_spark.operators.urls import (AUTHORITY_RE, PATH_RE,
                                                   QUERY_RE, TRAP_HEX_RE,
                                                   TRAP_NUM_RE,
                                                   TRAP_QNAME_RE)
    return f"""
    WITH urls AS (
      SELECT 'https://t' || (doc_id % 3) || '.example.org' ||
        CASE
          WHEN doc_id % 3 = 0 THEN
            '/cal/2024/' || (doc_id % 12 + 1) || '/' || (doc_id % 28 + 1)
          WHEN doc_id % 3 = 1 THEN
            '/view?sid=' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
              || '&page=' || (doc_id % 9)
          ELSE CASE WHEN doc_id % 2 = 0 THEN '/about' ELSE '/contact' END
        END AS url
      FROM documents
      UNION ALL
      SELECT 'https://t' || (doc_id % 3) || '.example.org/s/' ||
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS url
      FROM documents WHERE doc_id % 7 = 0
    ),
    keyed AS (
      SELECT
        list_element(string_split(list_element(string_split(
          lower(regexp_extract(url, '{AUTHORITY_RE}', 1)), '@'), -1),
          ':'), 1) AS host,
        (SELECT CASE WHEN p = '' THEN '/' ELSE p END FROM (
           SELECT regexp_extract(url, '{PATH_RE}', 1) AS p)) AS path,
        regexp_extract(url, '{QUERY_RE}', 1) AS q,
        url
      FROM urls
    ),
    tpl AS (
      SELECT host,
        regexp_replace(regexp_replace(path, '{TRAP_HEX_RE}', '{{H}}',
                                      'g'),
                       '{TRAP_NUM_RE}', '{{N}}', 'g') AS ptpl,
        coalesce(array_to_string(list_sort(list_filter(
          regexp_extract_all(q, '{TRAP_QNAME_RE}', 1),
          p -> p <> '')), ','), '') AS qnames,
        url
      FROM keyed WHERE host <> ''
    ),
    grouped AS (
      SELECT host,
        CASE WHEN qnames = '' THEN ptpl
             ELSE ptpl || '?' || qnames END AS template,
        CAST(count(DISTINCT url) AS BIGINT) AS n_urls
      FROM tpl GROUP BY 1, 2
    )
    SELECT host, template, n_urls,
      (template LIKE '%{{N}}%' OR template LIKE '%{{H}}%'
       OR template LIKE '%?%') AS wildcarded,
      ((template LIKE '%{{N}}%' OR template LIKE '%{{H}}%'
        OR template LIKE '%?%') AND n_urls >= 20) AS is_trap
    FROM grouped
    ORDER BY host, template"""


ORACLES["crawl_traps"] = _crawl_traps_oracle()

# host prior: raw (un-rounded) score -> micro BIGINT -> integer sums;
# the two final divisions mirror curation.host_quality_prior's op
# order exactly (IEEE multiply is commutative, so Spark's rewrite of
# m*x to x*m cannot diverge)
ORACLES["host_quality_prior"] = f"""
WITH f AS (
  SELECT 'h' || (doc_id % 17) || '.example.org' AS host,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop
  FROM documents),
q AS (
  SELECT host,
         least(n_tokens / 20.0, 1.0)
           * least(n_alpha / greatest(n_chars, 1)::DOUBLE * 1.25, 1.0)
           * least(n_stop / greatest(n_tokens, 1)::DOUBLE * 4.0, 1.0)
           AS score
  FROM f),
h AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(round(score * 1000000, 0) AS BIGINT))
              AS BIGINT) AS sum_q_micro
  FROM q GROUP BY host),
g AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS gn,
         CAST(sum(sum_q_micro) AS BIGINT) AS gs FROM h)
SELECT host, n_docs, sum_q_micro,
       round(((CAST(sum_q_micro AS DOUBLE)
               + (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)) * 20.0)
              / CAST(n_docs + 20 AS DOUBLE)) / 1000000.0, 6) AS prior
FROM h CROSS JOIN g
ORDER BY host"""


# planted-recall rows: the oracle enumerates the planted clone pairs
# by pure doc_id arithmetic (identical text -> identical signatures
# under any hash family -> guaranteed recovery; see
# _planted_clone_docs). jaccard is exactly 1.0 (identical shingle
# sets), hamming exactly 0.
ORACLES["minhash_planted_recall"] = _planted_pair_sql(
    17, 3, ",\n           CAST(1.0 AS DOUBLE) AS jaccard")
ORACLES["simhash_planted_recall"] = _planted_pair_sql(
    17, 3, ",\n           CAST(0 AS BIGINT) AS hamming")
ORACLES["winnow_planted_recall"] = _planted_pair_sql(37, 5)

# per-row task_cfg emission replay: same planted block arithmetic,
# same coalesce-fallback thresholds (box 0.5 / rec 0.0 / min_chars 3 /
# max link density 0.66 are DEFAULT_CONFIG values), same canonical
# (pos, depth, block_id) = j ordering and '\n' concat
ORACLES["task_config_mixed"] = """
WITH blocks AS (
  SELECT d.doc_id AS doc_id, j.j AS j,
         ((d.doc_id * 7 + j.j * 13) % 100) / 100.0 AS score,
         1 + (d.doc_id + j.j) % 40 AS ntc,
         (d.doc_id * (j.j + 1)) % 30 AS nlc,
         'blk' || j.j || '_' || d.doc_id AS btext,
         d.doc_id % 3 AS m
  FROM documents d CROSS JOIN (VALUES (0), (1), (2), (3)) AS j(j)),
k AS (
  SELECT *,
         (score >= CASE WHEN m = 0 THEN 0.75 ELSE 0.5 END
          AND score >= CASE WHEN m = 1 THEN 0.65 ELSE 0.0 END
          AND ntc >= CASE WHEN m = 1 THEN 12 ELSE 3 END
          AND nlc / CAST(greatest(ntc, 1) AS DOUBLE) <= 0.66) AS keep
  FROM blocks)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(m AS BIGINT) AS policy,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_spans,
       coalesce(string_agg(btext, chr(10) ORDER BY j)
                FILTER (WHERE keep), '') AS text
FROM k GROUP BY doc_id, m ORDER BY doc_id"""

# graded URL wordlist score: PRESENCE arithmetic — badalpha occurs
# iff doc_id hits %9==2, %13==5, or %11==4; riskbeta iff %7==3 or
# %11==4 — each contributes its weight once, rounded then thresholded
ORACLES["url_wordlist_score"] = """
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         round(CAST(CASE WHEN doc_id % 9 = 2 OR doc_id % 13 = 5
                              OR doc_id % 11 = 4
                         THEN 1.0 ELSE 0.0 END AS DOUBLE)
               + CAST(CASE WHEN doc_id % 7 = 3 OR doc_id % 11 = 4
                           THEN 0.4 ELSE 0.0 END AS DOUBLE), 6)
           AS url_word_score
  FROM documents)
SELECT doc_id, url_word_score,
       url_word_score >= 1.0 AS url_word_blocked
FROM s ORDER BY doc_id"""

# wordlist page gate: the oracle replays the module-built pattern
# (one source of truth) over the same planted text construction
from dxnn_ocr_cpp_spark.operators.curation import wordlist_regex

_WL_PAT = wordlist_regex(["blockedalpha", "blockedbeta gamma"])
ORACLES["wordlist_filter"] = f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' blockedalpha' ELSE '' END
         || CASE WHEN doc_id % 14 = 0
                 THEN ' blockedalpha blockedalpha' ELSE '' END
         || CASE WHEN doc_id % 11 = 3
                 THEN ' some blockedbeta gamma tail' ELSE '' END
         || CASE WHEN doc_id % 5 = 1
                 THEN ' xblockedalpha blockedalphax' ELSE '' END
           AS t2
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(t2), '{_WL_PAT}'))
            AS BIGINT) AS n_flagged,
       len(regexp_extract_all(lower(t2), '{_WL_PAT}')) = 0 AS keep
FROM t ORDER BY doc_id"""

# planted BPE: disjoint-letter words make the iterative merge loop's
# output a pure function of the document count (see _planted_bpe_docs)
# — merge 2k/2k+1 fuse the k-th most frequent word's two pairs.
# "left"/"right" quoted: DuckDB reserves them as join keywords.
ORACLES["bpe_train_planted"] = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
k AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(k))
SELECT CAST(2 * k.k AS BIGINT) AS merge_idx,
       chr(97 + 2 * k.k) AS "left",
       chr(97 + 2 * k.k + 1) AS "right",
       CAST(n.nd * (12 - k.k) AS BIGINT) AS n
FROM k CROSS JOIN n
UNION ALL
SELECT CAST(2 * k.k + 1 AS BIGINT),
       chr(97 + 2 * k.k) || chr(97 + 2 * k.k + 1), '</w>',
       CAST(n.nd * (12 - k.k) AS BIGINT)
FROM k CROSS JOIN n
ORDER BY merge_idx"""

# words 0..3 fully merged (1 symbol), 4..11 split (3 symbols):
# n_words = sum_{k<12}(12-k) = 78,
# n_tokens = (12+11+10+9)*1 + (8+7+...+1)*3 = 42 + 108 = 150
ORACLES["bpe_tokenize_planted"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(78 AS BIGINT) AS n_words,
       CAST(150 AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id"""

# streaming url-dedup: duplicates are identical rows by construction,
# so DISTINCT over the group arithmetic IS the expected output
ORACLES["stream_dedup_urls"] = """
WITH g AS (SELECT DISTINCT doc_id % 500 AS g FROM documents)
SELECT 'https://h' || (g % 17) || '.example.org/page/' || g AS url,
       CAST(1700000000 + g * 60 AS BIGINT) AS ts,
       CAST(length('planted ' || g) AS BIGINT) AS n_chars
FROM g ORDER BY url"""


def oracle_sql() -> dict[str, str]:
    # minhash_lsh_pairs / simhash_pairs / winnow_pairs / embedding_lsh_topk /
    # embedding_ivf_topk / embedding_cosine_dups_scale are deliberately
    # omitted: probabilistic candidate sets whose hash mixing DuckDB
    # cannot replay -> driver rows-only check; each has an md5-family
    # oracled twin and/or an internal exact-verify + pytest recall pin,
    # and (r4) the engine-native hash families additionally carry
    # value-level planted-recall driver rows (minhash_planted_recall /
    # simhash_planted_recall / winnow_planted_recall: clone pairs the
    # xxhash64/blake2b pipelines provably must recover).
    # bpe_train / bpe_tokenize are likewise rows-only: BPE's iterative
    # argmax is not SQL-expressible; exact parity with a sequential
    # pure-Python reference is pinned in tests/test_bpe.py.
    return dict(ORACLES)
