"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force  exact cosine top-k — broadcast the (small) query set,
               one narrow pass over the corpus, per-query top-k via
               window. Baseline and oracle.
  lsh-bucketed random-hyperplane LSH (signed projections -> bit
               signature -> banded buckets) — the 100-TB path: queries
               only meet corpus rows sharing a band bucket, so cost is
               corpus_size * (signature build) + bucket-local joins,
               never full cross-product.

Dot products use F.zip_with + F.aggregate (JVM higher-order functions,
no Python). Hyperplanes are seeded numpy, broadcast as literal arrays —
deterministic across runs/partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dxnn_ocr_cpp_spark.partitioning import ensure_min_partitions


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12))


def as_double_array(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_to: int = 4) -> DataFrame:
    """Exact top-k cosine neighbours per query (excluding self).

    queries is broadcast (it is the small side by construction — a
    handful of probe vectors against an arbitrarily large corpus);
    ranking uses (rounded sim DESC, neighbour id ASC) so the cut is
    fully deterministic and engine-independent.
    """
    c = corpus.select(F.col(id_col).alias("nb_id"),
                      as_double_array(F.col(vec_col)).alias("nb_vec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double_array(F.col(vec_col)).alias("q_vec"))
    sims = (c.join(F.broadcast(q), F.col("nb_id") != F.col("query_id"))
            .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("nb_vec")),
                                       round_to)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nb_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "nb_id", "sim"))


def hyperplanes(dim: int, n_planes: int = 64, seed: int = 42) -> list:
    """Seeded random hyperplanes (pure function of (dim, n, seed))."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim)).tolist()


def _band_buckets_udf(planes_arr, bands: int):
    """Vectorized kernel: embedding -> array<long>(bands) of packed
    bit-bucket values. One numpy matmul per Arrow batch replaces
    n_planes separate aggregate/zip_with Catalyst expressions (whose
    literal hyperplane arrays blow up codegen) — the NPU-call-shaped
    hybrid, same determinism (seeded planes, float64 matmul)."""
    planes = np.asarray(planes_arr, dtype=np.float64)
    rows_per_band = planes.shape[0] // bands
    weights = (np.uint64(1) << np.arange(rows_per_band, dtype=np.uint64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_buckets(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (M @ planes.T) >= 0                       # (n, n_planes)
        packed = (bits.reshape(n, bands, rows_per_band).astype(np.uint64)
                  * weights).sum(axis=2).astype(np.int64)  # (n, bands)
        return pd.Series(list(packed))

    return band_buckets


def cosine_dup_pairs_exact(emb: DataFrame, threshold: float = 0.4,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_to: int = 4,
                           max_rows: int = 200_000) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (a < b, sim >= threshold)
    via the all-pairs non-equi join — O(n^2) in corpus size (the plan
    is a BroadcastNestedLoop/cartesian at any size).  This exists as
    the oracle-checkable twin of cosine_dup_pairs_lsh; it is NOT the
    scale path, and it refuses corpora above max_rows rather than
    silently launching a quadratic job (the analog of the reference's
    request-size validation caps, /root/reference/server/ocr_handler.cpp:38-124).
    """
    n = emb.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_dup_pairs_exact is O(n^2); corpus has {n} rows > "
            f"max_rows={max_rows}. Use cosine_dup_pairs_lsh at scale "
            f"(banded candidates + exact-cosine verify).")
    e = emb.select(F.col(id_col).alias("id"),
                   as_double_array(F.col(vec_col)).alias("v"))
    pairs = (e.alias("x").join(e.alias("y"), F.col("x.id") < F.col("y.id"))
             .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                     F.round(cosine(F.col("x.v"), F.col("y.v")),
                             round_to).alias("sim")))
    return pairs.filter(F.col("sim") >= threshold)


def cosine_dup_pairs_lsh(emb: DataFrame, threshold: float = 0.4,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_planes: int = 32, bands: int = 8,
                         dim: int = 64, round_to: int = 4,
                         block: int = 4096) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: candidates = row pairs
    sharing >= 1 hyperplane-LSH band bucket (bucket-local — never
    O(n^2) in corpus size), verified with EXACT cosine >= threshold.
    Recall < 1.0 by design (a true pair differing in every band is
    missed; with r-bit bands, P[candidate] = 1-(1-(1-theta/pi)^r)^b) —
    the cosine twin of minhash_lsh_pairs, precision 1.0 because
    verification is exact.

    Physical shape: ONE shuffle groups vectors per (band, bucket);
    applyInPandas then computes all within-bucket pair sims as
    block-tiled numpy matmuls (BLAS, memory bounded by block^2
    regardless of bucket size) and emits ONLY pairs >= threshold, so
    the final cross-band dropDuplicates shuffles result-sized data.
    The previous self-join + dropDuplicates-before-verify formulation
    shuffled every candidate collision WITH both ride-along vectors
    (~25M x 1KB rows at sf0.1) and paid an interpreted Catalyst
    cosine per collision — measured 8.2s vs ~1s for this shape.
    Per-pair sims are order-independent (each is one 64-length dot),
    so output is deterministic under any row order within a bucket.
    Sims match the exact twin's formula term for term; only the final
    decimal rounding can differ by one 10^-round_to ulp (binary
    half-even here vs Spark's decimal HALF_UP there).
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (the diagonal-tile "
                         "triu mask relies on 0 being below it)")
    bucket_udf = _band_buckets_udf(hyperplanes(dim, n_planes), bands)
    # posexplode directly on the UDF call (see lsh_topk: a separate
    # select plans a dead duplicate ArrowEvalPython under Generate)
    pre = emb.select(F.col(id_col).alias("id"),
                     as_double_array(F.col(vec_col)).alias("v"))
    bb = pre.select(
        "id", "v",
        F.posexplode(bucket_udf(F.col("v"))).alias("band", "bucket"))
    return (bb.groupBy("band", "bucket")
            .applyInPandas(_block_pair_kernel(threshold, round_to, block),
                           "a long, b long, sim double")
            .dropDuplicates(["a", "b"]))


def _block_pair_kernel(threshold: float, round_to: int, block: int):
    """applyInPandas kernel: all within-group pair cosines >= threshold,
    as block-tiled numpy matmuls. Expects columns (id, v); shared by
    cosine_dup_pairs_lsh (groups = LSH band buckets) and semantic_dedup
    (groups = k-means cells)."""

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a": [], "b": [], "sim": []}) \
                .astype({"a": "int64", "b": "int64", "sim": "float64"})
        ids = pdf["id"].to_numpy()
        M = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in pdf["v"]])
        norms = np.linalg.norm(M, axis=1)
        outs = []
        for i in range(0, n, block):
            for j in range(i, n, block):
                # EXACTLY the cosine() Column formula: dot / max(na*nb,
                # 1e-12) — clamping the norm PRODUCT, not each norm, so
                # degenerate near-zero vectors score identically to the
                # exact all-pairs twin
                dots = M[i:i + block] @ M[j:j + block].T
                denom = np.maximum(
                    np.outer(norms[i:i + block], norms[j:j + block]),
                    1e-12)
                # np.round is binary half-even vs Spark's decimal
                # HALF_UP: sims within ~1e-12 of a .00005 decimal
                # boundary may round one ulp apart (tests compare with
                # 1e-4 tolerance for this reason)
                S = np.round(dots / denom, round_to)
                if i == j:  # upper triangle only within a diagonal tile
                    S = np.triu(S, 1)
                r, c = np.nonzero(S >= threshold)
                if len(r):
                    ia, ib = ids[r + i], ids[c + j]
                    lo = np.minimum(ia, ib)
                    hi_ = np.maximum(ia, ib)
                    keep = lo != hi_  # self-pairs via duplicate ids
                    outs.append(pd.DataFrame({
                        "a": lo[keep], "b": hi_[keep],
                        "sim": S[r, c][keep]}))
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "sim": []}) \
                .astype({"a": "int64", "b": "int64", "sim": "float64"})
        return pd.concat(outs, ignore_index=True)

    return bucket_pairs


def semantic_dedup(emb: DataFrame, threshold: float = 0.9,
                   n_lists: int = 16, iters: int = 2,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   sample_fraction: float | None = None,
                   round_to: int = 4, block: int = 4096,
                   index: tuple | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means cluster the
    embedding space, mine near-identical pairs (cosine >= threshold)
    WITHIN each cluster, connect them into duplicate groups, keep one
    representative (the min id) per group.

    Returns (id, group_id, keep) for EVERY input row: group_id is the
    component representative (= the row's own id for non-duplicates),
    keep is True exactly for representatives — filter on keep for the
    curated corpus.

    Scale shape: clustering is the candidate generator (pairs in
    different cells are never compared — the recall trade the
    published method makes by design); the per-cell pair mining is the
    same block-tiled matmul kernel as cosine_dup_pairs_lsh, ONE
    shuffle on list_id, pairs emitted result-sized. Each k-means cell
    materializes as one Arrow group, so size n_lists to the corpus
    (cells of ~10-100k vectors; the published configuration also uses
    corpus-proportional cluster counts). Grouping duplicates uses
    connected_components (O(log^2 n) rounds) rather than per-cell
    greedy pruning, so a duplicate chain across one cell is collapsed
    to exactly one survivor deterministically.

    Not SQL-replayable (k-means + hash mixing) -> rows-only driver
    check; semantics pinned by tests/test_similarity.py (planted
    duplicate groups collapse to their min id; partitioning
    invariance).

    index: pass an already-built (indexed, centroids) pair — e.g.
    ivf.read_ivf of a persisted per-corpus-snapshot index — to skip
    training entirely; clustering cost is then paid once per corpus,
    not per invocation (the same reuse contract as ivf_topk).
    """
    from dxnn_ocr_cpp_spark.operators.cc import connected_components
    from dxnn_ocr_cpp_spark.operators.ivf import build_ivf
    if index is not None:
        indexed, _ = index
    else:
        # cell assignment + Lloyd passes are the CPU-heavy stages
        emb = ensure_min_partitions(emb)
        indexed, _ = build_ivf(emb, n_lists=n_lists, iters=iters,
                               id_col=id_col, vec_col=vec_col,
                               sample_fraction=sample_fraction)
    pairs = (indexed
             .select(F.col("nb_id").alias("id"),
                     F.col("nb_vec").alias("v"), "list_id")
             .groupBy("list_id")
             .applyInPandas(_block_pair_kernel(threshold, round_to, block),
                            "a long, b long, sim double"))
    # every vector lives in exactly one cell -> each pair appears once;
    # no dropDuplicates needed (unlike the multi-band LSH path)
    comp = connected_components(pairs, "a", "b") \
        .withColumnRenamed("node", "id")
    return (emb.select(F.col(id_col).alias("id"))
            .join(comp, "id", "left")
            .select("id",
                    F.coalesce("component", F.col("id"))
                    .cast("long").alias("group_id"),
                    (F.coalesce("component", F.col("id"))
                     == F.col("id")).alias("keep")))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 32, bands: int = 8, dim: int = 64,
             round_to: int = 4) -> DataFrame:
    """Approximate top-k: candidates = rows sharing >=1 LSH band bucket
    with the query, then exact cosine + rank within candidates. Recall
    < 1.0 by design; the bench compares its hit-rate vs brute force."""
    planes = hyperplanes(dim, n_planes)
    bucket_udf = _band_buckets_udf(planes, bands)

    def with_buckets(df, idc):
        # posexplode applied DIRECTLY to the UDF call in one select —
        # materializing the array in its own select first makes Spark
        # plan a dead duplicate ArrowEvalPython under the Generate
        pre = df.select(F.col(id_col).alias(idc),
                        as_double_array(F.col(vec_col)).alias(f"{idc}_vec"))
        return pre.select(
            idc, f"{idc}_vec",
            F.posexplode(bucket_udf(F.col(f"{idc}_vec")))
             .alias("band", "bucket"))

    cb = with_buckets(corpus, "nb_id")
    qb = with_buckets(queries, "query_id")
    cand = (cb.join(F.broadcast(qb), ["band", "bucket"])
            .filter(F.col("nb_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "nb_id"]))
    sims = cand.withColumn(
        "sim", F.round(cosine(F.col("query_id_vec"), F.col("nb_id_vec")), round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nb_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "nb_id", "sim"))
