"""IVF (inverted-file) approximate nearest neighbour index.

The third ANN tier (after brute-force and hyperplane-LSH in
similarity.py), and the one real vector stores use at scale: partition
the corpus into n_lists Voronoi cells around centroids; a query only
scans the nprobe nearest cells.

Spark shape (all deterministic, no MLlib dependency):
  * centroid seeding: the n_lists vectors whose ids hash smallest
    (xxhash64 order — a seeded, data-independent sample);
  * Lloyd refinement: K iterations of assign (argmin, pure Column
    exprs) + recenter (posexplode -> groupBy(list, dim) avg). Centroid
    tables are tiny (n_lists x dim) and collected to the driver between
    iterations — the only driver traffic;
  * index = corpus + list_id column, written partitioned by list_id at
    scale (Iceberg bucket/identity partition -> cell pruning at read);
  * query: nprobe nearest cells per query via the same centroid
    literals, candidates joined on list_id (broadcast query side),
    exact cosine re-rank within candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dxnn_ocr_cpp_spark.operators.similarity import as_double_array, cosine


def _argmax(arr):
    # first max wins -> deterministic ties
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def _cell_assign_udf(centroids: list):
    """Vectorized nearest-centroid assignment: one numpy matmul per
    Arrow batch; first-max-wins ties (np.argmax) match _argmax."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(
        np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    dim = Cn.shape[1]

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = [None] * n  # null/ragged embeddings -> null list_id
        rows, idxs = [], []
        for i, v in enumerate(vecs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape == (dim,):
                rows.append(a)
                idxs.append(i)
        if rows:
            M = np.asarray(rows)
            Mn = M / np.maximum(
                np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            for i, lid in zip(idxs, (Mn @ Cn.T).argmax(axis=1)):
                out[i] = int(lid)
        return pd.Series(out, dtype="object")

    return assign


def _probe_cells_udf(centroids: list, nprobe: int):
    """array<int> of the nprobe nearest cells per query vector — one
    numpy matmul per Arrow batch on the (tiny, broadcast) query side.
    Replaces an n_lists x dim literal cosine expression tree whose
    codegen compile time dwarfed its execution (gotcha: n-expression
    Catalyst chains over literal arrays).  Ties broken by higher cell
    id first, matching the previous array_sort/reverse formulation."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    dim = Cn.shape[1]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape != (dim,):
                out.append(None)
                continue
            an = a / max(np.linalg.norm(a), 1e-12)
            sims = Cn @ an
            # stable sort on (-sim, -idx): desc sim, desc id on ties
            idx = np.arange(len(sims))
            order = np.lexsort((-idx, -sims))
            out.append([int(i) for i in order[:nprobe]])
        return pd.Series(out)

    return probe


def seed_centroids(corpus: DataFrame, n_lists: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    rows = (corpus
            .select(F.col(id_col).alias("id"),
                    as_double_array(F.col(vec_col)).alias("v"))
            .withColumn("h", F.xxhash64(F.col("id")))
            .orderBy("h").limit(n_lists).collect())
    return [r["v"] for r in rows]


def lloyd_refine(corpus: DataFrame, centroids: list, iters: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 sample_fraction: float | None = None,
                 seed: int = 42) -> list:
    """K-means refinement of the seed centroids.

    sample_fraction: train on a seeded Bernoulli sample of the corpus
    instead of every row — the standard IVF practice (centroid quality
    converges long before the full corpus is seen; FAISS trains on
    ~max(10k, 50*n_lists) vectors regardless of corpus size).  At 10^12
    rows the full-corpus posexplode recenter pass is x dim the corpus —
    always set this at scale."""
    vecs = corpus.select(as_double_array(F.col(vec_col)).alias("v"))
    if sample_fraction is not None and sample_fraction < 1.0:
        vecs = vecs.sample(fraction=sample_fraction, seed=seed)
    for _ in range(iters):
        assigned = vecs.withColumn(
            "list_id", _cell_assign_udf(centroids)(F.col("v")))
        means = (assigned
                 .select("list_id", F.posexplode("v").alias("dim", "x"))
                 # rounded: distributed float avg merges partial sums in
                 # shuffle-fetch arrival order, so raw low-order bits are
                 # run-dependent; 1e-9 quantization shrinks (does not
                 # eliminate: a partial-sum reorder can still move an
                 # average across a rounding boundary) the window for
                 # run-to-run centroid drift.  For guaranteed-identical
                 # cells across runs, persist the index once with
                 # write_ivf and reuse it — that is the supported
                 # determinism contract.
                 .groupBy("list_id", "dim").agg(F.round(F.avg("x"), 9).alias("m"))
                 .groupBy("list_id")
                 .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                      .alias("c"))
                 .collect())
        new = {r["list_id"]: [e["m"] for e in r["c"]] for r in means}
        # empty cells keep their previous centroid
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return centroids


def build_ivf(corpus: DataFrame, n_lists: int = 16, iters: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample_fraction: float | None = None
              ) -> tuple[DataFrame, list]:
    """-> (indexed corpus with list_id, centroids). At cluster scale,
    write the result partitioned by list_id so queries prune cells at
    the scan (write_ivf below; Iceberg identity-partition analog)."""
    centroids = seed_centroids(corpus, n_lists, id_col, vec_col)
    centroids = lloyd_refine(corpus, centroids, iters, id_col, vec_col,
                             sample_fraction=sample_fraction)
    indexed = (corpus
               .select(F.col(id_col).alias("nb_id"),
                       as_double_array(F.col(vec_col)).alias("nb_vec"))
               .withColumn("list_id",
                           _cell_assign_udf(centroids)(F.col("nb_vec"))))
    return indexed, centroids


def write_ivf(corpus: DataFrame, path: str, n_lists: int = 16,
              iters: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding",
              sample_fraction: float | None = None) -> None:
    """Train once, persist the index: corpus+list_id written
    PARTITIONED BY list_id (so a probe query's broadcast join prunes
    cells at the scan via dynamic partition pruning), centroids as a
    tiny sidecar table.  This is the production IVF shape — training
    cost is paid once per corpus snapshot, not per query
    (/root/reference caches its compiled model per device the same way,
    dxrt engine init vs per-request inference)."""
    indexed, centroids = build_ivf(corpus, n_lists, iters, id_col,
                                   vec_col, sample_fraction)
    spark = corpus.sparkSession
    (indexed.repartition("list_id")
     .write.partitionBy("list_id").mode("overwrite")
     .parquet(f"{path}/index"))
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    (spark.createDataFrame(cent_rows, "list_id int, centroid array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))


_READ_CACHE: dict = {}


def _sidecar_version(path: str) -> float:
    """mtime of the centroid sidecar's _SUCCESS marker — changes on
    every write_ivf overwrite, so the memo below can never serve
    centroids from a previous index generation."""
    import os
    try:
        return os.path.getmtime(f"{path}/centroids/_SUCCESS")
    except OSError:
        return -1.0


def read_ivf(spark, path: str) -> tuple[DataFrame, list]:
    """-> (indexed DataFrame, centroids) from a write_ivf directory.
    The centroid sidecar collect is memoized per (path, sidecar
    version) — an engine holds its index open rather than re-listing
    tiny parquet files per probe, but a retrain (write_ivf overwrite
    of the same path) bumps the _SUCCESS mtime and invalidates the
    memo, so stale centroids can never pair with a fresh index."""
    key = (path, _sidecar_version(path))
    if key not in _READ_CACHE:
        cents = (spark.read.parquet(f"{path}/centroids")
                 .orderBy("list_id").collect())
        # evict superseded generations of this path only
        for k in [k for k in _READ_CACHE if k[0] == path]:
            del _READ_CACHE[k]
        _READ_CACHE[key] = [list(r["centroid"]) for r in cents]
    indexed = spark.read.parquet(f"{path}/index")
    return indexed, _READ_CACHE[key]


def ivf_topk(indexed: DataFrame, centroids: list, queries: DataFrame,
             k: int = 5, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_to: int = 4) -> DataFrame:
    """Top-k per query scanning only nprobe cells. Recall < 1 by
    design; tests measure it against brute force."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double_array(F.col(vec_col)).alias("q_vec"))
    q = q.withColumn("list_id",
                     F.explode(_probe_cells_udf(centroids, nprobe)
                               (F.col("q_vec"))))
    cand = indexed.join(F.broadcast(q), "list_id") \
                  .filter(F.col("nb_id") != F.col("query_id"))
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("q_vec"), F.col("nb_vec")), round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nb_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "nb_id", "sim"))
