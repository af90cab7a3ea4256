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


def _centroid_sims(vec, centroids: list):
    """array<double> of cosine sims to each centroid literal — used on
    the tiny QUERY side only; the corpus side uses the matmul kernel
    below (n_lists separate aggregate/zip_with expressions over literal
    arrays blow up codegen exactly like the pre-kernel hyperplane LSH)."""
    sims = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        sims.append(cosine(vec, lit))
    return F.array(*sims)


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


def seed_centroids(corpus: DataFrame, n_lists: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    rows = (corpus
            .select(F.col(id_col).alias("id"),
                    as_double_array(F.col(vec_col)).alias("v"))
            .withColumn("h", F.xxhash64(F.col("id")))
            .orderBy("h").limit(n_lists).collect())
    return [r["v"] for r in rows]


def lloyd_refine(corpus: DataFrame, centroids: list, iters: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    vecs = corpus.select(as_double_array(F.col(vec_col)).alias("v"))
    for _ in range(iters):
        assigned = vecs.withColumn(
            "list_id", _cell_assign_udf(centroids)(F.col("v")))
        means = (assigned
                 .select("list_id", F.posexplode("v").alias("dim", "x"))
                 # rounded: distributed float avg merges partial sums in
                 # shuffle-fetch arrival order, so raw low-order bits are
                 # run-dependent; 1e-9 quantization makes the centroids
                 # (and every downstream cell assignment) bit-stable
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
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> tuple[DataFrame, list]:
    """-> (indexed corpus with list_id, centroids). At cluster scale,
    write the result partitioned by list_id so queries prune cells at
    the scan (Iceberg identity-partition on list_id)."""
    centroids = seed_centroids(corpus, n_lists, id_col, vec_col)
    centroids = lloyd_refine(corpus, centroids, iters, id_col, vec_col)
    indexed = (corpus
               .select(F.col(id_col).alias("nb_id"),
                       as_double_array(F.col(vec_col)).alias("nb_vec"))
               .withColumn("list_id",
                           _cell_assign_udf(centroids)(F.col("nb_vec"))))
    return indexed, centroids


def ivf_topk(indexed: DataFrame, centroids: list, queries: DataFrame,
             k: int = 5, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_to: int = 4) -> DataFrame:
    """Top-k per query scanning only nprobe cells. Recall < 1 by
    design; tests measure it against brute force."""
    n_lists = len(centroids)
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double_array(F.col(vec_col)).alias("q_vec"))
    sims = _centroid_sims(F.col("q_vec"), centroids)
    # top-nprobe list ids: zip(sim, idx) sorts by sim then idx — take tail
    zipped = F.arrays_zip(sims.alias("s"),
                          F.array(*[F.lit(i) for i in range(n_lists)]).alias("i"))
    probes = F.slice(F.reverse(F.array_sort(zipped)), 1, nprobe)
    q = q.withColumn("list_id", F.explode(probes.getField("i")))
    cand = indexed.join(F.broadcast(q), "list_id") \
                  .filter(F.col("nb_id") != F.col("query_id"))
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("q_vec"), F.col("nb_vec")), round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nb_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "nb_id", "sim"))
