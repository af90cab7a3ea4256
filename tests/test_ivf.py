"""IVF ANN tests: determinism, cell coverage, recall floor vs brute
force, nprobe monotonicity."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.ivf import build_ivf, ivf_topk, seed_centroids
from dxnn_ocr_cpp_spark.operators.similarity import brute_force_topk

EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def index(spark, emb):
    indexed, cents = build_ivf(emb, n_lists=16, iters=2)
    return indexed.cache(), cents


def test_every_vector_assigned_once(spark, emb, index):
    indexed, _ = index
    n = emb.count()
    assert indexed.count() == n
    assert indexed.select("nb_id").distinct().count() == n
    assert indexed.agg(F.min("list_id"), F.max("list_id")).collect()[0] \
        == (0, 15) or indexed.select("list_id").distinct().count() >= 8


def test_centroids_deterministic(spark, emb):
    a = seed_centroids(emb, 8)
    b = seed_centroids(emb, 8)
    assert a == b


def test_recall_floor_and_nprobe_monotone(spark, emb, index):
    indexed, cents = index
    q = emb.filter("vec_id < 20")
    bf = {(r["query_id"], r["nb_id"])
          for r in brute_force_topk(emb, q, k=5).collect()}
    recalls = []
    for nprobe in (4, 8, 16):
        iv = {(r["query_id"], r["nb_id"])
              for r in ivf_topk(indexed, cents, q, k=5, nprobe=nprobe).collect()}
        recalls.append(len(bf & iv) / len(bf))
    assert recalls[0] >= 0.4              # useful even at nprobe=4/16
    assert recalls == sorted(recalls)     # more probes never hurt
    assert recalls[2] == 1.0              # nprobe=n_lists == exhaustive


def test_lsh_recall_floor(spark, emb):
    """Hyperplane-LSH hit-rate vs the exact top-k (the docstring's
    promised comparison): measured 0.60 at sf0.01 with the default
    32-plane/8-band config; pin a floor with margin."""
    from dxnn_ocr_cpp_spark.operators.similarity import lsh_topk
    q = emb.filter("vec_id < 8")
    bf = {(r.query_id, r.nb_id)
          for r in brute_force_topk(emb, q, k=5).collect()}
    ls = {(r.query_id, r.nb_id) for r in lsh_topk(emb, q, k=5).collect()}
    assert len(bf & ls) / len(bf) >= 0.45
