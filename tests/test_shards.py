"""Training-shard packing (operators/shards.py): the bucketed
distributed prefix sum must equal a naive single-sequence cumsum."""

import random

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.shards import pack_shards, shard_manifest

T = 1000  # shard token budget in tests


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    # non-contiguous ids (gaps + empty buckets) to prove the bucket
    # decomposition does not assume dense keys
    rows = [(i * 3 + rng.randrange(2), rng.randrange(1, 300))
            for i in range(400)]
    ids = set()
    rows = [(i, n) for i, n in rows if not (i in ids or ids.add(i))]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def ref_pack(rows):
    out, cum = {}, 0
    for i, n in sorted(rows):
        out[i] = (cum, cum // T)
        cum += n
    return out


def test_matches_sequential_reference(spark, docs):
    rows = [(r["doc_id"], r["n_tokens"]) for r in docs.collect()]
    want = ref_pack(rows)
    got = {r["doc_id"]: (r["cum_tokens"], r["shard_id"])
           for r in pack_shards(docs, shard_tokens=T,
                                bucket_width=32).collect()}
    assert got == want


def test_bucket_width_is_internal_only(spark, docs):
    a = sorted(map(tuple, pack_shards(
        docs, shard_tokens=T, bucket_width=7).collect()))
    b = sorted(map(tuple, pack_shards(
        docs, shard_tokens=T, bucket_width=4096).collect()))
    assert a == b


def test_partitioning_invariance(spark, docs):
    a = sorted(map(tuple, pack_shards(
        docs.repartition(1), shard_tokens=T).collect()))
    b = sorted(map(tuple, pack_shards(
        docs.repartition(13), shard_tokens=T).collect()))
    assert a == b


def test_manifest_totals(spark, docs):
    man = shard_manifest(docs, shard_tokens=T, bucket_width=32)
    rows = man.collect()
    total = docs.agg(F.sum("n_tokens")).first()[0]
    assert sum(r["total_tokens"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # greedy no-split rule: every shard except possibly the last holds
    # >= the budget minus its largest doc (i.e. it was closed because
    # the NEXT doc crossed the budget)
    by_id = sorted(rows, key=lambda r: r["shard_id"])
    for r in by_id[:-1]:
        assert r["total_tokens"] + 300 >= T  # 300 = max doc size above
    # shard ids are contiguous from 0
    assert [r["shard_id"] for r in by_id] == list(range(len(by_id)))


def test_bad_params_rejected(docs):
    with pytest.raises(ValueError):
        pack_shards(docs, shard_tokens=0)
    with pytest.raises(ValueError):
        pack_shards(docs, bucket_width=-1)
