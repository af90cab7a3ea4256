"""DSIR importance resampling (operators/dsir.py).

Pins: gram universe (unigrams+bigrams WITH multiplicity), selection
behavior (target-like docs outrank target-unlike ones), the F8
empty-doc invariant, partitioning invariance of the integer micro-nat
weights, and the no-cartesian / broadcast-ratio plan shape.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators import dsir


TARGETY = "the quick brown fox jumps over the lazy dog"
RAWLIKE = "the quick brown fox naps under the lazy dog"
JUNKY = "zzz qqq kkk www zzz qqq kkk www vvv nnn"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_array_unigrams_and_bigrams(spark):
    df = _df(spark, [(1, "a b a")])
    [row] = df.select(dsir.gram_array("text").alias("g")).collect()
    assert row["g"] == ["a", "b", "a", "a b", "b a"]


def test_gram_array_short_and_empty_docs(spark):
    df = _df(spark, [(1, "solo"), (2, ""), (3, "   ")])
    got = {r["doc_id"]: r["g"] for r in
           df.select("doc_id",
                     dsir.gram_array("text").alias("g")).collect()}
    assert got[1] == ["solo"]       # no bigrams from a 1-token doc
    assert got[2] == [] and got[3] == []


def test_select_prefers_target_like_docs(spark):
    target = _df(spark, [(100 + i, TARGETY) for i in range(3)])
    raw = _df(spark, [(1, RAWLIKE), (2, JUNKY), (3, RAWLIKE), (4, JUNKY)])
    picked = [r["doc_id"]
              for r in dsir.dsir_select(raw, target, k=2).collect()]
    assert sorted(picked) == [1, 3]


def test_scores_are_higher_for_shared_vocabulary(spark):
    target = _df(spark, [(100, TARGETY)])
    raw = _df(spark, [(1, RAWLIKE), (2, JUNKY)])
    tc = dsir.bucket_counts(target)
    rc = dsir.bucket_counts(raw)
    ratio = dsir.log_ratio_table(tc, rc)
    got = {r["doc_id"]: r for r in
           dsir.importance_scores(raw, ratio).collect()}
    assert got[1]["logw_micro"] > got[2]["logw_micro"]
    # 9 tokens -> 9 unigrams + 8 bigrams
    assert got[1]["n_grams"] == 17


def test_empty_doc_kept_with_zero_weight(spark):
    target = _df(spark, [(100, TARGETY)])
    raw = _df(spark, [(1, RAWLIKE), (2, "")])
    tc = dsir.bucket_counts(target)
    ratio = dsir.log_ratio_table(tc, dsir.bucket_counts(raw))
    got = {r["doc_id"]: r for r in
           dsir.importance_scores(raw, ratio).collect()}
    assert got[2]["n_grams"] == 0 and got[2]["logw_micro"] == 0


def test_weights_invariant_under_partitioning(spark):
    rows = [(i, [TARGETY, RAWLIKE, JUNKY][i % 3] + f" tail{i % 5}")
            for i in range(60)]
    target = _df(spark, rows[:20])
    raw = _df(spark, rows[20:])
    ratio = dsir.log_ratio_table(dsir.bucket_counts(target),
                                 dsir.bucket_counts(raw))
    a = sorted(map(tuple, dsir.importance_scores(raw, ratio).collect()))
    b = sorted(map(tuple, dsir.importance_scores(
        raw.repartition(7), ratio).collect()))
    assert a == b  # integer micro-nat sums: order-independent, exact


def test_xxhash_family_runs(spark):
    target = _df(spark, [(100, TARGETY)])
    raw = _df(spark, [(1, RAWLIKE), (2, JUNKY)])
    picked = dsir.dsir_select(raw, target, k=1,
                              hash_family="xxhash64").collect()
    assert [r["doc_id"] for r in picked] == [1]
    with pytest.raises(ValueError):
        dsir.bucket_counts(raw, hash_family="sha9000").collect()


def test_plan_broadcasts_ratio_no_cartesian(spark):
    target = _df(spark, [(100, TARGETY)])
    raw = _df(spark, [(1, RAWLIKE), (2, JUNKY)])
    ratio = dsir.log_ratio_table(dsir.bucket_counts(target),
                                 dsir.bucket_counts(raw))
    plan = dsir.importance_scores(raw, ratio)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus -> ratio-table probe
    assert "CartesianProduct" not in plan
    # the only BNL joins allowed are the 1-row totals crossJoins in
    # log_ratio_table (the mixing.py broadcast-scalar idiom); the
    # corpus-side gram stream must never feed one
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_fused_fit_matches_two_pass(spark):
    rows = [(i, [TARGETY, RAWLIKE, JUNKY][i % 3] + f" t{i % 4}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("is_target", F.col("doc_id") % 5 == 0)
    two = dsir.log_ratio_table(
        dsir.bucket_counts(df.filter("is_target")),
        dsir.bucket_counts(df.filter("NOT is_target")))
    fused = dsir.fit_log_ratios(df)
    assert sorted(map(tuple, two.collect())) == \
        sorted(map(tuple, fused.collect()))
