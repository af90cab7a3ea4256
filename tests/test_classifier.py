"""Hashed-ngram integer perceptron: learnability on separable classes,
exact determinism under repartitioning (the no-floats contract),
empty-doc F8 handling, and the zero-shuffle inference plan pin."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.classifier import (feature_buckets,
                                                     score_documents,
                                                     train_perceptron)

EN = "the quick brown fox jumps over the lazy dog near the old barn"
DE = "der schnelle braune fuchs springt über den faulen hund am zaun"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i,
             (EN if i % 2 == 0 else DE) + f" t{i % 7}",
             1 if i % 2 == 0 else -1)
            for i in range(120)] + [(120, "", 1)]   # empty doc rides along
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


@pytest.fixture(scope="module")
def weights(corpus):
    return train_perceptron(corpus, n_buckets=256, iters=3)


def test_separable_classes_reach_full_train_accuracy(corpus, weights):
    sc = score_documents(corpus, weights).join(
        corpus.select("doc_id", "y"), "doc_id")
    wrong = sc.filter(
        (F.col("pred") != (F.col("y") > 0)) & (F.col("doc_id") != 120))
    assert wrong.count() == 0


def test_training_is_partitioning_invariant(corpus, weights):
    # integer gradient sums are order-independent -> bit-equal weights
    # whatever the physical layout
    w1 = train_perceptron(corpus.repartition(1), n_buckets=256, iters=3)
    w16 = train_perceptron(corpus.repartition(16), n_buckets=256, iters=3)
    assert w1 == w16 == weights


def test_empty_doc_scores_zero_not_dropped(corpus, weights):
    row = (score_documents(corpus, weights)
           .filter(F.col("doc_id") == 120).collect())
    assert len(row) == 1                      # F8: the row survives
    assert row[0]["score"] == 0 and row[0]["pred"] is False


def test_inference_plan_is_map_only(corpus, weights):
    plan = (score_documents(corpus, weights)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan             # zero shuffle
    assert "ArrowEvalPython" not in plan      # zero Python
    assert "BatchEvalPython" not in plan


def test_feature_buckets_multiplicity_and_range(spark):
    df = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    bkts = feature_buckets(df, n_buckets=16).collect()[0]["bkts"]
    assert len(bkts) == 3                     # counts, not a set
    assert bkts[0] == bkts[1]                 # same token -> same bucket
    assert all(0 <= b < 16 for b in bkts)
