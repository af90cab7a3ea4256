"""Unit tests for the CCNet-style unigram-LM quality scorer
(operators/lm.py): hand-computed probabilities, empty-doc handling,
deterministic vocabulary cutoff, and the broadcast-join plan shape.
"""

import math

import pytest

from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.lm import (
    lm_quality, score_documents, train_unigram_lm)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, ""),
        (3, "   "),               # whitespace-only == empty
        (4, "zzz qqq"),           # all-OOV once vocab is capped
        (5, "THE  The the"),      # case/ws-collapse -> 3x 'the'
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_logprobs(spark, corpus):
    vocab, total, kept = train_unigram_lm(corpus, vocab_size=1000)
    # tokens: doc0 6, doc1 3, doc4 2, doc5 3 -> T = 14
    assert total == 14
    counts = {r["token"]: r["c"] for r in vocab.collect()}
    assert counts["the"] == 6 and counts["sat"] == 2 and counts["zzz"] == 1
    assert kept == len(counts)

    out = {r["doc_id"]: r for r in
           score_documents(corpus, vocab, total, kept).collect()}
    denom = math.log(total + kept + 1)

    def lp(c):
        return math.log(c + 1) - denom

    exp0 = (lp(6) * 2 + lp(1) * 3 + lp(2)) / 6   # the,cat,sat,on,the,mat
    assert out[0]["n_tokens"] == 6
    assert out[0]["avg_logp"] == pytest.approx(round(exp0, 4), abs=1e-9)
    exp5 = lp(6)                                  # three 'the'
    assert out[5]["avg_logp"] == pytest.approx(round(exp5, 4), abs=1e-9)


def test_empty_docs_survive_with_zero_score(spark, corpus):
    out = {r["doc_id"]: r for r in lm_quality(corpus).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    for d in (2, 3):
        assert out[d]["n_tokens"] == 0
        assert out[d]["avg_logp"] == 0.0
        assert out[d]["keep"] is False   # gated by n_tokens, not score


def test_vocab_cutoff_is_deterministic(spark, corpus):
    # vocab_size=2: 'the'(6) then 'sat'(2); everything else OOV
    vocab, total, kept = train_unigram_lm(corpus, vocab_size=2)
    toks = sorted(r["token"] for r in vocab.collect())
    assert toks == ["sat", "the"] and kept == 2
    out = {r["doc_id"]: r for r in
           score_documents(corpus, vocab, total, kept).collect()}
    denom = math.log(total + kept + 1)
    # doc4 all-OOV: both tokens c=0
    assert out[4]["avg_logp"] == pytest.approx(
        round(math.log(1.0) - denom, 4), abs=1e-9)


def test_tie_break_on_token_string(spark):
    # equal counts: cutoff must keep the lexicographically smaller token
    df = spark.createDataFrame(
        [(0, "bb aa"), (1, "aa bb")], "doc_id long, text string")
    vocab, _, kept = train_unigram_lm(df, vocab_size=1)
    assert kept == 1
    assert vocab.collect()[0]["token"] == "aa"


def test_score_plan_broadcasts_vocab(spark, corpus):
    vocab, total, kept = train_unigram_lm(corpus, vocab_size=8)
    plan = score_documents(corpus, vocab, total, kept)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ppl_buckets_terciles(spark):
    """Head = most fluent third (highest avg_logp); empty docs are
    labelled, never dropped; tercile sizes balance on distinct scores."""
    from dxnn_ocr_cpp_spark.operators.lm import (lm_quality,
                                                 ppl_bucket_documents)
    rows = [(i, " ".join(["common"] * 5 + [f"rare{i}"] * i))
            for i in range(1, 10)] + [(99, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ppl_bucket_documents(lm_quality(df)).collect()}
    assert out[99]["ppl_bucket"] == "empty"
    scored = [(i, out[i]["avg_logp"]) for i in range(1, 10)]
    by_logp = sorted(scored, key=lambda t: t[1])
    buckets = [out[i]["ppl_bucket"] for i, _ in by_logp]
    # ascending logp must sweep tail -> middle -> head, in order
    assert buckets == sorted(buckets, key=("tail", "middle", "head").index)
    assert buckets[0] == "tail" and buckets[-1] == "head"
    assert set(buckets) == {"tail", "middle", "head"}
