"""TF-IDF keywords: df/idf semantics, integer-exact scoring, total
tie-break, empty-doc absence, and the three-exchange plan bound."""

import math

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.tfidf import (IDF_MICRO_SCALE,
                                                tfidf_topk)

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "banana banana banana"),
    (3, "   "),                      # whitespace-only -> no rows
]


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return tfidf_topk(df, k=2).collect()


def test_df_and_idf(rows):
    by = {(r["doc_id"], r["token"]): r for r in rows}
    r = by[(0, "apple")]
    assert (r["tf"], r["df"]) == (2, 1)
    assert r["idf_micro"] == round(math.log(4 / 1) * IDF_MICRO_SCALE)
    assert r["score_micro"] == 2 * r["idf_micro"]
    # banana is in 3 of 4 docs
    assert by[(2, "banana")]["df"] == 3


def test_rank_is_total_and_score_ordered(rows):
    doc0 = sorted((r for r in rows if r["doc_id"] == 0),
                  key=lambda r: r["rank"])
    assert [r["token"] for r in doc0] == ["apple", "banana"]
    assert doc0[0]["score_micro"] > doc0[1]["score_micro"]


def test_empty_doc_absent(rows):
    assert all(r["doc_id"] != 3 for r in rows)


def test_ubiquitous_token_scores_zero(spark):
    df = spark.createDataFrame([(0, "x a"), (1, "x b")],
                               "doc_id long, text string")
    out = {(r["doc_id"], r["token"]): r for r in
           tfidf_topk(df, k=5).collect()}
    assert out[(0, "x")]["idf_micro"] == 0
    # zero-score tokens still rank (tie-break by token asc)
    assert out[(0, "x")]["rank"] == 2


def test_plan_three_exchanges_no_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (tfidf_topk(df, k=2, n_docs=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 3
    assert "EvalPython" not in plan
