"""Domain-weighted dataset mixing: feasibility-capped rate
arithmetic, target-share realization, determinism/stability under
corpus growth, hash-family agreement, and the scale shape (corpus
side broadcast-join only, zero corpus shuffle).
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.mixing import (SCALE, mix_rates,
                                                 mix_sample)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(f"https://example.com/d{i}",
             "web" if i % 10 < 6 else ("code" if i % 10 < 9
                                       else "reference"), i)
            for i in range(3000)]
    return spark.createDataFrame(rows, "url string, domain string, id long")


@pytest.fixture(scope="module")
def weights(spark):
    return spark.createDataFrame(
        [("web", 0.5), ("code", 0.3), ("reference", 0.2)],
        "domain string, weight double")


class TestRates:
    def test_feasibility_bound(self, corpus, weights):
        counts = corpus.groupBy("domain").count()
        r = {x["domain"]: x for x in
             mix_rates(counts, weights).collect()}
        # reference is the scarce domain: 300 avail / 0.2 share ->
        # total 1500; its rate must be exactly 1.0 (fully consumed)
        assert r["reference"]["rate"] == pytest.approx(1.0)
        assert r["web"]["rate"] == pytest.approx(0.5 * 1500 / 1800)
        assert r["code"]["rate"] == pytest.approx(0.3 * 1500 / 900)
        assert all(0.0 <= x["rate"] <= 1.0 for x in r.values())

    def test_budget_clamp(self, corpus, weights):
        counts = corpus.groupBy("domain").count()
        r = {x["domain"]: x["rate"] for x in
             mix_rates(counts, weights, budget=150).collect()}
        assert r["reference"] == pytest.approx(0.2 * 150 / 300)

    def test_unweighted_domain_excluded(self, spark, weights):
        counts = spark.createDataFrame(
            [("web", 100), ("spamdomain", 9000)], "domain string, n long")
        r = {x["domain"]: x["rate"] for x in
             mix_rates(counts, weights).collect()}
        assert r["spamdomain"] == 0.0
        # weighted-but-absent domains zero the feasible total
        assert r["web"] == 0.0 and r["code"] == 0.0


class TestSample:
    def test_realized_shares_near_target(self, corpus, weights):
        counts = corpus.groupBy("domain").count()
        kept = mix_sample(corpus, mix_rates(counts, weights))
        got = {r["domain"]: r["n"] for r in
               kept.groupBy("domain").agg(F.count("*").alias("n"))
               .collect()}
        total = sum(got.values())
        # scarce domain fully consumed; others within hash noise of
        # their target share of the realized total
        assert got["reference"] == 300
        assert abs(got["web"] / total - 0.5) < 0.05
        assert abs(got["code"] / total - 0.3) < 0.05

    def test_deterministic_and_stable_under_growth(self, spark, corpus,
                                                   weights):
        counts = corpus.groupBy("domain").count()
        rates = mix_rates(counts, weights)
        a = {r["url"] for r in mix_sample(corpus, rates).collect()}
        b = {r["url"] for r in mix_sample(
            corpus.repartition(7), rates).collect()}
        assert a == b  # partition-order independence
        # halving the rates keeps a SUBSET of the same keys (threshold
        # monotonicity — the property RNG sampling lacks)
        half = rates.withColumn("rate", F.col("rate") / 2)
        c = {r["url"] for r in mix_sample(corpus, half).collect()}
        assert c <= a

    def test_family_agreement_on_shares(self, corpus, weights):
        counts = corpus.groupBy("domain").count()
        rates = mix_rates(counts, weights)
        for fam in ("xxhash64", "md5"):
            kept = mix_sample(corpus, rates, hash_family=fam)
            n = kept.count()
            assert abs(n - 1500) < 120, (fam, n)

    def test_corpus_side_no_shuffle(self, corpus, weights):
        counts = corpus.groupBy("domain").count()
        plan = mix_sample(corpus, mix_rates(counts, weights)) \
            ._jdf.queryExecution().executedPlan().toString()
        # corpus relation joins the rate table via broadcast hash —
        # its rows never shuffle (the SortMergeJoin / scalar-cross
        # nodes in the plan all sit on the tiny rate-table side,
        # under the BroadcastExchange)
        assert "BroadcastHashJoin" in plan
        for bad in ("CartesianProduct", "ArrowEval", "BatchEvalPython"):
            assert bad not in plan
