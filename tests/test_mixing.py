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


class TestTemperature:
    def test_tau_one_is_proportional(self, spark, corpus):
        # tau=1: weights equal the natural shares -> every rate is the
        # SAME constant (no domain rebalanced relative to another)
        from dxnn_ocr_cpp_spark.operators.mixing import (
            mix_rates, temperature_weights)
        counts = corpus.groupBy("domain").count()
        rates = mix_rates(counts, temperature_weights(counts, tau=1.0))
        vals = [x["rate"] for x in rates.collect()]
        assert max(vals) == pytest.approx(min(vals))
        assert max(vals) == pytest.approx(1.0)  # feasibility cap

    def test_tau_zero_is_uniform(self, spark, corpus):
        # tau=0: every represented domain gets equal weight -> the
        # realized mix is uniform, capped by the scarcest domain
        from dxnn_ocr_cpp_spark.operators.mixing import (
            mix_rates, mix_sample, temperature_weights)
        counts = corpus.groupBy("domain").count()
        rates = mix_rates(counts, temperature_weights(counts, tau=0.0))
        kept = mix_sample(corpus, rates).groupBy("domain").count()
        n = {x["domain"]: x["count"] for x in kept.collect()}
        # scarcest domain (reference, 300) is fully kept; each other
        # domain contributes ~300 too (hash sampling is +-2% at n=300)
        assert n["reference"] == 300
        for d in ("web", "code"):
            assert abs(n[d] - 300) <= 25

    def test_flattening_monotone(self, spark, corpus):
        # 0 < tau < 1 sits between proportional and uniform: the rare
        # domain's share of the mix grows as tau falls
        from dxnn_ocr_cpp_spark.operators.mixing import (
            mix_rates, mix_sample, temperature_weights)
        counts = corpus.groupBy("domain").count()

        def ref_share(tau):
            rates = mix_rates(counts, temperature_weights(counts, tau))
            kept = mix_sample(corpus, rates).groupBy("domain").count()
            n = {x["domain"]: x["count"] for x in kept.collect()}
            return n.get("reference", 0) / sum(n.values())

        s1, s05, s0 = ref_share(1.0), ref_share(0.5), ref_share(0.0)
        assert s1 < s05 < s0

    def test_weights_are_quantized_integers(self, spark, corpus):
        from dxnn_ocr_cpp_spark.operators.mixing import temperature_weights
        counts = corpus.groupBy("domain").count()
        for w in temperature_weights(counts, tau=0.37).collect():
            assert w["weight"] == float(int(w["weight"]))


class TestEpochPlan:
    def plan(self, spark, budget, max_epochs=4.0):
        from dxnn_ocr_cpp_spark.operators.mixing import epoch_plan
        toks = spark.createDataFrame(
            [("web", 1000), ("code", 100)], "domain string, n long")
        w = spark.createDataFrame(
            [("web", 0.5), ("code", 0.5)], "domain string, weight double")
        return {r["domain"]: r for r in
                epoch_plan(toks, w, budget, max_epochs).collect()}

    def test_uncapped_fractional_epochs(self, spark):
        p = self.plan(spark, budget=400)
        # web: target 200 over 1000 avail -> 0.2 epochs, no shortfall
        assert p["web"]["epochs"] == pytest.approx(0.2)
        assert p["web"]["realized_tokens"] == pytest.approx(200.0)
        assert p["web"]["shortfall"] == pytest.approx(0.0)

    def test_cap_produces_shortfall(self, spark):
        p = self.plan(spark, budget=2000)
        # code: target 1000 over 100 avail -> wants 10 epochs, capped
        # at 4 -> realized 400, shortfall 600
        assert p["code"]["epochs"] == 4.0
        assert p["code"]["realized_tokens"] == pytest.approx(400.0)
        assert p["code"]["shortfall"] == pytest.approx(600.0)
        # web unaffected by code's cap (no redistribution, by policy)
        assert p["web"]["epochs"] == pytest.approx(1.0)
        assert p["web"]["shortfall"] == pytest.approx(0.0)

    def test_unweighted_domain_rides_with_zero_target(self, spark):
        from dxnn_ocr_cpp_spark.operators.mixing import epoch_plan
        toks = spark.createDataFrame(
            [("web", 1000), ("spam", 500)], "domain string, n long")
        w = spark.createDataFrame([("web", 1.0)],
                                  "domain string, weight double")
        p = {r["domain"]: r for r in
             epoch_plan(toks, w, 100).collect()}
        assert p["spam"]["share"] == 0.0
        assert p["spam"]["epochs"] == 0.0
        assert p["spam"]["target_tokens"] == 0.0
