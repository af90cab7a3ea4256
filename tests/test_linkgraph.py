"""Link-graph construction + host PageRank: href harvest policy
(absolute / protocol-relative / relative / fragment), self-edge drop,
userinfo+port normalization, PageRank vs a sequential NumPy-free
reference replay, partitioning invariance, and the scale shape (no
Python hop in the harvest, no cartesian anywhere).
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.linkgraph import (host_edges,
                                                    host_pagerank)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("https://a.com/p1",
         '<a href="https://b.com/x">1</a>'
         '<a href="https://b.com/y">2</a>'
         "<a href='//c.com/z'>3</a>"
         '<a href="/local">4</a><a href="#frag">5</a>'),
        ("https://a.com/p2",
         '<A HREF="https://user:pw@B.com:443/q">case+userinfo</A>'),
        ("https://b.com/p1", '<a href="https://a.com/">back</a>'),
        ("https://d.com/p1", "<p>no links at all</p>"),
        ("https://a.com/p3", None),
    ]
    return spark.createDataFrame(rows, "url string, html string")


class TestHostEdges:
    def test_policy_and_counts(self, docs):
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in host_edges(docs).collect()}
        # a->b: two absolute from p1 + one case/userinfo/port from p2
        assert got == {("a.com", "b.com"): 3,
                       ("a.com", "c.com"): 1,
                       ("b.com", "a.com"): 1}

    def test_no_python_and_one_exchange(self, docs):
        plan = host_edges(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        # exactly the aggregation exchange (partial agg before it)
        assert plan.count("Exchange") == 1

    def test_partitioning_invariance(self, docs):
        a = sorted(map(tuple, host_edges(docs.repartition(1)).collect()))
        b = sorted(map(tuple, host_edges(
            docs.repartition(5, "html")).collect()))
        assert a == b and a


def _reference_pagerank(edges, damping, iters):
    """Sequential dict replay of the module's exact semantics."""
    hosts = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(hosts)
    out_w = {}
    for u, _, w in edges:
        out_w[u] = out_w.get(u, 0.0) + w
    rank = {h: 1.0 / n for h in hosts}
    for _ in range(iters):
        contrib = {h: 0.0 for h in hosts}
        for u, v, w in edges:
            contrib[v] += rank[u] * (w / out_w[u])
        rank = {h: (1 - damping) / n + damping * contrib[h]
                for h in hosts}
    return rank


class TestPageRank:
    EDGES = [("a", "b", 2.0), ("b", "a", 1.0), ("a", "c", 1.0),
             ("c", "a", 3.0), ("d", "a", 1.0)]  # d dangling-in only

    def _spark_ranks(self, spark, iters=4):
        e = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links double")
        return {r["host"]: r["rank"]
                for r in host_pagerank(e, 0.85, iters).collect()}

    def test_matches_sequential_reference(self, spark):
        got = self._spark_ranks(spark)
        want = _reference_pagerank(self.EDGES, 0.85, 4)
        assert set(got) == set(want)
        for h in want:
            assert abs(got[h] - want[h]) < 1e-12, h

    def test_hub_outranks_leaf(self, spark):
        # 20 rounds: this near-bipartite graph oscillates at low
        # iteration counts; dominance is a property of the converged
        # ranks, so assert it near the fixed point
        got = self._spark_ranks(spark, iters=20)
        # every host points at a; a must rank highest, no-in-link d
        # lowest
        assert got["a"] == max(got.values())
        assert got["d"] == min(got.values())

    def test_no_cartesian_or_python(self, spark):
        e = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links double")
        plan = host_pagerank(e, iters=2)._jdf.queryExecution() \
            .executedPlan().toString()
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "ArrowEval", "BatchEvalPython"):
            assert bad not in plan


class TestAnchorTexts:
    @pytest.fixture(scope="class")
    def adocs(self, spark):
        rows = [
            ("https://a.com/p1",
             '<a href="https://b.com/x">  Great   SITE </a>'
             '<a href="https://b.com/y">great site</a>'
             '<a href="https://b.com/z">docs</a>'
             '<a href="https://c.com/w">docs</a>'),
            ("https://a.com/p2",
             # nested markup body: skipped by the [^<]* policy
             '<a href="https://b.com/n"><b>bold</b></a>'
             # empty body: dropped
             '<a href="https://b.com/e"></a>'
             # self-link: dropped
             '<a href="https://a.com/s">me</a>'
             # fragment: never harvested
             '<a href="#top">frag</a>'
             '<a href="https://b.com/x2">great site</a>'),
            ("https://d.com/p1", None),
        ]
        return spark.createDataFrame(rows, "url string, html string")

    def test_normalization_and_policy(self, adocs):
        from dxnn_ocr_cpp_spark.operators.linkgraph import anchor_texts
        got = {(r["dst_host"], r["anchor"]): r["n"]
               for r in anchor_texts(adocs).collect()}
        # ws-collapse + trim + lower folds all three 'great site's
        assert got == {("b.com", "great site"): 3,
                       ("b.com", "docs"): 1,
                       ("c.com", "docs"): 1}

    def test_top_k_deterministic_on_ties(self, spark):
        from dxnn_ocr_cpp_spark.operators.linkgraph import top_anchors
        anchors = spark.createDataFrame(
            [("h.com", "zeta", 2), ("h.com", "alpha", 2),
             ("h.com", "mid", 1), ("h.com", "low", 1)],
            "dst_host string, anchor string, n long")
        got = [(r["anchor"], r["rk"])
               for r in top_anchors(anchors, k=3)
               .orderBy("rk").collect()]
        assert got == [("alpha", 1), ("zeta", 2), ("low", 3)]

    def test_pure_catalyst_no_python(self, adocs):
        from dxnn_ocr_cpp_spark.operators.linkgraph import anchor_texts
        plan = anchor_texts(adocs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def _reference_trustrank(edges, seeds, damping, iters):
    """Sequential dict replay of host_trustrank's exact semantics."""
    hosts = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    ns = len([h for h in hosts if h in seeds])
    out_w = {}
    for u, _, w in edges:
        out_w[u] = out_w.get(u, 0.0) + w
    tele = {h: (1.0 / ns if h in seeds else 0.0) for h in hosts}
    t = dict(tele)
    for _ in range(iters):
        contrib = {h: 0.0 for h in hosts}
        for u, v, w in edges:
            contrib[v] += t[u] * (w / out_w[u])
        t = {h: (1 - damping) * tele[h] + damping * contrib[h]
             for h in hosts}
    return t


class TestTrustRank:
    # a trusted neighborhood and a densely interlinked spam farm with
    # no trusted in-path — the shape TrustRank exists to separate
    EDGES = [("seed.org", "good.com", 2.0),
             ("good.com", "seed.org", 1.0),
             ("good.com", "deep.com", 1.0),
             ("seed.org", "deep.com", 1.0),
             ("spamhub.biz", "spam1.biz", 5.0),
             ("spam1.biz", "spamhub.biz", 5.0),
             ("spamhub.biz", "spam2.biz", 5.0),
             ("spam2.biz", "spamhub.biz", 5.0)]
    SEEDS = ["seed.org"]

    def _spark_trust(self, spark, iters=4):
        from dxnn_ocr_cpp_spark.operators.linkgraph import host_trustrank
        e = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links double")
        s = spark.createDataFrame([(h,) for h in self.SEEDS],
                                  "host string")
        return {r["host"]: r["trust"]
                for r in host_trustrank(e, s, 0.85, iters).collect()}

    def test_matches_sequential_reference(self, spark):
        got = self._spark_trust(spark)
        want = _reference_trustrank(self.EDGES, set(self.SEEDS), 0.85, 4)
        assert set(got) == set(want)
        for h in want:
            assert abs(got[h] - want[h]) < 1e-12, h

    def test_spam_farm_gets_exactly_zero(self, spark):
        got = self._spark_trust(spark)
        # no trusted in-path -> no mass ever arrives (exact 0.0, not
        # just small): the property raw PageRank cannot provide
        assert got["spamhub.biz"] == 0.0
        assert got["spam1.biz"] == 0.0
        assert got["seed.org"] > 0 and got["good.com"] > 0
        assert got["deep.com"] > 0  # two hops from the seed

    def test_contrast_with_raw_pagerank(self, spark):
        # the spam hub WINS raw PageRank on this graph (heaviest
        # in-links) yet scores zero trust
        e = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links double")
        pr = {r["host"]: r["rank"]
              for r in host_pagerank(e, 0.85, 4).collect()}
        tr = self._spark_trust(spark)
        assert pr["spamhub.biz"] > pr["good.com"]
        assert tr["spamhub.biz"] < tr["good.com"]

    def test_no_seed_in_graph_raises(self, spark):
        from dxnn_ocr_cpp_spark.operators.linkgraph import host_trustrank
        e = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links double")
        s = spark.createDataFrame([("absent.example",)], "host string")
        with pytest.raises(ValueError, match="no seed host"):
            host_trustrank(e, s)

    def test_no_cartesian_or_python(self, spark):
        from dxnn_ocr_cpp_spark.operators.linkgraph import host_trustrank
        e = spark.createDataFrame(
            self.EDGES, "src_host string, dst_host string, n_links double")
        s = spark.createDataFrame([(h,) for h in self.SEEDS],
                                  "host string")
        plan = host_trustrank(e, s, iters=2)._jdf.queryExecution() \
            .executedPlan().toString()
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "ArrowEval", "BatchEvalPython"):
            assert bad not in plan


class TestHostHits:
    @pytest.fixture(scope="class")
    def scores(self, spark):
        from dxnn_ocr_cpp_spark.operators.linkgraph import host_hits
        e = spark.createDataFrame(
            [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)],
            "src_host string, dst_host string, n_links long")
        return {r["host"]: (r["hub"], r["authority"])
                for r in host_hits(e, iters=3).collect()}

    def test_matches_sequential_reference(self, scores):
        # replay the exact L1-normalized semantics sequentially
        nodes = ["a", "b", "c"]
        E = {("a", "b"): 2.0, ("a", "c"): 1.0, ("b", "c"): 1.0}
        hub = {n: 1.0 for n in nodes}
        for _ in range(3):
            a = {n: sum(hub[u] * w for (u, v), w in E.items() if v == n)
                 for n in nodes}
            s = sum(a.values())
            a = {n: x / s for n, x in a.items()}
            h = {n: sum(a[v] * w for (u, v), w in E.items() if u == n)
                 for n in nodes}
            s = sum(h.values())
            hub = {n: x / s for n, x in h.items()}
            auth = a
        for n in nodes:
            assert scores[n][0] == pytest.approx(hub[n], abs=1e-12)
            assert scores[n][1] == pytest.approx(auth[n], abs=1e-12)

    def test_structure(self, scores):
        # no out-edges -> hub 0; no in-edges -> authority 0;
        # both L1 totals normalize to 1
        assert scores["c"][0] == 0.0
        assert scores["a"][1] == 0.0
        assert sum(v[0] for v in scores.values()) == pytest.approx(1.0)
        assert sum(v[1] for v in scores.values()) == pytest.approx(1.0)
        # the pure hub dominates; the weight-2 target out-ranks the
        # twice-linked-but-weight-1 target (weighted, not just counted)
        assert scores["a"][0] > scores["b"][0] > scores["c"][0]
        assert scores["b"][1] > scores["c"][1] > scores["a"][1]
