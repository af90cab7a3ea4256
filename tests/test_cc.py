"""Connected components (operators/cc.py): correctness on crafted
graphs (chains, stars, multi-component, self-loops/duplicate edges),
diameter-independence (a long path converges in few alternating-star
rounds), determinism under repartitioning, and the cluster summary.

Both physical paths are pinned: small_graph_edges=0 forces the
distributed alternating-star iteration; the default takes the driver
union-find fast path. They must agree exactly.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.cc import (connected_components,
                                             dedup_clusters)

# (name, kwargs): driver fast path vs forced-distributed path
PATHS = [("driver", {}), ("distributed", {"small_graph_edges": 0})]


def edges_df(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs],
                                 "a long, b long")


def comp_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


class TestComponents:
    @pytest.mark.parametrize("name,kw", PATHS)
    def test_two_components_and_min_labels(self, spark, name, kw):
        e = edges_df(spark, [(5, 3), (3, 8), (10, 11), (11, 12), (12, 10)])
        m = comp_map(connected_components(e, "a", "b", **kw))
        assert m == {3: 3, 5: 3, 8: 3, 10: 10, 11: 10, 12: 10}, name

    def test_long_path_diameter_independence(self, spark):
        # a 100-node path has diameter 99; min-label propagation would
        # need ~99 rounds — alternating-star must do it within the
        # small max_iter budget (distributed path forced: this pins
        # the ITERATIVE algorithm, not the driver shortcut)
        e = edges_df(spark, [(i, i + 1) for i in range(100)])
        m = comp_map(connected_components(e, "a", "b", max_iter=10,
                                          small_graph_edges=0))
        assert set(m.values()) == {0}
        assert len(m) == 101

    @pytest.mark.parametrize("name,kw", PATHS)
    def test_self_loops_and_duplicate_edges_ignored(self, spark, name, kw):
        e = edges_df(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (4, 4)])
        m = comp_map(connected_components(e, "a", "b", **kw))
        # 4 only appears as a self-loop: no pair evidence, not emitted
        assert m == {1: 1, 2: 1}, name

    @pytest.mark.parametrize("name,kw", PATHS)
    def test_empty_pairs(self, spark, name, kw):
        e = spark.createDataFrame([], "a long, b long")
        assert connected_components(e, "a", "b", **kw).count() == 0, name

    def test_paths_agree(self, spark):
        pairs = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
        e = edges_df(spark, pairs)
        fast = comp_map(connected_components(e, "a", "b"))
        dist = comp_map(connected_components(e, "a", "b",
                                             small_graph_edges=0))
        assert fast == dist and fast

    def test_partitioning_invariance(self, spark):
        pairs = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
        a = comp_map(connected_components(
            edges_df(spark, pairs).repartition(1), "a", "b",
            small_graph_edges=0))
        b = comp_map(connected_components(
            edges_df(spark, pairs).repartition(16, "b"), "a", "b",
            small_graph_edges=0))
        assert a == b

    def test_nonconvergence_raises(self, spark):
        e = edges_df(spark, [(1, 2), (2, 3)])
        with pytest.raises(RuntimeError, match="no convergence"):
            connected_components(e, "a", "b", max_iter=0,
                                 small_graph_edges=0)


class TestClusterSummary:
    def test_summary_fields(self, spark):
        e = edges_df(spark, [(5, 3), (3, 8), (20, 30)])
        rows = {r["component"]: (r["n_docs"], r["max_doc"])
                for r in dedup_clusters(e).collect()}
        assert rows == {3: (3, 8), 20: (2, 30)}

    def test_keeplist_semantics(self, spark):
        # keep-list = all docs minus non-survivor members
        docs = spark.range(10).select(F.col("id").alias("doc_id"))
        e = edges_df(spark, [(1, 4), (4, 7)])
        cc = connected_components(e, "a", "b")
        drop = cc.filter(F.col("node") != F.col("component")) \
            .select(F.col("node").alias("doc_id"))
        kept = sorted(r["doc_id"] for r in
                      docs.join(drop, "doc_id", "left_anti").collect())
        assert kept == [0, 1, 2, 3, 5, 6, 8, 9]


class TestCanonicalDocs:
    def run(self, spark, pairs, docs):
        from dxnn_ocr_cpp_spark.operators.cc import canonical_docs
        p = spark.createDataFrame(pairs, "a long, b long")
        d = spark.createDataFrame(docs, "doc_id long, n_chars long")
        return {r["component"]: r for r in
                canonical_docs(p, d).collect()}

    def test_longest_member_wins(self, spark):
        got = self.run(spark, [(1, 2), (2, 3), (10, 11)],
                       [(1, 5), (2, 99), (3, 7), (10, 4), (11, 4),
                        (12, 1000)])  # 12 not in any pair -> absent
        assert got[1]["canonical_doc"] == 2      # max n_chars in {1,2,3}
        assert got[1]["n_docs"] == 3 and got[1]["canonical_rank"] == 99
        assert 12 not in {r["canonical_doc"] for r in got.values()}

    def test_rank_tie_breaks_to_smaller_id(self, spark):
        got = self.run(spark, [(10, 11)], [(10, 4), (11, 4)])
        assert got[10]["canonical_doc"] == 10
