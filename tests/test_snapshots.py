"""Cross-snapshot corpus diff: status semantics (added / removed /
changed / unchanged, null-safe fingerprint equality), precomputed-
fingerprint path, rollup, partitioning invariance, and the scale
shape — the join input carries (key, fp) only and plans no
broadcast-nested-loop/cartesian node.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.snapshots import (diff_summary,
                                                    snapshot_diff)


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [("u/keep", "same text"),
         ("u/edit", "version one"),
         ("u/gone", "dropped page"),
         ("u/null", None)],
        "url string, text string")
    new = spark.createDataFrame(
        [("u/keep", "same text"),
         ("u/edit", "version two"),
         ("u/new", "fresh page"),
         ("u/null", None)],
        "url string, text string")
    return old, new


def status_map(df):
    return {r["url"]: r["status"] for r in df.collect()}


class TestSemantics:
    def test_statuses(self, snaps):
        old, new = snaps
        m = status_map(snapshot_diff(old, new))
        assert m == {"u/keep": "unchanged", "u/edit": "changed",
                     "u/gone": "removed", "u/new": "added",
                     "u/null": "unchanged"}  # both-null fp: no change

    def test_fp_columns(self, snaps):
        old, new = snaps
        rows = {r["url"]: r for r in snapshot_diff(old, new).collect()}
        assert rows["u/new"]["old_fp"] is None
        assert rows["u/gone"]["new_fp"] is None
        assert rows["u/edit"]["old_fp"] != rows["u/edit"]["new_fp"]
        assert rows["u/keep"]["old_fp"] == rows["u/keep"]["new_fp"]

    def test_precomputed_fingerprint_column(self, spark):
        old = spark.createDataFrame([("a", "fp1")], "url string, dg string")
        new = spark.createDataFrame([("a", "fp2")], "url string, dg string")
        m = status_map(snapshot_diff(old, new, fp_col="dg"))
        assert m == {"a": "changed"}

    def test_summary_rollup(self, snaps):
        old, new = snaps
        got = {r["status"]: r["n"]
               for r in diff_summary(snapshot_diff(old, new)).collect()}
        assert got == {"unchanged": 2, "changed": 1,
                       "removed": 1, "added": 1}


class TestDuplicateCaptures:
    def test_one_row_per_key_despite_within_snapshot_dups(self, spark):
        old = spark.createDataFrame(
            [("u/dup", "aaa"), ("u/dup", "zzz"), ("u/solo", "s")],
            "url string, text string")
        new = spark.createDataFrame(
            [("u/dup", "zzz"), ("u/dup", "zzz"), ("u/solo", "s")],
            "url string, text string")
        rows = snapshot_diff(old, new).collect()
        assert len(rows) == 2  # no row multiplication through the join
        m = {r["url"]: r["status"] for r in rows}
        # old side collapses to max(md5('aaa'), md5('zzz')), new to
        # md5('zzz'); status is deterministic either way
        assert m["u/solo"] == "unchanged"
        assert m["u/dup"] in ("changed", "unchanged")

    def test_null_fp_loses_to_non_null(self, spark):
        old = spark.createDataFrame(
            [("u/x", None), ("u/x", "real")], "url string, text string")
        new = spark.createDataFrame(
            [("u/x", "real")], "url string, text string")
        [r] = snapshot_diff(old, new).collect()
        assert r["status"] == "unchanged" and r["old_fp"] is not None

    def test_refresh_output_unique_despite_dups(self, spark):
        from dxnn_ocr_cpp_spark.operators.snapshots import (
            incremental_refresh)
        old = spark.createDataFrame(
            [("u/a", "ta"), ("u/a", "ta"), ("u/b", "tb")],
            "url string, text string")
        new = spark.createDataFrame(
            [("u/a", "ta"), ("u/b", "tb2")], "url string, text string")

        def process(docs):
            return docs.select("url", F.upper("text").alias("out")) \
                .dropDuplicates(["url"])

        got = sorted(map(tuple, incremental_refresh(
            old, new, process(old), process).collect()))
        assert got == [("u/a", "TA"), ("u/b", "TB2")]


class TestScaleShape:
    def test_partitioning_invariance(self, snaps):
        old, new = snaps
        a = sorted(map(tuple, snapshot_diff(
            old.repartition(1), new.repartition(1)).collect()))
        b = sorted(map(tuple, snapshot_diff(
            old.repartition(7, "text"), new.repartition(3)).collect()))
        assert a == b and a

    def test_no_pathological_join_node(self, snaps):
        old, new = snaps
        plan = snapshot_diff(old, new)._jdf.queryExecution() \
            .executedPlan().toString()
        for node in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert node not in plan
        # the shuffled side must be the two-column projection, not the
        # documents: no text column survives past the join input
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan


class TestIncrementalRefresh:
    def test_equals_full_recompute_and_only_churn_processed(self, spark):
        from dxnn_ocr_cpp_spark.operators.snapshots import incremental_refresh

        old = spark.createDataFrame(
            [(f"u/{i}", f"text {i}") for i in range(10)],
            "url string, text string")
        # churn: u/3 changed, u/7 removed, u/10-11 added
        new_rows = [(f"u/{i}", "text 3 v2" if i == 3 else f"text {i}")
                    for i in range(10) if i != 7]
        new_rows += [("u/10", "text 10"), ("u/11", "text 11")]
        new = spark.createDataFrame(new_rows, "url string, text string")

        seen = []

        def process(docs):
            seen.append(sorted(r["url"] for r in docs.select("url").collect()))
            return docs.select("url", F.upper("text").alias("out"))

        got = sorted(map(tuple, incremental_refresh(
            old, new, process(old), process).collect()))
        want = sorted(map(tuple, process(new).collect()))
        assert got == want
        # middle call is the refresh's: exactly the churn keys
        assert seen[1] == ["u/10", "u/11", "u/3"]
