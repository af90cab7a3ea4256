"""As-of join operator: semantics (backward inclusive, tie-break,
tolerance, no-match nulls, null-payload atomicity), determinism under
repartitioning, and the scale guarantee — one Exchange, no join node.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    # build: feature snapshots per key; probe: labels to enrich
    build = spark.createDataFrame(
        [(1, ts("2024-01-01T00:00:00"), 100, 1.0),
         (1, ts("2024-01-01T00:10:00"), 101, 2.0),
         (1, ts("2024-01-01T00:10:00"), 102, 3.0),   # equal-ts tie
         (1, ts("2024-01-01T00:30:00"), 103, None),  # null payload field
         (2, ts("2024-01-01T09:00:00"), 200, 9.0)],
        "k long, ts timestamp, snap_id long, feat double")
    probe = spark.createDataFrame(
        [(1, ts("2024-01-01T00:05:00"), 10),
         (1, ts("2024-01-01T00:10:00"), 11),   # exact-ts match
         (1, ts("2024-01-01T00:45:00"), 12),
         (2, ts("2024-01-01T08:00:00"), 20),   # before any snapshot
         (3, ts("2024-01-01T00:00:00"), 30)],  # key with no build rows
        "k long, ts timestamp, label_id long")
    return probe, build


def collect_map(df):
    return {r["label_id"]: (r["asof_snap_id"], r["asof_feat"])
            for r in df.collect()}


class TestSemantics:
    def test_backward_inclusive_tie_and_nulls(self, frames):
        probe, build = frames
        out = asof_join(probe, build, on="k", ts="ts",
                        payload=["snap_id", "feat"], tie="snap_id")
        m = collect_map(out)
        assert m[10] == (100, 1.0)          # strictly-before match
        assert m[11] == (102, 3.0)          # inclusive + greatest tie wins
        assert m[12] == (103, None)         # latest row, null field STAYS null
        assert m[20] == (None, None)        # nothing at-or-before
        assert m[30] == (None, None)        # key absent from build
        assert out.count() == probe.count()  # every probe row preserved

    def test_tolerance_nulls_stale_matches(self, frames):
        probe, build = frames
        out = asof_join(probe, build, on="k", ts="ts",
                        payload=["snap_id"], tie="snap_id",
                        tolerance_sec=600)
        m = {r["label_id"]: r["asof_snap_id"] for r in out.collect()}
        assert m[10] == 100     # 5 min old: fresh
        assert m[11] == 102     # 0 min old
        assert m[12] is None    # 15 min old > 600 s: staled out
        assert m[20] is None

    def test_null_ts_build_rows_never_match(self, spark):
        """A build row with NULL event time can't be 'the most recent
        at-or-before' anything (merge_asof and the LATERAL oracle both
        exclude it); the nulls-first window order must not leak it in."""
        build = spark.createDataFrame(
            [(1, None, 500)], "k long, ts timestamp, snap_id long")
        probe = spark.createDataFrame(
            [(1, ts("2024-01-01T00:00:00"), 10)],
            "k long, ts timestamp, label_id long")
        out = asof_join(probe, build, on="k", ts="ts",
                        payload=["snap_id"], tie="snap_id").collect()
        assert len(out) == 1
        assert out[0]["asof_snap_id"] is None
        assert out[0]["asof_ts"] is None

    def test_asof_ts_column_and_clash_guard(self, frames):
        probe, build = frames
        out = asof_join(probe, build, on="k", ts="ts",
                        payload=["snap_id"], tie="snap_id")
        row = {r["label_id"]: r for r in out.collect()}[11]
        assert row["asof_ts"] == ts("2024-01-01T00:10:00")
        with pytest.raises(ValueError, match="asof_snap_id"):
            asof_join(out, build, on="k", ts="ts",
                      payload=["snap_id"], tie="snap_id")


class TestScaleShape:
    def test_partitioning_invariance(self, frames):
        probe, build = frames
        a = collect_map(asof_join(probe.repartition(1), build.repartition(1),
                                  on="k", ts="ts",
                                  payload=["snap_id", "feat"], tie="snap_id"))
        b = collect_map(asof_join(probe.repartition(8, "label_id"),
                                  build.repartition(8, "snap_id"),
                                  on="k", ts="ts",
                                  payload=["snap_id", "feat"], tie="snap_id"))
        assert a == b

    def test_one_exchange_no_join_node(self, frames):
        probe, build = frames
        out = asof_join(probe, build, on="k", ts="ts",
                        payload=["snap_id"], tie="snap_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        for node in ("BroadcastNestedLoopJoin", "CartesianProduct",
                     "SortMergeJoin", "BroadcastHashJoin"):
            assert node not in plan, f"{node} in as-of plan:\n{plan[:2000]}"
