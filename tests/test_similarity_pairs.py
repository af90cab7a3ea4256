"""Embedding-cosine near-dup pair operators: the exact all-pairs twin
(oracle path, O(n^2)-guarded) vs the LSH-banded scale path — precision
must be 1.0 (every scale pair is a true pair with the identical sim),
recall measured, and the scale plan must contain no cartesian."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.similarity import (cosine_dup_pairs_exact,
                                                     cosine_dup_pairs_lsh)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_scale_pairs_subset_of_exact(emb):
    # exact side widened one rounding ulp so a boundary pair rounded up
    # by the numpy kernel but down by Spark still has a reference entry
    exact = {(r.a, r.b): r.sim
             for r in cosine_dup_pairs_exact(emb, threshold=0.3999).collect()}
    scale = {(r.a, r.b): r.sim
             for r in cosine_dup_pairs_lsh(emb, threshold=0.4).collect()}
    assert scale, "LSH path found no pairs at all"
    # precision 1.0: every reported pair is a true pair; sims equal up
    # to one final-rounding ulp (numpy binary half-even vs Spark
    # decimal HALF_UP can differ at .00005 decimal boundaries)
    for k, sim in scale.items():
        assert k in exact and abs(exact[k] - sim) <= 1e-4 + 1e-12
    # recall: banded candidates should recover most true pairs here
    # (high-sim pairs are near-certain candidates; the S-curve tail
    # around the 0.4 threshold loses some)
    recall = len(scale) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f} over {len(exact)} pairs"


def test_scale_plan_has_no_cartesian(emb):
    plan = cosine_dup_pairs_lsh(emb, threshold=0.4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_refuses_oversized_corpus(emb):
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        cosine_dup_pairs_exact(emb, max_rows=10)


class TestSemanticDedup:
    """SemDeDup-style: cluster -> within-cell pair mining -> connected
    components -> keep min id per duplicate group."""

    @pytest.fixture(scope="class")
    def planted(self, spark):
        # 3 planted duplicate groups (base vector + tiny jitter, cosine
        # ~0.9999) + isolated random vectors; deterministic seeds
        import numpy as np
        rng = np.random.default_rng(7)
        rows = []
        next_id = 0
        groups = []
        for g in range(3):
            base = rng.normal(size=32)
            members = []
            for m in range(4):
                v = base + rng.normal(scale=1e-3, size=32)
                rows.append((next_id, [float(x) for x in v]))
                members.append(next_id)
                next_id += 1
            groups.append(members)
        for _ in range(30):
            rows.append((next_id,
                         [float(x) for x in rng.normal(size=32)]))
            next_id += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        return df, groups

    def test_groups_collapse_to_min_id(self, spark, planted):
        from dxnn_ocr_cpp_spark.operators.similarity import semantic_dedup
        df, groups = planted
        out = {r["id"]: (r["group_id"], r["keep"])
               for r in semantic_dedup(df, threshold=0.95,
                                       n_lists=4).collect()}
        assert len(out) == df.count()          # row preservation
        for members in groups:
            rep = min(members)
            for m in members:
                assert out[m] == (rep, m == rep), (m, out[m])
        # isolated vectors keep themselves
        planted_ids = {m for g in groups for m in g}
        for i, (gid, keep) in out.items():
            if i not in planted_ids:
                assert gid == i and keep

    def test_partitioning_invariance(self, spark, planted):
        from dxnn_ocr_cpp_spark.operators.similarity import semantic_dedup
        df, _ = planted
        a = sorted(map(tuple, semantic_dedup(
            df.repartition(1), threshold=0.95, n_lists=4).collect()))
        b = sorted(map(tuple, semantic_dedup(
            df.repartition(7), threshold=0.95, n_lists=4).collect()))
        assert a == b
