"""containment_pairs — asymmetric n-gram containment semantics.

Reference analog: ancestor-containment dedupe of overlapping regions
(/root/reference/src/common/geometry.cpp:184-201, D13/D14) — "already
covered by another", the asymmetric question Jaccard can't ask.
"""

import pytest

from dxnn_ocr_cpp_spark.operators.dedup import (_gram_hashes,
                                                containment_pairs)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WIRE = ("alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima")
# container: the full wire story plus a long commentary tail
CONTAINER = WIRE + (" mike november oscar papa quebec romeo sierra "
                    "tango uniform victor whiskey xray yankee zulu "
                    "one two three four five six seven eight nine ten")


class TestContainmentPairs:
    def test_contained_direction_only(self, spark):
        out = {(r.src, r.dst): r.containment
               for r in containment_pairs(
                   _docs(spark, [(1, WIRE), (2, CONTAINER)]),
                   threshold=0.9).collect()}
        # every 3-gram of WIRE appears in CONTAINER -> containment 1.0
        assert out == {(1, 2): 1.0}

    def test_reverse_direction_below_threshold_at_lower_t(self, spark):
        rows = {(r.src, r.dst): r.containment
                for r in containment_pairs(
                    _docs(spark, [(1, WIRE), (2, CONTAINER)]),
                    threshold=0.05).collect()}
        assert rows[(1, 2)] == 1.0
        # container -> contained: |A∩B| / |CONTAINER grams| < 0.5
        assert 0 < rows[(2, 1)] < 0.5
        # exact value: common = grams(WIRE ∩ CONTAINER), nb = grams(CONTAINER)
        common = len(set(_gram_hashes(WIRE, 3))
                     & set(_gram_hashes(CONTAINER, 3)))
        nb = len(set(_gram_hashes(CONTAINER, 3)))
        assert rows[(2, 1)] == pytest.approx(common / nb, abs=1e-6)

    def test_identical_docs_both_directions(self, spark):
        out = {(r.src, r.dst): r.containment
               for r in containment_pairs(
                   _docs(spark, [(1, WIRE), (2, WIRE)]),
                   threshold=0.99).collect()}
        assert out == {(1, 2): 1.0, (2, 1): 1.0}

    def test_disjoint_docs_no_pairs(self, spark):
        out = containment_pairs(
            _docs(spark, [(1, WIRE),
                          (2, "uno dos tres cuatro cinco seis siete")]),
            threshold=0.01).collect()
        assert out == []

    def test_short_doc_pairs_only_with_identical_short_doc(self, spark):
        # fewer than n words -> the whole-doc fallback shingle: no
        # cross-pairing with the long doc's 3-grams, full containment
        # with an identical short doc
        out = containment_pairs(
            _docs(spark, [(1, WIRE), (2, "alpha bravo"),
                          (3, "alpha bravo")]),
            threshold=0.01).collect()
        assert {(r.src, r.dst) for r in out} == {(2, 3), (3, 2)}

    def test_containment_dominates_jaccard(self, spark):
        # the aggregator shape: jaccard misses it, containment finds it
        from dxnn_ocr_cpp_spark.operators.dedup import ngram_jaccard_pairs
        docs = _docs(spark, [(1, WIRE), (2, CONTAINER)])
        jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        cont = containment_pairs(docs, threshold=0.9).collect()
        assert jac == [] and len(cont) == 1

    def test_partitioning_invariance(self, spark):
        rows = [(i, WIRE if i % 3 == 0 else CONTAINER + f" tail{i}")
                for i in range(12)]
        a = {(r.src, r.dst, r.containment)
             for r in containment_pairs(
                 _docs(spark, rows).repartition(1),
                 threshold=0.3).collect()}
        b = {(r.src, r.dst, r.containment)
             for r in containment_pairs(
                 _docs(spark, rows).repartition(7),
                 threshold=0.3).collect()}
        assert a == b and a

    def test_matches_bruteforce_reference(self, spark):
        # seeded random corpus vs an all-pairs python-set replay of
        # the exact semantics (the parser-parity fuzz discipline)
        import random
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(3, 40))))
                for i in range(25)]
        sets = {i: set(_gram_hashes(t, 3).tolist()) for i, t in rows}
        want = {}
        for a in sets:
            for b in sets:
                if a != b and sets[a]:
                    c = len(sets[a] & sets[b]) / len(sets[a])
                    if c >= 0.2:
                        want[(a, b)] = c
        got = {(r.src, r.dst): r.containment
               for r in containment_pairs(_docs(spark, rows),
                                          threshold=0.2).collect()}
        assert set(got) == set(want)
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-6), k

    def test_no_cartesian_in_plan(self, spark):
        plan = containment_pairs(
            _docs(spark, [(1, WIRE), (2, CONTAINER)]),
            threshold=0.5)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
