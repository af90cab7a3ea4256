"""Winnowing fingerprint operator (textstats.winnow_* ) tests.

Pins the paper's guarantee (Schleimer et al., SIGMOD 2003): two docs
sharing a substring of length >= w + k - 1 canonical chars share at
least one fingerprint; plus determinism, edge cases, and the Spark
operator's agreement with the pure-numpy kernel.
"""

import numpy as np
import pytest

from dxnn_ocr_cpp_spark.operators.textstats import (_winnow_one,
                                                    winnow_pairs)

K, W = 8, 16
GUARANTEE = W + K - 1


class TestKernel:
    def test_shared_passage_guarantee(self):
        passage = "the quick brown fox jumps over the lazy dog tonight"
        assert len(passage) >= GUARANTEE
        a = _winnow_one(f"intro words here {passage} outro", K, W)
        b = _winnow_one(f"completely other opening {passage} and closing", K, W)
        assert len(np.intersect1d(a, b)) > 0

    def test_disjoint_texts_share_nothing(self):
        a = _winnow_one("alpha beta gamma delta epsilon zeta eta theta", K, W)
        b = _winnow_one("one two three four five six seven eight nine", K, W)
        assert len(np.intersect1d(a, b)) == 0

    def test_deterministic_and_canonicalized(self):
        a = _winnow_one("Hello   World  FOO bar", K, W)
        b = _winnow_one("hello world foo\tbar", K, W)
        assert (a == b).all()  # lower + ws-collapse canonicalization

    def test_edge_cases(self):
        assert len(_winnow_one(None, K, W)) == 0
        assert len(_winnow_one("", K, W)) == 0
        assert len(_winnow_one("ab", K, W)) == 1      # shorter than k
        assert len(_winnow_one("x" * (K + 2), K, W)) >= 1

    def test_density_bound(self):
        # winnowing selects ~2/(w+1) of positions; sanity-bound it
        text = " ".join(f"tok{i}" for i in range(400))
        fp = _winnow_one(text, K, W)
        n_grams = len(" ".join(text.lower().split())) - K + 1
        assert 0 < len(fp) <= n_grams * 3 // W


class TestSpark:
    @pytest.fixture(scope="class")
    def spark(self):
        from dxnn_ocr_cpp_spark.session import build_session
        s = build_session(app="winnow-test", master="local[4]")
        yield s

    def test_pairs_match_kernel(self, spark):
        passage = ("copied boilerplate passage that appears in multiple "
                   "documents verbatim and is long enough to fingerprint")
        rows = [
            (0, f"unique preamble zero {passage} unique tail zero"),
            (1, f"other document one {passage} different ending one"),
            (2, "totally unrelated content with no shared passages at "
                "all just filler words repeated filler words"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.a, r.b): r.n_common
               for r in winnow_pairs(df, min_common=1).collect()}
        assert (0, 1) in got
        assert (0, 2) not in got and (1, 2) not in got
        # n_common agrees with the kernel intersection
        a = _winnow_one(rows[0][1], K, W)
        b = _winnow_one(rows[1][1], K, W)
        assert got[(0, 1)] == len(np.intersect1d(a, b))


    def test_prefix_filter_equals_bruteforce(self, spark):
        """The ppjoin-style prefix filter + array_intersect verify must
        return EXACTLY the pairs/counts of the definitional brute-force
        |capped FP(a) ∩ capped FP(b)| — complete candidate recall by
        the pigeonhole prefix theorem, exact counts by verification."""
        from collections import Counter
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = d.select("doc_id", "text").collect()
        fps = {r.doc_id: _winnow_one(r.text, K, W) for r in rows}
        cnt = Counter(g for v in fps.values() for g in v)
        cap = 1000
        capped = {i: np.array([g for g in v if cnt[g] <= cap])
                  for i, v in fps.items()}
        ids = sorted(capped)
        want = {}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                c = len(np.intersect1d(capped[ids[i]], capped[ids[j]]))
                if c >= 5:
                    want[(ids[i], ids[j])] = c
        got = {(r.a, r.b): r.n_common
               for r in winnow_pairs(d, min_common=5).collect()}
        assert got == want


class TestSimhashRecall:
    def test_pigeonhole_complete_recall(self, spark):
        """pieces = max_hamming+1 guarantees EVERY pair within the
        radius is a candidate (a fixed 4-piece split missed d>3 pairs
        differing in all four pieces). Validated vs brute force."""
        import numpy as np
        from pyspark.sql import functions as F

        from dxnn_ocr_cpp_spark.operators.dedup import (simhash64,
                                                        simhash_pairs)
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        for mh in (3, 6):
            got = {(r.a, r.b)
                   for r in simhash_pairs(d, max_hamming=mh).collect()}
            sims = {r.id: r.sim for r in d.select(
                F.col("doc_id").alias("id"),
                simhash64(F.col("text")).alias("sim")).collect()}
            ids = sorted(sims)
            arr = np.array([sims[i] for i in ids],
                           dtype=np.int64).astype(np.uint64)
            want = {(ids[i], ids[j])
                    for i in range(len(ids)) for j in range(i + 1, len(ids))
                    if bin(int(arr[i] ^ arr[j])).count("1") <= mh}
            assert got == want, f"recall hole at max_hamming={mh}"

    def test_max_hamming_validated(self, spark):
        import pytest as _pytest

        from dxnn_ocr_cpp_spark.operators.dedup import simhash_pairs
        d = spark.range(1).selectExpr("id as doc_id", "'x' as text")
        with _pytest.raises(ValueError):
            simhash_pairs(d, max_hamming=8)


class TestStrategies:
    def test_count_strategy_equals_prefix(self):
        """Both physical plans return identical pairs/counts — the
        strategy knob only trades shuffle shape, never semantics."""
        from dxnn_ocr_cpp_spark.session import build_session
        s = build_session(app="winnow-strategy", master="local[4]")
        d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted((r.a, r.b, r.n_common) for r in
                   winnow_pairs(d, min_common=5, strategy="prefix").collect())
        b = sorted((r.a, r.b, r.n_common) for r in
                   winnow_pairs(d, min_common=5, strategy="count").collect())
        assert a == b and len(a) > 0

    def test_bad_strategy_raises(self):
        import pytest as _pt
        with _pt.raises(ValueError):
            winnow_pairs(None, strategy="nope")
