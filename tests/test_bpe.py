"""Distributed BPE training (operators/bpe.py) vs a sequential
pure-Python reference implementation — the htmlseg parity discipline
for operators whose iterative argmax is not SQL-expressible. Pins:
exact merge-list equality (order, pairs, counts), final segmentations,
greedy non-overlapping merge semantics, deterministic tiebreak,
partitioning invariance, and the OOV fallback in bpe_segment.
"""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators import bpe


# ---------- sequential reference (Sennrich et al. 2016) ----------

def _ref_tokens(t):
    t = re.sub(r"\s+", " ", t.strip().lower())
    return t.split(" ") if t else []


def ref_bpe(texts, n_merges):
    wc = Counter()
    for t in texts:
        wc.update(_ref_tokens(t))
    words = {w: list(w) + [bpe.END_OF_WORD] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (a, b), n = min(pc.items(),
                        key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        if n < 2:
            break
        merges.append((a, b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest new lower",
    "the cat sat on the mat",
    "the newest widest lowest",
    "",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_merges_match_reference(spark):
    got_merges, got_words = bpe.train_bpe(_df(spark, CORPUS), n_merges=12)
    want_merges, want_words = ref_bpe(CORPUS, 12)
    assert got_merges == want_merges
    got_syms = {r["word"]: r["syms"] for r in got_words.collect()}
    assert got_syms == want_words


def test_greedy_nonoverlapping_merge(spark):
    merges, words = bpe.train_bpe(_df(spark, ["aaaa aaaa"]), n_merges=1)
    assert merges == [("a", "a", 6)]  # 3 adjacent pairs x count 2
    [row] = words.collect()
    assert row["syms"] == ["aa", "aa", bpe.END_OF_WORD]


def test_tiebreak_is_pair_string_ascending(spark):
    # 'xy' and 'ab' both occur twice; 'a b' < 'x y'
    merges, _ = bpe.train_bpe(_df(spark, ["xy ab xy ab"]), n_merges=1)
    assert merges[0][:2] == ("a", "b")


def test_partitioning_invariance(spark):
    df = _df(spark, CORPUS * 3)
    m1, _ = bpe.train_bpe(df, n_merges=8)
    m2, _ = bpe.train_bpe(df.repartition(7), n_merges=8)
    assert m1 == m2


def test_early_stop_when_no_repeated_pair(spark):
    merges, _ = bpe.train_bpe(_df(spark, ["ab cd"]), n_merges=10)
    assert merges == []  # every pair occurs once


def test_segment_counts_and_oov_fallback(spark):
    train = _df(spark, ["low low lower lowest"])
    merges, words = bpe.train_bpe(train, n_merges=4)
    syms = {r["word"]: r["syms"] for r in words.collect()}
    docs = _df(spark, ["low unseen", ""])
    got = {r["doc_id"]: r for r in
           bpe.bpe_segment(docs, words).collect()}
    want_low = len(syms["low"])
    assert got[0]["n_words"] == 2
    # OOV 'unseen': character fallback = len + </w>
    assert got[0]["n_tokens"] == want_low + len("unseen") + 1
    assert got[1]["n_words"] == 0 and got[1]["n_tokens"] == 0


class TestTrainBpeCollected:
    """The large-vocab scale path: one distributed word-count pass +
    single-node incremental merge loop. Must be bit-identical to BOTH
    the driver-looped train_bpe and the sequential reference."""

    def test_matches_reference_and_distributed(self, spark):
        df = _df(spark, CORPUS)
        got_m, got_w = bpe.train_bpe_collected(df, n_merges=12)
        want_m, want_w = ref_bpe(CORPUS, 12)
        assert got_m == want_m
        assert {r["word"]: r["syms"] for r in got_w.collect()} == want_w
        dist_m, dist_w = bpe.train_bpe(df, n_merges=12)
        assert got_m == dist_m
        assert ({r["word"]: r["syms"] for r in got_w.collect()}
                == {r["word"]: r["syms"] for r in dist_w.collect()})

    def test_deep_merge_list_matches_reference(self, spark):
        # enough merges to exercise the incremental index through many
        # rounds of pair retirement and re-creation
        texts = [" ".join(f"w{i % 37}x{i % 11}" for i in range(200))
                 for _ in range(4)] + CORPUS
        got_m, got_w = bpe.train_bpe_collected(_df(spark, texts),
                                               n_merges=150)
        want_m, want_w = ref_bpe(texts, 150)
        assert got_m == want_m
        assert {r["word"]: r["syms"] for r in got_w.collect()} == want_w

    def test_early_stop_and_greedy(self, spark):
        m, _ = bpe.train_bpe_collected(_df(spark, ["ab cd"]), n_merges=10)
        assert m == []
        m, w = bpe.train_bpe_collected(_df(spark, ["aaaa aaaa"]),
                                       n_merges=1)
        assert m == [("a", "a", 6)]
        [row] = w.collect()
        assert row["syms"] == ["aa", "aa", bpe.END_OF_WORD]

    def test_max_words_guard(self, spark):
        with pytest.raises(ValueError, match="max_words"):
            bpe.train_bpe_collected(_df(spark, CORPUS), n_merges=2,
                                    max_words=3)

    def test_apply_merge_matches_catalyst_fold(self, spark):
        # the Python merge twin vs the _merge_fold Catalyst aggregate
        cases = [["a", "a", "a", "</w>"], ["x", "y", "x", "y", "</w>"],
                 ["a"], [], ["y", "x", "y", "x"]]
        df = spark.createDataFrame([(c,) for c in cases],
                                   "syms array<string>")
        got = [r[0] for r in df.select(
            bpe._merge_fold(F.col("syms"), "x", "y")).collect()]
        want = [bpe._apply_merge(c, "x", "y") for c in cases]
        assert got == want


def test_merges_df_schema(spark):
    merges, _ = bpe.train_bpe(_df(spark, ["aa aa bb"]), n_merges=2)
    out = bpe.merges_df(spark, merges)
    assert out.columns == ["merge_idx", "left", "right", "n"]
    assert out.count() == len(merges)
