"""Content-defined-chunking exact-substring dedup (operators/cdc.py).

The md5 hash family is replayed by a pure-Python reference below —
the same role the DuckDB oracle plays for the driver query: an
independent implementation of the cut rule, chunking, duplicate
detection, and span removal that the Spark operator must match
byte-for-byte.
"""
import hashlib

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.cdc import (cdc_chunks, duplicate_spans,
                                              remove_duplicate_spans)

W = 16

BOILER = ("This material may not be published, broadcast, rewritten "
          "or redistributed without express written consent of the "
          "publisher; all rights reserved worldwide, forever. ") * 2


def _doc(i: int, with_boiler: bool) -> str:
    body = (f"Document {i} body paragraph about topic {i * 7 % 13}. "
            * (8 + i % 5))
    return (body + BOILER + f"Unique trailer {i}." if with_boiler
            else body + f"Unique trailer {i}.")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(i, with_boiler=i % 2 == 0)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---- pure-Python reference of the md5 family (the oracle's twin) ----

def ref_chunks(text: str, w: int = W):
    cuts = []
    for i in range(w, len(text)):           # 1-based cut at i in [w, n-1]
        h = hashlib.md5(text[i - w:i].encode()).hexdigest()
        if h[0] == "0" and h[1] in "01234567":
            cuts.append(i)
    starts = [1] + [c + 1 for c in cuts]
    ends = cuts + [len(text)]
    return [(s, e - s + 1, hashlib.md5(text[s - 1:e].encode()).hexdigest())
            for s, e in zip(starts, ends)]


class TestChunks:
    def test_matches_python_reference(self, spark, corpus):
        got = {(r["doc_id"], r["start"], r["length"], r["chunk_key"])
               for r in cdc_chunks(corpus, hash_family="md5").collect()}
        want = set()
        for row in corpus.collect():
            for s, ln, k in ref_chunks(row["text"]):
                want.add((row["doc_id"], s, ln, k))
        assert got == want

    def test_chunks_partition_the_text(self, spark, corpus):
        for fam in ("md5", "xxhash64"):
            ch = (cdc_chunks(corpus, hash_family=fam)
                  .groupBy("doc_id")
                  .agg(F.sum("length").alias("total"),
                       F.min("start").alias("first"),
                       F.count("*").alias("n")).collect())
            lens = {r["doc_id"]: len(r["text"]) for r in corpus.collect()}
            for r in ch:
                assert r["first"] == 1
                assert r["total"] == lens[r["doc_id"]]

    def test_short_and_hostile_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "tiny"), (2, ""), (3, None), (4, "x" * W)],
            "doc_id long, text string")
        rows = cdc_chunks(df).collect()
        # null/empty drop out (nothing to chunk); short docs = 1 chunk
        assert {(r["doc_id"], r["start"], r["length"]) for r in rows} \
            == {(1, 1, 4), (4, 1, W)}

    def test_bad_family_rejected(self, corpus):
        with pytest.raises(ValueError):
            cdc_chunks(corpus, hash_family="sha1")


class TestDuplicateSpans:
    def test_translation_invariant_detection(self, spark, corpus):
        # BOILER sits at a different offset in every even doc; the
        # interior chunks must still align — every even doc must
        # report duplicated spans. (Superset allowed: the repeated-
        # sentence bodies legitimately share >32-char runs across
        # docs with colliding topic numbers, e.g. docs 4 and 17 —
        # test_flagged_spans_are_really_duplicated proves every extra
        # flag is a true duplicate.)
        for fam in ("md5", "xxhash64"):
            spans = duplicate_spans(corpus, hash_family=fam).collect()
            hit = {r["doc_id"] for r in spans}
            assert hit >= {i for i in range(20) if i % 2 == 0}, fam

    def test_flagged_spans_are_really_duplicated(self, spark, corpus):
        texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
        spans = duplicate_spans(corpus, hash_family="md5").collect()
        by_text = {}
        for r in spans:
            sub = texts[r["doc_id"]][r["start"] - 1:
                                     r["start"] - 1 + r["length"]]
            by_text.setdefault(sub, set()).add(r["doc_id"])
        for sub, docs in by_text.items():
            assert len(docs) >= 2, f"span not cross-doc: {sub[:40]!r}"

    def test_min_docs_counts_distinct_documents(self, spark):
        """min_docs is a DISTINCT-document threshold: a span repeated
        twice inside one doc plus once in another (3 total copies, 2
        docs) must NOT satisfy min_docs=3."""
        boiler = BOILER * 3  # long enough to chunk identically everywhere
        rows = [(1, f"alpha intro {'x' * 40} " + boiler
                    + " middle filler " + boiler + " tail one"),
                (2, f"beta intro {'y' * 40} " + boiler + " tail two"),
                (3, "gamma unrelated body " + "z" * 120)]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        at2 = duplicate_spans(d, min_docs=2, hash_family="md5").collect()
        assert {r["doc_id"] for r in at2} == {1, 2}
        # every flagged chunk lives in exactly 2 docs -> min_docs=3 empty,
        # even though the shared chunks have n_copies >= 3
        assert max(r["n_copies"] for r in at2) >= 3
        at3 = duplicate_spans(d, min_docs=3, hash_family="md5").collect()
        assert at3 == []

    def test_single_exchange_no_python(self, spark, corpus):
        plan = duplicate_spans(corpus)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1
        for node in ("ArrowEval", "BatchEvalPython", "SortMergeJoin"):
            assert node not in plan

    def test_partitioning_invariance(self, spark, corpus):
        a = sorted(map(tuple, duplicate_spans(
            corpus.repartition(1)).collect()))
        b = sorted(map(tuple, duplicate_spans(
            corpus.repartition(13)).collect()))
        assert a == b and a


class TestRemoveSpans:
    def _ref_remove(self, rows, keep):
        # pure-Python replay: chunk every doc, find cross-doc dup
        # chunk keys, drop per policy, reassemble
        chunks = {i: ref_chunks(t) for i, t in rows if t}
        owners = {}
        for i, cs in chunks.items():
            for s, ln, k in cs:
                owners.setdefault(k, set()).add(i)
        cross = {k for k, d in owners.items() if len(d) >= 2}
        first_seen = {}
        for i in sorted(chunks):
            for s, ln, k in sorted(chunks[i]):
                if k in cross and k not in first_seen:
                    first_seen[k] = (i, s)
        out = {}
        for i, t in rows:
            if not t:
                out[i] = ""
                continue
            parts = []
            for s, ln, k in chunks[i]:
                dup = k in cross
                if dup and keep == "none":
                    continue
                if dup and keep == "first" and first_seen[k] != (i, s):
                    continue
                parts.append(t[s - 1:s - 1 + ln])
            out[i] = "".join(parts)
        return out

    @pytest.mark.parametrize("keep", ["first", "none"])
    def test_matches_python_reference(self, spark, corpus, keep):
        rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
        want = self._ref_remove(rows, keep)
        got = {r["doc_id"]: r["text"]
               for r in remove_duplicate_spans(
                   corpus, keep=keep, hash_family="md5").collect()}
        assert got == want
        # the boilerplate really is gone from every doc but (at most)
        # the keeper
        carriers = [i for i, t in got.items() if BOILER[:60] in t]
        assert len(carriers) <= (1 if keep == "first" else 0)

    def test_rows_preserved(self, spark, corpus):
        assert remove_duplicate_spans(corpus).count() == corpus.count()

    def test_bad_keep_rejected(self, corpus):
        with pytest.raises(ValueError):
            remove_duplicate_spans(corpus, keep="last")
