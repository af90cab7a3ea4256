"""Curation policy operators (operators/curation.py): PII redaction,
repetition filters, benchmark decontamination, NFC normalization —
semantics on crafted inputs plus the plan shapes that make each safe at
100 TB (zero-shuffle projections; broadcast-only decontamination join).
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.curation import (DUP_2GRAM_FRAC_MAX,
                                                   DUP_WORD_FRAC_MAX,
                                                   decontaminate,
                                                   normalize_nfc,
                                                   pii_counts, redact_pii,
                                                   repetition_features,
                                                   repetition_ok)


def one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


class TestPII:
    def test_all_kinds_redacted_and_counted(self, spark):
        t = ("mail a.b+c@x-y.co.uk or d@e.io, host 192.168.001.200, "
             "call (555) 123-4567 / 555.123.4567 / 555-123-4567")
        df = one(spark, t).select(
            redact_pii(F.col("text")).alias("red"),
            *[c.alias(k) for k, c in pii_counts(F.col("text")).items()])
        r = df.collect()[0]
        assert r["email"] == 2 and r["ipv4"] == 1 and r["phone"] == 3
        assert "@" not in r["red"] and "192.168" not in r["red"]
        assert r["red"].count("<EMAIL>") == 2
        assert r["red"].count("<PHONE>") == 3
        assert r["red"].count("<IP>") == 1

    def test_ip_not_eaten_by_phone_and_clean_text_untouched(self, spark):
        clean = "no pii here, just words and 42 numbers"
        rows = (one(spark, "from 10.0.0.1 port 80")
                .unionAll(one(spark, clean))
                .select(redact_pii(F.col("text")).alias("red")).collect())
        assert rows[0]["red"] == "from <IP> port 80"
        assert rows[1]["red"] == clean

    def test_idempotent(self, spark):
        t = "x bob@example.com y"
        once = one(spark, t).select(redact_pii(F.col("text")).alias("r"))
        twice = once.select(redact_pii(F.col("r")).alias("r"))
        assert once.collect() == twice.collect()

    def test_zero_shuffle_plan(self, spark):
        df = one(spark, "a").select(redact_pii(F.col("text")))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan  # pure Catalyst


class TestRepetition:
    def feats(self, spark, text):
        f = repetition_features(F.col("text"))
        return one(spark, text).select(
            *[c.alias(k) for k, c in f.items()],
            repetition_ok(f).alias("keep")).collect()[0]

    def test_degenerate_repetition_fails_gate(self, spark):
        r = self.feats(spark, "spam " * 50)
        assert r["n_words"] == 50
        assert r["dup_word_frac"] == pytest.approx(1 - 1 / 50)
        assert r["dup_2gram_frac"] == pytest.approx(1 - 1 / 49)
        assert r["dup_word_frac"] > DUP_WORD_FRAC_MAX
        assert not r["keep"]

    def test_normal_prose_passes(self, spark):
        r = self.feats(spark, "the quick brown fox jumps over the lazy dog")
        assert r["n_words"] == 9
        assert r["dup_word_frac"] == pytest.approx(1 / 9)  # 'the' twice
        assert r["dup_2gram_frac"] == 0.0
        assert r["mean_word_len"] == pytest.approx(35 / 9)
        assert r["keep"]

    def test_bigram_loop_caught_even_with_distinct_ok(self, spark):
        # "a b a b ..." — dup_word_frac high too, but the 2-gram frac is
        # the decisive loop detector
        r = self.feats(spark, "alpha beta " * 30)
        assert r["dup_2gram_frac"] > DUP_2GRAM_FRAC_MAX
        assert not r["keep"]

    def test_empty_and_single_word(self, spark):
        r = self.feats(spark, "")
        assert (r["n_words"], r["dup_word_frac"], r["dup_2gram_frac"],
                r["mean_word_len"]) == (0, 0.0, 0.0, 0.0)
        assert not r["keep"]  # mean_word_len below range
        r = self.feats(spark, "hello")
        assert r["n_words"] == 1 and r["dup_2gram_frac"] == 0.0
        assert r["keep"]

    def test_zero_shuffle_plan(self, spark):
        f = repetition_features(F.col("text"))
        df = one(spark, "a b").select(*[c.alias(k) for k, c in f.items()])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDecontaminate:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        evalset = spark.createDataFrame(
            [(100, "the capital of france is paris it lies on the seine")],
            "doc_id long, text string")
        train = spark.createDataFrame(
            [(1, "the capital of france is paris a fact everyone knows"),
             (2, "unrelated words about spark shuffles and parquet files"),
             (3, "it lies on the seine said the guide in paris")],
            "doc_id long, text string")
        return train, evalset

    @pytest.mark.parametrize("family", ["blake2b", "grams"])
    def test_planted_overlap_flagged(self, corpora, family):
        train, evalset = corpora
        got = {r["doc_id"]: r["n_shared"]
               for r in decontaminate(train, evalset, min_common=2,
                                      gram_family=family).collect()}
        assert 1 in got and got[1] >= 4   # shares 'the capital of' run
        assert 3 in got
        assert 2 not in got               # disjoint vocabulary

    def test_families_agree(self, corpora):
        train, evalset = corpora
        a = sorted(decontaminate(train, evalset, min_common=2,
                                 gram_family="blake2b").collect())
        b = sorted(decontaminate(train, evalset, min_common=2,
                                 gram_family="grams").collect())
        assert a == b

    def test_broadcast_only_join_plan(self, corpora):
        train, evalset = corpora
        df = decontaminate(train, evalset)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        for node in ("SortMergeJoin", "CartesianProduct",
                     "BroadcastNestedLoopJoin"):
            assert node not in plan


class TestNFC:
    def test_composes_and_idempotent(self, spark):
        df = spark.createDataFrame(
            [("cafe\u0301",), ("caf\u00e9",), (None,), ("ascii only",)],
            "text string").select(
            "text", normalize_nfc(F.col("text")).alias("n"))
        rows = df.collect()
        assert rows[0]["n"] == "caf\u00e9" and len(rows[0]["n"]) == 4
        assert rows[1]["n"] == "caf\u00e9"       # already NFC: unchanged
        assert rows[2]["n"] is None              # None-safe
        assert rows[3]["n"] == "ascii only"
        again = df.select(normalize_nfc(F.col("n")).alias("n2")).collect()
        assert [r["n2"] for r in again] == [r["n"] for r in rows]
