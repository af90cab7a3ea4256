"""Bucketed co-located join: zero-shuffle fact-fact join (subprocess —
the demo owns its own metastore/warehouse so the shared test session
and the repo stay clean)."""

import pathlib
import subprocess
import sys

import pytest

DEMO = pathlib.Path(__file__).parent.parent / "tools" / "bucketed_join_demo.py"


def test_bucketed_join_has_no_shuffle(tmp_path):
    out = subprocess.run(
        [sys.executable, str(DEMO), "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    last = out.stdout.strip().splitlines()[-1:]
    assert last == ["PLAN-OK"], f"stdout={out.stdout[-500:]} " \
                                f"stderr={out.stderr[-500:]}"


def test_salting_defuses_hot_host_skew(spark):
    """The corpus's two hot hosts own ~50% of rows (FIXTURES §1). A
    host-keyed repartition concentrates them on single partitions; the
    salted repartition spreads rows uniformly — the X5 skew guard the
    north rule mandates, measured, not asserted by fiat."""
    from pyspark.sql import functions as F

    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.partitioning import host_of, salted_repartition

    docs = generate_documents_df(spark, 2000, partitions=8)
    n_part = 16

    def max_share(df):
        sizes = (df.withColumn("p", F.spark_partition_id())
                 .groupBy("p").count().collect())
        total = sum(r["count"] for r in sizes)
        return max(r["count"] for r in sizes) / total

    naive = max_share(docs.repartition(n_part, host_of(F.col("url"))))
    salted = max_share(salted_repartition(docs, n_part))
    # hot host -> one partition holds ~a quarter of the corpus;
    # salted -> near-uniform 1/16 (allow 2x slack for hash variance)
    assert naive > 0.15, f"corpus no longer skewed? naive={naive}"
    assert salted < 2.0 / n_part, f"salting failed: {salted}"
    assert salted < naive / 2


class TestSplitAssign:
    """Deterministic leakage-safe splits (partitioning.split_assign)."""

    def _docs(self, spark, n=4000):
        from pyspark.sql import functions as F
        return spark.range(n).select(
            F.concat(F.lit("https://example.com/doc/"),
                     F.col("id").cast("string")).alias("url"), "id")

    @pytest.mark.parametrize("family", ["xxhash64", "md5"])
    def test_proportions_and_exhaustiveness(self, spark, family):
        from dxnn_ocr_cpp_spark.partitioning import split_assign
        out = split_assign(self._docs(spark), hash_family=family)
        counts = {r["split"]: r["count"]
                  for r in out.groupBy("split").count().collect()}
        n = sum(counts.values())
        assert set(counts) == {"train", "val", "test"}
        assert n == 4000
        assert counts["train"] / n == pytest.approx(0.98, abs=0.01)
        assert counts["val"] / n == pytest.approx(0.01, abs=0.007)

    def test_assignment_is_pure_function_of_key(self, spark):
        """Adding rows must never move an existing key's split (the
        randomSplit failure mode: partition-order dependence)."""
        from dxnn_ocr_cpp_spark.partitioning import split_assign

        def assign(n, parts):
            df = self._docs(spark, n).repartition(parts)
            return {r["url"]: r["split"]
                    for r in split_assign(df).collect()}

        small, big = assign(500, 1), assign(4000, 8)
        assert all(big[u] == s for u, s in small.items())

    def test_bad_fractions_rejected(self, spark):
        from dxnn_ocr_cpp_spark.partitioning import split_assign
        with pytest.raises(ValueError, match="sum to 1"):
            split_assign(self._docs(spark, 10),
                         splits=(("a", 0.5), ("b", 0.4)))


class TestQuotaSample:
    """Deterministic per-group cap (partitioning.quota_sample)."""

    def _hosts(self, spark, n=3000):
        # skewed: host 'big' owns ~90% of rows
        from pyspark.sql import functions as F
        return spark.range(n).select(
            F.concat(F.lit("https://x/"), F.col("id").cast("string"))
             .alias("url"),
            F.when(F.col("id") % 10 < 9, "big")
             .otherwise(F.concat(F.lit("s"), (F.col("id") % 7)
                                 .cast("string"))).alias("host"))

    @pytest.mark.parametrize("family", ["xxhash64", "md5"])
    def test_cap_respected_and_deterministic(self, spark, family):
        from dxnn_ocr_cpp_spark.partitioning import quota_sample
        out = quota_sample(self._hosts(spark), "host", cap=15,
                           hash_family=family)
        from pyspark.sql import functions as F
        per = {r["host"]: r["n"] for r in
               out.groupBy("host").agg(F.count("*").alias("n"))
               .collect()}
        assert per["big"] == 15          # hot host capped exactly
        assert all(v <= 15 for v in per.values())
        again = quota_sample(self._hosts(spark).repartition(16),
                             "host", cap=15, hash_family=family)
        assert sorted(r["url"] for r in out.collect()) == \
            sorted(r["url"] for r in again.collect())

    def test_winners_stable_under_corpus_growth(self, spark):
        """A winner can only be displaced by a new row with a smaller
        hash unit — never reshuffled arbitrarily (the sampleBy/rand
        failure mode)."""
        from dxnn_ocr_cpp_spark.partitioning import quota_sample
        small = quota_sample(self._hosts(spark, 1000), "host", cap=5,
                             hash_family="md5")
        big = quota_sample(self._hosts(spark, 3000), "host", cap=5,
                           hash_family="md5")
        small_u = {(r["host"], r["url"]): r["u"] for r in small.collect()}
        from pyspark.sql import functions as F
        big_max = {r["host"]: r["u"] for r in
                   big.groupBy("host").agg(F.max("u").alias("u"))
                   .collect()}
        # every dropped small-corpus winner lost to a smaller-u row
        for (h, url), u in small_u.items():
            kept = {r["url"] for r in big.collect() if r["host"] == h}
            if url not in kept:
                assert big_max[h] <= u

    def test_window_input_is_prethinned(self, spark):
        """The skew guard: the hot group's window must see ~oversample*
        cap rows, not the whole group."""
        from dxnn_ocr_cpp_spark.partitioning import hash_unit, quota_sample
        from pyspark.sql import functions as F
        df = self._hosts(spark, 20000)
        counts = df.groupBy("host").agg(F.count(F.lit(1)).alias("__n"))
        thinned = (df.withColumn("u", hash_unit(F.col("url")))
                   .join(counts, "host")
                   .filter(F.col("u") < F.least(
                       F.lit(1.0), F.lit(2.0 * 15) / F.col("__n"))))
        big_in = thinned.filter(F.col("host") == "big").count()
        assert big_in < 200              # vs 18000 raw rows
        assert quota_sample(df, "host", cap=15) \
            .filter(F.col("host") == "big").count() == 15
