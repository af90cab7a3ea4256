"""Incremental dedup against a persisted MinHash index
(operators/dedup.py: write_minhash_index / read_minhash_index /
incremental_dedup): index roundtrip, both dedup stages on planted
fixtures, determinism of the best-match tie-break, and agreement with
the one-shot pair miner's family.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.dedup import (incremental_dedup,
                                                minhash_lsh_pairs,
                                                minhash_signature_table,
                                                read_minhash_index,
                                                write_minhash_index)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby every single morning")
OTHER = ("completely unrelated text about distributed query engines "
         "and shuffle partitioning strategies for petabyte analytics "
         "workloads in modern cloud data platforms today")
THIRD = ("a third entirely different document discussing sourdough "
         "bread hydration ratios fermentation schedules and oven "
         "steam techniques for home bakers with dutch ovens")


def corpus_df(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, BASE + " bonus tail words here")],
        "doc_id long, text string")


@pytest.fixture()
def index(spark, tmp_path):
    path = str(tmp_path / "mhidx")
    write_minhash_index(corpus_df(spark), path)
    return read_minhash_index(spark, path)


class TestIndexRoundtrip:
    def test_meta_records_family(self, spark, tmp_path):
        path = str(tmp_path / "idx")
        write_minhash_index(corpus_df(spark), path, n=2, num_perm=32,
                            bands=8, hash_family="md5")
        _, _, meta = read_minhash_index(spark, path)
        assert (meta["n"], meta["num_perm"], meta["bands"],
                meta["hash_family"]) == (2, 32, 8, "md5")

    def test_band_table_shape(self, spark, index):
        bands_df, sh_df, meta = index
        # one row per (doc, band); shingles one row per doc
        assert bands_df.count() == 3 * meta["bands"]
        assert sh_df.count() == 3
        assert set(bands_df.columns) == {"id", "band", "bucket"}


class TestIncrementalStages:
    def test_corpus_duplicate_dropped_with_best_match(self, spark, index):
        # doc 100 is an exact copy of corpus doc 1 (jaccard 1.0); docs
        # 1 and 3 BOTH match, tie-break must pick max jaccard first
        batch = spark.createDataFrame(
            [(100, BASE)], "doc_id long, text string")
        out = {r.id: r for r in incremental_dedup(
            batch, index, threshold=0.4).collect()}
        assert not out[100].keep
        assert out[100].dup_of == 1
        assert out[100].jaccard == pytest.approx(1.0)

    def test_fresh_doc_kept(self, spark, index):
        batch = spark.createDataFrame(
            [(101, THIRD)], "doc_id long, text string")
        out = incremental_dedup(batch, index, threshold=0.4).collect()
        assert len(out) == 1
        r = out[0]
        assert r.keep and r.dup_of is None and r.jaccard is None

    def test_batch_internal_dedup_keeps_min_id(self, spark, index):
        # two identical NEW docs, no corpus match: min id survives,
        # the other points at its representative with null jaccard
        batch = spark.createDataFrame(
            [(201, THIRD), (200, THIRD)], "doc_id long, text string")
        out = {r.id: r for r in incremental_dedup(
            batch, index, threshold=0.4).collect()}
        assert out[200].keep and out[200].dup_of is None
        assert not out[201].keep
        assert out[201].dup_of == 200 and out[201].jaccard is None

    def test_below_threshold_corpus_match_kept(self, spark, index):
        # shares a few words with BASE but far below 0.4 jaccard
        weak = ("the quick dog sat still while a completely new story "
                "about mountain weather patterns unfolded across many "
                "unrelated paragraphs of fresh descriptive text")
        batch = spark.createDataFrame(
            [(300, weak)], "doc_id long, text string")
        out = incremental_dedup(batch, index, threshold=0.9).collect()
        assert out[0].keep

    def test_one_row_per_batch_doc(self, spark, index):
        batch = spark.createDataFrame(
            [(400, BASE), (401, THIRD), (402, THIRD), (403, OTHER)],
            "doc_id long, text string")
        out = incremental_dedup(batch, index, threshold=0.4)
        assert out.count() == 4
        assert out.select("id").distinct().count() == 4


class TestFamilyAgreement:
    def test_matches_one_shot_miner_on_union(self, spark, tmp_path):
        """A batch doc dropped by incremental_dedup's corpus stage must
        correspond to a pair the one-shot miner finds on corpus+batch
        (same family, same threshold) — the incremental path is a
        re-plumbing, not a different algorithm."""
        corpus = corpus_df(spark)
        path = str(tmp_path / "idx2")
        write_minhash_index(corpus, path)
        index = read_minhash_index(spark, path)
        batch = spark.createDataFrame(
            [(100, BASE), (101, THIRD)], "doc_id long, text string")
        inc = {r.id: r for r in incremental_dedup(
            batch, index, threshold=0.4).collect()}
        pairs = {(r.a, r.b) for r in minhash_lsh_pairs(
            corpus.unionByName(batch), threshold=0.4,
            carry="ride_along").collect()}
        cross = {p for p in pairs if (p[0] < 100) != (p[1] < 100)}
        dropped_vs_corpus = {i for i, r in inc.items()
                             if r.jaccard is not None}
        assert dropped_vs_corpus == {
            max(p) for p in cross}  # batch ids are the larger side
        assert inc[101].keep

    def test_signature_table_matches_index_contents(self, spark,
                                                    tmp_path):
        corpus = corpus_df(spark)
        path = str(tmp_path / "idx3")
        write_minhash_index(corpus, path)
        _, sh_df, _ = read_minhash_index(spark, path)
        live = minhash_signature_table(corpus).select("id", "sh")
        stored = {r.id: list(r.sh) for r in sh_df.collect()}
        fresh = {r.id: list(r.sh) for r in live.collect()}
        assert stored == fresh
