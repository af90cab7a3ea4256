"""End-to-end corpus -> training shards composition (q_corpus_to_shards):
html -> extract -> token gate -> bucketed-prefix-sum shard packing.

Pins fixture freshness (the driver-oracle frozen parquet), the
prefix-sum invariants of the composed output, and determinism under
partitioning — the north-rule invariant carried through the whole
chain, not just extraction.
"""

import pathlib

import pyarrow.parquet as pq

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _live(spark):
    from __spark_entry__ import q_corpus_to_shards
    return sorted(q_corpus_to_shards(spark, "").collect(),
                  key=lambda r: r["doc_no"])


def test_fixture_fresh(spark):
    """Frozen fixture must match a live run — regenerate with
    tools/freeze_extract_expected.py after semantics changes."""
    expected = {
        r["doc_no"]: r
        for r in pq.read_table(
            GOLDEN_DIR / "corpus_to_shards_expected.parquet").to_pylist()
    }
    live = _live(spark)
    assert len(live) == len(expected)
    for r in live:
        e = expected[r["doc_no"]]
        got = {k: r[k] for k in ("url", "doc_no", "n_tokens",
                                 "cum_tokens", "shard_id")}
        assert got == e, f"stale fixture for doc {r['doc_no']}"


def test_prefix_sum_invariants(spark):
    """cum_tokens is the exclusive prefix sum in doc_no order;
    shard_id = floor(cum/budget); the token gate really filtered."""
    rows = _live(spark)
    assert 0 < len(rows) < 200          # gate dropped some docs
    run = 0
    for r in rows:
        assert r["cum_tokens"] == run
        assert r["n_tokens"] >= 40
        assert r["shard_id"] == run // 20_000
        run += r["n_tokens"]
    assert rows[-1]["shard_id"] >= 1    # budget produces >1 shard


def test_deterministic_under_partitioning(spark):
    from pyspark.sql import functions as F

    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.operators.shards import pack_shards
    from dxnn_ocr_cpp_spark.operators.textstats import token_count
    from dxnn_ocr_cpp_spark.pipeline import extract

    def run(parts):
        docs = generate_documents_df(spark, 80).repartition(parts)
        kept = (extract(docs).select(
                    F.regexp_extract("url", r"page-(\d+)$", 1)
                     .cast("long").alias("doc_no"),
                    token_count(F.col("text")).cast("long")
                     .alias("n_tokens"))
                .filter(F.col("n_tokens") >= 40))
        packed = pack_shards(kept, tokens_col="n_tokens",
                             order_col="doc_no",
                             shard_tokens=20_000, bucket_width=32)
        return sorted((r["doc_no"], r["cum_tokens"], r["shard_id"])
                      for r in packed.collect())

    assert run(1) == run(16)
