"""Golden-file e2e: byte-identical extraction vs frozen goldens.

Goldens were produced by tools/freeze_goldens.py at local[1]; this test
runs the same corpus at local[4] with repartition(16) and asserts every
url's extracted text hashes identically — the north-rule invariant
(parallelism-independent byte-identity), analog of the reference's
golden-corpus gate (/root/reference/benchmark/calculate_acc.py:186-207)
with CER tightened to equality.
"""

import hashlib
import json
import pathlib

import pytest

from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.pipeline import extract

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.mark.parametrize("n_docs", [200])
def test_golden_byte_identity(spark, n_docs):
    golden = json.loads((GOLDEN_DIR / f"golden_{n_docs}.json").read_text())
    docs = generate_documents_df(spark, n_docs, partitions=4).repartition(16)
    rows = extract(docs).collect()
    assert len(rows) == len(golden) == n_docs
    mismatches = []
    for r in rows:
        g = golden[r["url"]]
        h = hashlib.sha256(r["text"].encode("utf-8")).hexdigest()
        if (h != g["text_sha256"] or r["n_spans"] != g["n_spans"]
                or r["n_candidates"] != g["n_candidates"]
                or r["charset"] != g["charset"]):
            mismatches.append(r["url"])
    assert not mismatches, f"{len(mismatches)} golden mismatches: {mismatches[:5]}"


def test_extract_corpus_fixture_fresh(spark):
    """The driver-oracle fixture (extract_corpus_expected.parquet) must
    match a live run — catches a stale fixture after extraction-semantics
    changes BEFORE the driver's DuckDB compare does. Regenerate with
    tools/freeze_extract_expected.py."""
    import pyarrow.parquet as pq

    from __spark_entry__ import q_extract_corpus

    expected = {
        r["url"]: r
        for r in pq.read_table(
            GOLDEN_DIR / "extract_corpus_expected.parquet").to_pylist()
    }
    live = q_extract_corpus(spark, "").collect()
    assert len(live) == len(expected)
    for r in live:
        e = expected[r["url"]]
        got = {k: r[k] for k in ("url", "n_spans", "n_candidates",
                                 "charset", "text_len", "text_md5")}
        assert got == e, f"stale fixture for {r['url']}: {got} != {e}"
