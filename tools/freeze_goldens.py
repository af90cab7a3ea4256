"""Freeze golden outputs (FIXTURES.md §4).

Runs the production pipeline at local[1] (single task — no parallelism
involved at all) over the seeded corpus and writes
tests/golden/golden_{n}.json: url -> {sha256(text), n_spans,
n_candidates, charset}. The e2e test then re-runs at local[4] with
repartition(16) and asserts byte-identity — the exact-match analog of
the reference's CER accuracy gate
(/root/reference/benchmark/calculate_acc.py:50-93), tightened to
equality per the north rule.

Usage: python tools/freeze_goldens.py [n_docs ...]
"""

import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.pipeline import extract
from dxnn_ocr_cpp_spark.session import build_session


def freeze(n_docs: int, out_dir: pathlib.Path) -> pathlib.Path:
    spark = build_session(app=f"freeze-goldens-{n_docs}", master="local[1]",
                          shuffle_partitions=1)
    try:
        docs = generate_documents_df(spark, n_docs, partitions=1)
        rows = extract(docs).collect()
        golden = {
            r["url"]: {
                "text_sha256": hashlib.sha256(r["text"].encode("utf-8")).hexdigest(),
                "n_spans": r["n_spans"],
                "n_candidates": r["n_candidates"],
                "charset": r["charset"],
            }
            for r in rows
        }
        assert len(golden) == n_docs
        out = out_dir / f"golden_{n_docs}.json"
        out.write_text(json.dumps(golden, indent=0, sort_keys=True))
        print(f"froze {n_docs} goldens -> {out}")
        return out
    finally:
        spark.stop()


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [200]
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)
    for n in sizes:
        freeze(n, out_dir)
