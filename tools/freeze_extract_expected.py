"""Freeze the extract_corpus + extract_markdown expected outputs.

Runs q_extract_corpus and q_extract_markdown at local[1] (single
task, no parallelism) and writes
tests/golden/extract_corpus_expected.parquet and
tests/golden/extract_markdown_expected.parquet as ONE pyarrow file
each with explicit types so the DuckDB oracles
`SELECT .. FROM read_parquet(..)` return schemas identical to the
Spark queries'. Regenerate whenever extraction/rendering semantics
change — tests/test_golden.py::test_extract_corpus_fixture_fresh and
tests/test_markdown.py::test_markdown_fixture_fresh fail on
staleness first.

Usage: python tools/freeze_extract_expected.py
"""

import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

EXPECTED = (pathlib.Path(__file__).resolve().parent.parent
            / "tests" / "golden" / "extract_corpus_expected.parquet")

MD_EXPECTED = EXPECTED.parent / "extract_markdown_expected.parquet"

SCHEMA = pa.schema([("url", pa.string()),
                    ("n_spans", pa.int64()),
                    ("n_candidates", pa.int64()),
                    ("charset", pa.string()),
                    ("text_len", pa.int64()),
                    ("text_md5", pa.string())])

MD_SCHEMA = pa.schema([("url", pa.string()),
                       ("md_len", pa.int64()),
                       ("md_md5", pa.string()),
                       ("n_headings", pa.int64()),
                       ("n_list_items", pa.int64())])

SHARDS_EXPECTED = EXPECTED.parent / "corpus_to_shards_expected.parquet"

SHARDS_SCHEMA = pa.schema([("url", pa.string()),
                           ("doc_no", pa.int64()),
                           ("n_tokens", pa.int64()),
                           ("cum_tokens", pa.int64()),
                           ("shard_id", pa.int64())])


def freeze() -> None:
    from __spark_entry__ import (q_corpus_to_shards, q_extract_corpus,
                                 q_extract_markdown)
    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app="freeze-extract-expected", master="local[1]",
                          shuffle_partitions=1)
    try:
        EXPECTED.parent.mkdir(parents=True, exist_ok=True)
        for q, schema, path in ((q_extract_corpus, SCHEMA, EXPECTED),
                                (q_extract_markdown, MD_SCHEMA,
                                 MD_EXPECTED),
                                (q_corpus_to_shards, SHARDS_SCHEMA,
                                 SHARDS_EXPECTED)):
            rows = sorted(q(spark, "").collect(), key=lambda r: r["url"])
            tbl = pa.Table.from_pylist([r.asDict() for r in rows],
                                       schema=schema)
            pq.write_table(tbl, path)
            print(f"froze {tbl.num_rows} rows -> {path}")
    finally:
        spark.stop()


if __name__ == "__main__":
    freeze()
