"""Freeze the extract_corpus driver-query expected output.

Runs q_extract_corpus at local[1] (single task, no parallelism) and
writes tests/golden/extract_corpus_expected.parquet as ONE pyarrow
file with explicit types (url/charset/text_md5 string, counters
int64) so the DuckDB oracle `SELECT .. FROM read_parquet(..)` returns
a schema identical to the Spark query's. Regenerate whenever
extraction semantics change — tests/test_golden.py::
test_extract_corpus_fixture_fresh fails on staleness first.

Usage: python tools/freeze_extract_expected.py
"""

import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

EXPECTED = (pathlib.Path(__file__).resolve().parent.parent
            / "tests" / "golden" / "extract_corpus_expected.parquet")

SCHEMA = pa.schema([("url", pa.string()),
                    ("n_spans", pa.int64()),
                    ("n_candidates", pa.int64()),
                    ("charset", pa.string()),
                    ("text_len", pa.int64()),
                    ("text_md5", pa.string())])


def freeze() -> None:
    from __spark_entry__ import q_extract_corpus
    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app="freeze-extract-expected", master="local[1]",
                          shuffle_partitions=1)
    try:
        rows = sorted(q_extract_corpus(spark, "").collect(),
                      key=lambda r: r["url"])
        tbl = pa.Table.from_pylist([r.asDict() for r in rows],
                                   schema=SCHEMA)
        EXPECTED.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(tbl, EXPECTED)
        print(f"froze {tbl.num_rows} rows -> {EXPECTED}")
    finally:
        spark.stop()


if __name__ == "__main__":
    freeze()
