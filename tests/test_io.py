"""Storage-seam smoke tests (io.py). The sandbox has no Iceberg
runtime jar, so the Iceberg branch is environment-gated: these tests
lint the shipped DDL strings, exercise the availability probe's
fallback path explicitly, and round-trip the parquet fallback — the
only branch left untested is jar-present, which needs a real cluster."""

import re

from dxnn_ocr_cpp_spark.io import (ICEBERG_DDL, iceberg_available,
                                   read_table, write_table)


class TestIcebergDDL:
    def test_all_tables_format(self):
        for name, ddl in ICEBERG_DDL.items():
            rendered = ddl.format(catalog="cat", db="db", url_buckets=128)
            assert "{" not in rendered, f"unfilled placeholder in {name}"
            assert "USING iceberg" in rendered
            assert re.search(r"CREATE TABLE IF NOT EXISTS cat\.db\.", rendered)

    def test_data_tables_bucket_partitioned(self):
        # north rule: documents/extracted partitioned bucket(N, url)
        for name in ("documents", "extracted"):
            rendered = ICEBERG_DDL[name].format(catalog="c", db="d",
                                                url_buckets=128)
            assert "PARTITIONED BY (bucket(128, url))" in rendered, name

    def test_format_version_2(self):
        for name in ("documents", "extracted"):
            assert "'format-version'='2'" in ICEBERG_DDL[name], name

    def test_lineage_schema_matches_lineage_module(self):
        # the DDL must stay in sync with the columns lineage_rows emits
        ddl = ICEBERG_DDL["_lineage"]
        for col in ("run_id", "stage", "partition_id", "row_count",
                    "bytes_in", "bytes_out", "content_hash", "wall_ms"):
            assert col in ddl, col


def test_iceberg_available_fallback(spark):
    # sandbox has no iceberg-spark-runtime jar: the probe must return
    # False (not raise) and thereby select the parquet branch
    assert iceberg_available(spark) is False


def test_parquet_roundtrip_with_bucket_col(spark, tmp_path):
    from pyspark.sql import functions as F
    path = str(tmp_path / "t")
    df = spark.range(100).withColumn("b", F.pmod(F.xxhash64("id"), F.lit(8)))
    write_table(df, path, bucket_col="b")
    back = read_table(spark, path)
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))
