"""Cluster entry point for spark-submit (see tools/submit_example.sh).

Reads the documents table (Iceberg `lake.db.documents` or a parquet
path), runs validation + checkpointed extraction, writes the extracted
table and lineage. Resumable: re-submitting after a failure skips every
checkpointed stage/url.

usage: run_extraction_job.py <documents_table_or_path> <checkpoint_root>
                             [output_table_or_path]
"""

import sys

from pyspark.sql import SparkSession


def main(argv):
    if len(argv) < 2:
        sys.exit("usage: run_extraction_job.py <documents_table_or_path> "
                 "<checkpoint_root> [output_table_or_path]")
    src, ckpt_root = argv[0], argv[1]
    out = argv[2] if len(argv) > 2 else None

    spark = SparkSession.builder.appName("dxnn-extract").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from dxnn_ocr_cpp_spark.operators.validate import validate_documents
    from dxnn_ocr_cpp_spark.pipeline import extract_checkpointed

    docs = (spark.read.table(src) if "." in src and "/" not in src
            else spark.read.parquet(src))
    valid, rejects = validate_documents(docs)
    extracted, run = extract_checkpointed(spark, valid, ckpt_root)
    rejects.write.mode("overwrite").parquet(f"{ckpt_root}/rejects")
    if out:
        if "." in out and "/" not in out:
            extracted.writeTo(out).createOrReplace()
        else:
            extracted.write.mode("overwrite").parquet(out)
    stats = run.lineage().groupBy("stage").sum("row_count").collect()
    print({r[0]: r[1] for r in stats})
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
