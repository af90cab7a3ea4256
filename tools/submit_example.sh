#!/usr/bin/env bash
# Real-cluster deployment shape (north rule: spark-submit --py-files on
# a multi-executor cluster, Iceberg tables bucketed on hash(url)).
# The sandbox has no cluster; this documents the exact invocation.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

# package the engine
zip -qr /tmp/dxnn_ocr_cpp_spark.zip dxnn_ocr_cpp_spark

exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode cluster \
  --py-files /tmp/dxnn_ocr_cpp_spark.zip \
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog.lake.type=hadoop \
  --conf spark.sql.catalog.lake.warehouse="${WAREHOUSE:-s3a://bucket/warehouse}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \
  --conf spark.sql.execution.arrow.maxBytesPerBatch=33554432 \
  --conf spark.sql.shuffle.partitions=2000 \
  --conf spark.executor.memory=16g \
  --conf spark.executor.cores=8 \
  tools/run_extraction_job.py "$@"
