"""Checkpoint + per-partition lineage (X15 — absent in the reference,
mandated by the north rule; stats shape mirrors OCRPipelineStats,
/root/reference/include/pipeline/ocr_pipeline.h:98-128).

Design: a stage checkpoint is a parquet/Iceberg write of the stage
output keyed by url. Lineage rows are computed FROM the checkpointed
data by a cheap aggregation over spark_partition_id() — no mutable
side-channel from inside tasks (speculative execution / task retries
would double-count). content_hash is an order-insensitive BIT_XOR of
per-row xxhash64 (no overflow under ANSI mode), stable across
partitioning changes, and compositional: the whole-table hash is the
XOR of the per-partition hashes.

Resume: anti-join the input on already-checkpointed urls — idempotent,
re-running a partially-complete run never duplicates work or rows.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.schemas import LINEAGE


def new_run_id() -> str:
    # uuid4 is fine here: run ids label runs, they never affect data
    return uuid.uuid4().hex[:16]


def lineage_rows(df: DataFrame, run_id: str, stage: str,
                 bytes_in_col: str | None = None,
                 bytes_out_col: str | None = None) -> DataFrame:
    """Per-partition lineage from a (materialized) stage output."""
    hash_all = F.xxhash64(*[F.col(c) for c in df.columns])
    agg = (df
           .withColumn("_pid", F.spark_partition_id())
           .withColumn("_h", hash_all)
           .groupBy("_pid")
           .agg(
               F.count(F.lit(1)).alias("row_count"),
               (F.sum(F.length(F.col(bytes_in_col))) if bytes_in_col
                else F.lit(None).cast("long")).alias("bytes_in"),
               (F.sum(F.length(F.col(bytes_out_col))) if bytes_out_col
                else F.lit(None).cast("long")).alias("bytes_out"),
               F.expr("bit_xor(_h)").alias("content_hash"),
           ))
    return agg.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.col("_pid").cast("int").alias("partition_id"),
        F.col("row_count").cast("long"),
        F.col("bytes_in").cast("long"),
        F.col("bytes_out").cast("long"),
        F.col("content_hash").cast("long"),
        F.lit(None).cast("double").alias("wall_ms"),
    )


class CheckpointedRun:
    """Stage-by-stage checkpointing with resume (kill-and-rerun safe).

    Layout under `root`:
        <root>/<stage>/data/      parquet stage output
        <root>/_lineage/          lineage rows (append, one dir per stage run)
    """

    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.run_id = run_id or new_run_id()

    def _stage_path(self, stage: str) -> str:
        return f"{self.root}/{stage}/data"

    def has_stage(self, stage: str) -> bool:
        # parquet write is atomic-ish via _SUCCESS marker
        return os.path.exists(os.path.join(self._stage_path(stage), "_SUCCESS"))

    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_path(stage))

    def run_stage(self, stage: str, df_fn, inputs_done: DataFrame | None = None,
                  bytes_in_col: str | None = None,
                  bytes_out_col: str | None = None,
                  force: bool = False) -> DataFrame:
        """Execute-or-resume one stage. `df_fn()` builds the stage
        DataFrame lazily; it only runs when the checkpoint is absent —
        or when `force` says an upstream stage was extended and this
        derived checkpoint is stale."""
        t0 = time.monotonic()
        if force or not self.has_stage(stage):
            df = df_fn()
            df.write.mode("overwrite").parquet(self._stage_path(stage))
            out = self.read_stage(stage)
            wall = (time.monotonic() - t0) * 1000.0
            lin = lineage_rows(out, self.run_id, stage, bytes_in_col, bytes_out_col) \
                .withColumn("wall_ms", F.lit(wall))
            (lin.coalesce(1).write.mode("append")
                .parquet(f"{self.root}/_lineage"))
        return self.read_stage(stage)

    def invalidate_stage(self, stage: str) -> None:
        """Persistently mark a stage checkpoint stale by removing its
        _SUCCESS marker — run_stage will rebuild it."""
        marker = os.path.join(self._stage_path(stage), "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)

    def run_incremental_stage(self, stage: str, inputs: DataFrame, df_fn,
                              key: str = "url",
                              bytes_in_col: str | None = None,
                              bytes_out_col: str | None = None,
                              invalidates: tuple = ()):
        """Execute-or-extend one keyed stage: inputs already present in
        the checkpoint are skipped (anti-join on `key`); the rest are
        processed and APPENDED. This is the real per-doc resume — a
        prior run that completed over a subset of the corpus (or a
        re-submission with new documents) only pays for the missing
        keys. Returns (stage DataFrame, appended: bool).

        `invalidates` lists DERIVED stage checkpoints; their _SUCCESS
        markers are removed on disk BEFORE this stage is extended, so a
        crash between the append and the derived rebuild leaves them
        marked stale (rebuilt next run) instead of silently served.

        df_fn(todo) must emit >=1 row per input key (F8: block-less
        docs still get a null-block row) or resume would re-do them.
        Lineage is computed over the INCREMENT only (re-evaluating
        df_fn(todo) once more — increment-sized): full-checkpoint
        rescans would both double-count row sums in _lineage and
        re-hash 10^12 rows to record a 1-row append.
        """
        t0 = time.monotonic()
        if not self.has_stage(stage):
            for s in invalidates:
                self.invalidate_stage(s)
            df_fn(inputs).write.mode("overwrite").parquet(self._stage_path(stage))
            appended = True
            lin_src = self.read_stage(stage)
        else:
            todo = self.resume_filter(inputs, stage, key=key)
            appended = not todo.isEmpty()
            if appended:
                for s in invalidates:
                    self.invalidate_stage(s)
                out_new = df_fn(todo)
                out_new.write.mode("append").parquet(self._stage_path(stage))
                lin_src = out_new
        if appended:
            wall = (time.monotonic() - t0) * 1000.0
            lin = lineage_rows(lin_src, self.run_id, stage,
                               bytes_in_col, bytes_out_col) \
                .withColumn("wall_ms", F.lit(wall))
            (lin.coalesce(1).write.mode("append")
                .parquet(f"{self.root}/_lineage"))
        return self.read_stage(stage), appended

    def lineage(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE).parquet(f"{self.root}/_lineage")

    def resume_filter(self, documents: DataFrame, stage: str,
                      key: str = "url") -> DataFrame:
        """Drop inputs already present in a stage checkpoint (anti-join
        on the natural key — the reference's result_store_ map analog,
        /root/reference/server/ocr_handler.cpp:157-205)."""
        if not self.has_stage(stage):
            return documents
        done = self.read_stage(stage).select(key)
        return documents.join(done, key, "left_anti")
