"""Structured Streaming surface.

The reference's "streaming" is a bounded work-queue pipeline
(ConcurrentQueue cap 100 = backpressure,
/root/reference/src/pipeline/ocr_pipeline.cpp:353-355; non-blocking
try_push with retry :204-216). The honest Spark analog of that is just
batch micro-batched — but we also expose the real streaming operators a
continuously-crawled corpus needs:

  stream_extract            readStream(documents) -> the SAME extract()
                            transformation -> sink via foreachBatch
                            (exactly-once with checkpointing; per-batch
                            lineage rows reuse lineage.lineage_rows)
  stream_tumbling_counts    watermark + event-time tumbling window over
                            an event stream (late data handled)
  stream_sessionize         session_window aggregation

Batch/stream parity: extract() is a per-row transformation, so the
streaming and batch results are byte-identical for the same input rows
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.config import DEFAULT_CONFIG, ExtractionConfig
from dxnn_ocr_cpp_spark.pipeline import extract
from dxnn_ocr_cpp_spark.schemas import DOCUMENTS


def read_documents_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a documents directory (the WARC-dump
    ingestion shape: new parquet files appear, Spark picks them up).
    maxFilesPerTrigger bounds per-batch work — the backpressure knob
    (queue-cap analog)."""
    return (spark.readStream.schema(DOCUMENTS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_extract(docs_stream: DataFrame, out_path: str,
                   checkpoint_path: str,
                   cfg: ExtractionConfig = DEFAULT_CONFIG,
                   run_id: str = "stream"):
    """Continuous extraction with exactly-once parquet sink.

    foreachBatch gets the SAME lazy extract() plan per micro-batch.
    Exactly-once needs the WRITER to be idempotent on batch_id (the
    checkpoint only dedupes input batches, not partial output writes):
    each batch overwrites its own batch=<id> directory, so a replay
    after a mid-write crash rewrites the same files instead of
    appending duplicates. Lineage rows follow the same scheme — the
    streaming version of X15.
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch(batch_df, batch_id, out_path, cfg, run_id)

    return (docs_stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True))


def _write_batch(batch_df: DataFrame, batch_id: int, out_path: str,
                 cfg: ExtractionConfig, run_id: str) -> None:
    """One micro-batch of the stream_extract sink (module-level so the
    empty-batch path is unit-testable without driving a stream)."""
    from dxnn_ocr_cpp_spark.lineage import lineage_rows

    data_path = f"{out_path}/data/batch={batch_id}"
    out_df = extract(batch_df, cfg)
    out_df.write.mode("overwrite").parquet(data_path)
    # lineage from the files just written (not the lazy plan, which
    # would re-run extraction a second time). Explicit schema: an
    # empty replayed/watermark batch can write zero part files, and
    # schema INFERENCE on that directory raises and kills the stream
    written = batch_df.sparkSession.read.schema(out_df.schema) \
        .parquet(data_path)
    (lineage_rows(written, run_id, f"emit-batch-{batch_id}",
                  bytes_out_col="text")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{out_path}/_lineage/batch={batch_id}"))


def _with_event_time(df: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (ltz); parquet event times are
    often TIMESTAMP_NTZ — cast under the pinned-UTC session."""
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_counts(events_stream: DataFrame,
                           window: str = "5 minutes",
                           watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling counts with late-data watermark — the
    streaming twin of the batch events_tumbling query."""
    return (_with_event_time(events_stream)
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


def stream_host_stats(extracted_stream: DataFrame,
                      checkpoint_unused: str | None = None) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: cumulative
    per-host (docs, bytes) counters over a stream of extracted rows —
    the analog of the reference's long-lived per-pipeline stats object
    (OCRPipelineStats, /root/reference/include/pipeline/ocr_pipeline.h:98-128)
    kept as managed Spark state instead of a mutable singleton.

    State: (docs LONG, bytes LONG) per host; output mode `update`
    emits the new totals each micro-batch.
    """
    import pandas as pd

    def update(key, pdfs, state):
        docs, nbytes = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            docs += len(pdf)
            nbytes += int(pdf["text"].str.len().sum())
        state.update((docs, nbytes))
        yield pd.DataFrame({"host": [key[0]], "docs": [docs],
                            "bytes": [nbytes]})

    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)/", 1)
    return (extracted_stream
            .withColumn("host", host)
            .groupBy("host")
            .applyInPandasWithState(
                update,
                outputStructType="host string, docs long, bytes long",
                stateStructType="docs long, bytes long",
                outputMode="update",
                timeoutConf="NoTimeout"))


def stream_sessionize(events_stream: DataFrame,
                      gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Native session windows (the stateful-op analog of the batch
    lag+cumsum sessionization)."""
    return (_with_event_time(events_stream)
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events")))


def stream_dedup_urls(docs_stream: DataFrame,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each url
    within the watermark horizon (dropDuplicatesWithinWatermark keeps
    bounded state — a crawler re-fetches the same url across WARC
    segments, and unbounded dropDuplicates state would grow forever at
    10^12-doc scale). The batch twin is operators/dedup.exact_dedup."""
    return (docs_stream
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["url"]))


def stream_incremental_dedup(docs_stream: DataFrame, index_path: str,
                             out_path: str, checkpoint_path: str,
                             threshold: float = 0.5,
                             cfg: ExtractionConfig = DEFAULT_CONFIG):
    """Per-micro-batch near-dup gate against a PERSISTED MinHash index
    (operators/dedup.write_minhash_index) — the continuous-crawl
    composition: each arriving batch of raw pages is EXTRACTED, then
    deduped against the frozen corpus snapshot and within itself
    (operators/dedup.incremental_dedup), without ever rescanning the
    corpus. Keyed by url (the stream's natural key; the dedup
    operator's ids are type-generic).

    Snapshot semantics, stated plainly: the index is read per batch
    from disk and NOT updated by the stream, so batches do not dedup
    against earlier stream batches — the periodic batch job
    republishes the index and the stream gates against the newest
    snapshot (the standard snapshot-plus-stream split; exactly the
    contract q_incremental_dedup certifies in batch form).

    Sink is idempotent on batch_id (each batch overwrites its own
    batch=<id> directory) — the stream_extract discipline, so a replay
    after a mid-write crash rewrites instead of duplicating.
    Output rows per batch: (url, dup_of, jaccard, keep).
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _dedup_batch(batch_df, batch_id, index_path, out_path,
                     threshold, cfg)

    return (docs_stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True))


def _dedup_batch(batch_df: DataFrame, batch_id: int, index_path: str,
                 out_path: str, threshold: float,
                 cfg: ExtractionConfig) -> None:
    """One micro-batch of the stream_incremental_dedup sink
    (module-level so it is unit-testable without driving a stream)."""
    from dxnn_ocr_cpp_spark.operators.dedup import (incremental_dedup,
                                                    read_minhash_index)
    index = read_minhash_index(batch_df.sparkSession, index_path)
    texts = extract(batch_df, cfg).select("url", "text")
    out = incremental_dedup(texts, index, id_col="url",
                            text_col="text", threshold=threshold,
                            carry="ride_along")
    out.withColumnRenamed("id", "url").write.mode("overwrite") \
       .parquet(f"{out_path}/decisions/batch={batch_id}")
