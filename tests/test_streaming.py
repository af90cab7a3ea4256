"""Streaming tests: batch/stream parity for extraction, tumbling
window counts with watermark, session windows."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.pipeline import extract
from dxnn_ocr_cpp_spark.streaming import (
    read_documents_stream, stream_extract, stream_sessionize,
    stream_tumbling_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """File streams need a DIRECTORY source; stage the events table."""
    d = str(tmp_path_factory.mktemp("events_src"))
    spark.read.parquet(EVENTS).write.mode("overwrite").parquet(d)
    return d


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = generate_documents_df(spark, 50, partitions=5)
    docs.write.parquet(src)

    q = stream_extract(read_documents_stream(spark, src, 2), out, ckpt).start()
    q.awaitTermination(120)

    got = {r["url"]: r["text"] for r in spark.read.parquet(f"{out}/data").collect()}
    exp = {r["url"]: r["text"] for r in extract(docs).collect()}
    assert got == exp  # byte-identical batch/stream parity

    lin = spark.read.parquet(f"{out}/_lineage")
    assert lin.agg(F.sum("row_count")).collect()[0][0] == 50

    # restart with same checkpoint: availableNow already consumed all
    # files -> no duplicate rows (exactly-once)
    q2 = stream_extract(read_documents_stream(spark, src, 2), out, ckpt).start()
    q2.awaitTermination(60)
    assert spark.read.parquet(f"{out}/data").count() == 50


def test_empty_batch_does_not_kill_sink(spark, tmp_path):
    """A replayed/watermark micro-batch can be EMPTY and write zero
    part files; the lineage read-back must use an explicit schema or
    schema inference raises and kills the stream."""
    from dxnn_ocr_cpp_spark.config import DEFAULT_CONFIG
    from dxnn_ocr_cpp_spark.streaming import _write_batch
    out = str(tmp_path / "out")
    empty = generate_documents_df(spark, 5).filter("1 = 0")
    _write_batch(empty, 0, out, DEFAULT_CONFIG, "t")  # must not raise
    lin = spark.read.parquet(f"{out}/_lineage/batch=0")
    assert (lin.count() == 0
            or lin.agg(F.sum("row_count")).collect()[0][0] in (0, None))


def test_stream_tumbling_counts(spark, events_dir):
    ev = (spark.readStream.schema(spark.read.parquet(EVENTS).schema)
          .parquet(events_dir))
    agg = stream_tumbling_counts(ev)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("tumbling").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT event_type, sum(n_events) n FROM tumbling "
                    "GROUP BY event_type").collect()
    exp = (spark.read.parquet(EVENTS)
           .groupBy("event_type").count().collect())
    assert {(r["event_type"], r["n"]) for r in got} == \
           {(r["event_type"], r["count"]) for r in exp}


def test_stream_sessionize_runs(spark, events_dir):
    ev = (spark.readStream.schema(spark.read.parquet(EVENTS).schema)
          .parquet(events_dir))
    q = (stream_sessionize(ev).writeStream.outputMode("complete")
         .format("memory").queryName("sessions").start())
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) c FROM sessions").collect()[0]["c"]
    assert n > 0


def test_stream_host_stats_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: counters must accumulate across
    micro-batches (maxFilesPerTrigger=1 forces multiple batches)."""
    from dxnn_ocr_cpp_spark.streaming import stream_host_stats

    src = str(tmp_path / "ext_src")
    docs = generate_documents_df(spark, 40, partitions=1)
    ext = extract(docs)
    ext.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).write.mode("append").parquet(src)
    ext.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_host_stats(stream).writeStream.outputMode("update")
         .format("memory").queryName("hoststats").start())
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends each emission; latest per host
    # must equal the batch ground truth
    got = spark.sql("""
        SELECT host, max(docs) docs, max(bytes) bytes
        FROM hoststats GROUP BY host""").collect()
    exp = (extract(docs)
           .withColumn("host", F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1))
           .groupBy("host")
           .agg(F.count(F.lit(1)).alias("docs"),
                F.sum(F.length("text")).alias("bytes"))).collect()
    assert {(r["host"], r["docs"], r["bytes"]) for r in got} == \
           {(r["host"], r["docs"], r["bytes"]) for r in exp}


def test_stream_dedup_urls(spark, tmp_path):
    """First occurrence per url survives; re-fetches within the
    watermark horizon are dropped; state stays bounded."""
    from dxnn_ocr_cpp_spark.streaming import (read_documents_stream,
                                              stream_dedup_urls)
    src = str(tmp_path / "docs_dup")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    docs = generate_documents_df(spark, 30, partitions=3)
    # duplicate every row (same url, same ts) => half must be dropped
    docs.union(docs).write.mode("overwrite").parquet(src)
    stream = read_documents_stream(spark, src, max_files_per_trigger=2)
    q = (stream_dedup_urls(stream).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert got.select("url").distinct().count() == 30


class TestStreamIncrementalDedup:
    """Continuous-crawl gate: per-micro-batch extract -> dedup against
    a persisted MinHash index snapshot, url-keyed, idempotent sink."""

    def test_batches_gate_against_index_and_themselves(self, spark,
                                                       tmp_path):
        from dxnn_ocr_cpp_spark.operators.dedup import (
            incremental_dedup, read_minhash_index, write_minhash_index)
        from dxnn_ocr_cpp_spark.streaming import (
            read_documents_stream, stream_incremental_dedup)

        corpus_docs = generate_documents_df(spark, 30, partitions=2)
        corpus = extract(corpus_docs).select("url", "text")
        idx = str(tmp_path / "mhidx")
        write_minhash_index(corpus, idx, id_col="url")

        src = str(tmp_path / "stream_src")
        # recrawls: corpus content under NEW urls -> must drop vs index
        recrawl = (generate_documents_df(spark, 8, partitions=1)
                   .withColumn("url", F.concat(F.lit("recrawl://"),
                                               F.col("url"))))
        # novel docs (ids 30..44): absent from the 30-doc index
        all45 = generate_documents_df(spark, 45, partitions=1)
        novel = all45.join(corpus_docs.select("url"), "url", "left_anti")
        # within-batch duplicate: one novel doc under a second url
        twin = (novel.orderBy("url").limit(1)
                .withColumn("url", F.concat(F.lit("mirror://"),
                                            F.col("url"))))
        recrawl.repartition(1).write.mode("append").parquet(src)
        novel.unionByName(twin).repartition(1) \
             .write.mode("append").parquet(src)

        out = str(tmp_path / "decisions")
        q = stream_incremental_dedup(
            read_documents_stream(spark, src, max_files_per_trigger=1),
            idx, out, str(tmp_path / "ckpt")).start()
        q.awaitTermination(180)

        got = spark.read.parquet(f"{out}/decisions") \
            .select("url", "dup_of", "jaccard", "keep")
        rows = {r["url"]: r for r in got.collect()}
        assert len(rows) == 8 + 15 + 1
        # every recrawl dropped against its corpus twin
        for u, r in rows.items():
            if u.startswith("recrawl://"):
                assert not r["keep"], u
                assert r["dup_of"] == u[len("recrawl://"):], u
                assert r["jaccard"] == 1.0, u
        # the mirror pair keeps exactly one member (min url wins)
        mirror = [r for u, r in rows.items()
                  if u.startswith("mirror://")][0]
        partner = mirror["url"][len("mirror://"):]
        assert mirror["keep"] != rows[partner]["keep"]
        kept_one = mirror if mirror["keep"] else rows[partner]
        assert kept_one["url"] == min(mirror["url"], partner)
        # all other novel docs kept
        others = [r for u, r in rows.items()
                  if not u.startswith(("recrawl://", "mirror://"))
                  and u != partner]
        assert others and all(r["keep"] for r in others)

        # stream/batch parity: replay each file through the batch
        # operator -> identical decision rowsets
        index = read_minhash_index(spark, idx)
        for batch_src in (recrawl, novel.unionByName(twin)):
            want = sorted(tuple(r) for r in incremental_dedup(
                extract(batch_src).select("url", "text"), index,
                id_col="url", text_col="text", threshold=0.5,
                carry="ride_along").collect())
            urls = {r["url"] for r in batch_src.select("url").collect()}
            got_b = sorted(tuple(rows[u]) for u in urls)
            assert got_b == want
