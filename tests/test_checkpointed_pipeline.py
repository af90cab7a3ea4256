"""Mid-pipeline checkpoint/resume: crash between stages must resume
without re-parsing html, and the final output must byte-equal the
zero-shuffle extract() path."""

import shutil

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.pipeline import extract, extract_checkpointed


@pytest.fixture()
def docs(spark):
    return generate_documents_df(spark, 80, partitions=4)


def test_checkpointed_equals_hot_path(spark, docs, tmp_path):
    ext, run = extract_checkpointed(spark, docs, str(tmp_path / "r1"))
    got = {r["url"]: (r["text"], r["n_spans"]) for r in ext.collect()}
    exp = {r["url"]: (r["text"], r["n_spans"]) for r in extract(docs).collect()}
    assert got == exp  # byte-identical incl. empty-body rows


def test_crash_between_stages_resumes_without_reparse(spark, docs, tmp_path):
    root = str(tmp_path / "r2")
    # run stage 1+2 only, then "crash" (never build stage 3)
    run1_ext, run1 = None, None
    from dxnn_ocr_cpp_spark.lineage import CheckpointedRun
    from dxnn_ocr_cpp_spark.pipeline import extract_blocks
    pre = CheckpointedRun(spark, root, run_id="pre-crash")
    pre.run_stage("blocks", lambda: extract_blocks(docs), bytes_out_col="text")

    # resumed run: blocks stage must come from the checkpoint — assert
    # by making reparse impossible (feed an EMPTY documents df)
    empty = docs.filter(F.lit(False))
    ext, run = extract_checkpointed(spark, empty, root, run_id="resumed")
    got = {r["url"]: r["text"] for r in ext.collect()}
    exp = {r["url"]: r["text"] for r in extract(docs).collect()}
    assert got == exp

    # lineage: blocks written once (pre-crash), extracted once (resumed)
    lin = run.lineage().select("run_id", "stage").distinct().collect()
    stages = {(r["run_id"], r["stage"]) for r in lin}
    assert ("pre-crash", "blocks") in stages
    assert ("resumed", "extracted") in stages
    assert ("resumed", "blocks") not in stages


def test_partial_blocks_resume(spark, docs, tmp_path):
    """Stage 1 completed over HALF the corpus (crash / earlier subset
    run); re-running extract_checkpointed over the full corpus must
    parse only the other half, append it, rebuild the derived stage,
    and byte-equal a clean run — through the public API."""
    root = str(tmp_path / "r3")
    from dxnn_ocr_cpp_spark.lineage import CheckpointedRun
    from dxnn_ocr_cpp_spark.pipeline import extract_blocks

    half = docs.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    pre = CheckpointedRun(spark, root, run_id="half")
    pre.run_incremental_stage("blocks", half,
                              lambda todo: extract_blocks(todo),
                              key="url", bytes_out_col="text")
    assert pre.read_stage("blocks").select("url").distinct().count() \
        == half.select("url").count()

    ext, run = extract_checkpointed(spark, docs, root, run_id="resumed")
    got = {r["url"]: r["text"] for r in ext.collect()}
    exp = {r["url"]: r["text"] for r in extract(docs).collect()}
    assert got == exp

    # the blocks checkpoint holds each url exactly once (no re-parse
    # of the pre-checkpointed half, no duplicates from the append)
    blocks = run.read_stage("blocks")
    assert blocks.select("url").distinct().count() == docs.count()
    n_urls_with_dupes = (blocks.select("url", "block_id").distinct()
                         .groupBy("url", "block_id").count()
                         .filter(F.col("count") > 1).count())
    assert n_urls_with_dupes == 0
    # both runs appear in blocks lineage (pre wrote half, resume extended)
    stages = {(r["run_id"], r["stage"])
              for r in run.lineage().select("run_id", "stage").distinct().collect()}
    assert ("half", "blocks") in stages and ("resumed", "blocks") in stages


def test_resume_noop_when_complete(spark, docs, tmp_path):
    """Re-running over an already-complete checkpoint does zero stage
    work and writes no new lineage."""
    root = str(tmp_path / "r4")
    extract_checkpointed(spark, docs, root, run_id="first")
    ext, run = extract_checkpointed(spark, docs, root, run_id="second")
    assert ext.count() == docs.count()
    stages = {(r["run_id"], r["stage"])
              for r in run.lineage().select("run_id", "stage").distinct().collect()}
    assert ("second", "blocks") not in stages
    assert ("second", "extracted") not in stages
