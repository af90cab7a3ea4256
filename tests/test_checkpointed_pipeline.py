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
    """Crash mid-stage-1: half the urls checkpointed; resume parses
    only the other half and the union equals a clean run."""
    root = str(tmp_path / "r3")
    from dxnn_ocr_cpp_spark.lineage import CheckpointedRun
    from dxnn_ocr_cpp_spark.pipeline import extract_blocks

    half = docs.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    pre = CheckpointedRun(spark, root, run_id="half")
    pre.run_stage("blocks", lambda: extract_blocks(half), bytes_out_col="text")
    # simulate stage-1 re-entry: wipe the _SUCCESS-gated stage dir is NOT
    # needed — extract_checkpointed's resume_filter appends the rest
    done = pre.read_stage("blocks").select("url").distinct().count()
    assert done == half.select("url").count()

    # manual resume of stage 1 over the remaining docs, then stage 3
    rest = pre.resume_filter(docs, "blocks")
    assert rest.count() == docs.count() - half.count()
    merged = pre.read_stage("blocks").unionByName(extract_blocks(rest))
    merged_urls = merged.select("url").distinct().count()
    assert merged_urls == docs.count()
