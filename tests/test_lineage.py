"""Checkpoint / lineage / resume tests (X15, FIXTURES.md §5).

Kill-and-resume scenario: run stage 1+2, delete the final stage,
re-run — the resumed run must emit byte-identical final output and the
resume filter must not re-process checkpointed urls.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.lineage import CheckpointedRun, lineage_rows
from dxnn_ocr_cpp_spark.pipeline import extract


@pytest.fixture()
def docs(spark):
    return generate_documents_df(spark, 60, partitions=4)


def test_lineage_rows_cover_all_partitions(spark, docs, tmp_path):
    ext = extract(docs).repartition(5)
    lin = lineage_rows(ext, "run1", "emit", bytes_out_col="text").collect()
    assert sum(r["row_count"] for r in lin) == 60
    assert len({r["partition_id"] for r in lin}) == len(lin)
    assert all(r["stage"] == "emit" and r["run_id"] == "run1" for r in lin)
    assert sum(r["bytes_out"] for r in lin) > 0


def test_content_hash_partition_invariant(spark, docs):
    """Order-insensitive content hash: same data, different partitioning
    -> same total hash (the cross-run comparability guarantee)."""
    ext = extract(docs)
    h1 = lineage_rows(ext.repartition(2), "r", "s").agg(
        F.expr("bit_xor(content_hash)")).collect()[0][0]
    h2 = lineage_rows(ext.repartition(13), "r", "s").agg(
        F.expr("bit_xor(content_hash)")).collect()[0][0]
    assert h1 == h2


def test_checkpoint_resume_idempotent(spark, docs, tmp_path):
    root = str(tmp_path / "ckpt")

    run = CheckpointedRun(spark, root, run_id="runA")
    out1 = run.run_stage("extract", lambda: extract(docs),
                         bytes_out_col="text").collect()

    # simulate crash after checkpoint: a new run over the same root
    run2 = CheckpointedRun(spark, root, run_id="runB")
    # resume filter: everything is done -> nothing left to process
    todo = run2.resume_filter(docs, "extract")
    assert todo.count() == 0
    # re-running the stage must NOT recompute (df_fn would explode)
    out2 = run2.run_stage("extract", lambda: 1 / 0).collect()
    assert sorted(r["text"] for r in out1) == sorted(r["text"] for r in out2)

    # partial resume: wipe checkpoint, checkpoint only half, resume rest
    shutil.rmtree(root)
    half = docs.filter(F.xxhash64("url") % 2 == 0)
    run3 = CheckpointedRun(spark, root, run_id="runC")
    run3.run_stage("extract", lambda: extract(half), bytes_out_col="text")
    rest = run3.resume_filter(docs, "extract")
    assert rest.count() == 60 - half.count()
    # full result = checkpointed ∪ resumed, identical to a clean run
    merged = run3.read_stage("extract").unionByName(extract(rest)).collect()
    clean = extract(docs).collect()
    assert sorted((r["url"], r["text"]) for r in merged) == \
           sorted((r["url"], r["text"]) for r in clean)

    lin = run3.lineage().collect()
    assert all(l.run_id == "runC" for l in lin)
