"""Per-row parameter variation (OCRTaskConfig analog,
/root/reference/include/pipeline/ocr_pipeline.h:59-77): a `task_cfg`
struct column overrides run-level thresholds per row, letting one
batch mix extraction policies. Invariants pinned here:

  * a row's overrides produce byte-identical output to a whole run
    configured with those values;
  * null fields / absent column fall back to the run-level config
    (output byte-identical to the no-column run);
  * the plan stays zero-shuffle with exactly one Python hop;
  * extract_python mirrors the semantics;
  * the checkpointed path refuses mixed-policy input loudly.
"""

import dataclasses

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.config import (DEFAULT_CONFIG, TASK_CONFIG_COL,
                                       task_config_col)
from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.pipeline import extract, extract_python


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents_df(spark, 30).cache()


def _texts(df):
    return {r["url"]: r["text"] for r in df.collect()}


def test_overrides_match_run_level_config(spark, docs):
    # every row overridden to strict thresholds == a strict run
    strict = dict(box_thresh=0.9, min_text_chars=40)
    tagged = docs.withColumn(TASK_CONFIG_COL, task_config_col(**strict))
    per_row = _texts(extract(tagged))
    run_level = _texts(extract(
        docs, dataclasses.replace(DEFAULT_CONFIG, **strict)))
    assert per_row == run_level
    # and the strict thresholds actually bite vs the defaults
    assert per_row != _texts(extract(docs))


def test_mixed_policies_in_one_batch(spark, docs):
    # even urls strict, odd urls default — ONE job, two policies
    even = F.xxhash64("url") % 2 == 0
    tagged = docs.withColumn(
        TASK_CONFIG_COL,
        F.when(even, task_config_col(box_thresh=0.9, min_text_chars=40))
         .otherwise(task_config_col()))
    mixed = _texts(extract(tagged))
    strict = _texts(extract(
        docs, dataclasses.replace(DEFAULT_CONFIG,
                                  box_thresh=0.9, min_text_chars=40)))
    default = _texts(extract(docs))
    evens = {r["url"] for r in docs.filter(even).collect()}
    for url, text in mixed.items():
        assert text == (strict[url] if url in evens else default[url])


def test_null_fields_and_absent_column_are_default(spark, docs):
    tagged = docs.withColumn(TASK_CONFIG_COL, task_config_col())
    assert _texts(extract(tagged)) == _texts(extract(docs))


def test_plan_shape_unchanged(spark, docs):
    tagged = docs.withColumn(TASK_CONFIG_COL,
                             task_config_col(box_thresh=0.8))
    plan = extract(tagged)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 1


def test_extract_python_mirror(spark, docs):
    strict = dict(box_thresh=0.9, min_text_chars=40)
    tagged = docs.withColumn(TASK_CONFIG_COL, task_config_col(**strict))
    got = {r["url"]: r["text"] for r in extract(tagged).collect()}
    for r in docs.collect():
        exp = extract_python(r["url"], r["html"], task=strict)
        assert got[r["url"]] == exp["text"], r["url"]


def test_checkpointed_refuses_task_cfg(spark, docs, tmp_path):
    from dxnn_ocr_cpp_spark.pipeline import extract_checkpointed
    tagged = docs.withColumn(TASK_CONFIG_COL, task_config_col())
    with pytest.raises(ValueError, match="task_cfg"):
        extract_checkpointed(spark, tagged, str(tmp_path / "ckpt"))
