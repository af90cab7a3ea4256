"""Mixed-language span segmentation: run-length merge semantics,
blank-paragraph policy, reassembly byte-fidelity, and the scale
shape — ONE exchange (the (id, span_idx) groupBy rides the window's
id-hash partitioning), zero Python.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.textstats import lang_spans

EN = "the cat and the dog of the house is here."
DE = "der hund und die katze ist nicht hier."
ES = "el gato es una cosa la casa los dos."


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # en, en (merged) -> de -> en again: 3 spans
        (1, f"{EN}\n\n{EN}\n\n{DE}\n\n{EN}"),
        # single language: 1 span
        (2, f"{ES}\n\n{ES}"),
        # blank paragraphs dropped, runs still merge across them
        (3, f"{EN}\n\n   \n\n{EN}"),
        # all blank: no rows
        (4, "  \n\n  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSemantics:
    def test_runs_merge_and_split(self, docs):
        out = {(r["doc_id"], r["span_idx"]): (r["lang"], r["n_paras"])
               for r in lang_spans(docs).collect()}
        assert out[(1, 0)] == ("en", 2)   # adjacent en paragraphs merge
        assert out[(1, 1)] == ("de", 1)
        assert out[(1, 2)] == ("en", 1)   # en resumes as a NEW span
        assert out[(2, 0)] == ("es", 2)
        assert out[(3, 0)] == ("en", 2)   # blank paragraph vanished
        assert (4, 0) not in out          # all-blank doc emits nothing
        assert len(out) == 5

    def test_span_text_reassembly(self, docs):
        rows = {(r["doc_id"], r["span_idx"]): r["span_text"]
                for r in lang_spans(docs).collect()}
        assert rows[(1, 0)] == f"{EN}\n\n{EN}"
        assert rows[(1, 1)] == DE
        assert rows[(2, 0)] == f"{ES}\n\n{ES}"

    def test_partitioning_invariance(self, docs):
        a = sorted(map(tuple, lang_spans(docs.repartition(1)).collect()))
        b = sorted(map(tuple,
                       lang_spans(docs.repartition(9, "text")).collect()))
        assert a == b and a


class TestScaleShape:
    def test_one_exchange_no_python(self, docs):
        plan = lang_spans(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        for node in ("ArrowEval", "BatchEvalPython", "CartesianProduct"):
            assert node not in plan
