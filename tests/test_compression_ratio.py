"""with_compression_ratio — the one-number entropy/template signal."""

import zlib

import pytest

from dxnn_ocr_cpp_spark.operators.textstats import with_compression_ratio


def _ratios(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    return {r["doc_id"]: r["compression_ratio"]
            for r in with_compression_ratio(df).collect()}


TEMPLATE = "click here to subscribe " * 100
PROSE = ("the committee reviewed seventeen applications during its "
         "march session and approved funding for the harbor survey, "
         "the orchard restoration, and two smaller projects whose "
         "budgets had been revised downward after the january audit. "
         "members noted that the timeline for the bridge inspection "
         "remained uncertain pending the contractor's response. "
         "several residents spoke against relocating the ferry "
         "landing, citing access for the northern villages, while "
         "the engineer presented soundings that showed the channel "
         "silting faster than the previous model had predicted. a "
         "revised dredging schedule will be circulated before the "
         "next public meeting, together with cost estimates for "
         "stabilizing the eastern breakwater and replacing the "
         "navigation lights damaged in the winter storms. the clerk "
         "was asked to publish the minutes within ten days and to "
         "notify the fisheries board of the proposed closure dates.")
# b85-coded md5 digests: 85-symbol alphabet at ~6.4 bits/char of
# real entropy — comfortably above zlib's reach (a LINEAR chain mod k
# is periodic and compresses to ~0.09; learned the hard way)
import base64  # noqa: E402
import hashlib  # noqa: E402

ENTROPY = "".join(
    base64.b85encode(hashlib.md5(str(i).encode()).digest()).decode()
    for i in range(60))


class TestCompressionRatio:
    def test_ordering_template_prose_entropy(self, spark):
        r = _ratios(spark, [TEMPLATE, PROSE, ENTROPY])
        assert r[0] < r[1] < r[2]
        assert r[0] < 0.1        # repeated template: near zero
        assert 0.1 < r[1] < 0.75  # natural prose: middle band
        assert r[2] > 0.75       # wide-alphabet entropy stream

    def test_exact_value_matches_zlib(self, spark):
        r = _ratios(spark, [PROSE])
        b = PROSE.encode()
        assert r[0] == pytest.approx(len(zlib.compress(b, 6)) / len(b))

    def test_null_and_empty_are_null(self, spark):
        r = _ratios(spark, [None, "", "x"])
        assert r[0] is None and r[1] is None and r[2] is not None

    def test_plan_one_python_hop_zero_exchange(self, spark):
        df = spark.createDataFrame([(1, "abc")],
                                   "doc_id long, text string")
        plan = with_compression_ratio(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert "Exchange" not in plan

    def test_deterministic_across_partitionings(self, spark):
        texts = [TEMPLATE, PROSE, ENTROPY] * 7
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "doc_id long, text string")
        a = sorted(map(tuple, with_compression_ratio(
            df.repartition(1)).collect()))
        b = sorted(map(tuple, with_compression_ratio(
            df.repartition(5)).collect()))
        assert a == b
