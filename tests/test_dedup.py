"""MinHash LSH carry-mode tests: ride_along vs join_back must produce
identical pairs, and the join_back band shuffle must be id-only (the
100-TB shuffle-bytes guarantee is a plan property, so pin it in CI
like the other plan tests)."""

import re

from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.dedup import minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return jqe.explainString(mode)


def band_exchange_inputs(plan: str) -> list:
    """Input column lists of every Exchange (shuffle or broadcast)
    that carries (band, bucket) rows in a formatted plan — i.e. the
    exchanges whose payload the carry mode controls."""
    out = []
    for m in re.finditer(
            r"\(\d+\) (?:Exchange|BroadcastExchange)\s*\n"
            r"Input \[\d+\]: \[([^\]]*)\]", plan):
        cols = m.group(1)
        if "band#" in cols:
            out.append(cols)
    return out


def no_broadcast(spark):
    """Force shuffle joins so the plan under test is the at-scale one
    (tiny test corpora otherwise broadcast the band table away)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    return ctx()


def test_minhash_carry_modes_agree(spark):
    d = docs(spark)
    ride = minhash_lsh_pairs(d, threshold=0.4, carry="ride_along")
    back = minhash_lsh_pairs(d, threshold=0.4, carry="join_back")
    r = sorted(map(tuple, ride.collect()))
    b = sorted(map(tuple, back.collect()))
    assert r == b and len(r) > 0


def test_join_back_band_shuffle_is_id_only(spark):
    d = docs(spark)
    with no_broadcast(spark):
        plan = formatted_plan(minhash_lsh_pairs(d, threshold=0.4,
                                                carry="join_back"))
    inputs = band_exchange_inputs(plan)
    assert inputs, f"no (band, bucket) exchange found in plan:\n{plan[:3000]}"
    for cols in inputs:
        assert "sh#" not in cols, \
            f"band shuffle still carries the shingle array: [{cols}]"


def test_ride_along_band_shuffle_carries_shingles(spark):
    # sanity for the test above: the regex does find the payload when
    # it is there
    d = docs(spark)
    with no_broadcast(spark):
        plan = formatted_plan(minhash_lsh_pairs(d, threshold=0.4,
                                                carry="ride_along"))
    inputs = band_exchange_inputs(plan)
    assert inputs and any("sh#" in cols for cols in inputs)


def test_auto_threshold_picks_mode(spark):
    d = docs(spark)
    # tiny corpus under the cap -> ride_along plan (shingles in band
    # exchange); cap below the hint -> join_back plan
    with no_broadcast(spark):
        lo = formatted_plan(minhash_lsh_pairs(d, carry="auto",
                                              approx_docs=10))
        hi = formatted_plan(minhash_lsh_pairs(d, carry="auto",
                                              approx_docs=10,
                                              ride_along_max_docs=5))
    assert any("sh#" in c for c in band_exchange_inputs(lo))
    assert band_exchange_inputs(hi) and \
        all("sh#" not in c for c in band_exchange_inputs(hi))
