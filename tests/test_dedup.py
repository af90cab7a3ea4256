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


def test_minhash_signature_agreement(spark):
    """Regression for the pyspark higher-order-function trap: a seed
    captured via `lambda s, i=i:` gives the lambda TWO parameters, which
    silently selects transform's binary (element, INDEX) form — h_i then
    depended on each doc's array layout and near-identical shingle sets
    agreed on 0/64 signature positions (LSH recall collapsed to
    exact-dup pairs). Caught by the md5-family DuckDB oracle.

    Pin the minhash property directly: hash determinism across docs
    (identical sets -> identical signatures) and E[agreement] = jaccard
    (sets sharing 9/11 elements must agree on far more than the broken
    implementation's ~0 positions)."""
    from dxnn_ocr_cpp_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame(
        [(1, list(range(1, 11))),       # {1..10}
         (2, list(range(1, 11))),       # identical set, different doc
         (3, list(range(1, 10)) + [99])],  # shares 9/11 distinct -> j~0.82
        "id: long, sh: array<long>")
    sig = {r.id: r.sig for r in df.select(
        "id", minhash_signature(F.col("sh"), 64).alias("sig")).collect()}
    assert sig[1] == sig[2], "identical sets must give identical signatures"
    agree = sum(1 for a, b in zip(sig[1], sig[3]) if a == b)
    # E[agree] = 64 * 9/11 ~ 52; broken impl gives ~0. 32 is a safe floor.
    assert agree >= 32, f"signature agreement {agree}/64 — hash family broken"


def test_minhash_recall_matches_exact_at_test_sf(spark):
    """End-to-end recall pin: on the sf0.001 corpus every true pair has
    jaccard >= 0.88, where banded LSH (b=16, r=4) capture probability is
    1 - ~1e-7 — so the verified LSH output must EQUAL the exact-Jaccard
    pair set, for both hash families (deterministic hashes -> stable)."""
    from dxnn_ocr_cpp_spark.operators.dedup import ngram_jaccard_pairs

    d = docs(spark)
    exact = {(r.a, r.b) for r in
             ngram_jaccard_pairs(d, threshold=0.4).collect()}
    assert exact, "corpus should contain near-dup pairs"
    for fam in ("xxhash64", "md5"):
        got = {(r.a, r.b) for r in
               minhash_lsh_pairs(d, threshold=0.4, carry="ride_along",
                                 hash_family=fam).collect()}
        assert got == exact, (f"{fam}: missed {exact - got}, "
                              f"false {got - exact}")


def test_minhash_md5_family_replayable(spark):
    """The md5 family's whole point: h_i(g) = (a_i * x(g) + b_i) mod P
    with x(g) = first-8-hex of md5(g) mod P must be reproducible with
    stdlib hashlib + integer arithmetic (== any engine with md5)."""
    import hashlib

    from dxnn_ocr_cpp_spark.operators.dedup import (MH_P,
                                                    mh_affine_consts,
                                                    minhash_signature)

    grams = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"]
    df = spark.createDataFrame([(grams,)], "sh: array<string>")
    got = df.select(
        minhash_signature(F.col("sh"), 8, "md5").alias("sig")).first().sig
    xs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % MH_P
          for g in grams]
    want = [min((a * x + b) % MH_P for x in xs)
            for a, b in (mh_affine_consts(i) for i in range(8))]
    assert got == want
