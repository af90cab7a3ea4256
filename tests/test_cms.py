"""Count-Min Sketch: one-sided guarantee, mergeability, bounded cell
count, DuckDB bucket replay, and the bounded-shuffle plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.cms import (CMS_TOKEN_RE, cms_build,
                                              cms_lookup, cms_merge,
                                              cms_oracle_cells_sql)

DEPTH, WIDTH = 4, 64   # deliberately small so collisions DO happen


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(200):
        # 'alpha' in every doc, 'beta' in every 2nd, 'rare7' in one,
        # plus per-doc noise tokens that force bucket collisions at
        # width 64
        toks = ["alpha", f"noise{i % 97}", f"pad{i}"]
        if i % 2 == 0:
            toks.append("beta")
        if i == 123:
            toks.append("rare7")
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def sketch(corpus):
    return cms_build(corpus, depth=DEPTH, width=WIDTH).cache()


def exact_counts(corpus):
    return {
        r["tok"]: r["n"]
        for r in (corpus.select(F.explode(F.regexp_extract_all(
            F.lower("text"), F.lit(CMS_TOKEN_RE), 0)).alias("tok"))
            .groupBy("tok").count().withColumnRenamed("count", "n")
            .collect())}


def test_estimate_never_undercounts(spark, corpus, sketch):
    truth = exact_counts(corpus)
    terms = spark.createDataFrame([(t,) for t in truth], "term string")
    est = {r["term"]: r["est"]
           for r in cms_lookup(sketch, terms, depth=DEPTH,
                               width=WIDTH).collect()}
    assert set(est) == set(truth)
    for t, n in truth.items():
        assert est[t] >= n, (t, est[t], n)
    # headline terms are exact-ish at this density: the error bound
    # e*N/width with N=~740 tokens, width 64 allows slack but the hot
    # tokens must at least dominate
    assert est["alpha"] >= 200 and est["beta"] >= 100
    assert est["rare7"] >= 1


def test_absent_term_reads_collision_noise_only(spark, sketch):
    terms = spark.createDataFrame([("neverseen",)], "term string")
    est = cms_lookup(sketch, terms, depth=DEPTH, width=WIDTH).collect()
    assert est[0]["term"] == "neverseen"
    assert est[0]["est"] >= 0   # min over cells; never negative/null


def test_merge_equals_whole(spark, corpus, sketch):
    half_a = corpus.where("doc_id < 100")
    half_b = corpus.where("doc_id >= 100")
    merged = cms_merge(cms_build(half_a, depth=DEPTH, width=WIDTH),
                       cms_build(half_b, depth=DEPTH, width=WIDTH))
    whole = {(r["r"], r["bucket"]): r["n"] for r in sketch.collect()}
    got = {(r["r"], r["bucket"]): r["n"] for r in merged.collect()}
    assert got == whole


def test_cell_count_bounded_by_grid(sketch):
    assert sketch.count() <= DEPTH * WIDTH


def test_duckdb_replays_grid(corpus, sketch):
    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = ("WITH " + cms_oracle_cells_sql(
        "SELECT text FROM docs WHERE text IS NOT NULL", "text",
        depth=DEPTH, width=WIDTH)
        + " SELECT r, bucket, n FROM grid")
    want = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    got = {(r["r"], r["bucket"]): r["n"] for r in sketch.collect()}
    assert got == want


def test_build_plan_is_one_partial_agg(corpus):
    # width differs from the cached module sketch so the cache manager
    # cannot substitute an InMemoryRelation (whose stored plan string
    # would double-count "Exchange")
    plan = cms_build(corpus, depth=DEPTH, width=128) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1       # the grid groupBy only
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_lookup_broadcasts_sketch(spark, sketch):
    # the sketch is bounded at depth*width cells, so it is the
    # broadcast side; the probe side is the preserved side of the
    # left join (Spark cannot build the preserved side)
    terms = spark.createDataFrame([("alpha",), ("beta",)], "term string")
    plan = cms_lookup(sketch, terms, depth=DEPTH, width=WIDTH) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
