"""Bucketed co-located join: zero-shuffle fact-fact join (subprocess —
the demo owns its own metastore/warehouse so the shared test session
and the repo stay clean)."""

import pathlib
import subprocess
import sys

DEMO = pathlib.Path(__file__).parent.parent / "tools" / "bucketed_join_demo.py"


def test_bucketed_join_has_no_shuffle(tmp_path):
    out = subprocess.run(
        [sys.executable, str(DEMO), "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    last = out.stdout.strip().splitlines()[-1:]
    assert last == ["PLAN-OK"], f"stdout={out.stdout[-500:]} " \
                                f"stderr={out.stderr[-500:]}"


def test_salting_defuses_hot_host_skew(spark):
    """The corpus's two hot hosts own ~50% of rows (FIXTURES §1). A
    host-keyed repartition concentrates them on single partitions; the
    salted repartition spreads rows uniformly — the X5 skew guard the
    north rule mandates, measured, not asserted by fiat."""
    from pyspark.sql import functions as F

    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.partitioning import host_of, salted_repartition

    docs = generate_documents_df(spark, 2000, partitions=8)
    n_part = 16

    def max_share(df):
        sizes = (df.withColumn("p", F.spark_partition_id())
                 .groupBy("p").count().collect())
        total = sum(r["count"] for r in sizes)
        return max(r["count"] for r in sizes) / total

    naive = max_share(docs.repartition(n_part, host_of(F.col("url"))))
    salted = max_share(salted_repartition(docs, n_part))
    # hot host -> one partition holds ~a quarter of the corpus;
    # salted -> near-uniform 1/16 (allow 2x slack for hash variance)
    assert naive > 0.15, f"corpus no longer skewed? naive={naive}"
    assert salted < 2.0 / n_part, f"salting failed: {salted}"
    assert salted < naive / 2
