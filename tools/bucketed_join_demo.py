"""Bucketed-table co-located join demo (X4 partition-pruning analog /
SURVEY §2.7 scale note).

Writes orders and lineitem bucketed by the join key, then shows the
join plan has NO shuffle on either side (co-located sort-merge join) —
the layout a 100-TB deployment would use for repeated fact-fact joins,
equivalent to Iceberg's bucket(N, key) partition transform.

Runs standalone (own warehouse + derby metastore in a temp dir, so the
repo stays clean): python tools/bucketed_join_demo.py [sf_dir]
Prints PLAN-OK / PLAN-SHUFFLES as the last line.
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    from pyspark.sql import SparkSession

    tmp = tempfile.mkdtemp(prefix="bucketed_demo_")
    spark = (SparkSession.builder.master("local[8]")
             .appName("bucketed-join-demo")
             .config("spark.sql.warehouse.dir", f"{tmp}/warehouse")
             .config("spark.driver.extraJavaOptions",
                     f"-Dderby.system.home={tmp}/derby")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        n_buckets = 8
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        (orders.write.bucketBy(n_buckets, "o_orderkey")
               .sortBy("o_orderkey").mode("overwrite")
               .saveAsTable("orders_b"))
        (lineitem.write.bucketBy(n_buckets, "l_orderkey")
                 .sortBy("l_orderkey").mode("overwrite")
                 .saveAsTable("lineitem_b"))

        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            spark.table("lineitem_b").l_orderkey
            == spark.table("orders_b").o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_rows = joined.count()
        shuffles = plan.count("Exchange")
        print(f"rows={n_rows} exchanges={shuffles}")
        print("PLAN-OK" if shuffles == 0 else "PLAN-SHUFFLES")
        return 0 if shuffles == 0 else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
