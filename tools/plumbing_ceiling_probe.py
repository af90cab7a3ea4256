"""Measure Spark's DATA-PLUMBING ceiling for the extraction job shape
— the same corpus scan + Arrow hop with the kernel replaced by a
passthrough.

Separates the two components of the wide-window (8->32) gap between
the engine (~15.5k docs/s at local[32]) and the bare-multiprocessing
kernel (~27k docs/s, tools/kernel_ceiling_probe.py): how much is the
JVM-side parquet scan + Arrow encode + Python-worker round trip
(plumbing every Spark job with a Python stage pays), and how much is
the kernel itself. The passthrough UDF receives the full html bytes
(so the Arrow transfer cost is identical) and emits only (url, n) —
zero kernel work.

Usage:  python tools/plumbing_ceiling_probe.py [corpus_dir]
Prints docs/sec for the passthrough job at local[8] and local[32]
(lo-hi-lo bracketed like bench.py), plus the implied plumbing share.
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def run_leg(cores: int, corpus: str) -> float:
    import pandas as pd

    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app=f"plumbing-{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores * 2,
                          extra_conf={
                              "spark.sql.files.maxPartitionBytes": "4m",
                              "spark.sql.files.openCostInBytes": "512k",
                              "spark.driver.memory":
                                  f"{max(8, cores // 2)}g",
                          })
    try:
        docs = spark.read.parquet(corpus).select("url", "html")
        n = docs.count()

        def passthrough(batches):
            for pdf in batches:
                # touch the bytes so lazy buffers actually transfer
                yield pd.DataFrame({
                    "url": pdf["url"],
                    "n": [len(h) if h is not None else 0
                          for h in pdf["html"]],
                })

        out = docs.mapInPandas(passthrough, schema="url string, n long")

        def mat():
            out.write.format("noop").mode("overwrite").save()

        mat()  # warm every worker
        t0 = time.monotonic()
        mat()
        return n / (time.monotonic() - t0)
    finally:
        spark.stop()


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/spark_graft_corpus/seed42_n600000_v2"
    lo1 = run_leg(8, corpus)
    hi = run_leg(32, corpus)
    lo2 = run_leg(8, corpus)
    lo = (lo1 + lo2) / 2
    print(f"passthrough local[8]: {lo1:.0f} / {lo2:.0f} docs/s "
          f"(mean {lo:.0f})")
    print(f"passthrough local[32]: {hi:.0f} docs/s")
    print(f"plumbing 8->32 scaling: {hi / (lo * 4):.4f}")


if __name__ == "__main__":
    main()
