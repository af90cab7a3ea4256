"""Measure the extraction kernel's OWN multiprocessing scaling ceiling
— no Spark anywhere in the loop.

Answers the question the wide (8->32) bench window raises: is the
engine's sub-1.0 wide-window efficiency a Spark property or a host
property?  The bench's in-run host ceiling uses arithmetic busywork
(bench.py `_burn`); this probe runs the ACTUAL segmentation kernel
(`pipeline.extract_python`, the same pure-Python function the Spark
pandas UDF batches over) through a bare `multiprocessing.Pool` at the
two leg widths, alternating lo-hi-lo so linear host drift cancels the
same way bench.py's bracketing does.

Measured on the sandbox VM (32 vCPU, 600k-doc corpus sample):
  kernel 8->32 scaling efficiency ~= 0.78 — indistinguishable from the
  arithmetic busywork ceiling (~0.76).  I.e. the busywork probe is
  representative of the real workload, and nothing about the kernel
  (allocation patterns, unicode tables, lxml-free parsing) scales
  better than generic CPU work does on this host.

Usage:  python tools/kernel_ceiling_probe.py [corpus_dir]
"""
import multiprocessing as mp
import sys
import time

import pyarrow.dataset as ds

sys.path.insert(0, "/root/repo")

N_DOCS = 24000  # enough work per leg to dwarf pool startup


def _load(corpus: str, n: int):
    d = ds.dataset(corpus, format="parquet")
    tbl = d.head(n, columns=["url", "html"])
    return list(zip(tbl.column("url").to_pylist(),
                    tbl.column("html").to_pylist()))


def _work(chunk):
    from dxnn_ocr_cpp_spark.pipeline import extract_python
    tot = 0
    for url, html in chunk:
        tot += len(extract_python(url, html)["text"])
    return tot


def measure(docs, procs: int) -> float:
    chunks = [docs[i::procs * 4] for i in range(procs * 4)]
    with mp.Pool(procs) as p:
        p.map(_work, [c[:40] for c in chunks])  # warm imports
        t0 = time.monotonic()
        p.map(_work, chunks)
        dt = time.monotonic() - t0
    return len(docs) / dt


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/spark_graft_corpus/seed42_n600000_v2"
    docs = _load(corpus, N_DOCS)
    print(f"loaded {len(docs)} docs")
    # alternate lo hi lo so drift cancels like bench.py's bracketing
    lo1 = measure(docs, 8)
    hi = measure(docs, 32)
    lo2 = measure(docs, 8)
    lo = (lo1 + lo2) / 2
    print(f"8 procs: {lo1:.0f} / {lo2:.0f} docs/s (mean {lo:.0f})")
    print(f"32 procs: {hi:.0f} docs/s")
    print(f"kernel 8->32 scaling efficiency: {hi / (lo * 4):.4f}")


if __name__ == "__main__":
    main()
