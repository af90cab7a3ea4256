"""Benchmark harness (driver contract + north-rule scaling evidence).

Phase 1  headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
         local[$SPARK_GRAFT_CPUS]: per-query wall seconds, fully
         materialized via the noop sink (no driver collect cost).
Phase 2  extraction scaling: the SAME seeded corpus parquet is
         extracted at local[N] and local[4N] in separate JVMs
         (subprocess) — docs/sec at both + scaling efficiency
         docs_sec_4N / (4 * docs_sec_N), plus the host's own
         pure-python CPU scaling ceiling for context. THREE windows
         per run: narrow 2->8 (host scales ~0.95, so the number is
         the engine's), wide 8->32 (SURVEY §0's named pair; host
         ceiling ~0.71-0.85 on this VM, so the engine number is read
         against it), and isolated-executor 8->32 (hi leg = four
         SEPARATE cpuset-pinned 8-core JVMs over disjoint corpus
         shards, barrier-released — the per-executor cgroup/heap
         regime of a real 4-executor cluster). This evidences the
         north rule's N->4N executor criterion in-sandbox (analog of
         the reference's 1->3 NPU card scaling, ~0.99 efficiency,
         /root/reference/README.md:167-172).

Prints ONE compact JSON line (fits the driver's 2000-char tail
capture):
  {"metric": ..., "value": N, "unit": "sec", "queries": {subset},
   "sf": ..., "extraction": {summary}, "extraction_wide": {summary},
   "detail": "BENCH/bench_detail.json"}
and rewrites BENCH/BASELINE.md + BENCH/bench_detail.json (the full
per-query map and full window records).

Scenario modes (`python bench.py --mode latency|stress|stability|
capacity`) self-measure the ENGINE — per-job latency percentiles,
concurrent-job degradation, run-to-run drift, batch-size capacity
sweep — the analog of the reference's 5-mode scenario framework
(/root/reference/server/benchmark/benchmark_config.yaml:29-35,
core/metrics.py:63-205). They write BENCH/MODES.md and print one
JSON line each; the default invocation is unchanged.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent

# cpuset pinning: a real cluster executor is cgroup-confined to its
# cores — ALL of its threads (tasks, GC, parquet scan, Arrow encode)
# compete inside that budget, and the JVM sizes its thread pools from
# the cgroup's availableProcessors. Unpinned local[N] on a 32-vCPU box
# instead lets the JVM's service threads ride idle host cores for free
# (measured: local[8] legs burned 9.6 cores), inflating lo-leg
# throughput and deflating the N->4N ratio. taskset gives each leg the
# same confinement a cluster would; the busy-CPU accounting (still
# published) then VERIFIES the pin instead of correcting for its
# absence. Legs at the full machine width are left unpinned (no-op).
PIN_CPUS = shutil.which("taskset") is not None and \
    os.environ.get("SPARK_GRAFT_PIN", "1") != "0"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42

# N -> 4N pair for the scaling criterion. 2->8 by default: the host
# VM's OWN pure-python multiprocessing scaling (no Spark) measures
# ~0.97 for 2->8 procs but only ~0.85 for 4->16 and ~0.71 for 8->32
# (frequency scaling + noisy-neighbor contention grows with active
# cores), so 2->8 is the window where a measurement reflects the
# ENGINE rather than the host — the per-run ceiling probe still
# reports the host context either way.
_lv = os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8").split(",")
SCALING_LEVELS = (int(_lv[0]), int(_lv[1]))

# A second, WIDE window (default 8->32) is measured alongside the
# headline window every run: SURVEY §0 names local[8] vs local[32] as
# the evidence pair, and publishing only the narrow window across
# rounds would read as denominator shopping. The wide window's host
# ceiling is much lower (~0.71-0.85 measured on this VM), so its
# engine number is interpreted against that ceiling, never raw.
_wv = os.environ.get("SPARK_GRAFT_WIDE_LEVELS", "8,32").split(",")
WIDE_LEVELS = (int(_wv[0]), int(_wv[1]))
RUN_WIDE = os.environ.get("SPARK_GRAFT_WIDE", "1") != "0"

# A third, ISOLATED-EXECUTOR wide window (VERDICT r3 ask #1): the same
# 8->32 pair, but the hi leg runs as FOUR SEPARATE 8-core JVM
# processes, each taskset-pinned to its own disjoint 8-core cpuset
# with its own heap, GC, Python worker pool, and disjoint quarter of
# the corpus files — the per-executor cgroup/heap regime a real
# 4-executor cluster applies (and the regime r3's SCALE.md argued
# would recover the wide window). A file barrier releases all four
# measured passes together; aggregate throughput = total docs /
# slowest shard wall. Measured result (see BENCH/BASELINE.md): JVM
# isolation does NOT recover the window — the residual is the host's
# shared memory subsystem, not the shared JVM.
RUN_ISO = os.environ.get("SPARK_GRAFT_ISO", "1") != "0"
ISO_EXEC_CORES = int(os.environ.get("SPARK_GRAFT_ISO_EXEC_CORES", "8"))
# how long the iso hi leg waits for every shard JVM's READY line
ISO_READY_TIMEOUT = float(
    os.environ.get("SPARK_GRAFT_ISO_READY_TIMEOUT", "600"))

# wall-clock budget for the DEFAULT `python bench.py` run (queries +
# any scaling-window re-measures). The driver's capture killed the
# r4 run at timeout because the default re-measured all three windows
# unconditionally (~40-70 min); under budget the query table always
# runs and each window re-measures only if its estimate fits —
# otherwise the committed stable window is reused, labeled. `--full`
# disables the budget entirely.
BENCH_BUDGET = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))


def docs_for(levels: tuple) -> int:
    """Corpus size for a scaling window. Scaling measurement needs
    enough work to amortize fixed overheads: each level pays ~5s of
    per-job driver/scheduling cost regardless of cores (measured:
    4*T16 - T4 residual), which any real long-running 10^12-doc job
    amortizes to nothing — so the bench must too. The default keeps
    the hi-level run near a minute (fixed cost <5% of T_hi) while
    bounding the lo-level run at a few minutes."""
    env = os.environ.get("SPARK_GRAFT_SCALE_DOCS")
    if env:
        return int(env)
    return 300_000 if levels[0] <= 2 else 600_000


SCALE_DOCS = docs_for(SCALING_LEVELS)
def _corpus_version() -> int:
    sys.path.insert(0, str(REPO))
    from dxnn_ocr_cpp_spark.corpus import CORPUS_VERSION
    return CORPUS_VERSION


# the import closure of the measured job (session build -> corpus read
# -> pipeline.extract): the scaling windows and the cached
# total-chars count depend on exactly these files. Keying caches on
# this closure instead of the whole package means adding a curation
# operator (dedup.py, linkgraph.py, ...) doesn't throw away a
# measured-stable scaling window that never executed that code.
_EXTRACTION_CLOSURE = [
    "pipeline.py", "config.py", "htmlseg.py", "schemas.py",
    "partitioning.py", "session.py", "corpus.py",
    "operators/segment.py", "operators/score.py", "operators/emit.py",
]


def _package_code_digest() -> str:
    """Digest of the extraction hot path's import closure — cache key
    for anything derived from extraction OUTPUT (total chars, scaling
    windows), which depends on this code as much as on the corpus."""
    import hashlib
    h = hashlib.blake2b(digest_size=8)
    pkg = REPO / "dxnn_ocr_cpp_spark"
    for rel in _EXTRACTION_CLOSURE:
        p = pkg / rel
        h.update(rel.encode())
        h.update(p.read_bytes() if p.exists() else b"<missing>")
    return h.hexdigest()


def corpus_cache(n_docs: int) -> str:
    return os.environ.get(
        "SPARK_GRAFT_CORPUS_CACHE",
        f"/tmp/spark_graft_corpus/seed{SEED}_n{n_docs}_v{_corpus_version()}")


CORPUS_CACHE = corpus_cache(SCALE_DOCS)

HEADLINE = [
    "pricing_summary",
    "order_revenue_by_priority",
    "top_orders_per_cust",
    "events_sessionize",
    "token_counts",
    "quality_scores",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "winnow_pairs",
    "embedding_topk",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_cosine_dups_scale",
    "pdf_roundtrip",
    "curate_keeplist",
    "media_pipeline",
    "media_decode",
    "events_asof_join",
    "dataset_split",
    "sketch_accuracy",
    "quota_sample",
    "warc_roundtrip",
    "dedup_clusters",
    "pii_redact",
    "repetition_filters",
    "decontaminate",
    "nfc_normalize",
    "fix_mojibake",
    "sitemap_harvest",
    "rss_harvest",
    "robots_parse",
    "frontier_build",
    "url_canonicalize",
    "line_dedup",
    "chunk_documents",
    "lm_quality",
    "duplicate_spans",
    "span_dedup",
    "semantic_dedup",
    "pack_shards",
    "url_blocklist",
    "recrawl_latest",
    "snapshot_diff",
    "lm_ppl_buckets",
    "lang_spans",
    "link_graph",
    "host_pagerank",
    "dataset_mix",
    "anchor_texts",
    "dsir_select",
    "robots_gate",
    "bpe_train",
    "page_meta",
    "html_tables",
    "tfidf_keywords",
    "c4_filters",
    "gopher_rules",
    "quality_classifier",
    "dedup_canonical",
    "fuzzy_dedup_keeplist",
    "incremental_dedup",
    "corpus_stats",
    "paragraph_dedup",
    "incremental_refresh",
    "crawl_schedule",
    "phrase_search",
    "bm25_rank",
    "extract_markdown",
    "host_template_lines",
    "image_dhash_pairs",
    "audio_fp_pairs",
    "media_dedup_keeplist",
    "publish_dates",
    "containment_pairs",
    "containment_keeplist",
    "host_trustrank",
    "compression_quality",
    "dataset_mix_temperature",
    "meta_robots_gate",
    "script_mix",
    "curation_funnel",
    "host_hits",
    "epoch_plan",
    "stream_dedup_urls",
    "task_config_mixed",
]



def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def ensure_corpus(path: str, n_docs: int) -> None:
    if pathlib.Path(path, "_SUCCESS").exists():
        return
    sys.path.insert(0, str(REPO))
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app="bench-corpus", master=f"local[{CPUS}]")
    try:
        # many small files so any later reader gets enough input splits
        generate_documents_df(spark, n_docs, seed=SEED,
                              partitions=max(64, CPUS * 2)) \
            .write.mode("overwrite").parquet(path)
    finally:
        spark.stop()


def _proc_stat_busy() -> float:
    """System-wide busy CPU seconds since boot (/proc/stat line 1:
    total minus idle+iowait). The bench owns the machine during a
    scaling leg, so a delta across the measured pass is the engine's
    whole-process-tree CPU — JVM scan/Arrow threads AND python UDF
    workers — which per-process rusage cannot capture reliably
    (the JVM reaps its own python daemons)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def _proc_stat_steal() -> float:
    """Hypervisor steal seconds since boot (/proc/stat field 8): time
    this VM's vCPUs were runnable but the host ran someone else. Steal
    accrues only under demand, so a delta across a measured leg reads
    how much of THIS leg's core budget the neighbor took — the direct
    signal for 'the measurement ran on less machine than it was
    promised'. 0 on bare metal / steal-less hypervisors."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal / os.sysconf("SC_CLK_TCK")


def scaling_worker(cores: int, corpus: str) -> dict:
    """Runs in a child JVM: extract the corpus at local[cores]."""
    sys.path.insert(0, str(REPO))
    from dxnn_ocr_cpp_spark.pipeline import extract
    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app=f"bench-extract-{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores * 2,
                          extra_conf={
                              # split sizing balances two costs: fine
                              # splits give many waves (no straggler
                              # tail at the higher level) but each task
                              # pays an Arrow-stream + python-worker
                              # round-trip setup. Measured at 32 cores
                              # on the 600k corpus: 1m splits (~1200
                              # tasks) 13.4k docs/s, 4m (~300 tasks,
                              # 9+ waves at 32) 17.3k, 16m flat at
                              # 17.2k — 4m amortizes per-task overhead
                              # while keeping full waves. (A real
                              # cluster's 128m default never hits
                              # this; it is a local-bench artifact of
                              # MB-scale html rows.)
                              "spark.sql.files.maxPartitionBytes": "4m",
                              "spark.sql.files.openCostInBytes": "512k",
                              # constant heap PER TASK, not per JVM: the
                              # default 8g driver heap gives a 2-core
                              # run 4g/task but a 32-core run 250MB/task
                              # on MB-scale html rows — the 32-core leg
                              # then measures GC, not the engine. On a
                              # real cluster this is executor-memory /
                              # executor-cores sizing; local mode puts
                              # every task in the one driver JVM.
                              "spark.driver.memory":
                                  f"{max(8, cores // 2)}g",
                          })
    try:
        docs = spark.read.parquet(corpus)
        n = docs.count()

        def run() -> tuple:
            c0, s0 = _proc_stat_busy(), _proc_stat_steal()
            t0 = time.monotonic()
            # no repartition: the corpus layout already provides ~200
            # balanced splits; a shuffle of the html bytes would only
            # add disk traffic (hot path stays zero-shuffle)
            _materialize(extract(docs))
            return (time.monotonic() - t0, _proc_stat_busy() - c0,
                    _proc_stat_steal() - s0)

        # warm pass: spawns every Python worker + JITs the plan
        # (reference keeps only post-warm runs, benchmark.cpp:184-222).
        # The FIRST worker per corpus warms with the full char-count
        # aggregation (CPS metric, reference formula benchmark.cpp:285)
        # and caches the total — extraction is deterministic, so the
        # count is a corpus property, not a run property; later workers
        # warm on a 15% sample (same UDF/codegen paths) instead of
        # paying a second full extraction each.
        from pyspark.sql import functions as F
        chars_cache = pathlib.Path(corpus) / "_total_chars.json"
        # the count is a property of (corpus, extraction code) — key it
        # by a digest of the package source too, or a semantics change
        # (e.g. normalize_text) would silently publish a stale CPS
        code_key = _package_code_digest()
        cached = None
        if chars_cache.exists():
            cached = json.loads(chars_cache.read_text())
            if cached.get("code") != code_key:
                cached = None
        if cached is not None:
            total_chars = cached["total_chars"]
            _materialize(extract(docs.sample(fraction=0.15, seed=7)))
        else:
            total_chars = extract(docs).agg(
                F.sum(F.length("text"))).collect()[0][0] or 0
            chars_cache.write_text(json.dumps(
                {"total_chars": total_chars, "code": code_key}))
        wall, busy, steal = run()
        # cores_used exposes the local-mode accounting gap the raw
        # N->4N ratio hides: a local[8] leg on a 32-vCPU box lets the
        # JVM's scan/Arrow/GC threads ride the 24 idle cores for free,
        # so "8 cores" understates what the lo leg really consumed and
        # the raw wide-window efficiency double-counts that borrowed
        # CPU against the hi leg. On a real cluster the executor
        # cgroup caps this; here we publish measured busy-CPU so the
        # ratio can be read per actually-used core.
        return {"cores": cores, "wall_sec": round(wall, 3),
                "docs": n, "docs_per_sec": round(n / wall, 2),
                "chars_per_sec": round(total_chars / wall, 1),
                "busy_cpu_sec": round(busy, 1),
                "cores_used": round(busy / wall, 2),
                # fraction of this leg's nominal core budget the
                # hypervisor gave to someone else during the measured
                # pass (cpuset-pinned legs: the rest of the box is
                # idle and demands ~nothing, so system-wide steal is
                # this leg's steal)
                "steal_frac": round(steal / (wall * cores), 4),
                # cpuset actually applied to this leg (taskset is set
                # by the parent; report what the child observed)
                "affinity": len(os.sched_getaffinity(0))}
    finally:
        spark.stop()


def scaling_worker_shard(cores: int, corpus: str, shard: int,
                         n_shards: int, barrier: str) -> dict:
    """One isolated-executor shard: a SEPARATE JVM process (the parent
    taskset-pins it to its own disjoint `cores`-wide cpuset) running
    local[cores] over files[shard::n_shards] of the corpus — the
    per-executor cgroup/heap confinement of a real cluster executor.
    Prints READY after its warm pass, then spins on the barrier file
    so all shards' measured passes overlap fully (a ragged start would
    let early shards run on an underloaded box and overstate the
    aggregate)."""
    import glob
    sys.path.insert(0, str(REPO))
    from dxnn_ocr_cpp_spark.pipeline import extract
    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app=f"bench-iso-{shard}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores * 2,
                          extra_conf={
                              # same physical knobs as scaling_worker
                              "spark.sql.files.maxPartitionBytes": "4m",
                              "spark.sql.files.openCostInBytes": "512k",
                              "spark.driver.memory":
                                  f"{max(8, cores // 2)}g",
                          })
    try:
        files = sorted(glob.glob(f"{corpus}/part-*.parquet"))
        docs = spark.read.parquet(*files[shard::n_shards])
        n = docs.count()
        # warm spawns the python workers + JITs the plan; 30% of the
        # shard ~= the 15% full-corpus warm of scaling_worker
        _materialize(extract(docs.sample(fraction=0.3, seed=7)))
        print(f"READY {shard}", flush=True)
        deadline = time.monotonic() + 300
        while not os.path.exists(barrier):
            if time.monotonic() > deadline:
                raise RuntimeError("iso shard barrier never released")
            time.sleep(0.05)
        t0 = time.monotonic()
        _materialize(extract(docs))
        wall = time.monotonic() - t0
        return {"shard": shard, "cores": cores, "wall_sec": round(wall, 3),
                "docs": n, "docs_per_sec": round(n / wall, 2),
                "affinity": len(os.sched_getaffinity(0))}
    finally:
        spark.stop()


class _LinePump:
    """Reads a child's stdout on a daemon thread into a queue so the
    parent can wait for lines WITH a deadline: a shard JVM that hangs
    without printing (e.g. Spark stuck in warm-up) used to block
    readline() forever — the 600 s READY deadline was only checked
    between lines. get() returns the line, '' at EOF, or None when
    the deadline passes with nothing available (the thread itself
    stays blocked on the pipe; it exits at EOF when the child is
    killed)."""

    def __init__(self, stream):
        import queue
        import threading
        self._q = queue.Queue()

        def pump():
            for line in stream:
                self._q.put(line)
            self._q.put("")  # EOF sentinel

        self._t = threading.Thread(target=pump, daemon=True)
        self._t.start()

    def get(self, deadline: float):
        import queue
        remain = deadline - time.monotonic()
        try:
            return self._q.get(timeout=max(remain, 0.0))
        except queue.Empty:
            return None


def worker_multi_jvm(total_cores: int, corpus: str,
                     exec_cores: int = ISO_EXEC_CORES) -> dict:
    """The isolated-executor hi leg: total_cores/exec_cores SEPARATE
    JVM processes, each pinned to a disjoint exec_cores-wide cpuset
    over a disjoint corpus shard, measured passes released together by
    a file barrier. Returns the same record shape as scaling_worker
    (aggregate docs/sec = total docs / slowest shard wall — the
    job-completion definition a cluster scheduler would use), plus the
    per-shard detail. Busy/steal accounting reads /proc/stat across
    the envelope of the overlapped passes in the PARENT, so it
    captures all four process trees at once."""
    import tempfile
    import uuid
    n_jvms = total_cores // exec_cores
    barrier = os.path.join(tempfile.gettempdir(),
                           f"spark_graft_iso_go_{uuid.uuid4().hex[:8]}")
    for attempt in (1, 2):
        procs = []
        try:
            for w in range(n_jvms):
                cmd = [sys.executable, __file__, "--scaling-shard-worker",
                       str(exec_cores), corpus, str(w), str(n_jvms),
                       barrier]
                if PIN_CPUS:
                    lo_c, hi_c = w * exec_cores, (w + 1) * exec_cores - 1
                    cmd = ["taskset", "-c", f"{lo_c}-{hi_c}"] + cmd
                procs.append(subprocess.Popen(
                    cmd, stdout=subprocess.PIPE,
                    stderr=subprocess.DEVNULL, text=True))
            outs: list[list[str]] = [[] for _ in range(n_jvms)]
            pumps = [_LinePump(p.stdout) for p in procs]
            deadline = time.monotonic() + ISO_READY_TIMEOUT
            for i, p in enumerate(procs):
                while True:
                    line = pumps[i].get(deadline)
                    if line is None:
                        raise RuntimeError(f"iso shard {i} never READY")
                    if not line:
                        raise RuntimeError(f"iso shard {i} died pre-READY")
                    if line.startswith("READY"):
                        break
                    outs[i].append(line)
            b0, s0 = _proc_stat_busy(), _proc_stat_steal()
            t0 = time.monotonic()
            pathlib.Path(barrier).write_text("go")
            shards = []
            result_deadline = time.monotonic() + 900
            for i, p in enumerate(procs):
                while True:  # drain this shard's pump to EOF
                    line = pumps[i].get(result_deadline)
                    if line is None:
                        raise RuntimeError(
                            f"iso shard {i} produced no result "
                            f"within deadline")
                    if not line:
                        break  # EOF
                    line = line.strip()
                    if line.startswith("{"):
                        shards.append(json.loads(line))
                if p.wait(timeout=900) != 0 or len(shards) != i + 1:
                    raise RuntimeError(f"iso shard {i} failed")
            wall = time.monotonic() - t0
            busy = _proc_stat_busy() - b0
            steal = _proc_stat_steal() - s0
            docs = sum(r["docs"] for r in shards)
            max_wall = max(r["wall_sec"] for r in shards)
            return {"cores": total_cores, "wall_sec": round(max_wall, 3),
                    "docs": docs,
                    "docs_per_sec": round(docs / max_wall, 2),
                    "busy_cpu_sec": round(busy, 1),
                    # envelope wall (barrier release -> last exit)
                    # denominates busy: the measured passes fully
                    # overlap, so envelope ~= max shard wall + reap
                    "cores_used": round(busy / wall, 2),
                    "steal_frac": round(
                        steal / (wall * total_cores), 4),
                    "affinity": len(os.sched_getaffinity(0)),
                    "n_jvms": n_jvms, "exec_cores": exec_cores,
                    "shards": shards}
        except Exception:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            if attempt == 2:
                raise
        finally:
            pathlib.Path(barrier).unlink(missing_ok=True)
    raise AssertionError("unreachable")


def cpu_ceiling(lo: int, hi: int, with_steal: bool = False):
    """Host CPU scaling ceiling for lo->hi pure-python processes —
    the hardware context the engine's efficiency is judged against
    (no Spark involved).

    with_steal=True additionally returns the worst PER-PHASE steal
    fraction: each phase's /proc/stat steal delta over its own timed
    pass, normalized by that phase's OWN core count — the same
    normalization the per-leg 5% gate applies to the engine legs.
    (The previous whole-probe-over-hi-cores normalization
    systematically understated lo-phase steal by ~hi/lo and diluted
    both phases with untimed warm-up — the gate read looser than the
    per-leg gate it fronts for.)"""
    import multiprocessing as mp

    def measure(procs: int) -> tuple:
        # pin each phase to exactly `procs` cores, matching how the
        # engine legs run (pool children inherit the parent affinity)
        prev = None
        if PIN_CPUS and procs < (os.cpu_count() or procs):
            prev = os.sched_getaffinity(0)
            os.sched_setaffinity(0, set(range(procs)))
        try:
            with mp.Pool(procs) as p:
                p.map(_burn, [500_000] * procs)  # warm
                s0, t0 = _proc_stat_steal(), time.monotonic()
                p.map(_burn, [8_000_000] * procs * 3)
                dt = time.monotonic() - t0
                steal = (_proc_stat_steal() - s0) / (dt * procs)
                return procs * 3 / dt, steal
        finally:
            if prev is not None:
                os.sched_setaffinity(0, prev)

    thr_hi, st_hi = measure(hi)
    thr_lo, st_lo = measure(lo)
    ratio = round(thr_hi / (thr_lo * (hi / lo)), 4)
    if with_steal:
        return ratio, max(st_lo, st_hi)
    return ratio


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def per_core_ratio(hi_round: dict, lo_a: dict, lo_b: dict) -> float | None:
    """One bracketed round's PER-BUSY-CORE efficiency: each leg's
    throughput divided by the cores it measurably used (/proc/stat
    busy delta), hi ratioed against the mean of its two bracketing lo
    legs — the same drift cancellation as the raw ratio. This isolates
    the ENGINE's scalability from local-mode core borrowing: a
    local[8] leg on a 32-vCPU box gets its JVM scan/Arrow/GC work done
    on idle cores the nominal '8' never charges it for, deflating the
    raw N->4N number (a real cluster's executor cgroup would cap it).
    Returns None when any leg lacks cores_used (pre-instrumentation
    cached windows)."""
    lo_pc = [r["docs_per_sec"] / r["cores_used"]
             for r in (lo_a, lo_b) if r.get("cores_used")]
    if len(lo_pc) < 2 or not hi_round.get("cores_used"):
        return None
    return (hi_round["docs_per_sec"] / hi_round["cores_used"]) \
        / (sum(lo_pc) / len(lo_pc))


def window_unstable(bracket_probes: list, eff_rounds: list,
                    eff: float, ceiling: float,
                    dps: tuple | None = None,
                    max_steal: float = 0.0) -> bool:
    """Validity of a scaling window — host-side AND engine-side.

    Host side: a ceiling probe > 1.05 is physically impossible under
    stable CPU (the host throttled the probe's LOW-parallelism phase
    relative to its high one — mid-measurement drift), and a > 0.2
    spread across bracketed rounds means different rounds saw
    different hosts. bracket_probes are only the probes that BRACKET
    the measured rounds (the gate probe that admitted measurement +
    the post-run probe): earlier pre-gate probes the health gate
    rejected and waited out are published for context but do not gate
    validity — a rejected probe that merely DELAYED the start is
    evidence the gate worked, not that the measurement drifted (one
    leftover-load 1.155 start-up probe flagged an otherwise clean
    window). Engine side (the r2 gate hole): a median efficiency >
    1.02, or one exceeding what the host itself can scale by > 5%,
    can only be drift the bracketing failed to cancel (r2 published
    1.0508 against a 0.9541 host ceiling — impossible). Label the
    window rather than publish a number that reads as an engine
    property.

    dps is (best lo-level docs/sec, best hi-level docs/sec): the
    measured job is a zero-shuffle, independent-partition map, so
    best throughput is monotone in cores on a healthy host; hi
    strictly BELOW lo across interleaved rounds means the hi legs ran
    on a different effective machine (observed: a cgroup-throttled
    window where local[32] 'measured' 0.21 efficiency with local[32]
    wall slower than local[8], while a standalone worker minutes
    later hit full throughput). This check is specific to
    embarrassingly-parallel jobs — a shuffling job could honestly
    scale negatively.

    Steal side: /proc/stat steal accounting per measured leg. A leg
    whose steal fraction exceeds 5% of its core budget ran on less
    machine than its core count claims — the hypervisor gave those
    cycles to a neighbor, which hits the wide (all-core) leg far
    harder than a narrow pinned leg and so fakes an engine scaling
    defect. Observed: a window where both wide rounds agreed at ~0.37
    (spread fine, probes fine — every prior gate passed) while
    load-period steal ran ~13%; the same code measured 0.53+ in a
    low-steal window. Unlike the drift gates this one is magnitude-
    blind and reads a counter the engine cannot influence."""
    lo_dps, hi_dps = dps if dps is not None else (0.0, 1.0)
    return max(bracket_probes) > 1.05 \
        or (max(eff_rounds) - min(eff_rounds) > 0.2) \
        or eff > 1.02 \
        or (eff / ceiling) > 1.05 \
        or hi_dps <= lo_dps \
        or max_steal > 0.05


def run_scaling(corpus: str, levels: tuple = SCALING_LEVELS,
                min_rounds: int = 3, max_rounds: int = 5,
                hi_worker=None, deadline: float | None = None,
                lo_worker=None) -> dict:
    """Alternate the two levels as lo hi lo hi lo ... so every hi run
    is bracketed by two lo runs: efficiency ratios use the bracketing
    mean (first-order drift cancellation), throughput uses
    best-per-level. The sandbox VM's available CPU drifts by ~10% over
    minutes; interleaving prevents a noise dip from landing entirely
    on one level.

    hi_worker: optional replacement for the hi leg's worker (same
    record shape) — the isolated-executor window passes
    worker_multi_jvm so its hi leg runs as separate pinned JVMs while
    every other part of the protocol (bracketing, probes, gates,
    steal accounting, stable-window policy) stays identical.

    deadline: optional wall-clock cap (time.monotonic() value). The
    min_rounds bracket always runs — the caller budgeted for it
    before starting the window — but every OPTIONAL phase checks the
    deadline first: the health-gate's 90 s waits, the noise-triggered
    extension rounds, and the healthy-recovery rounds. This caps the
    retry policy by budget, not only by count (the r4 failure: window
    extensions compounded into a 40-70 min default run the driver
    killed at timeout)."""
    def room_for(cost: float) -> bool:
        return deadline is None or time.monotonic() + cost <= deadline

    def round_cost() -> float:
        # one more round = one hi leg + one lo leg, from the walls
        # this window actually measured (plus scheduling slack)
        return 1.2 * (hi_seq[-1]["wall_sec"] + lo_seq[-1]["wall_sec"])

    def worker(cores: int) -> dict:
        cmd = [sys.executable, __file__, "--scaling-worker",
               str(cores), corpus]
        if PIN_CPUS and cores < (os.cpu_count() or cores):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        # the sandbox VM occasionally stalls for minutes at a time; a
        # hung/failed worker is retried once instead of sinking the run
        for attempt in (1, 2):
            try:
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                if attempt == 2:
                    raise
                continue
            if out.returncode == 0:
                break
            if attempt == 2:
                raise RuntimeError(f"scaling worker {cores} failed:\n"
                                   f"{out.stderr[-2000:]}")
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = levels
    lo_seq, hi_seq = [], []

    # BRACKETED rounds: every hi run sits between two lo runs and its
    # ratio is taken against their MEAN. A back-to-back (lo, hi) pair
    # still aliases host drift into the ratio — the lo leg runs ~4x
    # longer, so a speed change between the legs lands entirely on one
    # side (one such window measured a physically impossible 1.004
    # "efficiency" round). With linear drift g(t), mean(lo(t0), lo(t2))
    # ≈ lo·g(t_hi) because the hi leg sits at the midpoint — first-
    # order cancellation for one extra lo leg per RUN (not per round:
    # consecutive rounds share the bracketing lo).
    def one_round():
        lo_fn = lo_worker or worker
        if not lo_seq:
            lo_seq.append(lo_fn(lo))
        hi_seq.append(hi_worker(hi) if hi_worker else worker(hi))
        lo_seq.append(lo_fn(lo))

    def ratios():
        out = []
        for i, h in enumerate(hi_seq):
            lo_mean = (lo_seq[i]["docs_per_sec"]
                       + lo_seq[i + 1]["docs_per_sec"]) / 2
            out.append(h["docs_per_sec"] / (lo_mean * (hi / lo)))
        return out

    def per_core_ratios():
        out = []
        for i, h in enumerate(hi_seq):
            r = per_core_ratio(h, lo_seq[i], lo_seq[i + 1])
            if r is None:
                return []
            out.append(r)
        return out

    def n_rounds():
        return len(hi_seq)

    # host-health gate BEFORE measuring the engine: the ceiling probe
    # is pure-python multiprocessing (no Spark), so a low reading means
    # the HOST cannot scale lo->hi in this window (noisy-neighbor VM)
    # and any engine measurement would measure the host, not the
    # engine. Wait out degraded windows, bounded at 5 probes (~6 min
    # worst case); the gate reads only host health, never the
    # engine's own numbers.
    # a probe reading > 1.02 is itself drift evidence (pure CPU work
    # cannot scale lo->hi above 1.0; the probe's lo phase was
    # throttled relative to its hi phase), so it neither passes the
    # gate nor counts toward the ceiling below. The health FLOOR is
    # window-dependent: this VM's normal ceiling is ~0.95 for 2->8
    # but only ~0.71-0.85 for 8->32 (frequency scaling + contention
    # grow with active cores), so a 0.75 reading is ill health in the
    # narrow window but business as usual in the wide one.
    floor = 0.85 if hi <= 8 else 0.60

    def healthy(p: float) -> bool:
        return floor <= p <= 1.02

    def probe() -> tuple:
        """Ceiling probe + the hypervisor steal fraction observed
        while the probe loaded the box — a high-steal window fails
        the gate even when the probe's lo->hi RATIO happens to look
        healthy (both phases equally robbed). Steal is normalized
        PER PHASE inside cpu_ceiling (each phase's own timed pass
        over its own core count — the exact normalization of the
        per-leg 5% gate in window_unstable), so the pre-run gate and
        the per-leg gate now read the same units; the old
        whole-probe-over-hi-cores fraction understated lo-phase steal
        by ~hi/lo."""
        return cpu_ceiling(lo, hi, with_steal=True)

    probes, gate_steals = [], []
    p, st = probe()
    probes.append(p); gate_steals.append(st)
    while (not healthy(probes[-1]) or gate_steals[-1] > 0.05) \
            and len(probes) < 5 and room_for(90 + 45):
        time.sleep(90)
        p, st = probe()
        probes.append(p); gate_steals.append(st)
    gate_probe = probes[-1]  # the probe that admitted measurement

    for _ in range(min_rounds):
        one_round()
    # noise-triggered extension (NOT result-triggered): when the
    # matched-pair ratios spread wider than 0.1 the host was drifting
    # mid-measurement, so collect up to two more rounds — more data
    # under noise, the same median estimator either way
    while n_rounds() < max_rounds \
            and max(ratios()) - min(ratios()) > 0.1 \
            and room_for(round_cost()):
        one_round()
    # recovery rounds: if the host was degraded for every pre-run probe
    # but measures healthy now, the measurement window was bad — sample
    # up to two more rounds in the healthy window. All rounds and all
    # probes are published; the median runs over everything.
    post = cpu_ceiling(lo, hi)
    probes.append(post)
    if healthy(post) and not any(healthy(p) for p in probes[:-1]):
        while n_rounds() < max_rounds and room_for(round_cost()):
            one_round()
    # best observed throughput per level, across all runs (the VM's
    # available CPU drifts ~10% over minutes, so best-per-level is the
    # least host-biased THROUGHPUT estimate; efficiency never mixes
    # windows — it comes from the bracketed ratios only).
    # HEADLINE = MEDIAN of the bracketed ratios: max() over noisy
    # ratios systematically biases upward (a lucky-noise round wins);
    # the best round is still reported, labeled as such.
    import statistics
    results = {
        lo: max(lo_seq, key=lambda r: r["docs_per_sec"]),
        hi: max(hi_seq, key=lambda r: r["docs_per_sec"]),
    }
    eff_rounds = ratios()
    eff = statistics.median(eff_rounds)
    # best observed host window (probes bracket the measurement:
    # pre-gate + post-run), ignoring drifted >1.02 readings — one such
    # reading once inflated the ceiling to 1.005 and made a host-bound
    # 0.71 run read as engine inefficiency
    valid = [p for p in probes if p <= 1.02]
    ceiling = max(valid) if valid else statistics.median(probes)
    max_steal = max((r.get("steal_frac", 0.0) or 0.0)
                    for r in lo_seq + hi_seq)
    unstable = window_unstable(
        [gate_probe, post], eff_rounds, eff, ceiling,
        dps=(results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]),
        max_steal=max_steal)
    pc_rounds = per_core_ratios()
    pc = {}
    if pc_rounds:
        pc = {
            "per_core_efficiency": round(statistics.median(pc_rounds), 4),
            "per_core_efficiency_rounds": [round(e, 4) for e in pc_rounds],
            "cores_used": {
                f"local[{lo}]": results[lo].get("cores_used"),
                f"local[{hi}]": results[hi].get("cores_used"),
            },
        }
    return {
        **pc,
        "mode": "isolated-executors" if hi_worker else "single-jvm",
        "cpuset_pinned": PIN_CPUS,
        f"local[{lo}]": results[lo],
        f"local[{hi}]": results[hi],
        "scaling_factor": hi / lo,
        "scaling_efficiency": round(eff, 4),           # median of rounds
        "scaling_efficiency_best": round(max(eff_rounds), 4),
        "efficiency_per_round": [round(e, 4) for e in eff_rounds],
        "host_cpu_ceiling": ceiling,
        "host_ceiling_probes": [round(p, 4) for p in probes],
        "gate_steal_probes": [round(s, 4) for s in gate_steals],
        # engine scaling relative to what the host itself can scale
        "efficiency_vs_host_ceiling": round(eff / ceiling, 4),
        # worst per-leg hypervisor steal during the measured passes
        "max_steal_frac": round(max_steal, 4),
        "host_window_unstable": unstable,
    }


def run_queries() -> dict:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod
    from dxnn_ocr_cpp_spark.session import build_session
    spark = build_session(app="bench-queries", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    timings = {}
    try:
        for name in HEADLINE:
            fn = qs[name]
            fn(spark, SF_DIR).take(1)  # warm: plan + JIT + file listing
            t0 = time.monotonic()
            _materialize(fn(spark, SF_DIR))
            timings[name] = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()
    return timings


def stable_cache_path(levels: tuple, mode: str = "") -> pathlib.Path:
    tag = f"_{mode}" if mode else ""
    return REPO / "BENCH" / \
        f"stable_scaling{tag}_{levels[0]}_{levels[1]}.json"


def stable_window_policy(ext: dict, levels: tuple = SCALING_LEVELS,
                         corpus: str = CORPUS_CACHE,
                         mode: str = "") -> dict:
    """Last-known-good policy for the scaling headline, bounded so it
    can never cherry-pick: a STABLE window (validity checks in
    run_scaling) always replaces the cache and is always reported; an
    UNSTABLE window is reported verbatim UNLESS a cached stable window
    exists, in which case the stable one becomes the headline and the
    unstable measurement is published alongside under
    `unstable_current_window`. Stability is a property of the HOST
    during the window (ceiling-probe drift, ratio spread), decided
    before any comparison of efficiency values — a stable 0.85 will
    replace a stable 0.99, so the policy prefers by VALIDITY, never by
    magnitude."""
    import datetime
    import platform
    cache = stable_cache_path(levels, mode)
    # keyed by engine-code digest + host so a cached window can never be
    # republished for code it didn't measure or a machine it didn't run on
    key = {"corpus": corpus, "levels": list(levels),
           "code": _package_code_digest(), "host": platform.node(),
           # methodology marker: a window measured without cpuset
           # pinning must never be republished as if it were pinned
           # (and vice versa) — the lo-leg core borrowing changes the
           # denominator of every ratio
           "pinned": PIN_CPUS}
    if mode:  # iso windows key + cache separately from single-jvm ones
        key["mode"] = mode
    if not ext.get("host_window_unstable"):
        cache.parent.mkdir(parents=True, exist_ok=True)
        cache.write_text(json.dumps(
            {"measured_at": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
             "window_key": key, **ext}, indent=1))
        return ext
    if cache.exists():
        stable = json.loads(cache.read_text())
        # only substitute a window measured on the SAME corpus at the
        # SAME parallelism pair — never borrow across configurations —
        # and re-check the cached window against the CURRENT validity
        # predicate, so a window cached before a gate was tightened
        # (the r2 1.0508 headline; the r3 throttled-cgroup window
        # where hi-level throughput fell below lo-level) can never be
        # republished
        eff = stable.get("scaling_efficiency", 99)
        ceil = stable.get("host_cpu_ceiling", 1e-9)
        lo_dps = stable.get(f"local[{levels[0]}]", {}) \
            .get("docs_per_sec", 0.0)
        hi_dps = stable.get(f"local[{levels[1]}]", {}) \
            .get("docs_per_sec", 1.0)
        if (stable.get("window_key") == key and eff <= 1.02
                and eff / ceil <= 1.05 and hi_dps > lo_dps):
            stable["unstable_current_window"] = ext
            return stable
    return ext


def _window_cost_estimate(levels: tuple, mode: str = "",
                          min_rounds: int = 3) -> float:
    """Conservative wall-clock estimate for re-measuring a scaling
    window, from the cached stable window's own measured leg walls
    when available (magnitude constants from BENCH/BASELINE.md
    otherwise). Counts the two ceiling probes, the min_rounds
    lo-hi-lo bracket, and — when the corpus cache is absent — corpus
    generation, then adds 25% headroom. Deliberately ignores the
    noise-triggered extension rounds: those are separately capped by
    the same deadline inside run_scaling."""
    lo, hi = levels
    cache = stable_cache_path(levels, mode)
    lo_w, hi_w = (170.0, 50.0)  # measured magnitudes on this VM
    if cache.exists():
        try:
            d = json.loads(cache.read_text())
            lo_w = d[f"local[{lo}]"]["wall_sec"]
            hi_w = d[f"local[{hi}]"]["wall_sec"]
        except (KeyError, ValueError):
            pass
    probe_cost = 40.0  # cpu_ceiling: warm + 3x burn at both widths
    est = 2 * probe_cost + (min_rounds + 1) * lo_w + min_rounds * hi_w
    corpus = corpus_cache(docs_for(levels))
    if not os.path.exists(corpus):
        est += docs_for(levels) * 0.002  # corpus generation
    return est * 1.25


def measure_or_reuse_window(levels: tuple, mode: str = "",
                            deadline: float | None = None,
                            min_rounds: int = 3, max_rounds: int = 5,
                            hi_worker_factory=None,
                            required: bool = False) -> dict | None:
    """One scaling window under the wall-clock budget: re-measure it
    when the estimated cost fits before `deadline`, else reuse the
    committed stable window verbatim — labeled with its own
    measured_at plus an explicit `remeasure_skipped` marker (and
    `cache_key_stale` when the engine hot path changed since it was
    measured, so a reused number can never silently pose as a fresh
    one). A `required` window (the headline) is measured even over
    budget when NO cache exists — the report needs some window — while
    an optional one is omitted (None)."""
    import platform
    est = _window_cost_estimate(levels, mode, min_rounds)
    fits = deadline is None or time.monotonic() + est <= deadline
    cache = stable_cache_path(levels, mode)
    if not fits and cache.exists():
        w = json.loads(cache.read_text())
        w["remeasure_skipped"] = "budget"
        key = w.get("window_key", {})
        if key.get("code") != _package_code_digest() \
                or key.get("host") != platform.node() \
                or key.get("pinned") != PIN_CPUS:
            w["cache_key_stale"] = True
        return w
    if not fits and not required:
        return None
    corpus = corpus_cache(docs_for(levels))
    ensure_corpus(corpus, docs_for(levels))
    hi_worker = hi_worker_factory(corpus) if hi_worker_factory else None
    w = run_scaling(corpus, levels, min_rounds=min_rounds,
                    max_rounds=max_rounds, hi_worker=hi_worker,
                    deadline=deadline)
    return stable_window_policy(w, levels, corpus, mode=mode)


def _window_section(ext: dict, levels: tuple, headline: bool) -> list:
    lo, hi = levels
    lo_r, hi_r = ext[f"local[{lo}]"], ext[f"local[{hi}]"]
    iso = ext.get("mode") == "isolated-executors"
    role = ("headline window" if headline
            else "isolated-executor window — the multi-JVM cluster "
                 "analog" if iso
            else "wide window — interpret against its host ceiling")
    hi_label = (f"{hi_r.get('n_jvms', 4)} x local[{hi_r.get('exec_cores', 8)}] "
                f"separate JVMs" if iso else f"local[{hi}]")
    lines = [
        f"### {lo}->{hi} cores ({role})",
        "",
        f"Corpus: {lo_r['docs']} docs.",
        "",
    ]
    if ext.get("remeasure_skipped"):
        lines += [
            f"REUSED stable window (measured_at "
            f"{ext.get('measured_at', '?')}): re-measuring was "
            f"skipped because its estimated cost did not fit the "
            f"run's wall-clock budget "
            f"(SPARK_GRAFT_BENCH_BUDGET; `--full` re-measures "
            f"unconditionally)."
            + (" NOTE: the extraction hot path changed since this "
               "window was measured (cache_key_stale)."
               if ext.get("cache_key_stale") else ""),
            "",
        ]
    lines += [
        "| parallelism | wall sec | docs/sec |",
        "|---|---|---|",
        f"| local[{lo}] | {lo_r['wall_sec']} | {lo_r['docs_per_sec']} |",
        f"| {hi_label} | {hi_r['wall_sec']} | {hi_r['docs_per_sec']} |",
        "",
    ]
    if iso:
        per_shard = [r["docs_per_sec"]
                     for r in hi_r.get("shards", [])]
        lines += [
            f"Hi leg = {hi_r.get('n_jvms')} SEPARATE "
            f"local[{hi_r.get('exec_cores')}] JVM processes, each "
            f"taskset-pinned to its own disjoint "
            f"{hi_r.get('exec_cores')}-core cpuset with its own heap, "
            f"GC, and Python worker pool, over a disjoint quarter of "
            f"the corpus files — the per-executor cgroup/heap regime "
            f"of a real {hi_r.get('n_jvms')}-executor cluster. A file "
            f"barrier releases all measured passes together; "
            f"aggregate docs/sec = total docs / slowest shard wall. "
            f"Per-shard docs/sec this window's best hi round: "
            f"{per_shard}.",
            "",
        ]
    lines += [
        f"**Scaling efficiency ({lo}->{hi} cores, 4x): "
        f"{ext['scaling_efficiency']} (median of lo-bracketed hi rounds; "
        f"best round {ext['scaling_efficiency_best']})** — per-round "
        f"{ext['efficiency_per_round']} "
        f"(host CPU ceiling for {lo}->{hi} pure-python procs, measured "
        f"in-run with multiprocessing busywork: {ext['host_cpu_ceiling']}; "
        f"median engine efficiency normalized by that ceiling: "
        f"{ext['efficiency_vs_host_ceiling']})",
        "",
    ]
    if ext.get("max_steal_frac") is not None:
        lines += [
            f"Hypervisor-steal verification (/proc/stat steal delta "
            f"per measured leg): worst leg lost "
            f"{round(100 * ext['max_steal_frac'], 2)}% of its core "
            f"budget to neighbor tenants; windows where any leg loses "
            f">5% are invalidated rather than published (steal robs "
            f"the all-core leg far more than a narrow pinned leg — "
            f"measured up to 13% under whole-box load vs 0.1% on a "
            f"pinned 8-core leg — so un-gated it fakes an engine "
            f"scaling defect a real cluster's dedicated cores would "
            f"never see).",
            "",
        ]
    if ext.get("cpuset_pinned") and ext["scaling_efficiency"] > 1.0:
        lines += [
            f"A ratio slightly above 1.0 under pinning is "
            f"fixed-overhead amortization, not measurement drift (the "
            f"r2 failure mode — an engine ratio ABOVE the host ceiling "
            f"with unpinned legs — stays gated at 1.02/1.05x): the "
            f"pinned local[{lo}] leg pays the JVM's fixed service load "
            f"(GC, scheduler, scan bookkeeping) inside a {lo}-core "
            f"budget where it is a large fraction, while the "
            f"local[{hi}] leg amortizes the same load over {hi} cores "
            f"— exactly as 2-core vs 8-core cluster executors would. "
            f"The criterion is >= 0.8; whether the denominator "
            f"convention reads 0.98 or 1.00 it is met with margin.",
            "",
        ]
    if ext.get("per_core_efficiency") is not None:
        cu = ext.get("cores_used", {})
        if ext.get("cpuset_pinned"):
            lines += [
                f"Each leg is cpuset-pinned (taskset) to exactly its "
                f"nominal cores — the confinement a real cluster's "
                f"executor cgroup applies, under which the JVM sizes "
                f"its GC/scan/Arrow thread pools from the cgroup "
                f"width. Busy-CPU accounting (/proc/stat during the "
                f"measured pass) verifies the pin: local[{lo}] used "
                f"{cu.get(f'local[{lo}]')} cores, local[{hi}] used "
                f"{cu.get(f'local[{hi}]')}. **Per-busy-core "
                f"efficiency (docs/s per measured core, hi vs lo): "
                f"{ext['per_core_efficiency']}**; per-round "
                f"{ext['per_core_efficiency_rounds']}. (Unpinned, a "
                f"local[8] leg measurably burned ~9.6 cores — its JVM "
                f"service threads riding idle host cores the nominal "
                f"thread count never charged it for.)",
                "",
            ]
        else:
            lines += [
                f"Busy-CPU accounting (/proc/stat during the measured "
                f"pass): "
                f"local[{lo}] actually used {cu.get(f'local[{lo}]')} "
                f"cores, "
                f"local[{hi}] used {cu.get(f'local[{hi}]')} — in local "
                f"mode "
                f"the lo leg's JVM scan/Arrow/GC threads borrow idle "
                f"cores "
                f"the nominal thread count doesn't charge it for (a real "
                f"cluster's executor cgroup would). **Per-busy-core "
                f"efficiency (docs/s per measured core, hi vs lo): "
                f"{ext['per_core_efficiency']}** — the engine-scalability "
                f"number with that borrowing removed; per-round "
                f"{ext['per_core_efficiency_rounds']}.",
                "",
            ]
    if "unstable_current_window" in ext:
        cur = ext["unstable_current_window"]
        lines += [
            f"Scaling numbers above are the most recent STABLE window "
            f"(measured {ext.get('measured_at', 'earlier')}, same code, "
            f"same corpus): THIS run's scaling window was flagged "
            f"unstable (host ceiling probes "
            f"{cur['host_ceiling_probes']}, per-round "
            f"{cur['efficiency_per_round']}, median "
            f"{cur['scaling_efficiency']}) and is published here "
            f"verbatim rather than as the headline. The policy prefers "
            f"windows by VALIDITY only, never by efficiency magnitude "
            f"(see bench.py stable_window_policy).",
            "",
        ]
    elif ext.get("host_window_unstable"):
        lines += [
            "**Window flagged UNSTABLE during this run** (a ceiling "
            "probe > 1.05, matched-round ratio spread > 0.2, or an "
            "engine ratio exceeding the physical bound — median > 1.02 "
            "or > 1.05x the host ceiling): the numbers above measure "
            "the drifting VM as much as the engine. Re-run in a stable "
            "window before comparing.",
            "",
        ]
    return lines


def write_report(payload: dict) -> None:
    ext = payload["extraction"]
    lines = [
        "# BENCH — PySpark extraction engine",
        "",
        f"Relational queries at `{SF_DIR}`; extraction scaling on the "
        f"seeded corpus (cache root: `/tmp/spark_graft_corpus`).",
        "",
        "## Extraction throughput scaling (north rule: N -> 4N, "
        "target efficiency >= 0.8)",
        "",
        "THREE windows are measured EVERY run — the narrow 2->8 "
        "window where the host itself scales near-perfectly (so the "
        "number reflects the engine), the wide 8->32 window named by "
        "SURVEY §0 (where this VM's own pure-python ceiling is far "
        "below 1.0; the engine number is read against that ceiling), "
        "and the ISOLATED-EXECUTOR 8->32 window whose hi leg runs as "
        "four separate cpuset-pinned 8-core JVMs over disjoint corpus "
        "shards — the multi-executor cluster regime, measured instead "
        "of argued. Publishing all three closes the round-2 gap where "
        "the window narrowed round-over-round without a side-by-side.",
        "",
    ]
    lines += _window_section(ext, SCALING_LEVELS, headline=True)
    wide = payload.get("extraction_wide")
    if wide:
        lines += _window_section(wide, WIDE_LEVELS, headline=False)
    iso = payload.get("extraction_iso")
    if iso:
        lines += _window_section(iso, WIDE_LEVELS, headline=False)
        lines += [
            "**What the isolated-executor window settles** (the r3 "
            "open question): r3 argued the wide window's shortfall was "
            "the one shared JVM (heap/GC serving all 32 task threads) "
            "and that a multi-executor cluster would recover it. "
            "Measured, that hypothesis is REFUTED on this host: four "
            "fully isolated 8-core JVMs — disjoint cpusets, heaps, "
            "GCs, Python pools, disjoint inputs — aggregate within a "
            "few percent of the single local[32] JVM, and a "
            "2x-local[8] probe of the same shape scales 8->16 at "
            "~0.80 while 8->32 lands where the wide window lands. "
            "Degradation grows smoothly with ACTIVE CORES regardless "
            "of process topology, which is the signature of the "
            "host's shared memory subsystem (bandwidth + frequency "
            "scaling), not of any engine or JVM structure. The "
            "per-process probes agree: the bare extraction kernel "
            "under multiprocessing (no Spark, no JVM) scales 8->32 "
            "at 0.78 on this box, and the engine's data plane moves "
            "several times the kernel's bytes per doc (parquet "
            "decode + Arrow round-trip), so it saturates the same "
            "memory subsystem earlier. A real cluster's 4N executors "
            "bring 4N memory buses — in-sandbox, all 32 cores share "
            "one; that hardware axis cannot be evidenced here, and "
            "these numbers are the honest in-box reading.",
            "",
        ]
    lines += [
        "Per window: >=3 hi rounds at the headline (>=2 at the wide "
        "window), extended when the ratio spread exceeds 0.1 — "
        "noise-triggered, not result-triggered — each BRACKETED by two "
        "lo runs and ratioed against their mean so linear host drift "
        "cancels to first order; headline efficiency is the MEDIAN "
        "round (max over noisy ratios biases upward), throughput "
        "best-per-level (the sandbox VM's available CPU drifts ~10% "
        "over minutes).",
        "",
        "Kernel-ceiling cross-check (`tools/kernel_ceiling_probe.py`): "
        "the actual segmentation kernel (`pipeline.extract_python` — "
        "the same pure-Python function the pandas UDF batches over), "
        "run through a bare `multiprocessing.Pool` with no Spark at "
        "all, scales 8->32 at **0.7784** on this VM (lo-hi-lo "
        "bracketed, 24k docs) — indistinguishable from the "
        "arithmetic-busywork ceiling (0.7648). So the in-run "
        "busywork ceiling is representative of the real workload, "
        "not an underestimate.",
        "",
        "Plumbing-ceiling cross-check "
        "(`tools/plumbing_ceiling_probe.py`): the identical parquet "
        "scan + Arrow round-trip with the kernel replaced by a "
        "passthrough moves ~111k docs/s at local[8] and ~160k at "
        "local[32] — 7-10x the full job at both widths — so the JVM "
        "data plane is a minor ADDITIVE wall-clock cost (~10% of "
        "hi-leg wall). Its own 8->32 scaling is poor (~0.36: it is "
        "the most bandwidth-bound stage), and it runs CONCURRENTLY "
        "with the kernel, so at 32 active cores kernel + data plane "
        "together saturate the box's memory subsystem earlier than "
        "the kernel alone would — consistent with the "
        "isolated-executor window's finding that process topology "
        "doesn't move the number.",
        "",
        "Reference precedent: DXNN-OCR card scaling 7.40 -> 14.73 -> "
        "21.96 FPS across 1/2/3 NPUs = 0.995/0.989 efficiency "
        "(/root/reference/README.md:167-172). Same embarrassingly "
        "parallel per-document shape: our hot path has zero shuffles.",
        "",
        "## Headline query wall-times (sec, noop-materialized)",
        "",
        "Cross-round caveat: this table has no load gate (unlike the "
        "scaling windows) — deltas vs an earlier round are only "
        "meaningful if both measurement windows were quiet. See "
        "BENCH/REGRESSIONS.md for the r2->r3 delta investigation "
        "(all six flagged queries recovered on a quiet box; no code "
        "regression existed).",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in payload["queries"].items()]
    lines += ["", f"Total: {payload['value']} sec  |  sf dir: `{SF_DIR}`  "
                  f"|  cpus: {CPUS}", ""]
    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines))


# ---------------- scenario modes (reference 5-mode analog) ----------

def _pctl(xs: list, q: float) -> float:
    """Linear-interpolated percentile (the reference's numpy
    percentile semantics, core/metrics.py:63-91)."""
    s = sorted(xs)
    if len(s) == 1:
        return s[0]
    pos = q * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    hi = min(lo + 1, len(s) - 1)
    return s[lo] * (1 - frac) + s[hi] * frac


def _mode_session(mode: str):
    sys.path.insert(0, str(REPO))
    from dxnn_ocr_cpp_spark.session import build_session
    return build_session(app=f"bench-{mode}", master=f"local[{CPUS}]",
                        shuffle_partitions=CPUS)


def mode_latency(n_docs: int = 2000, jobs: int = 20) -> dict:
    """Per-job latency percentiles: `jobs` identical small extraction
    jobs through one session — what a caller submitting batch requests
    experiences (reference latency mode: single-request round-trip
    P50/P90/P99)."""
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    spark = _mode_session("latency")
    try:
        docs = generate_documents_df(spark, n_docs, seed=SEED).cache()
        docs.count()  # materialize input so jobs measure extraction only
        walls = []
        _materialize(extract(docs))  # warm (JIT + Python workers)
        for _ in range(jobs):
            t0 = time.monotonic()
            _materialize(extract(docs))
            walls.append(time.monotonic() - t0)
        return {"mode": "latency", "docs_per_job": n_docs, "jobs": jobs,
                "p50_s": round(_pctl(walls, 0.5), 3),
                "p90_s": round(_pctl(walls, 0.9), 3),
                "p99_s": round(_pctl(walls, 0.99), 3),
                "mean_s": round(sum(walls) / len(walls), 3),
                "per_doc_ms_p50": round(_pctl(walls, 0.5) / n_docs * 1e3, 3)}
    finally:
        spark.stop()


def mode_stress(n_docs: int = 2000, concurrency: int = 4,
                jobs_per_thread: int = 3) -> dict:
    """Concurrent-submission degradation: `concurrency` driver threads
    each run extraction jobs against the same session (Spark schedules
    them over the shared executor pool). Reports solo vs contended
    per-job latency and aggregate throughput — the reference's stress
    mode (concurrency 10 against one pipeline)."""
    import threading
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    spark = _mode_session("stress")
    try:
        docs = generate_documents_df(spark, n_docs, seed=SEED).cache()
        docs.count()
        _materialize(extract(docs))  # warm
        t0 = time.monotonic()
        _materialize(extract(docs))
        solo = time.monotonic() - t0

        walls, lock = [], threading.Lock()

        def worker():
            for _ in range(jobs_per_thread):
                t = time.monotonic()
                _materialize(extract(docs))
                with lock:
                    walls.append(time.monotonic() - t)

        threads = [threading.Thread(target=worker)
                   for _ in range(concurrency)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        total = time.monotonic() - t0
        n_jobs = concurrency * jobs_per_thread
        return {"mode": "stress", "docs_per_job": n_docs,
                "concurrency": concurrency, "jobs": n_jobs,
                "solo_job_s": round(solo, 3),
                "contended_p50_s": round(_pctl(walls, 0.5), 3),
                "contended_p99_s": round(_pctl(walls, 0.99), 3),
                # <1.0 would mean concurrency HURTS aggregate throughput
                "aggregate_speedup": round(n_jobs * solo / total, 3),
                "agg_docs_per_sec": round(n_jobs * n_docs / total, 1)}
    finally:
        spark.stop()


def mode_stability(n_docs: int = 5000, repeats: int = 8) -> dict:
    """Run-to-run drift: identical job `repeats` times; coefficient of
    variation of throughput (reference stability mode: sustained load,
    variance watched)."""
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    import statistics
    spark = _mode_session("stability")
    try:
        docs = generate_documents_df(spark, n_docs, seed=SEED).cache()
        docs.count()
        _materialize(extract(docs))  # warm
        tps = []
        for _ in range(repeats):
            t0 = time.monotonic()
            _materialize(extract(docs))
            tps.append(n_docs / (time.monotonic() - t0))
        mean = statistics.mean(tps)
        stdev = statistics.stdev(tps) if len(tps) > 1 else 0.0
        return {"mode": "stability", "docs_per_job": n_docs,
                "repeats": repeats,
                "docs_per_sec_mean": round(mean, 1),
                "docs_per_sec_min": round(min(tps), 1),
                "docs_per_sec_max": round(max(tps), 1),
                "cv": round(stdev / mean, 4)}
    finally:
        spark.stop()


def mode_capacity(sizes: tuple = (2000, 8000, 32000)) -> dict:
    """Throughput vs batch size: does docs/sec hold as the batch
    grows? A flat curve = fixed per-job overhead amortized, no
    superlinear term — the per-run capacity probe (reference capacity
    mode: load until saturation)."""
    from dxnn_ocr_cpp_spark.corpus import generate_documents_df
    from dxnn_ocr_cpp_spark.pipeline import extract
    spark = _mode_session("capacity")
    try:
        points = []
        for n in sizes:
            docs = generate_documents_df(spark, n, seed=SEED,
                                         partitions=max(8, CPUS)).cache()
            docs.count()
            _materialize(extract(docs))  # warm
            t0 = time.monotonic()
            _materialize(extract(docs))
            wall = time.monotonic() - t0
            docs.unpersist()
            points.append({"n_docs": n, "wall_s": round(wall, 3),
                           "docs_per_sec": round(n / wall, 1)})
        base = points[0]["docs_per_sec"]
        return {"mode": "capacity", "points": points,
                # >1: throughput still rising with batch size (overhead
                # amortizing); ~1: flat; <<1: something superlinear
                "largest_vs_smallest": round(
                    points[-1]["docs_per_sec"] / base, 3)}
    finally:
        spark.stop()


MODES = {"latency": mode_latency, "stress": mode_stress,
         "stability": mode_stability, "capacity": mode_capacity}


def write_modes_report(results: dict) -> None:
    lines = ["# BENCH scenario modes",
             "",
             "Engine self-measurement (analog of the reference's "
             "latency/stress/stability/capacity scenario framework, "
             "/root/reference/server/benchmark/benchmark_config.yaml:29-35). "
             f"local[{CPUS}], seeded corpus.",
             ""]
    for mode, r in results.items():
        lines.append(f"## {mode}")
        lines.append("")
        for k, v in r.items():
            if k != "mode":
                lines.append(f"- {k}: `{v}`")
        lines.append("")
    out = REPO / "BENCH" / "MODES.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines))


def run_modes(names: list) -> None:
    results = {}
    for name in names:
        if name not in MODES:
            raise SystemExit(f"unknown mode {name}; pick from {list(MODES)}")
        results[name] = MODES[name]()
    # merge with previously recorded modes so single-mode runs don't
    # wipe the report
    prior_path = REPO / "BENCH" / "modes.json"
    prior = json.loads(prior_path.read_text()) if prior_path.exists() else {}
    prior.update(results)
    prior_path.parent.mkdir(exist_ok=True)
    prior_path.write_text(json.dumps(prior, indent=1))
    write_modes_report(prior)
    print(json.dumps({"metric": "bench_modes", "modes": results}))


# queries inlined into the final stdout JSON line. The driver captures
# only the last ~2000 chars of stdout; round 2's 63-query line
# overflowed it and the round recorded NO parsed bench at all. The
# full per-query map always goes to BENCH/bench_detail.json — this
# subset (the composed pipelines + the costliest operator families)
# keeps the driver-visible line well under the capture window.
INLINE_QUERIES = [
    "fuzzy_dedup_keeplist", "incremental_dedup", "quality_classifier",
    "curate_keeplist",
    "frontier_build", "dedup_clusters", "host_pagerank",
    "winnow_pairs", "minhash_lsh_pairs", "simhash_pairs",
    "ngram_jaccard_pairs", "embedding_ivf_topk", "embedding_lsh_topk",
    "semantic_dedup", "pdf_roundtrip", "warc_roundtrip", "dsir_select",
]


def _ext_summary(ext: dict, levels: tuple) -> dict:
    """Compact scalars for the one-line driver JSON; full window detail
    lives in BENCH/bench_detail.json."""
    lo, hi = levels
    out = {
        "levels": [lo, hi],
        "docs_per_sec": {str(lo): ext[f"local[{lo}]"]["docs_per_sec"],
                         str(hi): ext[f"local[{hi}]"]["docs_per_sec"]},
        "efficiency": ext["scaling_efficiency"],
        "host_ceiling": ext["host_cpu_ceiling"],
        "vs_ceiling": ext["efficiency_vs_host_ceiling"],
        "unstable": bool(ext.get("host_window_unstable")),
    }
    if ext.get("per_core_efficiency") is not None:
        out["per_core_eff"] = ext["per_core_efficiency"]
    if ext.get("remeasure_skipped"):
        # a reused stable window must never pose as a fresh one: the
        # driver-visible line carries its own measurement timestamp
        out["cached"] = ext.get("measured_at", True)
        if ext.get("cache_key_stale"):
            out["stale"] = True
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        print(json.dumps(scaling_worker(int(sys.argv[2]), sys.argv[3])))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-shard-worker":
        print(json.dumps(scaling_worker_shard(
            int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
            int(sys.argv[5]), sys.argv[6])))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--mode":
        run_modes(sys.argv[2].split(",") if len(sys.argv) > 2
                  else list(MODES))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--queries-only":
        # iteration aid, the inverse of SPARK_GRAFT_SKIP_QUERIES:
        # refresh the per-query table reusing the committed STABLE
        # scaling windows (each labeled with its own measured_at) —
        # a query-side change doesn't invalidate a scaling window,
        # the two phases measure disjoint code paths
        extraction = json.loads(
            stable_cache_path(SCALING_LEVELS).read_text())
        wide_cache = stable_cache_path(WIDE_LEVELS)
        wide = (json.loads(wide_cache.read_text())
                if RUN_WIDE and wide_cache.exists() else None)
        iso_cache = stable_cache_path(WIDE_LEVELS, "iso")
        iso = (json.loads(iso_cache.read_text())
               if RUN_ISO and iso_cache.exists() else None)
        _finish(extraction, wide, iso, run_queries())
        return
    full = len(sys.argv) > 1 and sys.argv[1] == "--full"
    # BUDGET-AWARE DEFAULT (the round-4 lesson): the old default
    # unconditionally re-measured all three scaling windows — an est.
    # 40-70 min — and the driver killed it at timeout (rc=124),
    # recording NO perf data at all. The bench's first duty is to
    # ALWAYS emit its one-line JSON within the caller's budget:
    # queries run first (they have no cache), then each scaling
    # window is re-measured ONLY if its estimated cost fits the
    # remaining wall-clock budget — otherwise the committed stable
    # window is reused verbatim, labeled with its own measured_at
    # and an explicit remeasure_skipped marker. `--full` (or a large
    # SPARK_GRAFT_BENCH_BUDGET) restores unconditional re-measure.
    # Reference analog: the benchmark harness always emits its
    # report (/root/reference/benchmark/benchmark.cpp:239-293).
    deadline = (None if full
                else time.monotonic() + BENCH_BUDGET)
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES") == "1":
        # iteration aid: refresh the scaling windows without paying
        # the query phase; report/detail keep the prior query table
        prior = REPO / "BENCH" / "bench_detail.json"
        timings = (json.loads(prior.read_text()).get("queries", {})
                   if prior.exists() else {})
    else:
        timings = run_queries()
    extraction = measure_or_reuse_window(
        SCALING_LEVELS, deadline=deadline, required=True)
    wide = None
    if RUN_WIDE:
        wide = measure_or_reuse_window(
            WIDE_LEVELS, deadline=deadline,
            min_rounds=2, max_rounds=4)
    iso = None
    if RUN_ISO:
        iso = measure_or_reuse_window(
            WIDE_LEVELS, mode="iso", deadline=deadline,
            min_rounds=2, max_rounds=4,
            hi_worker_factory=lambda corpus: (
                lambda cores: worker_multi_jvm(cores, corpus)))
    _finish(extraction, wide, iso, timings)


def _finish(extraction: dict, wide: dict | None, iso: dict | None,
            timings: dict) -> None:
    payload = {
        "metric": "bench_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": pathlib.Path(SF_DIR).name,
        "extraction": extraction,
    }
    if wide:
        payload["extraction_wide"] = wide
    if iso:
        payload["extraction_iso"] = iso
    write_report(payload)
    detail = REPO / "BENCH" / "bench_detail.json"
    detail.parent.mkdir(exist_ok=True)
    detail.write_text(json.dumps(payload, indent=1))
    # final stdout line: compact enough for the driver's 2000-char
    # tail capture (the full payload is in BENCH/bench_detail.json)
    compact = {
        "metric": "bench_total_wall",
        "value": payload["value"],
        "unit": "sec",
        "queries": {k: timings[k] for k in INLINE_QUERIES
                    if k in timings},
        "sf": payload["sf"],
        "extraction": _ext_summary(extraction, SCALING_LEVELS),
        "detail": "BENCH/bench_detail.json",
    }
    if wide:
        compact["extraction_wide"] = _ext_summary(wide, WIDE_LEVELS)
    if iso:
        compact["extraction_iso"] = _ext_summary(iso, WIDE_LEVELS)
    line = json.dumps(compact)
    if len(line) > 1900:  # belt-and-braces: never overflow the capture
        compact.pop("queries", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
