"""Physical layout: url-bucket partitioning + hot-host salting (X4/X5).

The reference dodges skew/contention by pinning recognition to one
thread (/root/reference/src/pipeline/ocr_pipeline.cpp:128-132) and
batching crops by aspect-ratio bucket
(/root/reference/src/recognition/text_recognizer.cpp:135-183). At
cluster scale our skew is hot hosts (few hosts own half the corpus) and
giant pages. Both are defused before the expensive stage-1 UDF:

  * repartition on xxhash64(url) — uniform, key-independent spread
    (per-doc work is embarrassingly parallel; no key locality needed);
  * len_bucket column (C5 aspect-ratio-bucket analog) so giant pages
    can be observed (lineage histogram) and, when writing, routed.

For the Iceberg layout the DDL (io.py) buckets on url, matching the
north rule `hash(url)` bucket mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

# byte-length buckets for html blobs (analog of ratio buckets {3,5,10,15,25,35})
LEN_BUCKET_EDGES = [1 << 10, 4 << 10, 16 << 10, 64 << 10, 256 << 10, 1 << 20, 8 << 20]


def ensure_min_partitions(df):
    """Widen an underpartitioned source to the session's default
    parallelism. A small single-file parquet scan plans ONE input
    split, which serializes any CPU-heavy per-row stage (signature
    build, per-position hashing) on one core; at cluster scale inputs
    already carry >= parallelism splits and this is a no-op — no extra
    shuffle is ever added where one wouldn't pay for itself."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def with_len_bucket(df, html_col: str = "html", out_col: str = "len_bucket"):
    expr = F.lit(len(LEN_BUCKET_EDGES))
    for i in reversed(range(len(LEN_BUCKET_EDGES))):
        expr = F.when(F.length(F.col(html_col)) <= LEN_BUCKET_EDGES[i], F.lit(i)).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))


def host_of(url_col):
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/", 1)


def salted_repartition(df, n_partitions: int, url_col: str = "url",
                       salt_buckets: int = 8):
    """Spread rows uniformly for the UDF stage. xxhash64(url, salt)
    already decorrelates hot hosts; the salt term guards the degenerate
    case of massive per-url duplication upstream."""
    salt = (F.xxhash64(F.col(url_col)) % salt_buckets).cast("int")
    return df.repartition(n_partitions, F.xxhash64(F.col(url_col), salt))


def bucket_id(url_col, n_buckets: int = 32):
    """Stable bucket id for layout/lineage: pmod(xxhash64(url), n)."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


# ---------------- deterministic per-group quota sampling ----------------

def hash_unit(key_col, hash_family: str = "xxhash64"):
    """Deterministic pseudo-uniform u in [0,1) from a key — the shared
    primitive under split_assign and quota_sample. md5 family is
    engine-replayable (first-6-hex-chars / 16^6); xxhash64 is the
    cheaper JVM production family."""
    if hash_family == "md5":
        total = 16 ** SPLIT_HEX_WIDTH
        return (F.conv(F.substring(F.md5(key_col), 1, SPLIT_HEX_WIDTH),
                       16, 10).cast("double") / total)
    return F.pmod(F.xxhash64(key_col), F.lit(1_000_000)) \
        .cast("double") / 1_000_000


def quota_sample(df, group_col: str, cap: int, key_col: str = "url",
                 oversample: float = 2.0,
                 hash_family: str = "xxhash64"):
    """Keep at most `cap` rows per group, chosen deterministically (the
    cap-smallest hash_unit(key) values — stable across runs, clusters,
    and row additions outside the winners, unlike df.sampleBy).

    Scale shape: the naive form — row_number over
    partitionBy(group) — funnels EVERY row of a hot group through one
    window task before the cap filter drops them, the exact skew the
    north rule exists to defuse. So rows are pre-thinned first: group
    counts (one partial-agg shuffle on group) broadcast back, and only
    rows with u < oversample*cap/n_group survive to the window —
    expected window input is oversample*cap per group REGARDLESS of
    group size. The pre-filter is part of the operator definition
    (both hash families and the SQL oracle replay it bit-for-bit), so
    determinism is unconditional; `oversample` only trades pre-filter
    sharpness against the binomial tail where a group yields fewer
    than cap winners.

    Returns df's columns + `u` + `rk` (1-based deterministic rank
    within the group).
    """
    u = hash_unit(F.col(key_col), hash_family)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    thr = F.least(F.lit(1.0), F.lit(float(oversample) * cap) / F.col("__n"))
    thinned = (df.withColumn("u", u)
               .join(F.broadcast(counts), group_col)
               .filter(F.col("u") < thr).drop("__n"))
    w = Window.partitionBy(group_col).orderBy("u", key_col)
    return (thinned.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= cap))


# ---------------- deterministic dataset splits ----------------

DEFAULT_SPLITS = (("train", 0.98), ("val", 0.01), ("test", 0.01))
SPLIT_HEX_WIDTH = 6  # md5-family fraction resolution: 16^-6 ~ 6e-8


def split_hex_thresholds(splits=DEFAULT_SPLITS) -> list:
    """Cumulative md5-prefix thresholds for all but the last split —
    the ONE place the boundary arithmetic lives (the DuckDB oracle
    inlines these same constants)."""
    total = 16 ** SPLIT_HEX_WIDTH
    acc, out = 0.0, []
    for name, frac in splits[:-1]:
        acc += frac
        out.append((name, format(int(round(acc * total)),
                                 f"0{SPLIT_HEX_WIDTH}x")))
    return out


def split_assign(df, key_col: str = "url", splits=DEFAULT_SPLITS,
                 hash_family: str = "xxhash64", out_col: str = "split"):
    """Deterministic, leakage-safe train/val/test assignment: a pure
    function of the split KEY, so (a) the same page lands in the same
    split on every run/cluster/snapshot, (b) keying on url/host keeps
    near-duplicate pages of one site from straddling train and test,
    and (c) adding or removing other rows never reshuffles existing
    assignments (unlike randomSplit, which is partition-order
    dependent). One narrow projection — no shuffle, no RNG state.

    hash_family "xxhash64": pmod over 10^6 buckets (JVM-only, the
    production path). "md5": first-6-hex-chars range compare —
    bit-replayable by any engine with md5 (the DuckDB oracle twin,
    same pattern as the dedup md5 families)."""
    fracs = [f for _, f in splits]
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {sum(fracs)}")
    if hash_family == "md5":
        h = F.substring(F.md5(F.col(key_col)), 1, SPLIT_HEX_WIDTH)
        expr = F.lit(splits[-1][0])
        for name, thr in reversed(split_hex_thresholds(splits)):
            expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    else:
        total = 1_000_000
        bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(total))
        acc, expr = 0.0, F.lit(splits[-1][0])
        cuts = []
        for name, frac in splits[:-1]:
            acc += frac
            cuts.append((name, int(round(acc * total))))
        for name, cut in reversed(cuts):
            expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
