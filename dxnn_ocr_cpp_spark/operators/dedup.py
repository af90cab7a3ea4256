"""Deduplication operators for training-data curation.

Four tiers, cheapest first — all shuffle-aware, designed so the join
keys stay bounded at 10^12-document scale:

  exact        md5(canonical text) groupBy — one shuffle on a 16-byte key
  ngram-set    exact word-n-gram Jaccard via shingle inverted index —
               pair generation bounded by per-shingle doc frequency cap
               (hot shingles are stopword-ish and carry no signal; the
               cap is the skew defuser, analog of the reference's
               candidate cap, /root/reference/src/detection/db_postprocess.cpp:53)
  minhash-lsh  probabilistic: k permutations -> b bands; candidate pairs
               only within equal band buckets (the 100-TB path: cost is
               O(docs * k) + bucket-local joins, never O(n^2))
  simhash      64-bit near-dup signature; hamming-ball lookup via
               4-piece exact-match trick

All hashing is xxhash64 (JVM-side, seeded, deterministic). The only
Python is simhash's vectorized bit-vote kernel (one Arrow hop).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dxnn_ocr_cpp_spark.operators.textstats import (exploded_hash_rows,
                                                    fingerprint)
from dxnn_ocr_cpp_spark.partitioning import ensure_min_partitions

# Java-regex \s class (what Spark's regexp_replace(\s+) matches) — NOT
# Python's Unicode-aware \s; keeps tokenization bit-compatible with the
# Column-expression variant and the DuckDB oracle CTE
_WS_RUN = re.compile(r"[ \t\n\x0b\f\r]+")


def _tokenize(s: str) -> list:
    """Exact Python replica of the oracle/Column tokenization:
    split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')."""
    return _WS_RUN.sub(" ", s.strip(" ").lower()).split(" ")


def _gram_hashes(s, n: int, hasher: str = "blake2b") -> np.ndarray:
    """Distinct word n-grams of one doc -> sorted int64 hashes (stable
    across processes/partitionings, unlike hash()).

    hasher "blake2b" (production, 8-byte digest) or "md5" (first 8
    digest bytes, big-endian signed — EXACTLY the int64 an engine gets
    from CAST('0x' || substr(md5(g), 1, 16)) two's-complement, which is
    what makes the md5 family DuckDB-oracle-replayable)."""
    if s is None:
        return np.empty(0, dtype=np.int64)
    w = _tokenize(s)
    if len(w) >= n:
        grams = {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    else:
        grams = {" ".join(w)}
    if hasher == "md5":
        digest = lambda g: hashlib.md5(g.encode("utf-8")).digest()[:8]  # noqa: E731
    else:
        digest = lambda g: hashlib.blake2b(  # noqa: E731
            g.encode("utf-8"), digest_size=8).digest()
    arr = np.fromiter(
        (int.from_bytes(digest(g), "big", signed=True) for g in grams),
        dtype=np.int64, count=len(grams))
    arr.sort()
    return arr


# ---------- exact ----------

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """One survivor per identical canonical text: the min id. Returns
    (fingerprint, keep_id, n_dupes). Single shuffle on the digest."""
    return (df
            .withColumn("fingerprint", fingerprint(F.col(text_col)))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).cast("int").alias("n_dupes")))


# ---------- word n-gram shingles (shared) ----------

def word_grams(text_col, n: int = 3):
    """Distinct word n-grams as STRINGS, pure Catalyst — the
    oracle-replayable twin of word_shingle_hashes (same token sets:
    split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' '),
    same short-doc fallback to the whole token string).

    The per-gram slice+array_join is O(words^2) per doc, and downstream
    shuffles carry n-word strings instead of 8-byte longs — this is the
    verification-family builder, not the scale path (use
    word_shingle_hashes in production)."""
    w = F.split(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.when(F.size(w) >= n, F.array_distinct(grams)) \
            .otherwise(F.array(F.array_join(w, " ")))


def word_shingle_hashes(text_col, n: int = 3):
    """Distinct word n-grams hashed to int64, via ONE vectorized-batch
    pandas UDF (the sanctioned Arrow hop, same shape as the segmenter).

    Two scale effects vs the pure-Column variant:
      - downstream shuffles move 8-byte longs instead of n-word strings
        (~10x less shuffle I/O on web text);
      - the per-gram slice+array_join Catalyst expression is O(words^2)
        per doc — the Python set-build is O(words) and measured ~5x
        faster end-to-end at sf0.1.
    Same token sets as the oracle CTE; collision odds ~k^2/2^64."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle_hashes(texts: pd.Series) -> pd.Series:
        return pd.Series([_gram_hashes(s, n) for s in texts])

    return shingle_hashes(text_col)


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a, b, jaccard >= t) over
    the df-capped inverted index: shingles appearing in more than
    max_shingle_df docs are excluded from pair counting (skew guard)
    while set sizes stay pre-cap — on corpora where the cap never
    fires (any sane threshold) this IS exact Jaccard, and the DuckDB
    oracle mirrors the cap bit-for-bit either way.

    Inverted-index pair generation: explode shingles, drop shingles
    appearing in > max_shingle_df docs (frequency cap = skew guard:
    without it one stop-shingle joins half the corpus to itself), join
    doc-lists pairwise, count common shingles, compute
    |A∩B| / (|A|+|B|-|A∩B|).

    Shingles are pre-hashed to int64 (word_shingle_hashes) so the
    explode/join shuffles carry 8-byte keys, not n-word strings.
    """
    # set size rides along on every exploded row (8 bytes) so the final
    # jaccard needs NO join back to a recomputed shingle table; the
    # Python-side explosion avoids the dead duplicate UDF eval that
    # F.explode(udf(...)) plans (see textstats.exploded_hash_rows)
    ex = exploded_hash_rows(df, id_col, text_col,
                            lambda s: _gram_hashes(s, n))
    # frequency cap (bounded work per key — candidate-cap analog),
    # expressed as a window count over the SAME hash-partitioning the
    # self-join needs: one exchange serves the cap, both join sides
    # (ReusedExchange), and the join's sort
    exf = (ex.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("g")))
             .filter(F.col("df") <= F.lit(max_shingle_df)).drop("df"))
    pairs = (exf.alias("x").join(exf.alias("y"), "g")
             .filter(F.col("x.id") < F.col("y.id"))
             .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
             .agg(F.count(F.lit(1)).cast("int").alias("common"),
                  F.first(F.col("x.n")).alias("na"),     # constant per a
                  F.first(F.col("y.n")).alias("nb")))    # constant per b
    return (pairs
            .withColumn("jaccard",
                        F.col("common")
                        / (F.col("na") + F.col("nb") - F.col("common")))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      threshold: float = 0.8,
                      max_shingle_df: int = 1000) -> DataFrame:
    """Exact asymmetric n-gram containment pairs: (src, dst,
    containment) where containment = |SRC ∩ DST| / |SRC| >= threshold,
    src != dst. Directed — both readings of an intersecting pair are
    evaluated independently.

    Symmetric Jaccard misses the aggregator/quotation shape: a page
    that wholly CONTAINS another (wire story + commentary, scraped
    snippet + site chrome) has low Jaccard when the container is much
    larger, yet the contained page is pure redundancy against it.
    Containment is Broder's asymmetric companion to resemblance
    (SEQUENCES'97); the reference analog is the ancestor-containment
    dedupe of overlapping detections (D13,
    /root/reference/src/common/geometry.cpp:190-201) — "is this
    region already covered by another" rather than "are these two
    regions similar".

    Physically it reuses ngram_jaccard_pairs' df-capped inverted
    index unchanged — one window exchange serves the frequency cap,
    both self-join sides (ReusedExchange), and the join's sort; the
    unordered intersection row (a<b, common, na, nb) then fans out to
    its two directed readings via one inline explode, so no second
    aggregation and no union rescan of the index. Docs shorter than n
    words carry the shared _gram_hashes fallback — one whole-doc
    shingle — so they pair only with textually identical short docs.
    When the df cap fires, common is understated for pairs sharing a
    hot shingle (same conservative semantics as the Jaccard miner;
    the oracle mirrors the cap bit-for-bit)."""
    ex = exploded_hash_rows(df, id_col, text_col,
                            lambda s: _gram_hashes(s, n))
    exf = (ex.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("g")))
             .filter(F.col("df") <= F.lit(max_shingle_df)).drop("df"))
    pairs = (exf.alias("x").join(exf.alias("y"), "g")
             .filter(F.col("x.id") < F.col("y.id"))
             .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
             .agg(F.count(F.lit(1)).cast("int").alias("common"),
                  F.first(F.col("x.n")).alias("na"),
                  F.first(F.col("y.n")).alias("nb")))
    directed = pairs.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst"),
                 (F.col("common") / F.col("na")).alias("containment")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst"),
                 (F.col("common") / F.col("nb")).alias("containment")),
    )).alias("p")).select("p.*")
    return (directed.filter(F.col("containment") >= threshold)
            .select("src", "dst",
                    F.round("containment", 6).alias("containment")))


# ---------- MinHash + LSH ----------

# md5-family universal hashing: x(g) = int(md5(g)[:8 hex]) mod P, then
# h_i(x) = (a_i * x + b_i) mod P with P the Mersenne prime 2^31-1.
# P prime makes every h_i a BIJECTION on Z_P (a_i != 0 mod P), i.e. a
# true permutation — the textbook Carter-Wegman family, not a mixing
# heuristic. ONE md5 per gram (the old family paid num_perm of them)
# plus integer affine maps both engines replay exactly: no overflow
# (a, x < P  =>  a*x < 2^62) under Spark ANSI or DuckDB BIGINT.
MH_P = 2_147_483_647
MH_A_MULT = 2_654_435_761       # Knuth multiplicative constants —
MH_B_MULT = 40_503              # any fixed nonzero residues work
def mh_affine_consts(i: int) -> tuple[int, int]:
    return ((MH_A_MULT * (i + 1)) % MH_P, (MH_B_MULT * (i + 7)) % MH_P)


def _md5_gram_int(g):
    """First 8 md5 hex chars as an integer, reduced mod MH_P —
    the gram's point in Z_P (DuckDB: CAST('0x'||substr(md5(g),1,8)
    AS BIGINT) % P)."""
    return F.pmod(
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        F.lit(MH_P))


def _mh_affine(i: int):
    a, b = mh_affine_consts(i)
    return lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(MH_P))


def minhash_signature(shingles_col, num_perm: int = 64,
                      hash_family: str = "xxhash64"):
    """num_perm minhashes via a seeded hash family: h_i(S) = min over
    shingles of hash(shingle, i). No Python, no stored permutation
    tables — the seed IS the permutation.

    hash_family:
      xxhash64  production default over int64 shingle hashes (JVM
                intrinsic, engine-specific mixing)
      md5       over gram STRINGS: h_i(g) = (a_i * x(g) + b_i) mod P
                with x(g) the first 8 md5 hex chars of the gram (see
                mh_affine_consts/_md5_gram_int). Bit-replayable in ANY
                engine with md5 — this family powers the DuckDB oracle
                that proves the banding/join/verify logic end-to-end.
                NOTE: as a pure Column function this inlines the md5
                transform into every seed; minhash_lsh_pairs stages
                the x(g) array in its own projection so the md5 pass
                runs ONCE (CollapseProject keeps non-cheap multi-use
                aliases staged)."""
    # seed capture MUST be a closure factory, not a `lambda s, i=i:`
    # default arg — pyspark counts the lambda's parameters, and a
    # second parameter silently selects transform's binary
    # (element, INDEX) form, swapping the seed literal for the array
    # index. With per-doc-sorted shingle arrays that made h_i depend on
    # each doc's array layout: near-identical sets agreed on 0/64
    # signature positions and LSH recall collapsed to exact-dup pairs
    # (caught by the md5-family DuckDB oracle; pinned by
    # test_dedup.py::test_minhash_signature_agreement).
    if hash_family == "md5":
        xs = F.transform(shingles_col, _md5_gram_int)
        return F.array(*[
            F.array_min(F.transform(xs, _mh_affine(i)))
            for i in range(num_perm)
        ])

    def _h(i):
        return lambda s: F.xxhash64(s, F.lit(i))
    return F.array(*[
        F.array_min(F.transform(shingles_col, _h(i)))
        for i in range(num_perm)
    ])


_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al. 2014, public
    domain): full-avalanche 64-bit mixer; uint64 wrap-around is the
    intended modular arithmetic."""
    z = x + _SPLITMIX_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
    return z ^ (z >> np.uint64(31))


def word_shingles_and_minhash(text_col, n: int = 3, num_perm: int = 64):
    """Shingle hashes AND the num_perm minhash signature in ONE Arrow
    hop, as struct(sh array<long>, sig array<long>).

    The column-level minhash_signature (64 higher-order `transform`
    lambdas) is evaluated per element by Catalyst's interpreted lambda
    machinery — measured ~2.5s at sf0.1 on local[32], dominating the
    whole LSH query. Hash-family mixing is engine-specific by contract
    (rows-only driver check; properties pinned in tests), so the
    production family computes h_i(s) = splitmix64(s ^ seed_i) with the
    whole batch's shingles flattened once and per-seed segment minima
    via np.minimum.reduceat — no per-doc Python loop in the hot part.
    Docs with no shingles (null text) get int64-max sentinel positions;
    any bucket collision among them dies in the exact-Jaccard verify
    (empty sets have jaccard 0)."""
    seeds = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    out_t = T.StructType([
        T.StructField("sh", T.ArrayType(T.LongType())),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ])

    @F.pandas_udf(out_t)
    def shingles_minhash(texts: pd.Series) -> pd.DataFrame:
        per_doc = [_gram_hashes(s, n) for s in texts]
        m = len(per_doc)
        lens = np.fromiter((len(a) for a in per_doc), np.int64, m)
        sigs = np.full((m, num_perm), np.iinfo(np.int64).max, np.int64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate(
                [a for a in per_doc if len(a)]).astype(np.uint64)
            starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            rows = np.flatnonzero(nz)
            for i, seed in enumerate(seeds):
                mixed = _splitmix64(flat ^ seed).view(np.int64)
                sigs[rows, i] = np.minimum.reduceat(mixed, starts)
        return pd.DataFrame({"sh": per_doc, "sig": list(sigs)})

    return shingles_minhash(text_col)


def minhash_signature_table(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3,
                            num_perm: int = 64,
                            hash_family: str = "xxhash64") -> DataFrame:
    """(id, sh, sig) — shingle set + num_perm-minima MinHash signature
    per document. Factored out of minhash_lsh_pairs so the one-shot
    pair miner, the persisted index writer (write_minhash_index), and
    the incremental-batch path (incremental_dedup) share one builder
    and can never drift apart on tokenization or the hash family."""
    # the num_perm-permutation signature build is the CPU-heavy stage
    # and runs BEFORE the first exchange — widen a small-file scan so
    # it isn't serialized on one core (no-op at cluster scale)
    df = ensure_min_partitions(df)
    if hash_family == "md5":
        # oracle-replayable family: string grams -> ONE md5 pass into
        # Z_P points (staged so CollapseProject cannot inline the md5
        # transform into all num_perm seed minima — multi-use non-cheap
        # aliases stay staged), then integer affine permutation minima
        sh = df.select(F.col(id_col).alias("id"),
                       word_grams(F.col(text_col), n).alias("sh"))
        staged = sh.select("id", "sh",
                           F.transform("sh", _md5_gram_int).alias("__xs"))
        return staged.select(
            "id", "sh",
            F.array(*[F.array_min(F.transform(F.col("__xs"),
                                              _mh_affine(i)))
                      for i in range(num_perm)]).alias("sig"))
    # production family: fused shingle+signature Arrow kernel (the
    # 64 interpreted HOF transforms were the query's hot spot)
    both = df.select(
        F.col(id_col).alias("id"),
        word_shingles_and_minhash(F.col(text_col), n, num_perm)
        .alias("m"))
    return both.select("id", F.col("m.sh").alias("sh"),
                       F.col("m.sig").alias("sig"))


def _band_bucket(b: int, rows_per_band: int, hash_family: str):
    cols = [F.col("sig")[b * rows_per_band + r]
            for r in range(rows_per_band)]
    if hash_family == "md5":
        # oracle-replayable: the band key is the '|'-joined integer
        # minhashes themselves (string_agg ORDER BY seed in SQL)
        return F.concat_ws("|", *[c.cast("string") for c in cols])
    return F.xxhash64(*cols)


def _band_struct_explode(num_perm: int, bands: int, hash_family: str):
    rows_per_band = num_perm // bands
    return F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 _band_bucket(b, rows_per_band, hash_family)
                 .alias("bucket"))
        for b in range(bands)
    ])).alias("bb")


def write_minhash_index(df: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, num_perm: int = 64, bands: int = 16,
                        hash_family: str = "xxhash64") -> None:
    """Persist the MinHash index for a corpus snapshot — the
    production contract minhash_lsh_pairs' join_back docstring names
    ('the shingle table is a persisted signature table: write once,
    join per run'), made concrete:

      {path}/bands     (band, bucket, id), partitioned by band
      {path}/shingles  (id, sh)
      {path}/meta      one row of the family parameters, so a reader
                       can never probe with a mismatched family

    Training-data pipelines recrawl continuously; recomputing
    signatures for 10^12 already-indexed documents per batch is the
    scale-killer this avoids. At cluster scale write both tables as
    Iceberg, bands bucketed on (bucket) within each band partition so
    the incremental join co-locates without a corpus-side shuffle."""
    sig = minhash_signature_table(df, id_col, text_col, n, num_perm,
                                  hash_family)
    bands_df = (sig.select("id",
                           _band_struct_explode(num_perm, bands,
                                                hash_family))
                .select("id", "bb.band", "bb.bucket"))
    (bands_df.repartition("band")
     .write.partitionBy("band").mode("overwrite")
     .parquet(f"{path}/bands"))
    sig.select("id", "sh").write.mode("overwrite") \
        .parquet(f"{path}/shingles")
    spark = df.sparkSession
    (spark.createDataFrame(
        [(int(n), int(num_perm), int(bands), hash_family)],
        "n int, num_perm int, bands int, hash_family string")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))


def read_minhash_index(spark, path: str) -> tuple:
    """-> (bands_df, shingles_df, meta dict) from write_minhash_index."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    return (spark.read.parquet(f"{path}/bands"),
            spark.read.parquet(f"{path}/shingles"),
            meta)


def incremental_dedup(new_docs: DataFrame, index: tuple,
                      id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.5,
                      carry: str = "auto",
                      approx_docs: int | None = None) -> DataFrame:
    """Dedup a NEW batch of documents against a persisted corpus index
    (read_minhash_index output) WITHOUT rescanning the corpus — the
    incremental shape every continuously-crawling pipeline runs.

    Two deterministic stages:
      1. corpus stage — batch signatures (a narrow map over the BATCH
         only) band-join the index; a new doc that verifies (exact
         Jaccard >= threshold) against ANY indexed doc is dropped;
         dup_of = the best match (max rounded jaccard, ties to the
         smaller corpus id).
      2. batch stage — the survivors are deduped among THEMSELVES
         with the same family via minhash_lsh_pairs + connected
         components; each component keeps its min id.

    Returns one row per new doc: (id, dup_of, jaccard, keep) — dup_of
    null for kept docs, jaccard only for corpus-stage drops (batch-
    stage drops point at their kept representative).

    Scale shape: corpus-side cost is ONE band-bucket equi-join against
    the band-partitioned index plus a shingle join for verification —
    both keyed, both prunable; nothing rescans or re-hashes indexed
    documents. The batch stage is minhash_lsh_pairs at batch size."""
    index_bands, index_sh, meta = index
    n, num_perm = int(meta["n"]), int(meta["num_perm"])
    bands, hash_family = int(meta["bands"]), meta["hash_family"]
    # persisted: the batch signature map is the batch's costliest
    # narrow stage and BOTH stages consume it (stage 1 band-joins the
    # index, stage 2 pair-mines the survivors) — materializing once
    # halves the md5/shingle work; batch-sized by design (the corpus
    # side lives in the persisted index)
    sig = minhash_signature_table(new_docs, id_col, text_col, n,
                                  num_perm, hash_family).persist()
    nb = (sig.select("id", "sh",
                     _band_struct_explode(num_perm, bands, hash_family))
          .select("id", "sh", "bb.band", "bb.bucket"))
    cand = (nb.join(index_bands.select(F.col("id").alias("cid"),
                                       "band", "bucket"),
                    ["band", "bucket"])
            .select("id", "sh", "cid")
            .dropDuplicates(["id", "cid"]))
    ver = cand.join(index_sh.select(F.col("id").alias("cid"),
                                    F.col("sh").alias("shc")), "cid")
    inter = F.size(F.array_intersect("sh", "shc")).cast("double")
    union = (F.size("sh") + F.size("shc")).cast("double") - inter
    jac = inter / F.greatest(union, F.lit(1.0))
    matched = (ver.withColumn("jaccard", F.round(jac, 6))
               .filter(jac >= threshold))
    # best corpus match per new doc: max rounded jaccard, ties to the
    # smallest corpus id — min_by over the (-jaccard, cid) struct
    # (lexicographic) rather than a negated-id struct max, so cid may
    # be ANY orderable type (numeric doc ids, url strings); ordering
    # keys are unique per (id, cid) so min_by is deterministic
    best = (matched.groupBy("id")
            .agg(F.max("jaccard").alias("jaccard"),
                 F.min_by(
                     "cid",
                     F.struct((-F.col("jaccard")).alias("nj"),
                              F.col("cid"))).alias("dup_of"))
            .select("id", "dup_of", "jaccard"))
    survivors = new_docs.join(
        best.select(F.col("id").alias(id_col)), id_col, "left_anti")
    # survivors' signatures come from the persisted stage-1 table
    # (anti-join on the corpus-dropped ids) instead of re-shingling
    # and re-hashing ~the whole batch a second time
    surv_sig = sig.join(best.select("id"), "id", "left_anti")
    pairs = minhash_lsh_pairs(survivors, id_col=id_col,
                              text_col=text_col, n=n,
                              num_perm=num_perm, bands=bands,
                              threshold=threshold, carry=carry,
                              approx_docs=approx_docs,
                              hash_family=hash_family, sig=surv_sig)
    from dxnn_ocr_cpp_spark.operators.cc import connected_components
    comp = (connected_components(pairs.select("a", "b"), "a", "b")
            .select(F.col("node").alias("id"),
                    F.col("component").alias("rep")))
    ids = new_docs.select(F.col(id_col).alias("id"))
    return (ids.join(best, "id", "left")
            .join(comp, "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("dup_of"),
                    F.when(F.col("rep") != F.col("id"), F.col("rep")))
                .alias("dup_of"),
                "jaccard",
                (F.col("dup_of").isNull()
                 & (F.coalesce(F.col("rep"), F.col("id"))
                    == F.col("id"))).alias("keep")))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5,
                      verify: bool = True,
                      carry: str = "auto",
                      ride_along_max_docs: int = 1_000_000,
                      approx_docs: int | None = None,
                      hash_family: str = "xxhash64",
                      sig: DataFrame | None = None) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH; optionally
    verified with exact Jaccard on the shingle sets.

    sig — optional precomputed minhash_signature_table output
    (id, sh, sig) for EXACTLY the documents in df, same (n, num_perm,
    hash_family). The signature build is the pair miner's costliest
    narrow map; a caller that already built signatures for these docs
    (incremental_dedup stage 1 did, for its index band-join) passes
    them instead of re-shingling and re-hashing the corpus.

    Scale shape: signature build is a narrow map; the only shuffle is
    the band-bucket groupBy; pairs emerge bucket-locally. With
    b=16, r=4 the S-curve threshold is (1/16)^(1/4) ~ 0.5.

    carry — how verify gets each candidate's shingle set:
      ride_along  the full int64 shingle array rides every one of the
                  `bands` exploded rows, so verify needs NO join back.
                  Wins at small/medium scale: one exchange, and both
                  join sides reuse it (ReuseExchange).
      join_back   the band explode carries ONLY (id, band, bucket);
                  candidate (a, b) pairs join back to the shingle
                  table twice. Two extra id-keyed shuffles, but the
                  band shuffle shrinks ~`bands`-fold in bytes — at
                  web scale the ride-along payload (bands x shingles x
                  8B per doc) dominates shuffle I/O and this is the
                  only sane plan. On a real cluster the shingle table
                  is a persisted signature table (write once, join
                  per run).
      auto        ride_along up to ride_along_max_docs documents,
                  join_back above. CAUTION: without an approx_docs
                  hint, auto runs a df.count() Spark job EAGERLY at
                  plan-construction time (a full scan if df is a
                  transformed DataFrame) — pass approx_docs or an
                  explicit carry when building lazy plans.
    Both modes produce identical pairs — pinned by
    tests/test_dedup.py::test_minhash_carry_modes_agree.

    hash_family "md5" swaps the shingle/permutation/bucket hashing for
    md5-based equivalents (see minhash_signature) while keeping the
    banding, candidate join, dedupe, and exact-Jaccard verify code
    paths IDENTICAL — the md5 family is what the DuckDB oracle can
    replay bit-for-bit, so it certifies this operator's pair-mining
    logic, not just its own output.
    """
    if carry not in ("auto", "ride_along", "join_back"):
        raise ValueError(f"carry must be auto|ride_along|join_back, got {carry}")
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"hash_family must be xxhash64|md5, got {hash_family}")
    if carry == "auto":
        n_docs = approx_docs if approx_docs is not None else df.count()
        carry = "ride_along" if n_docs <= ride_along_max_docs else "join_back"
    if sig is None:
        sig = minhash_signature_table(df, id_col, text_col, n, num_perm,
                                      hash_family)
    sh = sig.select("id", "sh")

    def band_structs():
        return _band_struct_explode(num_perm, bands, hash_family)

    if carry == "ride_along":
        # shingles ride through the band explode as int64 arrays
        # (8 bytes/shingle, ~10x lighter than the raw n-gram strings);
        # both join sides shuffle the SAME subtree on (band, bucket) so
        # ReuseExchange computes the text->shingle pipeline once
        bands_df = sig.select("id", "sh", band_structs()) \
                      .select("id", "sh", "bb.band", "bb.bucket")
        cand = (bands_df.alias("x").join(bands_df.alias("y"),
                                         ["band", "bucket"])
                .filter(F.col("x.id") < F.col("y.id"))
                .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                        F.col("x.sh").alias("sha"), F.col("y.sh").alias("shb"))
                .dropDuplicates(["a", "b"]))
        if not verify:
            return cand.select("a", "b")
    else:
        # id-only band rows: the (band, bucket) exchange carries 24
        # bytes/row instead of the whole shingle array
        bands_df = sig.select("id", band_structs()) \
                      .select("id", "bb.band", "bb.bucket")
        cand = (bands_df.alias("x").join(bands_df.alias("y"),
                                         ["band", "bucket"])
                .filter(F.col("x.id") < F.col("y.id"))
                .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
                .dropDuplicates(["a", "b"]))
        if not verify:
            return cand
        cand = (cand
                .join(sh.select(F.col("id").alias("a"),
                                F.col("sh").alias("sha")), "a")
                .join(sh.select(F.col("id").alias("b"),
                                F.col("sh").alias("shb")), "b"))
    inter = F.size(F.array_intersect("sha", "shb")).cast("double")
    union = (F.size("sha") + F.size("shb")).cast("double") - inter
    return (cand
            .withColumn("jaccard", inter / F.greatest(union, F.lit(1.0)))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


# ---------- SimHash ----------

def simhash64(text_col, token_n: int = 2, hash_family: str = "blake2b"):
    """64-bit SimHash over distinct word n-gram tokens:
    bit_j = majority vote of bit_j(hash64(token)) across tokens.

    ONE fused pandas UDF (tokenize + hash + whole-batch numpy bit-vote
    via reduceat) — the NPU-call-shaped hybrid; a pure-Column version
    needs 64 aggregate passes and is ~100x slower.

    hash_family "md5" takes the token hash from the first 8 md5 digest
    bytes instead of blake2b — identical vote/signature kernel, but the
    bits are reproducible in any engine with md5 (DuckDB oracle)."""
    @F.pandas_udf(T.LongType())
    def simhash_from_text(texts: pd.Series) -> pd.Series:
        bitpos = np.arange(64, dtype=np.uint64)
        n = len(texts)
        per_doc = [_gram_hashes(s, token_n, hash_family) for s in texts]
        lens = np.fromiter((len(a) for a in per_doc), np.int64, n)
        out = np.zeros(n, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            # flatten every doc's token hashes into one array, vote
            # bits once, segment-sum with reduceat — no per-doc kernel
            flat = np.concatenate(
                [a for a in per_doc if len(a) > 0]).astype(np.uint64)
            bits = ((flat[:, None] >> bitpos) & np.uint64(1)).astype(np.int32)
            starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            votes = np.add.reduceat(bits, starts, axis=0)     # (n_nz, 64)
            majority = votes * 2 > lens[nz, None]             # bit=1 iff >half
            sigs = (majority.astype(np.uint64) << bitpos).sum(
                axis=1, dtype=np.uint64)
            out[nz] = sigs.astype(np.int64)                   # two's-complement
        return pd.Series(out)

    return simhash_from_text(text_col)


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  hash_family: str = "blake2b") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found via
    the pigeonhole trick: split the 64-bit hash into max_hamming+1
    pieces; any pair within the distance agrees exactly on >=1 piece ->
    equi-join per piece, then exact hamming filter. No O(n^2), and
    COMPLETE recall (pieces = d+1 is what the guarantee requires —
    a fixed 4-piece split would silently miss d>3 pairs differing in
    all four pieces). d is capped at 7: narrower than 8-bit pieces
    bucket half the corpus together and the join degenerates."""
    # signature kernel runs pre-exchange; parallelize small scans
    df = ensure_min_partitions(df)
    s = df.select(F.col(id_col).alias("id"),
                  simhash64(F.col(text_col),
                            hash_family=hash_family).alias("sim"))
    return hamming_pairs(s, max_hamming)


def hamming_pairs(sigs: DataFrame, max_hamming: int,
                  id_col: str = "id", sig_col: str = "sim") -> DataFrame:
    """(id, 64-bit signature) -> all pairs with hamming <= max_hamming,
    via the pigeonhole join described in simhash_pairs. Shared by
    SimHash text near-dup and the multimodal dHash image near-dup —
    any 64-bit locality-preserving signature plugs in. Returns
    (a, b, hamming) with a < b."""
    if not 0 <= max_hamming <= 7:
        raise ValueError("max_hamming must be in [0, 7] "
                         "(pieces = d+1 at >=8 bits each)")
    n_pieces = max_hamming + 1
    width = 64 // n_pieces  # remainder bits ride in the last piece
    s = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sim"))

    def piece_val(p: int):
        bits = 64 - p * width if p == n_pieces - 1 else width
        shifted = F.shiftright("sim", p * width)
        if bits >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << bits) - 1))

    pieces = s.select(
        "id", "sim",
        F.explode(F.array(*[
            F.struct(F.lit(p).alias("piece"), piece_val(p).alias("val"))
            for p in range(n_pieces)
        ])).alias("pc")).select("id", "sim", "pc.piece", "pc.val")
    cand = (pieces.alias("x").join(pieces.alias("y"), ["piece", "val"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                    F.col("x.sim").alias("sa"), F.col("y.sim").alias("sb"))
            .dropDuplicates(["a", "b"]))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))
