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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dxnn_ocr_cpp_spark.operators.textstats import fingerprint


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

def word_shingles(text_col, n: int = 3):
    """Array of word n-grams of the canonicalized text (distinct,
    sorted for determinism)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " ")
    grams = F.transform(
        # 0 .. size-n inclusive; greatest() keeps the sequence ascending
        # for short docs (the when() below selects the `short` branch)
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    short = F.array(F.array_join(words, " "))  # doc shorter than n words
    return F.array_sort(F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(short)))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int = 1000) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (a, b, jaccard >= t).

    Inverted-index pair generation: explode shingles, drop shingles
    appearing in > max_shingle_df docs (frequency cap = skew guard:
    without it one stop-shingle joins half the corpus to itself), join
    doc-lists pairwise, count common shingles, compute
    |A∩B| / (|A|+|B|-|A∩B|).
    """
    sh = (df.select(F.col(id_col).alias("id"),
                    word_shingles(F.col(text_col), n).alias("sh"))
            .withColumn("n_sh", F.size("sh")))
    sizes = sh.select("id", "n_sh")
    ex = sh.select("id", F.explode("sh").alias("g"))
    # frequency cap (bounded work per key — candidate-cap analog)
    hot = ex.groupBy("g").count().filter(F.col("count") > max_shingle_df).select("g")
    ex = ex.join(F.broadcast(hot), "g", "left_anti")
    pairs = (ex.alias("x").join(ex.alias("y"), "g")
             .filter(F.col("x.id") < F.col("y.id"))
             .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
             .agg(F.count(F.lit(1)).cast("int").alias("common")))
    out = (pairs
           .join(sizes.withColumnRenamed("id", "a")
                      .withColumnRenamed("n_sh", "na"), "a")
           .join(sizes.withColumnRenamed("id", "b")
                      .withColumnRenamed("n_sh", "nb"), "b")
           .withColumn("jaccard",
                       F.col("common")
                       / (F.col("na") + F.col("nb") - F.col("common")))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return out


# ---------- MinHash + LSH ----------

def minhash_signature(shingles_col, num_perm: int = 64):
    """num_perm minhashes via seeded xxhash64: h_i(S) = min over
    shingles of xxhash64(shingle, i). No Python, no stored permutation
    tables — the seed IS the permutation."""
    return F.array(*[
        F.array_min(F.transform(shingles_col, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_perm)
    ])


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5,
                      verify: bool = True) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH; optionally
    verified with exact Jaccard on the shingle sets.

    Scale shape: signature build is a narrow map; the only shuffle is
    the band-bucket groupBy; pairs emerge bucket-locally. With
    b=16, r=4 the S-curve threshold is (1/16)^(1/4) ~ 0.5.
    """
    rows_per_band = num_perm // bands
    sh = df.select(F.col(id_col).alias("id"),
                   word_shingles(F.col(text_col), n).alias("sh"))
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), num_perm))
    bands_df = sig.select(
        "id", "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                             for r in range(rows_per_band)]).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"))
    bands_df = bands_df.select("id", "sh", "bb.band", "bb.bucket")
    cand = (bands_df.alias("x").join(bands_df.alias("y"), ["band", "bucket"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                    F.col("x.sh").alias("sha"), F.col("y.sh").alias("shb"))
            .dropDuplicates(["a", "b"]))
    if not verify:
        return cand.select("a", "b")
    inter = F.size(F.array_intersect("sha", "shb")).cast("double")
    union = (F.size("sha") + F.size("shb")).cast("double") - inter
    return (cand
            .withColumn("jaccard", inter / F.greatest(union, F.lit(1.0)))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


# ---------- SimHash ----------

def _simhash_from_hashes_udf():
    """Vectorized numpy kernel: array<long> token hashes -> 64-bit
    SimHash. Token hashing stays JVM-side (xxhash64); only the bit-vote
    reduction crosses to Python — one Arrow hop, whole batch at once
    (the NPU-call-shaped hybrid; a pure-Column version needs 64
    aggregate passes and is ~100x slower)."""
    @F.pandas_udf(T.LongType())
    def simhash_from_hashes(hashes: pd.Series) -> pd.Series:
        bitpos = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, arr in enumerate(hashes):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = (h[:, None] >> bitpos) & np.uint64(1)     # (n_tok, 64)
            votes = (2 * bits.astype(np.int32) - 1).sum(axis=0)
            sig = int(((votes > 0).astype(np.uint64) << bitpos)
                      .sum(dtype=np.uint64))
            out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return simhash_from_hashes


def simhash64(text_col, token_n: int = 2):
    """64-bit SimHash over word n-gram tokens:
    bit_j = sign(sum over tokens of (bit_j(xxhash64(tok)) ? +1 : -1))."""
    toks = word_shingles(text_col, token_n)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _simhash_from_hashes_udf()(hashes)


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found via
    the 4-piece pigeonhole trick: split the 64-bit hash into 4 16-bit
    pieces; any pair within distance 3 agrees exactly on >=1 piece ->
    equi-join per piece, then exact hamming filter. No O(n^2)."""
    s = df.select(F.col(id_col).alias("id"),
                  simhash64(F.col(text_col)).alias("sim"))
    pieces = s.select(
        "id", "sim",
        F.explode(F.array(*[
            F.struct(F.lit(p).alias("piece"),
                     F.shiftright("sim", p * 16)
                      .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for p in range(4)
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
