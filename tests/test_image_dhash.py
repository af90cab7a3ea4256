"""Perceptual image dedup (multimodal.dhash64_arr / image_dhash_pairs).

The image-side analog of SimHash text near-dup: a 64-bit
locality-preserving signature fed through the SAME pigeonhole hamming
join (dedup.hamming_pairs). Pins the hash kernel (bit layout, grayscale
rule, resize kernel), near-dup behavior under rescaling, per-row fault
containment, planted-fixture separation margins, and the pair miner.
"""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.multimodal import (
    _nn_resize, decode_image, dhash64_arr, image_dhash_pairs, make_bmp,
    make_ppm, synthesize_patterned_images, with_dhash)


def _pattern(g: int, w: int = 16, h: int = 12) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    val = ((((x + 17 * g) * 73856093)
            ^ ((y + 31 * g) * 19349663)) >> 8) & 0xFF
    return np.repeat(val.astype(np.uint8)[..., None], 3, axis=2)


class TestKernel:
    def test_bit_layout_tiny(self):
        # 9x8 image used as-is (resize is identity): bit k set iff
        # col k > col k+1 in row-major MSB-first order
        arr = np.zeros((8, 9, 3), np.uint8)
        arr[0, 0] = 200  # row 0: col0 > col1 -> MSB set
        got = dhash64_arr(arr)
        assert got < 0 or got >= 0  # signed long domain
        assert (got & ((1 << 64) - 1)) >> 63 == 1  # MSB
        assert bin(got & ((1 << 64) - 1)).count("1") == 1

    def test_signed_long_wrap(self):
        # all-descending rows set every bit -> signature -1 as int64
        arr = np.zeros((8, 9, 3), np.uint8)
        arr[:, :, :] = np.arange(9, 0, -1, dtype=np.uint8)[None, :, None]
        assert dhash64_arr(arr) == -1

    def test_grayscale_integer_exact(self):
        # (r+g+b)//3 — channel order must not matter for equal sums
        a = np.zeros((8, 9, 3), np.uint8)
        b = np.zeros((8, 9, 3), np.uint8)
        a[0, 0] = (30, 60, 90)
        b[0, 0] = (90, 60, 30)
        assert dhash64_arr(a) == dhash64_arr(b)

    def test_scale_invariance_near_dup(self):
        # the SAME pattern rendered at 2x resolution hashes within a
        # small radius of the original (that's the point of dHash)
        base = _pattern(3)
        big = _nn_resize(base, 32, 24)
        d = (dhash64_arr(base) ^ dhash64_arr(big)) & ((1 << 64) - 1)
        assert bin(d).count("1") <= 2

    def test_format_invariance(self):
        # identical pixels through PPM and BMP decode to the same hash
        arr = _pattern(7)
        ppm, _ = decode_image(make_ppm(16, 12, arr))
        bmp, _ = decode_image(make_bmp(16, 12, arr))
        assert dhash64_arr(ppm) == dhash64_arr(bmp)


class TestPlantedSeparation:
    def test_groups_distinct_and_far(self):
        """The certification fixture's margin: 25 distinct hashes,
        minimum cross-group hamming well above the query's radius 2.
        If a pattern change erodes this, the planted oracle becomes
        invalid — fail HERE first."""
        hs = {g: dhash64_arr(_pattern(g)) for g in range(25)}
        assert len(set(hs.values())) == 25
        mind = min(
            bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
            for a, b in itertools.combinations(range(25), 2))
        assert mind >= 6, f"cross-group margin eroded: {mind}"


class TestSpark:
    @pytest.fixture(scope="class")
    def media(self, spark):
        docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
        return synthesize_patterned_images(docs).cache()

    def test_fault_containment(self, spark, media):
        got = {r["media_id"]: r for r in with_dhash(media).collect()}
        assert len(got) == 120
        assert got[0]["dhash_status"] == "dhash-error"   # 0 % 37 == 0
        assert got[0]["dhash"] is None
        assert got[74]["dhash_status"] == "dhash-error"
        assert got[1]["dhash_status"] == "hashed"

    def test_pairs_exactly_same_group(self, spark, media):
        pairs = image_dhash_pairs(media, max_hamming=2).collect()
        ok = {i for i in range(120) if i % 37 != 0}
        expected = {(a, b) for a in ok for b in ok
                    if a < b and a % 25 == b % 25}
        got = {(r["a"], r["b"]) for r in pairs}
        assert got == expected
        assert all(r["hamming"] == 0 for r in pairs)

    def test_partitioning_invariance(self, spark, media):
        a = sorted((r["a"], r["b"]) for r in image_dhash_pairs(
            media.repartition(1)).collect())
        b = sorted((r["a"], r["b"]) for r in image_dhash_pairs(
            media.repartition(13)).collect())
        assert a == b

    def test_no_cartesian_in_plan(self, spark, media):
        plan = (image_dhash_pairs(media)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
